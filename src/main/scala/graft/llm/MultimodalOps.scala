package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Q

/** Multimodal-column plumbing (BASELINE.json): images/audio/video are
  * opaque `binary` columns with typed metadata. The image path runs a
  * REAL codec — PNG via javax.imageio, JDK-only, no extra jars: payloads
  * are deterministic synthesized PNGs (the fixtures ship no binary
  * column) and mm_decode extracts width/height/channels from an actual
  * decode, oracle-checked against the generation parameters. Audio runs
  * the REAL WAV codec (javax.sound.sampled, r15); video has no system
  * codec in this container, so the r15 video arm pairs an own minimal
  * frame container (GVID) with REAL per-frame PNG decodes; the older
  * frame-sample/resize rows operate on byte blocks / metadata with the
  * same partition-parallel shapes.
  */
object MultimodalOps {

  /** Binary metadata extraction: byte length, content digest, leading
    * "magic bytes" — the real first stage of any media pipeline.
    */
  val m1 = Q(
    "mm_binary_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  md5(text) AS digest,
      |  lower(hex(encode(substr(text, 1, 4)))) AS magic_hex
      |FROM documents
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val bin = col("text").cast(BinaryType)
    s.table("documents").select(
      col("doc_id"),
      octet_length(bin).as("n_bytes"),
      md5(bin).as("digest"),
      lower(hex(substring(col("text"), 1, 4).cast(BinaryType))).as("magic_hex"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Decoded "image" metadata for every payload. Fields are Option so a
    * NULL payload yields a row of NULL metadata (DuckDB: md5(NULL)=NULL)
    * instead of crashing the decode task.
    */
  final case class MediaMeta(
      doc_id: Long, width: Option[Int], height: Option[Int],
      channels: Option[Int], n_frames: Option[Int])

  /** Per-thread PNG ImageWriter (the `ImageIO.write` facade re-walks
    * the SPI registry and re-wraps streams on every call — measured as
    * the linear term in mm_video_meta's 100×-tier wall, 3.5 encodes per
    * row; an ImageWriter is not thread-safe, so thread-local, not
    * shared). Same codec object the facade would dispatch to.
    */
  private val PngWriterTL: ThreadLocal[javax.imageio.ImageWriter] =
    ThreadLocal.withInitial(() =>
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next())

  private[graft] def pngEncode(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = PngWriterTL.get()
    val bos = new java.io.ByteArrayOutputStream()
    // explicit memory-cached stream (not the facade): the default path
    // consults ImageIO.getUseCache() and spools through a temp FILE —
    // one create/write/delete per row on the shuffle disk
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { w.setOutput(ios); w.write(img) } finally ios.close()
    bos.toByteArray
  }

  /** Deterministic PNG payload for a document id: dimensions and
    * colorspace are pure functions of the id (so the oracle can state
    * expected metadata without a codec), pixel content is a gradient
    * keyed by (x, y, id) so the codec compresses real image data. Odd
    * ids are 1-band grayscale, even ids 3-band BGR.
    */
  /** Fixture contract, enforced once (r15 ADVICE): every id-derived
    * payload formula below uses `%` / `.toInt` arithmetic that assumes
    * NON-NEGATIVE doc ids — Scala's `%` is sign-following and `.toInt`
    * truncates, where the DuckDB oracle's restatement operates on the
    * same fixtures assuming ids ≥ 0. A negative id would hash-diverge
    * or produce n_frames < 1; fail loudly instead of silently.
    */
  private[llm] def nonNegId(id: Long): Long = {
    require(id >= 0,
      s"multimodal payload formulas require non-negative doc ids, got $id")
    id
  }

  /** Fill a TYPE_3BYTE_BGR image from the (x, y) → packed-rgb formula by
    * writing the raster's byte buffer directly. Bit-identical to the
    * per-pixel `setRGB` loop it replaces — TYPE_3BYTE_BGR stores the
    * three sRGB bytes verbatim (B,G,R interleaved), so `setRGB(x,y,v)`
    * IS these three byte stores plus a per-call color-model dispatch
    * that measured as most of the payload-synthesis wall.
    */
  private def fillBgr(img: java.awt.image.BufferedImage)(rgb: (Int, Int) => Int): Unit = {
    val w = img.getWidth; val h = img.getHeight
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = rgb(x, y)
        data(i) = (v & 255).toByte           // B
        data(i + 1) = ((v >> 8) & 255).toByte  // G
        data(i + 2) = ((v >> 16) & 255).toByte // R
        i += 3
        x += 1
      }
      y += 1
    }
  }

  private[graft] def pngPayload(id: Long): Array[Byte] = {
    nonNegId(id)
    val w = 16 + ((id * 7) % 48).toInt
    val h = 16 + ((id * 13) % 48).toInt
    val kind =
      if (id % 2 == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(w, h, kind)
    if (kind == java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      fillBgr(img)((x, y) => (x * 31 + y * 17 + id.toInt * 97) & 0xffffff)
    else {
      // gray arm stays on setRGB: TYPE_BYTE_GRAY's sRGB→gray conversion
      // is the color model's, not a restatable formula — keep Java's
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (x * 31 + y * 17 + id.toInt * 97) & 0xffffff)
          x += 1
        }
        y += 1
      }
    }
    pngEncode(img)
  }

  /** Typed decode stage with a REAL codec in the loop: Dataset[(id,
    * bytes)] → mapPartitions → Dataset[MediaMeta], where the bytes are
    * actual PNG streams (synthesized per id — the fixtures ship no
    * binary column) and width/height/channels/n_frames come from a
    * javax.imageio decode of those bytes. One ImageReader per
    * partition, rows streamed through it — the codec-context pattern;
    * embarrassingly parallel and shuffle-free at any scale. The oracle
    * recomputes the expected metadata from the generation parameters,
    * so a codec that mis-reports dimensions (or plumbing that swaps
    * payloads between rows) hash-fails.
    */
  val m2 = Q(
    "mm_decode",
    """SELECT doc_id,
      |  CAST(CASE WHEN text IS NULL THEN NULL
      |       ELSE 16 + (doc_id * 7) % 48 END AS INT) AS width,
      |  CAST(CASE WHEN text IS NULL THEN NULL
      |       ELSE 16 + (doc_id * 13) % 48 END AS INT) AS height,
      |  CAST(CASE WHEN text IS NULL THEN NULL
      |       WHEN doc_id % 2 = 1 THEN 1 ELSE 3 END AS INT) AS channels,
      |  CAST(CASE WHEN text IS NULL THEN NULL ELSE 1 END AS INT) AS n_frames
      |FROM documents
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    import s.implicits._
    // payload stage: id → PNG bytes (stands in for reading image files /
    // a binary column); a NULL source document yields a NULL payload.
    // Fanned out before synthesis: one PNG encode + decode per row is
    // CPU-bound and the scan is one task (guide §2.5)
    val payloads = graft.engine.Par.spread(s.table("documents")
      .select(col("doc_id"), col("text").isNotNull.as("has"))
      .as[(Long, Boolean)], col("doc_id"))
      .mapPartitions(_.map { case (id, has) =>
        (id, if (has) pngPayload(id) else null)
      })
      .toDF("doc_id", "payload")
      .as[(Long, Array[Byte])]
    // decode stage: one codec context (PNG ImageReader) per partition
    payloads.mapPartitions { it =>
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      it.map { case (id, bytes) =>
        if (bytes == null) // NULL payload → NULL metadata, not a crash
          MediaMeta(id, None, None, None, None)
        else {
          // direct memory-cached stream, NOT createImageInputStream:
          // the factory re-scans the SPI registry per call and, with
          // the default useCache=true, backs each image by a temp file
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis)
            val img = reader.read(0)
            MediaMeta(id,
              width = Some(img.getWidth),
              height = Some(img.getHeight),
              channels = Some(img.getRaster.getNumBands),
              n_frames = Some(reader.getNumImages(true)))
          } finally iis.close()
        }
      }
    }.toDF()
      // preSort (r19): the range sampling otherwise re-runs the whole
      // codec map a second time per execution; width defeats the
      // elision against the spread's doc_id partitioning
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("width")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Frame sampling over binary payloads: every k-th byte-block as a
    * "frame" (the video-frame-sample access pattern), pure Spark binary
    * slicing — no shuffle, prunes to two columns at the scan.
    */
  val m3 = Q(
    "mm_frame_sample",
    """SELECT doc_id,
      |  lower(hex(encode(substr(text, 1, 8)))) AS frame0,
      |  lower(hex(encode(substr(text, 65, 8)))) AS frame1,
      |  lower(hex(encode(substr(text, 129, 8)))) AS frame2,
      |  CAST(CEIL(octet_length(encode(text)) / 64.0) AS INT) AS n_blocks
      |FROM documents WHERE doc_id < 100
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("documents").filter(col("doc_id") < 100).select(
      col("doc_id"),
      lower(hex(substring(col("text"), 1, 8).cast(BinaryType))).as("frame0"),
      lower(hex(substring(col("text"), 65, 8).cast(BinaryType))).as("frame1"),
      lower(hex(substring(col("text"), 129, 8).cast(BinaryType))).as("frame2"),
      ceil(octet_length(col("text").cast(BinaryType)) / 64.0).cast(IntegerType).as("n_blocks"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Resize stage: decoded dimensions → target box (fit-within,
    * aspect-preserving — the standard training-pipeline image resize).
    * The input dims here are md5-derived synthetic metadata (the
    * real-codec path is mm_decode; a production resize consumes the
    * decode stage's metadata table); the resize ARITHMETIC — the part a
    * real pipeline would run after any codec — is real and
    * oracle-checked: scale = min(tw/w, th/h, 1) (never upscale), output
    * rounded down, floor at 1 px. Pure projection: no shuffle, prunes
    * to two columns at the scan, embarrassingly parallel at any scale.
    */
  val m4 = Q(
    "mm_resize",
    """SELECT doc_id, w, h,
      |  CAST(GREATEST(1, CAST(FLOOR(w * s) AS INT)) AS INT) AS rw,
      |  CAST(GREATEST(1, CAST(FLOOR(h * s) AS INT)) AS INT) AS rh
      |FROM (
      |  SELECT doc_id, w, h,
      |    LEAST(224.0 / w, 224.0 / h, 1.0) AS s
      |  FROM (
      |    SELECT doc_id,
      |      64 + (ascii(substr(md5(text), 1, 1)) * 256 +
      |            ascii(substr(md5(text), 2, 1))) % 512 AS w,
      |      64 + (ascii(substr(md5(text), 3, 1)) * 256 +
      |            ascii(substr(md5(text), 4, 1))) % 512 AS h
      |    FROM documents) dims) scaled
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val m = md5(col("text").cast(BinaryType))
    def byteAt(i: Int) = ascii(substring(m, i, 1))
    val w = lit(64) + (byteAt(1) * 256 + byteAt(2)) % 512
    val h = lit(64) + (byteAt(3) * 256 + byteAt(4)) % 512
    val dims = s.table("documents").select(col("doc_id"),
      w.cast(IntegerType).as("w"), h.cast(IntegerType).as("h"))
    val sc = least(lit(224.0) / col("w"), lit(224.0) / col("h"), lit(1.0))
    dims.select(col("doc_id"), col("w"), col("h"),
        greatest(lit(1), floor(col("w") * sc).cast(IntegerType)).as("rw"),
        greatest(lit(1), floor(col("h") * sc).cast(IntegerType)).as("rh"))
      // preSort (r19): no range-sampling re-exec of the md5-derived dims
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("w")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** dHash bands from a decoded raster: nearest-sample the image onto a
    * 9×8 luminance grid (integer ITU-ish weights 299/587/114, floor
    * division — every step exact integer arithmetic so the oracle can
    * restate it from the generation formula), emit 64 bits (each = "is
    * my right neighbor brighter"), packed little-endian into four
    * 16-bit bands. Bands double as the LSH bucketing keys: identical
    * band ⇒ candidate (pigeonhole-complete for hamming ≤ 3; the wider
    * hamming ≤ 6 verify is banding-scoped BY SPEC on both sides).
    */
  private[graft] def dhashBands(img: java.awt.image.BufferedImage): Array[Long] = {
    val w = img.getWidth; val h = img.getHeight
    val lums = Array.ofDim[Int](8, 9)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 9) {
        val v = img.getRGB(i * w / 9, j * h / 8) & 0xffffff
        val r = (v >> 16) & 255; val g = (v >> 8) & 255; val b = v & 255
        lums(j)(i) = (299 * r + 587 * g + 114 * b) / 1000
        i += 1
      }
      j += 1
    }
    val bands = new Array[Long](4)
    var t = 0
    while (t < 64) {
      if (lums(t / 8)(t % 8 + 1) > lums(t / 8)(t % 8)) bands(t / 16) |= 1L << (t % 16)
      t += 1
    }
    bands
  }

  /** Perceptual-hash image dedup (r14): the visual near-dup stage of a
    * multimodal pipeline — decode each image with the REAL PNG codec,
    * dHash the raster ([[dhashBands]]), bucket on the four 16-bit hash
    * bands (reusing [[DedupOps.lshCandidates]], hot-bucket star guard
    * included), and verify candidates by full 64-bit hamming ≤ 6.
    * Re-encodes, crops that preserve the sampled grid, and palette
    * shifts that survive the luminance quantization all land within a
    * few bits — the standard image-dedup contract (dHash is public
    * domain; cf. the pHash family).
    *
    * Restricted to the 3-band payloads (even ids): their decoded raster
    * is bit-exactly the generation formula (TYPE_3BYTE_BGR stores sRGB
    * verbatim and PNG is lossless), so the DuckDB oracle recomputes the
    * hash from (doc_id, w, h) alone and any codec/raster/packing bug
    * hash-fails. The 1-band arm goes through Java's internal gray
    * conversion (not SQL-restatable) — decode coverage for it lives in
    * mm_decode.
    *
    * Scale layout: decode+hash is partition-parallel with one codec
    * context per partition (the mm_decode pattern); only (doc_id, four
    * 16-bit bands) ever shuffles — 5 narrow columns per image
    * regardless of pixel size; the candidate join is bucket-confined
    * with the d2 hot-bucket cap.
    */
  val m5 = Q(
    "mm_phash_dedup",
    """WITH img AS (
      |  SELECT doc_id,
      |    16 + (doc_id * 7) % 48 AS w,
      |    16 + (doc_id * 13) % 48 AS h
      |  FROM documents WHERE doc_id % 2 = 0),
      |lum AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, 71), p ->
      |      (299 * ((((((p % 9) * w) // 9) * 31 + ((p // 9) * h // 8) * 17 + doc_id * 97) % 16777216) // 65536)
      |       + 587 * (((((((p % 9) * w) // 9) * 31 + ((p // 9) * h // 8) * 17 + doc_id * 97) % 16777216) // 256) % 256)
      |       + 114 * ((((((p % 9) * w) // 9) * 31 + ((p // 9) * h // 8) * 17 + doc_id * 97) % 16777216) % 256)) // 1000
      |    ) AS lums
      |  FROM img),
      |bits AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, 63), t ->
      |      CASE WHEN lums[(t // 8) * 9 + (t % 8) + 2] > lums[(t // 8) * 9 + (t % 8) + 1]
      |        THEN 1::BIGINT ELSE 0::BIGINT END) AS bs
      |  FROM lum),
      |hashes AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, 3), k ->
      |      list_aggregate(list_transform(generate_series(0, 15), u -> bs[k * 16 + u + 1] << u), 'sum')) AS bands
      |  FROM bits),
      |bandrows AS (
      |  SELECT doc_id, unnest(generate_series(0, 3)) AS band,
      |    bands[unnest(generate_series(0, 3)) + 1] AS bucket
      |  FROM hashes),
      |sized AS (
      |  SELECT doc_id, band, bucket,
      |    COUNT(*) OVER (PARTITION BY band, bucket) AS bsize,
      |    MIN(doc_id) OVER (PARTITION BY band, bucket) AS brep
      |  FROM bandrows),
      |cand AS (
      |  SELECT DISTINCT id_a, id_b FROM (
      |    SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |    FROM sized a JOIN sized b
      |      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      |    WHERE a.bsize <= 100
      |    UNION ALL
      |    SELECT brep AS id_a, doc_id AS id_b
      |    FROM sized WHERE bsize > 100 AND doc_id <> brep) u),
      |verified AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(bit_count(xor(ha.bands[1], hb.bands[1])) + bit_count(xor(ha.bands[2], hb.bands[2]))
      |       + bit_count(xor(ha.bands[3], hb.bands[3])) + bit_count(xor(ha.bands[4], hb.bands[4])) AS INT) AS hamming
      |  FROM cand c
      |  JOIN hashes ha ON ha.doc_id = c.id_a
      |  JOIN hashes hb ON hb.doc_id = c.id_b)
      |SELECT id_a, id_b, hamming FROM verified WHERE hamming <= 6
      |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin
  ) { s =>
    import s.implicits._
    // decode + hash: one codec context per partition (mm_decode
    // pattern); read 3× below (band rows + both verify sides) → CacheOnce
    val hashes = graft.engine.CacheOnce(
      graft.engine.Tables.dirOf(s).getOrElse("?") + "/mm_phash/hashes",
      s.table("documents")
        .filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"))
        // narrow spread of the BUILD (r19, VERDICT item 5): the decode
        // input is a single-row-group scan, so the 2500-image codec
        // pass ran one task. dp/8 parallelizes the build while keeping
        // the cached partition count (= every consumer's task count,
        // the r18 C2b tax) small; the shuffle moves only doc_id longs.
        .repartition(math.max(2,
          s.sparkContext.defaultParallelism / 8), col("doc_id")).as[Long]
        .mapPartitions { it =>
          val reader =
            javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
          it.map { id =>
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(pngPayload(id)))
            try {
              reader.setInput(iis)
              val b = dhashBands(reader.read(0))
              (id, b(0), b(1), b(2), b(3))
            } finally iis.close()
          }
        }
        .toDF("doc_id", "b0", "b1", "b2", "b3"))
    val bandrows = hashes.select(col("doc_id"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band"), col(s"b$k").as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = DedupOps.lshCandidates(bandrows,
      cacheKey = graft.engine.Tables.dirOf(s).getOrElse("?") + "/mm_phash")
    val ha = hashes.select(col("doc_id").as("id_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = hashes.select(col("doc_id").as("id_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(ha, "id_a").join(hb, "id_b")
      .select(col("id_a"), col("id_b"),
        (expr("bit_count(a0 ^ c0)") + expr("bit_count(a1 ^ c1)") +
          expr("bit_count(a2 ^ c2)") + expr("bit_count(a3 ^ c3)"))
          .cast(IntegerType).as("hamming"))
      .filter(col("hamming") <= 6)
      // preSort (r19): no range-sampling re-exec of the hamming verify
      // joins; hamming joins the keys so the exchange is not elided
      // against the candidate distinct's (id_a, id_b) partitioning
      .transform(graft.engine.Par.preSort(_,
        col("id_a"), col("id_b"), col("hamming")))
      .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
  }

  // ---- video arm (r15): container parse + REAL per-frame PNG codec --

  /** Deterministic multi-frame "video" payload: a minimal container
    * (magic "GVID", frame count, per-frame byte offsets) wrapping REAL
    * PNG-encoded frames — the format a training pipeline sees after
    * frame extraction (no system video codec exists in this container,
    * so the CONTAINER is ours — 12+4n header bytes — while every frame
    * goes through the real javax.imageio codec both directions; the
    * same honesty split as the audio arm's synthesized-but-real WAV).
    * Frame f of doc id is the [[pngPayload]] gradient re-keyed by
    * (id, f): fixed 16×16 3-band BGR so the decoded raster is sRGB-
    * verbatim (the mm_phash_dedup argument) and the oracle can restate
    * per-frame statistics bit-exactly from the pixel formula.
    */
  private[graft] def videoFrames(id: Long): Int = 2 + (nonNegId(id) % 4).toInt

  private[graft] def videoPayload(id: Long): Array[Byte] = {
    val n = videoFrames(id)
    val frames = (0 until n).map { f =>
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      fillBgr(img)((x, y) =>
        (x * 31 + y * 17 + id.toInt * 97 + f * 211) & 0xffffff)
      pngEncode(img)
    }
    val header = java.nio.ByteBuffer.allocate(12 + 4 * n)
    header.put("GVID".getBytes("US-ASCII")).putInt(n)
    var off = 12 + 4 * n // frames start right after the 12+4n-byte header
    frames.foreach { fb => header.putInt(off); off += fb.length }
    header.putInt(0) // reserved
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(header.array())
    frames.foreach(bos.write)
    bos.toByteArray
  }

  final case class VideoMeta(
      doc_id: Long, n_frames: Option[Int], width: Option[Int],
      height: Option[Int], mid_frame_lum_sum: Option[Long])

  /** Video metadata + middle-frame statistics through the container
    * parser and the REAL PNG codec: parse the GVID header, decode the
    * MIDDLE frame (the standard video-thumbnail/key-frame access
    * pattern — exactly one frame's decode cost per clip, not n), and
    * report its integer luminance sum (the 299/587/114 floor-div
    * weights mm_phash_dedup proved bit-restatable). The oracle
    * recomputes frame count from the id formula and the luminance sum
    * from the pixel formula over the 16×16 grid, so a container-offset
    * bug, a wrong-frame decode, or a lossy step hash-fails.
    * Embarrassingly parallel, shuffle-free but the presentation sort.
    */
  val m8 = Q(
    "mm_video_meta",
    """WITH px AS (
      |  SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS n_frames,
      |    CAST((2 + doc_id % 4) // 2 AS INT) AS mid,
      |    unnest(generate_series(0, 255)) AS p
      |  FROM documents WHERE text IS NOT NULL),
      |lum AS (
      |  SELECT doc_id, n_frames,
      |    ((p % 16) * 31 + (p // 16) * 17 + doc_id * 97 + mid * 211) % 16777216 AS rgb
      |  FROM px),
      |c AS (
      |  SELECT doc_id, n_frames,
      |    (rgb // 65536) % 256 AS r, (rgb // 256) % 256 AS g, rgb % 256 AS b
      |  FROM lum),
      |agg AS (
      |  SELECT doc_id, n_frames,
      |    SUM((299 * r + 587 * g + 114 * b) // 1000) AS lum_sum
      |  FROM c GROUP BY doc_id, n_frames)
      |SELECT d.doc_id,
      |  a.n_frames,
      |  CAST(CASE WHEN a.n_frames IS NOT NULL THEN 16 END AS INT) AS width,
      |  CAST(CASE WHEN a.n_frames IS NOT NULL THEN 16 END AS INT) AS height,
      |  CAST(a.lum_sum AS BIGINT) AS mid_frame_lum_sum
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    import s.implicits._
    // fixture contract: documents has no binary column, so the payload
    // is synthesized in-plan per row. The SCALE tiers instead read
    // payloads ScaleGen wrote ONCE to videos.parquet (videoMetaOf over
    // the stored column), so the tier row measures the operator —
    // container parse + one decode per clip — not fixture synthesis.
    // fan out BEFORE synthesis: the single-row-group scan is one task,
    // and ~3.5 PNG encodes + 1 decode per row is pure CPU — spread the
    // (id, has) pairs (16 bytes/row) across the cores first (guide §2.5)
    videoMetaOf(graft.engine.Par.spread(s.table("documents")
      .select(col("doc_id"), col("text").isNotNull.as("has"))
      .as[(Long, Boolean)], col("doc_id"))
      .map { case (id, has) => (id, if (has) videoPayload(id) else null) })
  }

  /** Container parse + MIDDLE-frame decode + luminance sum over any
    * (doc_id, gvid-payload) pairs — the operator kernel shared by the
    * declared query (payload synthesized in-plan, see m8) and the
    * scale tier (payload stored by ScaleGen). One codec context per
    * partition, exactly one frame decode per clip; null payload →
    * null metadata row.
    */
  private[graft] def videoMetaOf(
      pairs: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
      : org.apache.spark.sql.DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    pairs
      .mapPartitions { it =>
        val reader =
          javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        it.map { case (id, bytes) =>
          if (bytes == null) VideoMeta(id, None, None, None, None)
          else {
            val bb = java.nio.ByteBuffer.wrap(bytes)
            val magic = new Array[Byte](4); bb.get(magic)
            require(new String(magic, "US-ASCII") == "GVID", "bad container")
            val n = bb.getInt
            val offsets = Array.fill(n)(bb.getInt)
            val mid = n / 2
            val end = if (mid + 1 < n) offsets(mid + 1) else bytes.length
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(
                bytes, offsets(mid), end - offsets(mid)))
            try {
              reader.setInput(iis)
              val img = reader.read(0)
              // whole-frame luminance sum: order-independent, so read
              // the decoded raster bytes directly when the codec hands
              // back the exact TYPE_3BYTE_BGR layout the frames were
              // written in (lossless PNG, bytes ARE the sRGB values);
              // per-pixel getRGB dispatch is the slow general fallback
              var lum = 0L
              val buf = img.getRaster.getDataBuffer
              buf match {
                case db: java.awt.image.DataBufferByte
                    if img.getType ==
                      java.awt.image.BufferedImage.TYPE_3BYTE_BGR =>
                  val d = db.getData
                  var i = 0
                  while (i < d.length) {
                    lum += (299 * (d(i + 2) & 255) + 587 * (d(i + 1) & 255) +
                      114 * (d(i) & 255)) / 1000
                    i += 3
                  }
                case _ =>
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      val v = img.getRGB(x, y) & 0xffffff
                      lum += (299 * ((v >> 16) & 255) + 587 * ((v >> 8) & 255) +
                        114 * (v & 255)) / 1000
                      x += 1
                    }
                    y += 1
                  }
              }
              VideoMeta(id, Some(n), Some(img.getWidth),
                Some(img.getHeight), Some(lum))
            } finally iis.close()
          }
        }
      }
      .toDF()
      // preSort (r19): no range-sampling re-exec of the container parse
      // + mid-frame decode (see mm_decode)
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("width")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  // ---- audio arm (r15): real WAV codec via javax.sound.sampled ------

  /** Deterministic 16-bit PCM WAV payload for a document id: header
    * parameters (channels, frame count) and every sample value are pure
    * integer functions of the id, so the oracle can restate both the
    * metadata AND the decoded signal statistics without a codec. The
    * sample formula wraps a quadratic through mod 4096 (a pseudo-
    * sawtooth) using only small-integer arithmetic — bit-exact in
    * BIGINT on both engines, values within the 16-bit range by
    * construction. `javax.sound.sampled` is JDK-only (no audio device
    * is touched for file encode/decode), so the codec is REAL in this
    * container — the same posture as the PNG arm.
    */
  private[graft] def wavSample(id: Long, j: Long): Int =
    (((nonNegId(id) * 97 + j * j * 31 + j * 57) % 4096) - 2048).toInt

  /** The WAV codec SPI objects, resolved ONCE per JVM: the
    * `AudioSystem` facade re-scans the sound SPI registry on EVERY
    * call (JDK13Services caches providers only briefly and under a
    * lock), which serialized the 8-thread decode stage — the 10×-tier
    * row measured near-zero parallel speedup (20.5 s for ~12 s of
    * single-thread codec work). Resolving the same provider instances
    * through the public `javax.sound.sampled.spi` interfaces hoists the
    * scan out of the per-row path — the codec itself is unchanged
    * (these ARE the objects AudioSystem would dispatch to).
    */
  private lazy val WavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        found = w
    }
    require(found != null, "no WAVE-capable AudioFileWriter SPI")
    found
  }

  private lazy val WavReader: javax.sound.sampled.spi.AudioFileReader = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    var found: javax.sound.sampled.spi.AudioFileReader = null
    val probe = wavPayload(0L)
    while (found == null && it.hasNext) {
      val r = it.next()
      try {
        r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close()
        found = r
      } catch { case _: Exception => }
    }
    require(found != null, "no WAV-capable AudioFileReader SPI")
    found
  }

  /** Decode WAV bytes via the hoisted SPI reader. */
  private[graft] def wavDecode(bytes: Array[Byte])
      : javax.sound.sampled.AudioInputStream =
    WavReader.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))

  private[graft] def wavChannels(id: Long): Int = 1 + (nonNegId(id) % 2).toInt
  private[graft] def wavFrames(id: Long): Int = 200 + ((nonNegId(id) * 17) % 300).toInt

  private[graft] def wavPayload(id: Long): Array[Byte] = {
    val channels = wavChannels(id)
    val nFrames = wavFrames(id)
    val nTot = nFrames * channels
    val pcm = new Array[Byte](nTot * 2)
    var j = 0
    while (j < nTot) {
      val s = wavSample(id, j)
      pcm(2 * j) = (s & 0xff).toByte       // little-endian 16-bit
      pcm(2 * j + 1) = ((s >> 8) & 0xff).toByte
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, channels, /*signed=*/ true, /*bigEndian=*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try WavWriter.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  final case class AudioMeta(
      doc_id: Long, sample_rate: Option[Int], channels: Option[Int],
      bits: Option[Int], n_frames: Option[Int], duration_ms: Option[Double])

  /** Audio header metadata through the REAL WAV parser: synthesize each
    * document's WAV payload ([[wavPayload]]), decode its header with
    * `AudioSystem.getAudioInputStream`, and report format + duration.
    * The oracle restates everything from the generation parameters, so
    * a header-layout bug, a frame-count miscount, or plumbing that
    * swaps payloads between rows hash-fails. NULL text → NULL metadata
    * (the mm_decode contract). Embarrassingly parallel, shuffle-free:
    * one decode context per partition, the only exchange is the
    * presentation sort.
    */
  val m6 = Q(
    "mm_audio_meta",
    """SELECT doc_id,
      |  CAST(CASE WHEN text IS NULL THEN NULL ELSE 8000 END AS INT) AS sample_rate,
      |  CAST(CASE WHEN text IS NULL THEN NULL
      |       ELSE 1 + doc_id % 2 END AS INT) AS channels,
      |  CAST(CASE WHEN text IS NULL THEN NULL ELSE 16 END AS INT) AS bits,
      |  CAST(CASE WHEN text IS NULL THEN NULL
      |       ELSE 200 + (doc_id * 17) % 300 END AS INT) AS n_frames,
      |  ROUND(CASE WHEN text IS NULL THEN NULL
      |       ELSE (200 + (doc_id * 17) % 300) * 1000.0 / 8000 END, 3) AS duration_ms
      |FROM documents
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    import s.implicits._
    s.table("documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("src"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, src) =>
        if (src == null) AudioMeta(id, None, None, None, None, None)
        else {
          val ais = wavDecode(wavPayload(id))
          try {
            val f = ais.getFormat
            val frames = ais.getFrameLength
            val durMs = BigDecimal(frames * 1000.0 / f.getSampleRate.toDouble)
              .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
            AudioMeta(id, Some(math.round(f.getSampleRate).toInt),
              Some(f.getChannels), Some(f.getSampleSizeInBits),
              Some(frames.toInt), Some(durMs))
          } finally ais.close()
        }
      })
      .toDF()
      // preSort (r19): no range-sampling re-exec of the WAV header parse
      .transform(graft.engine.Par.preSort(_,
        col("doc_id"), col("sample_rate")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  final case class AudioStats(
      doc_id: Long, n_samples: Option[Int], peak: Option[Int],
      sum_sq: Option[Long], n_zero_cross: Option[Int], rms: Option[Double])

  /** Decoded-signal statistics through the REAL WAV codec: synthesize,
    * encode, decode back, and aggregate the PCM stream — peak, energy
    * (sum of squares), zero crossings, RMS. Statistics are over the
    * flat interleaved sample stream (channel-agnostic energy/peak; the
    * crossing count is a contract over the decoded stream, stated
    * identically in the oracle formula). Every aggregate is integer
    * except rms, which both sides compute as ROUND(SQRT(sum_sq/n), 6)
    * on IEEE doubles (sqrt is correctly rounded — the deterministic
    * pair). A lossy codec step, an endianness bug, or a dropped frame
    * changes sum_sq and hash-fails. Per-doc work is bounded by the
    * payload size; shuffle-free except the presentation sort.
    */
  val m7 = Q(
    "mm_audio_decode",
    """WITH cfg AS (
      |  SELECT doc_id,
      |    (1 + doc_id % 2) * (200 + (doc_id * 17) % 300) AS n_tot
      |  FROM documents WHERE text IS NOT NULL),
      |smp AS (
      |  SELECT doc_id, unnest(generate_series(0, n_tot - 1)) AS j FROM cfg),
      |v AS (
      |  SELECT doc_id, j,
      |    ((doc_id * 97 + j * j * 31 + j * 57) % 4096) - 2048 AS s,
      |    CASE WHEN j > 0 THEN
      |      ((doc_id * 97 + (j-1) * (j-1) * 31 + (j-1) * 57) % 4096) - 2048
      |    END AS sp
      |  FROM smp),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_samples, MAX(ABS(s)) AS peak,
      |    SUM(s * s) AS sum_sq,
      |    SUM(CASE WHEN j > 0 AND ((s >= 0) <> (sp >= 0)) THEN 1 ELSE 0 END)
      |      AS n_zero_cross
      |  FROM v GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(a.n_samples AS INT) AS n_samples,
      |  CAST(a.peak AS INT) AS peak,
      |  CAST(a.sum_sq AS BIGINT) AS sum_sq,
      |  CAST(a.n_zero_cross AS INT) AS n_zero_cross,
      |  ROUND(SQRT(a.sum_sq * 1.0 / a.n_samples), 6) AS rms
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    import s.implicits._
    s.table("documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("src"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, src) =>
        if (src == null) AudioStats(id, None, None, None, None, None)
        else {
          val ais = wavDecode(wavPayload(id))
          try {
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            var peak = 0; var sumSq = 0L; var cross = 0
            var prev = 0; var j = 0
            while (j < n) {
              val v = ((bytes(2 * j) & 0xff) | (bytes(2 * j + 1) << 8)).toShort.toInt
              if (math.abs(v) > peak) peak = math.abs(v)
              sumSq += v.toLong * v
              if (j > 0 && ((v >= 0) != (prev >= 0))) cross += 1
              prev = v
              j += 1
            }
            val rms = BigDecimal(math.sqrt(sumSq.toDouble / n))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            AudioStats(id, Some(n), Some(peak), Some(sumSq), Some(cross),
              Some(rms))
          } finally ais.close()
        }
      })
      .toDF()
      // preSort (r19): no range-sampling re-exec of the sample decode
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("rms")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  val all: Seq[Q] = Seq(m1, m2, m3, m4, m5, m6, m7, m8)
}
