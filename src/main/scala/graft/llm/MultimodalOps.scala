package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Q

/** Multimodal-column plumbing (BASELINE.json): images/audio/video are
  * opaque `binary` columns with typed metadata. The image path runs a
  * REAL codec — PNG via javax.imageio, JDK-only, no extra jars: payloads
  * are deterministic synthesized PNGs (the fixtures ship no binary
  * column) and mm_decode extracts width/height/channels from an actual
  * decode, oracle-checked against the generation parameters. Audio/video
  * codecs don't exist in this container, so frame-sampling and resize
  * operate on byte blocks / metadata with the same partition-parallel
  * shapes a real codec stage would use.
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

  /** Deterministic PNG payload for a document id: dimensions and
    * colorspace are pure functions of the id (so the oracle can state
    * expected metadata without a codec), pixel content is a gradient
    * keyed by (x, y, id) so the codec compresses real image data. Odd
    * ids are 1-band grayscale, even ids 3-band BGR.
    */
  private[graft] def pngPayload(id: Long): Array[Byte] = {
    val w = 16 + ((id * 7) % 48).toInt
    val h = 16 + ((id * 13) % 48).toInt
    val kind =
      if (id % 2 == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(w, h, kind)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 17 + id.toInt * 97) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // explicit memory-cached stream: ImageIO.write(…, OutputStream)
    // otherwise consults ImageIO.getUseCache() and spools every PNG
    // through a temp FILE — one create/write/delete per row, on the
    // same disk the shuffle uses; measured as a whole-suite drag at
    // sf0.1 (disk churn serializes unrelated concurrent queries)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, "png", ios)
    finally ios.close()
    bos.toByteArray
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
    // a binary column); a NULL source document yields a NULL payload
    val payloads = s.table("documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("src"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, src) =>
        (id, if (src == null) null else pngPayload(id))
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
      .orderBy(col("doc_id").asc_nulls_last)
  }

  val all: Seq[Q] = Seq(m1, m2, m3, m4)
}
