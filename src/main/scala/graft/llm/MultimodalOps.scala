package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Q

/** Multimodal-column plumbing (BASELINE.json): images/audio/video are
  * opaque `binary` columns with typed metadata. The container has no
  * media codecs, so the decode step is a STUB (deterministic fake derived
  * from the bytes) — but the Spark-side plumbing is real: binary columns,
  * typed Dataset decode stage, partition-parallel execution, metadata
  * schema. The fixtures ship no binary column, so `documents.text` is
  * cast to UTF-8 bytes as the stand-in payload.
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

  /** Typed decode stage: Dataset[(id, bytes)] → mapPartitions →
    * Dataset[MediaMeta]. The per-partition loop is where a real codec
    * (JPEG decode, audio resample, video frame-sample) would run — one
    * codec context per partition, rows streamed through it; this shape is
    * embarrassingly parallel and shuffle-free at any scale.
    *
    * STUB: no media libs in this container — dimensions are derived
    * deterministically from the md5 hex of the payload bytes, which the
    * DuckDB oracle recomputes with the same ascii arithmetic, so the
    * mapPartitions plumbing itself is oracle-checked.
    */
  val m2 = Q(
    "mm_decode_stub",
    """SELECT doc_id,
      |  CAST(64 + (ascii(substr(md5(text), 1, 1)) * 256 +
      |             ascii(substr(md5(text), 2, 1))) % 512 AS INT) AS width,
      |  CAST(64 + (ascii(substr(md5(text), 3, 1)) * 256 +
      |             ascii(substr(md5(text), 4, 1))) % 512 AS INT) AS height,
      |  CAST(1 + ascii(substr(md5(text), 5, 1)) % 3 AS INT) AS channels,
      |  CAST(1 + ascii(substr(md5(text), 6, 1)) % 16 AS INT) AS n_frames
      |FROM documents
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    import s.implicits._
    val payloads = s.table("documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      // real pipeline: one codec context per partition, opened here
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        if (bytes == null) // oracle: md5(NULL) = NULL → all-NULL metadata
          MediaMeta(id, None, None, None, None)
        else {
          // ??? <- real decode goes here; md5-derived fake below
          digest.reset()
          val hex = digest.digest(bytes).map("%02x".format(_)).mkString
          MediaMeta(id,
            width = Some(64 + (hex(0).toInt * 256 + hex(1).toInt) % 512),
            height = Some(64 + (hex(2).toInt * 256 + hex(3).toInt) % 512),
            channels = Some(1 + hex(4).toInt % 3),
            n_frames = Some(1 + hex(5).toInt % 16))
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
    * The decode half is the same md5-derived stub as mm_decode_stub
    * (no codecs in this container); the resize ARITHMETIC — the part a
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
