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

  /** Decoded "image" metadata for every payload. */
  final case class MediaMeta(
      doc_id: Long, width: Int, height: Int, channels: Int, n_frames: Int)

  /** Typed decode stage: Dataset[(id, bytes)] → mapPartitions →
    * Dataset[MediaMeta]. The per-partition loop is where a real codec
    * (JPEG decode, audio resample, video frame-sample) would run — one
    * codec context per partition, rows streamed through it; this shape is
    * embarrassingly parallel and shuffle-free at any scale.
    *
    * STUB: no media libs in this container — dimensions are derived
    * deterministically from the payload bytes so tests stay stable.
    */
  val m2 = Q.noOracle("mm_decode_stub") { s =>
    import s.implicits._
    val payloads = s.table("documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      // real pipeline: val codec = Codec.open() once per partition
      it.map { case (id, bytes) =>
        // ??? <- real decode goes here; deterministic fake below
        val h = java.util.Arrays.hashCode(bytes)
        MediaMeta(id,
          width = 64 + math.abs(h % 512),
          height = 64 + math.abs((h / 512) % 512),
          channels = 1 + math.abs(h % 3),
          n_frames = 1 + math.abs(h % 16))
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

  val all: Seq[Q] = Seq(m1, m2, m3)
}
