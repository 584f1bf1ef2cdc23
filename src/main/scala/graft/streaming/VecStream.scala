package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.OutputMode

/** Streaming ingest for the similarity family (r17) — the ANN
  * counterpart of DocStream's dedup ingest faces: a stream of query
  * vectors (`qid`, `qe`) searched per micro-batch against the PREBUILT
  * IVF slab index ([[graft.llm.SimilarityOps.ivfListSlabs]]).
  *
  * Per-trigger cost is the true IVF serving cost — nprobe slab lookups
  * plus a scan of only the probed lists' members per query vector;
  * nothing corpus-sized shuffles or hash-builds per trigger (the join
  * spelling builds the full inverted-lists relation every call — right
  * for a corpus self-join, wrong for a bounded ingest batch). No
  * streaming state: index refresh = rebuild the slabs and swap the
  * memo, no query restart — the same trade as classifyIngestIndexed.
  *
  * Results equal the batch path ([[graft.llm.SimilarityOps.ivfTopKLookupFor]],
  * itself spec-pinned row-for-row to the declarative nn_ivf_topk
  * spelling and oracle-checked as `nn_ivf_lookup`); verdicts are
  * per-query-vector and depend only on the static index, so output is
  * independent of micro-batch boundaries (spec-pinned).
  *
  * Scale layout: at production scale nlists tracks √n (the ANN ladder
  * discipline), so probed work per vector is nprobe·√n cosines and the
  * per-trigger wall is ∝ batch — measured in SCALE.md §r17 at the
  * 1000× tier against the √n quantizer.
  */
object VecStream {

  /** `nprobe <= 0` (the default) resolves through the recall-targeted
    * policy [[graft.llm.SimilarityOps.nprobeForRecall]] (r17 VERDICT
    * wrong-#3): the face's default hits a STATED sampled-recall target
    * (≥0.9, from the measured probe-share frontier) instead of a fixed
    * probe share that under-recalled mid-tier. Explicit widths still
    * override — the latency/recall trade stays caller-ownable.
    */
  def annIngestTopK(
      vecs: DataFrame, // (qid, qe)
      sink: (DataFrame, Long) => Unit,
      nprobe: Int = -1,
      topk: Int = 3,
      nlists: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // resolve the index against the OUTER session at query start: the
    // micro-batch's session is a streaming CLONE that never saw
    // Tables.register, so per-dataset memos must not key off it (the
    // slab RDDs themselves are SparkContext-level and serve any clone)
    val s = vecs.sparkSession
    val np =
      if (nprobe > 0) nprobe
      else graft.llm.SimilarityOps.nprobeForRecall(nlists)
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.llm.SimilarityOps.ivfTopKLookupFor(
          s, batch.toDF(), np, topk, nlists), id)
      }
      .start()
  }
}
