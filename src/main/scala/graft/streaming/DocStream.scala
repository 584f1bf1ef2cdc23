package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming document-ingest analytics (SURVEY.md §2.10 stretch, the
  * incremental half of the llm.DedupOps batch pipeline): the same
  * MinHash signatures and LSH banding as `dd_minhash_lsh`, with bucket
  * membership held as KEYED STATE so near-duplicates are flagged at
  * ingest time instead of in a later all-corpus batch pass.
  *
  * Scale layout: the stateful operator is keyed by (band, bucket) — the
  * state store shards on the bucket hash, carries one long per bucket
  * (the owning doc id), and never holds document text; per-batch work is
  * one signature pass over the incoming documents plus a state lookup
  * per band. At 100 TB/day of ingest the equivalent deployment bounds
  * state with ProcessingTimeTimeout (or periodically rebases it from the
  * batch pass) the same way longestRunPerUser documents.
  */
object DocStream {

  /** One emitted row per (document, band): `ownerId` is the id that
    * owned the band bucket when the document arrived (itself, if it
    * opened the bucket). A document is a near-dup CANDIDATE iff any of
    * its bands has `ownerId != docId` — the same candidate semantics as
    * the batch LSH pair generator, oriented to FIRST-ARRIVAL: a
    * duplicate arriving after its twin is flagged against the twin even
    * when its id is smaller. (The batch pass orients pairs to the
    * minimum id; the two agree whenever arrival order follows id order —
    * the differential spec pins both the agreement and the out-of-order
    * orientation.)
    */
  final case class BandHit(docId: Long, band: Int, ownerId: Long)

  // public: Catalyst's generated (de)serializer code instantiates it
  final case class BandRow(docId: Long, band: Int, bucket: String)

  /** Flag near-dup candidates on a document stream (`doc_id`, `text`).
    *
    * Works identically on a bounded frame (state starts empty, one group
    * call per bucket) — the spec's batch oracle. Within a micro-batch,
    * documents are processed in ascending doc_id, so with an id-ordered
    * feed the owner is the minimum id the bucket has seen — exactly the
    * batch pass's `min(doc_id) per bucket`.
    */
  def nearDupBandHits(
      docs: DataFrame,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      timeoutDuration: String = "1 hour"): Dataset[BandHit] = {
    // Same timeout contract as EventStream.longestRunPerUser: NoTimeout
    // keeps state for the life of the query (right for tests and bounded
    // backfills); production ingest passes ProcessingTimeTimeout so cold
    // buckets age out — with the documented cost that a timed-out bucket
    // re-admits a late duplicate (rebase from the batch pass bounds it).
    // Operational note (StreamingSpec pins both behaviors): with
    // ProcessingTimeTimeout the engine runs continuous timeout-sweep
    // micro-batches (shouldRunAnotherBatch is always true), so
    // processAllAvailable never observes noNewData and blocks forever —
    // monitor the SINK, not the query, when using this mode.
    require(
      timeout == GroupStateTimeout.NoTimeout ||
        timeout == GroupStateTimeout.ProcessingTimeTimeout,
      s"nearDupBandHits: unsupported timeout mode $timeout")
    import docs.sparkSession.implicits._
    val sig = graft.engine.GraftColumns.minhashSig(col("text"), graft.llm.DedupOps.K)
    val bands = docs
      .select(col("doc_id"), explode(graft.llm.DedupOps.bandStructs(sig)).as("bb"))
      .select(col("doc_id").as("docId"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
      .as[BandRow]
    bands
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (key: (Int, String), rows: Iterator[BandRow], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // cold bucket ages out; nothing to emit
            Iterator.empty
          } else {
            val ids = rows.map(_.docId).toArray.sorted
            // emit the owner AS OF ARRIVAL (before this row can claim the
            // bucket): a later-arriving duplicate with a SMALLER id must
            // still report the incumbent, not itself — updating first
            // would emit a self-owned hit and silently pass the duplicate
            var owner = state.getOption.getOrElse(Long.MaxValue)
            val out = ids.map { id =>
              val incumbent = if (owner == Long.MaxValue) id else owner
              if (id < owner) owner = id
              BandHit(id, key._1, incumbent)
            }
            state.update(owner)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(timeoutDuration)
            out.iterator
          }
      }
  }

  /** Per-document near-dup verdicts from the band hits — a plain
    * aggregation over the stateful operator's output (run it on the
    * SINK side or on the bounded backfill; chaining it INTO the same
    * streaming query would be a second stateful operator).
    */
  def nearDupVerdicts(hits: Dataset[DocStream.BandHit]): DataFrame =
    hits.toDF()
      .groupBy(col("docId").as("doc_id"))
      .agg(max(when(col("ownerId") =!= col("docId"), true).otherwise(false))
        .as("near_dup"),
        min(when(col("ownerId") =!= col("docId"), col("ownerId")))
          .as("dup_of"))

  /** Continuous ingest classification against the PRECOMPUTED corpus
    * dedup index — the streaming face of `dd_incremental_indexed`
    * (r15): each micro-batch IS one ingest window, classified by the
    * SAME batch classifier the declared query uses
    * ([[graft.llm.DedupOps.classifyBatch]]) via `foreachBatch` — the
    * documented Structured Streaming pattern for applying batch-only
    * logic (multi-join + per-doc min aggregation, unsupported as a
    * single continuous plan) per trigger, with exactly-once batch ids
    * for idempotent sinks. Verdicts are per-document and depend only on
    * the static index, so output is independent of micro-batch
    * boundaries (the spec pins stream-split == batch equality).
    *
    * Scale layout: each trigger re-executes the index relations'
    * plans (stream-static semantics) — UNPERSISTED index relations
    * (e.g. reading the index tables a nightly job rewrites) therefore
    * pick up a refresh without restarting the query, while the
    * CacheOnce-persisted index of `dd_incremental_indexed` stays
    * PINNED until its cache entry is replaced/unpersisted (refresh =
    * re-call incrementalIndex after the rebuild, which swaps the
    * entry). Per-trigger cost is the
    * measured window posture (SCALE.md r15: a 1% window classifies in
    * 18.6 s against the 5M-doc index while the corpus-sized batch takes
    * 508 s).
    */
  def classifyIngest(
      docs: DataFrame,
      index: (DataFrame, DataFrame, DataFrame),
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        // pruneVerify: a micro-batch is bounded by construction — the
        // candidate cid set is KB-scale, so the fat shingle index never
        // exchanges per trigger (measured 3× at the 1000× tier)
        sink(graft.llm.DedupOps.classifyBatch(
          batch.toDF(), index._1, index._2, index._3, pruneVerify = true), id)
      }
      .start()

  // public: Catalyst's generated (de)serializer code instantiates it
  final case class ExactVerdict(docId: Long, verdict: String,
    matchId: Option[Long])

  /** EXACT-arm ingest classification with the corpus digest index held
    * in the STATE STORE — `flatMapGroupsWithState` seeded with the
    * index as INITIAL STATE, so per-trigger cost is point lookups on
    * the digests present in the batch instead of the stream-static
    * face's per-trigger index re-execution (the measured ~14 s scan
    * floor at the 1000× tier, SCALE.md r16). Trigger 1 pays the
    * one-time state load (∝ corpus — the index shuffles into the state
    * store once); every later trigger touches only the batch's keys —
    * cost ∝ batch size, independent of corpus size.
    *
    * The trade, stated: index refresh = restart the query (or a
    * timeout/rebase protocol), where [[classifyIngest]]'s stream-static
    * joins pick up an unpersisted-index rebuild without restart; and
    * only the EXACT arm fits this posture cheaply — near-dup verify
    * needs the fat shingle payload, which does not belong in a state
    * store. Production shape: state-store exact gate first (this),
    * survivors to the stream-static near classifier (classifyIngest) —
    * most ingest duplicates are verbatim, so the expensive face sees a
    * fraction of the stream.
    *
    * Verdicts equal classifyBatch's exact arm (spec-pinned):
    * `exact_dup` with the MINIMUM matching corpus id, else `new`.
    */
  // public: Catalyst's generated (de)serializer code instantiates it
  final case class GateRow(docId: Long, text: String, exMatch: Option[Long])

  /** STAGED ingest classification — the production composition the r16
    * scaladocs named, now code (VERDICT r16 item 2): a state-store
    * EXACT gate first (the [[classifyIngestExact]] operator, extended
    * to carry text through), then only its SURVIVORS — docs with no
    * verbatim corpus twin — reach the near classifier. Most ingest
    * duplicates are verbatim, so the expensive face sees the
    * non-verbatim fraction of the stream, and a trigger whose docs are
    * all verbatim skips near-arm work entirely (`near` is applied to an
    * empty frame; its plan executes against zero probe rows).
    *
    * `near` is the pluggable survivor classifier, (doc_id, text) →
    * (doc_id, nd_match):
    *  - stream-static (arbitrary index refresh, per-trigger scan
    *    floor): `b => DedupOps.nearMatches(b, cBands, cSh, pruneVerify
    *    = true)`
    *  - point-lookup (below the scan floor, refresh = index swap):
    *    `b => LookupIndex.nearMatchesIndexed(b, idx)`
    * Verdicts equal [[graft.llm.DedupOps.classifyBatch]] on the union
    * (spec-pinned for both faces): exact > near > new, min matching
    * cid, one row per ingest doc.
    *
    * Scale layout: the gate shuffles the batch (id, text, digest) by
    * digest once — batch-side only, the corpus never moves after the
    * trigger-1 state load; survivors re-shuffle by their probe keys in
    * the near face. State refresh remains the exact arm's stated trade
    * (restart or rebase); the near index refreshes independently.
    *
    * `sink` CONTRACT (r17 ADVICE): consume the verdict frame EAGERLY,
    * inside the call — write it, collect it, or count it before
    * returning (the standard foreachBatch contract). The frame is
    * backed by a per-trigger persist of the stateful gate output that
    * is RELEASED when sink returns; a sink that stores the DataFrame
    * and consumes it after returning re-executes the stateful
    * micro-batch plan from lineage — state-store reads included —
    * after the trigger has advanced, which is slow at best and can
    * fail or read stale state at worst.
    */
  /** The state-store digest gate both exact-arm faces share: corpus
    * digests (min owning cid) seeded as flatMapGroupsWithState initial
    * state, the batch keyed by its own md5, every doc emitted with its
    * exact match (or None) and its text carried through. ONE
    * definition so the state orientation/timeout semantics cannot
    * silently diverge between [[classifyIngestExact]] and
    * [[classifyIngestStaged]] (spec-pinned equal to classifyBatch's
    * exact arm).
    */
  private def digestGate(docs: DataFrame, corpusDigests: DataFrame)
      : Dataset[GateRow] = {
    val s = docs.sparkSession
    import s.implicits._
    val initial = corpusDigests
      .groupBy(col("h")).agg(min(col("cid")).as("cid"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
    docs
      .select(col("doc_id"), col("text"),
        md5(col("text").cast(org.apache.spark.sql.types.BinaryType)).as("h"))
      .as[(Long, String, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout, initial) {
        (_: String, rows: Iterator[(Long, String, String)], state: GroupState[Long]) =>
          val m = if (state.exists) Some(state.get) else None
          rows.map { case (id, text, _) => GateRow(id, text, m) }
      }
  }

  def classifyIngestStaged(
      docs: DataFrame,
      corpusDigests: DataFrame, // (cid, h) — the cEx index relation
      near: DataFrame => DataFrame, // survivors (doc_id, text) → (doc_id, nd_match)
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    digestGate(docs, corpusDigests)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (gate: Dataset[GateRow], id: Long) =>
        // persist the gate output FIRST: the verdict assembly below is
        // several actions, and an unpersisted foreachBatch frame
        // re-executes the stateful micro-batch plan (state-store reads
        // included) once per action — measured 6.1 s → 1.9 s steady
        // per trigger at the 1000× tier. The sink contract is the
        // foreachBatch one (consume eagerly within the call); all
        // callers write or collect, so releasing after sink() is safe.
        val g = gate.toDF().persist()
        try {
          val exacts = g.filter(col("exMatch").isNotNull)
            .select(col("docId").as("doc_id"),
              lit("exact_dup").as("verdict"), col("exMatch").as("match_id"))
          val survivors = g.filter(col("exMatch").isNull)
            .select(col("docId").as("doc_id"), col("text"))
          // verbatim-only triggers skip the near face entirely — the
          // staged composition's whole point (most ingest duplicates
          // are verbatim); isEmpty is a limit-1 probe on the persisted
          // gate output
          val nearV =
            if (survivors.isEmpty)
              survivors.select(col("doc_id"), lit("new").as("verdict"),
                lit(null).cast("long").as("match_id"))
            else survivors.select(col("doc_id"))
              .join(near(survivors), Seq("doc_id"), "left")
              .select(col("doc_id"),
                when(col("nd_match").isNotNull, "near_dup")
                  .otherwise("new").as("verdict"),
                col("nd_match").as("match_id"))
          sink(exacts.unionByName(nearV)
            .orderBy(col("doc_id").asc_nulls_last), id)
        } finally g.unpersist(false)
      }
      .start()
  }

  /** Fully point-lookup ingest classification (VERDICT r16 item 3, the
    * below-scan-floor posture): every micro-batch classified by
    * [[graft.llm.LookupIndex.classifyBatchIndexed]] — digest, bucket,
    * and shingle lookups against per-partition hash slabs; per-trigger
    * cost is batch-sized probe shuffles plus O(candidates) work, with
    * NO pass over any corpus-sized relation (the stream-static faces'
    * ~9.7 s/trigger floor at the 1000× tier). No streaming state
    * either: index refresh = rebuild the slab RDDs and swap
    * (LookupIndex.release + forDataset), no query restart — the
    * opposite trade from the state-store exact arm.
    */
  def classifyIngestIndexed(
      docs: DataFrame,
      idx: graft.llm.LookupIndex.Index,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.llm.LookupIndex.classifyBatchIndexed(batch.toDF(), idx), id)
      }
      .start()

  def classifyIngestExact(
      docs: DataFrame,
      corpusDigests: DataFrame, // (cid, h) — the cEx index relation
      sink: (Dataset[ExactVerdict], Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val s = docs.sparkSession
    import s.implicits._
    // the SHARED digest gate (one state value per digest: the smallest
    // owning corpus id, the batch arm's min(cid) orientation), verdicts
    // projected statelessly. Text rides the gate's batch-side shuffle
    // here too — bounded by the trigger, and one gate definition beats
    // a diverging copy (r17 review finding).
    digestGate(docs, corpusDigests)
      .map(g => ExactVerdict(g.docId,
        if (g.exMatch.isDefined) "exact_dup" else "new", g.exMatch))
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (b: Dataset[ExactVerdict], id: Long) => sink(b, id) }
      .start()
  }
}
