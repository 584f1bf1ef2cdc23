package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream
import graft.streaming.EventStream.Click

/** Structured Streaming semantics, tested by stream-vs-batch
  * self-differential: the same event set run (a) through a MemoryStream
  * micro-batch pipeline and (b) as a plain bounded DataFrame must agree,
  * because every EventStream transform is defined on the shared
  * DataFrame API (SURVEY.md §2.10).
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(min: Int): Timestamp = new Timestamp(3600_000L + min * 60_000L)

  private val sample = Seq(
    (1L, ts(0), "view", 1.0), (1L, ts(1), "view", 2.0),
    (1L, ts(6), "click", 3.0), (2L, ts(2), "view", 4.0),
    (2L, ts(7), "buy", 5.0), (1L, ts(12), "view", 6.0),
    (3L, ts(3), "view", 7.0))

  private def eventsDf(rows: Seq[(Long, Timestamp, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_type", "value")
  }

  test("windowedCounts: streaming result equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    mem.addData(sample.take(4))
    mem.addData(sample.drop(4))
    val streamDf = mem.toDF.toDF("user_id", "ts", "event_type", "value")
    val q = EventStream.windowedCounts(streamDf).writeStream
      .format("memory").queryName("wc_stream").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("wc_stream")
      .orderBy("w_start", "event_type").collect().toSeq
    val batch = EventStream.windowedCounts(eventsDf(sample))
      .orderBy("w_start", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("sessionCounts: 30-minute gap yields one session per user here") {
    val out = EventStream.sessionCounts(eventsDf(sample))
      .orderBy("user_id").collect()
    assert(out.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.find(_.getAs[Long]("user_id") == 1L).get.getAs[Long]("n_events") == 4)
  }

  test("dedupExact: cross-micro-batch duplicate dropped, equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (1, ts0) appears in batch 1 AND again in batch 2 → one survivor;
    // (2, ts2) appears twice within batch 1 → one survivor; key 3's
    // duplicate arrives RE-STAMPED (ts5 vs ts3, within the watermark) —
    // key-only dedup must still drop it
    val b1 = Seq((1L, ts(0), "view", 1.0), (2L, ts(2), "view", 4.0),
      (2L, ts(2), "view", 4.0), (3L, ts(3), "buy", 7.0))
    val b2 = Seq((1L, ts(0), "view", 1.0), (3L, ts(5), "buy", 7.0))
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    mem.addData(b1)
    mem.addData(b2)
    val streamDf = mem.toDF.toDF("user_id", "ts", "event_type", "value")
    val q = EventStream.dedupExact(streamDf, Seq("user_id")).writeStream
      .format("memory").queryName("dd_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dd_stream")
      .orderBy("user_id", "ts").collect().toSeq
    val batch = EventStream.dedupExact(eventsDf(b1 ++ b2), Seq("user_id"))
      .orderBy("user_id", "ts").collect().toSeq
    // one survivor per key on both paths (survivor's ts for key 3 is
    // pick-dependent in batch, so compare the key sets, not full rows)
    assert(streamed.map(_.getAs[Long]("user_id")) == Seq(1L, 2L, 3L))
    assert(batch.map(_.getAs[Long]("user_id")) == Seq(1L, 2L, 3L))
    // the stream kept the FIRST-ARRIVED copy of key 3
    assert(streamed.find(_.getAs[Long]("user_id") == 3L).get
      .getAs[Timestamp]("ts") == ts(3))
  }

  test("classifyIngest: micro-batch splits don't change verdicts, equals batch classifier") {
    import spark.implicits._
    import graft.streaming.DocStream
    implicit val sqlCtx = spark.sqlContext
    // static corpus (the "index" side): the stream classifies against
    // it — a verbatim copy (exact_dup), an 80%-prefix (near_dup via
    // shared LSH bands at jaccard ≥ 0.3), and a fresh doc (new)
    val corpusDocs = Seq(
      0L -> "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
      1L -> "kilo lima mike november oscar papa quebec romeo sierra tango",
      2L -> "uniform victor whiskey xray yankee zulu one two three four")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val index = graft.llm.DedupOps.corpusSideRelations(corpus, cap = 100)
    val ingest = Seq(
      100L -> corpusDocs(0)._2,                                  // exact
      101L -> corpusDocs(1)._2.split(" ").take(8).mkString(" "), // near
      102L -> "five six seven eight nine ten eleven twelve")     // new
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Option[Long])]()
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.classifyIngest(
      mem.toDF.toDF("doc_id", "text"), index,
      (verdicts, _) => got.synchronized {
        got ++= verdicts.collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
      })
    try {
      mem.addData(ingest.take(2)) // split across two micro-batches:
      q.processAllAvailable()     // verdicts must not depend on the split
      mem.addData(ingest.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val batch = graft.llm.DedupOps
      .classifyBatch(ingest.toDF("doc_id", "text"), index._1, index._2, index._3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq
    assert(got.sortBy(_._1).toSeq == batch.sortBy(_._1))
    assert(got.sortBy(_._1).toSeq == Seq(
      (100L, "exact_dup", Some(0L)),
      (101L, "near_dup", Some(1L)),
      (102L, "new", None)))
  }

  test("classifyIngestExact: state-store point lookups equal the batch exact arm") {
    import spark.implicits._
    import graft.streaming.DocStream
    implicit val sqlCtx = spark.sqlContext
    // corpus with a SHARED digest (docs 0 and 5 identical text): the
    // state must hold the MINIMUM owning cid, the batch arm's
    // orientation
    val corpusDocs = Seq(
      0L -> "alpha bravo charlie delta echo",
      1L -> "kilo lima mike november oscar",
      5L -> "alpha bravo charlie delta echo")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val cEx = corpus.select(col("doc_id").as("cid"),
      md5(col("text").cast(org.apache.spark.sql.types.BinaryType)).as("h"))
    val ingest = Seq(
      100L -> corpusDocs(0)._2, // exact vs shared digest → match_id 0
      101L -> "totally new words here",
      102L -> corpusDocs(1)._2) // exact → match_id 1
    val got = scala.collection.mutable.ArrayBuffer[DocStream.ExactVerdict]()
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.classifyIngestExact(
      mem.toDF.toDF("doc_id", "text"), cEx,
      (vs, _) => got.synchronized { got ++= vs.collect() })
    try {
      // split across two triggers: trigger 2 must hit STATE loaded at
      // trigger 1 (the initial-state path), not re-read the index
      mem.addData(ingest.take(1))
      q.processAllAvailable()
      mem.addData(ingest.drop(1))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.sortBy(_.docId).toSeq == Seq(
      DocStream.ExactVerdict(100L, "exact_dup", Some(0L)),
      DocStream.ExactVerdict(101L, "new", None),
      DocStream.ExactVerdict(102L, "exact_dup", Some(1L))))
    // differential vs the batch classifier's exact arm on the same data
    val (ex, bands, csh) = graft.llm.DedupOps.corpusSideRelations(corpus, 100)
    val batch = graft.llm.DedupOps
      .classifyBatch(ingest.toDF("doc_id", "text"), ex, bands, csh)
      .collect()
      .map(r => (r.getLong(0),
        if (r.getString(1) == "exact_dup") "exact_dup" else "other"))
      .toMap
    got.foreach { v =>
      if (v.verdict == "exact_dup")
        assert(batch(v.docId) == "exact_dup",
          s"stream flagged ${v.docId} exact but batch did not")
    }
  }

  test("DocStream near-dup: cross-batch duplicate flagged, equals batch") {
    import spark.implicits._
    import graft.streaming.DocStream
    implicit val sqlCtx = spark.sqlContext
    // distinct word-soup originals; 10..12 arrive a MICRO-BATCH LATER as
    // exact copies of 0..2 (identical signature → every band collides →
    // guaranteed candidates); 13 is new and must pass clean
    val originals = Seq(
      0L -> "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
      1L -> "kilo lima mike november oscar papa quebec romeo sierra tango",
      2L -> "uniform victor whiskey xray yankee zulu one two three four",
      3L -> "red orange yellow green blue indigo violet cyan magenta white")
    val later = Seq(
      10L -> originals(0)._2, 11L -> originals(1)._2, 12L -> originals(2)._2,
      13L -> "five six seven eight nine ten eleven twelve thirteen fourteen")
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.nearDupBandHits(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("nd_stream")
      .outputMode("append").start()
    // one trigger per block, so batch 2 genuinely reads batch 1's STATE
    // (adding both before start() would collapse them into one
    // micro-batch and never exercise the cross-batch path)
    try {
      mem.addData(originals)
      q.processAllAvailable()
      mem.addData(later)
      q.processAllAvailable()
    } finally q.stop()
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      DocStream.nearDupVerdicts(df.as[DocStream.BandHit])
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getBoolean(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq
    val streamed = verdicts(spark.table("nd_stream"))
    // batch oracle: the SAME function on the bounded union (state empty,
    // one group call per bucket) — stream-vs-batch self-differential
    val batch = verdicts(
      DocStream.nearDupBandHits((originals ++ later).toDF("doc_id", "text")).toDF())
    assert(streamed == batch)
    val flagged = streamed.filter(_._2).map(v => v._1 -> v._3).toMap
    assert(flagged == Map(10L -> Some(0L), 11L -> Some(1L), 12L -> Some(2L)),
      s"got $flagged")
  }

  test("DocStream near-dup: late duplicate with a SMALLER id is still flagged") {
    import spark.implicits._
    import graft.streaming.DocStream
    implicit val sqlCtx = spark.sqlContext
    // first-arrival semantics: doc 1000 arrives first and owns its
    // buckets; its exact copy arrives a batch LATER with id 500 — the
    // copy must be flagged against the incumbent, not report itself
    val text = "golf hotel india juliet kilo lima mike november oscar papa"
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.nearDupBandHits(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("nd_stream_ooo")
      .outputMode("append").start()
    try {
      mem.addData(Seq(1000L -> text))
      q.processAllAvailable()
      mem.addData(Seq(500L -> text))
      q.processAllAvailable()
    } finally q.stop()
    val flagged = DocStream.nearDupVerdicts(
        spark.table("nd_stream_ooo").as[DocStream.BandHit])
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq
    assert(flagged == Seq((500L, true, Some(1000L)), (1000L, false, None)),
      s"got $flagged")
  }

  test("DocStream ProcessingTimeTimeout: timed-out bucket re-admits a late duplicate") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import graft.streaming.DocStream
    implicit val sqlCtx = spark.sqlContext
    // the PRODUCTION timeout mode, with its documented trade-off pinned:
    // after a bucket's state ages out, an exact duplicate arriving later
    // is re-admitted as a fresh owner (the batch rebase pass is what
    // bounds this window in a real deployment). 1 ms timeout + sleep
    // makes the age-out deterministic; the middle batch only exists to
    // run a trigger after the deadline so timed-out state is swept.
    val text = "quebec romeo sierra tango uniform victor whiskey xray yankee zulu"
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.nearDupBandHits(
        mem.toDF.toDF("doc_id", "text"),
        timeout = GroupStateTimeout.ProcessingTimeTimeout,
        timeoutDuration = "1 millisecond")
      .writeStream.format("memory").queryName("nd_stream_timeout")
      .outputMode("append").start()
    // processAllAvailable CANNOT be used here: with ProcessingTimeTimeout
    // FlatMapGroupsWithStateExec.shouldRunAnotherBatch is always true, so
    // the engine runs continuous timeout-sweep batches and never signals
    // noNewData — the call blocks forever (found the hard way; jstack
    // shows the stream thread busy in back-to-back batches). Poll the
    // sink for the expected row count instead; the sweep batches run
    // constantly in between, so a 1 s grace comfortably ages out state.
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis + 30000
      while (spark.table("nd_stream_timeout").count() < n &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
      assert(spark.table("nd_stream_timeout").count() >= n,
        s"sink never reached $n rows")
    }
    try {
      mem.addData(Seq(100L -> text))
      awaitRows(4) // one hit per band
      Thread.sleep(1000) // pass the deadline; sweep batches fire meanwhile
      mem.addData(Seq(200L -> "one two three four five six seven eight nine ten"))
      awaitRows(8)
      Thread.sleep(1000)
      mem.addData(Seq(300L -> text)) // exact duplicate of the aged-out 100
      awaitRows(12)
    } finally q.stop()
    val flagged = DocStream.nearDupVerdicts(
        spark.table("nd_stream_timeout").as[DocStream.BandHit])
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    // 300 is NOT flagged — its twin's state aged out — and nothing
    // crashed in the hasTimedOut branch; with NoTimeout (the spec above)
    // the same arrival pattern flags the duplicate
    assert(flagged == Seq((100L, false), (200L, false), (300L, false)),
      s"got $flagged")
  }

  test("longestRunPerUser: run spanning micro-batches is counted once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Click]
    // user 7: view,view in batch 1; view,click in batch 2 → best run 3
    mem.addData(Click(7L, ts(0), "view"), Click(7L, ts(1), "view"))
    mem.addData(Click(7L, ts(2), "view"), Click(7L, ts(3), "click"))
    val q = EventStream.longestRunPerUser(mem.toDS()).writeStream
      .format("memory").queryName("runs_stream").outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val last = spark.table("runs_stream").collect().last
    assert(last.getAs[Int]("runLength") == 3)
    assert(last.getAs[String]("lastType") == "click")
  }

  test("funnelStage: cross-batch progression matches the batch ev_funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Click]
    // u1 progresses across batches (view | click, purchase) → stage 3;
    // u2's purchase PRECEDES everything → stage 2 (view, click only);
    // u3 clicks before viewing → stage 1; u4 never views → stage 0
    val batch1 = Seq(
      Click(1L, ts(0), "view"),
      Click(2L, ts(0), "purchase"), Click(2L, ts(1), "view"),
      Click(3L, ts(0), "click"), Click(4L, ts(0), "error"))
    val batch2 = Seq(
      Click(1L, ts(5), "click"), Click(1L, ts(9), "purchase"),
      Click(2L, ts(6), "click"), Click(3L, ts(4), "view"))
    mem.addData(batch1: _*)
    mem.addData(batch2: _*)
    val q = EventStream.funnelStage(mem.toDS()).writeStream
      .format("memory").queryName("funnel_stream").outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // update mode re-emits per batch: latest row per user wins
    val stages = spark.table("funnel_stream").collect()
      .groupBy(_.getAs[Long]("userId"))
      .map { case (u, rows) => u -> rows.last.getAs[Int]("stage") }
    assert(stages == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))

    // stream-vs-batch differential: stage tallies must equal the batch
    // ev_funnel aggregate over the same rows
    val events = (batch1 ++ batch2)
      .toDF("user_id", "ts", "event_type")
    val b = graft.llm.PipelineOps.funnelOf(events).collect()(0)
    assert(b.getAs[Long]("n_view") == stages.values.count(_ >= 1))
    assert(b.getAs[Long]("n_view_click") == stages.values.count(_ >= 2))
    assert(b.getAs[Long]("n_full_funnel") == stages.values.count(_ >= 3))
  }

  test("attribution: cross-batch last-touch equals the batch ASOF operator") {
    import spark.implicits._
    import EventStream.Ev
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // u1: view then purchase (attributed 'view'), then a click and a
    //     LATE purchase whose ts precedes that click → still 'view';
    // u2: same-ts view+click collapse → MAX type 'view' wins the tie;
    // u3: purchase with no touch → 'organic';
    // u4: touch in batch 1, purchase in batch 2 (state carries over)
    val batch1 = Seq(
      Ev(1L, ts(0), "view", 0), Ev(1L, ts(2), "purchase", 10.0),
      Ev(2L, ts(1), "view", 0), Ev(2L, ts(1), "click", 0),
      Ev(3L, ts(0), "purchase", 7.0), Ev(4L, ts(3), "click", 0))
    val batch2 = Seq(
      Ev(1L, ts(6), "click", 0), Ev(1L, ts(4), "purchase", 5.0),
      Ev(2L, ts(5), "purchase", 20.0), Ev(4L, ts(8), "purchase", 2.0))
    mem.addData(batch1: _*)
    mem.addData(batch2: _*)
    val q = EventStream.attribution(mem.toDS()).writeStream
      .format("memory").queryName("att_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("att_stream").collect()
      .map(r => (r.getAs[Long]("userId"), r.getAs[Timestamp]("ts")) ->
        r.getAs[String]("touchType")).toMap
    assert(streamed == Map(
      (1L, ts(2)) -> "view", (1L, ts(4)) -> "view",
      (2L, ts(5)) -> "view", (3L, ts(0)) -> "organic",
      (4L, ts(8)) -> "click"))

    // stream-vs-batch differential: per-touch-type tallies must equal
    // the batch ev_attribution report (custom ASOF exec) over the same
    // rows
    val events = (batch1 ++ batch2)
      .map(e => (e.userId, e.ts, e.eventType, e.value))
      .toDF("user_id", "ts", "event_type", "value")
    val b = graft.llm.PipelineOps.attributionOf(spark, events).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Double]("attributed_value"))).toMap
    val s = spark.table("att_stream").collect()
      .groupBy(_.getAs[String]("touchType"))
      .map { case (t, rows) =>
        t -> (rows.length.toLong, rows.map(_.getAs[Double]("value")).sum) }
    assert(b == s, s"batch=$b stream=$s")
  }
}
