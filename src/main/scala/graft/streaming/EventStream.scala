package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types._

/** Streaming analytics over the `events` table shape (SURVEY.md §2.10).
  *
  * The reference is batch-only — its only "streaming" is incremental
  * Arrow batch delivery (/root/reference/main.go:235-243), which Spark
  * covers with `toLocalIterator`. This module is the engine's forward
  * path: the same event-time transforms run over a bounded DataFrame
  * (batch backfill) or an unbounded `readStream` source, because
  * Structured Streaming shares the DataFrame API. Every transform here
  * is incremental-safe: watermarks bound state, windows are event-time
  * (not arrival-time), and custom state uses mapGroupsWithState with an
  * explicit timeout so state size stays O(active keys), not O(history).
  *
  * At 100 TB/day the same code runs with a Kafka source and a parquet
  * sink; nothing below depends on the source being finite.
  */
object EventStream {

  /** Tumbling 5-minute event-time window counts + value sum per event
    * type, tolerating 10 minutes of lateness. Batch equivalence: the
    * identical plan over a bounded input is a plain groupBy — used by
    * the spec as its own oracle.
    */
  def windowedCounts(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Session windows (30-minute gap) per user: built-in session_window
    * keeps state per open session, closed by the watermark.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))

  /** Streaming EXACT DEDUP — the training-pipeline dedup stage
    * (llm.DedupOps) in its incremental form: drop any row whose key was
    * already seen, with the dedup state BOUNDED by the event-time
    * watermark instead of growing with history. A duplicate arriving in
    * a later micro-batch than its original is still dropped as long as
    * it lands within the lateness bound; state for keys older than the
    * watermark is evicted. Batch equivalence: the identical call on a
    * bounded frame is a plain dropDuplicates — the spec's oracle.
    *
    * At 100 TB/day this is the ingest-side filter in front of the batch
    * MinHash pass: hash-partitioned state store on the dedup key (the
    * digest, never the payload — same shuffle discipline as dd_exact).
    */
  def dedupExact(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast(TimestampType))
      .withWatermark(tsCol, lateness)
      // KEY-ONLY dedup with watermark-bounded state: a re-delivery that
      // re-stamps the event time is still the same key and still drops
      // (dropDuplicates(key :+ ts) would let it through); per-key state
      // is evicted once the watermark passes, so memory stays O(keys
      // within the lateness bound). Spark only accepts the
      // within-watermark form on streams, so a bounded frame takes the
      // equivalent plain key dedup — the spec's batch oracle.
      .transform(df =>
        if (df.isStreaming) df.dropDuplicatesWithinWatermark(keyCols)
        else df.dropDuplicates(keyCols))

  final case class Click(userId: Long, ts: java.sql.Timestamp, eventType: String)
  final case class RunState(best: Int, cur: Int, lastType: String, lastTs: Long)
  final case class UserRun(userId: Long, runLength: Int, lastType: String)

  /** Per-user funnel progression state: epoch-millis of the first view,
    * first click after it, first purchase after that (MinValue = not
    * reached), plus the last applied event time for late-arrival
    * fencing.
    */
  final case class FunnelState(t1: Long, t2: Long, t3: Long, lastTs: Long)
  final case class UserFunnel(userId: Long, stage: Int)

  /** Streaming counterpart of the batch `ev_funnel` operator
    * (llm.PipelineOps.funnelOf): per-user ordered view→click→purchase
    * progression maintained incrementally with mapGroupsWithState.
    * Emits each user's current stage (0 = nothing, 1 = viewed,
    * 2 = clicked after the first view, 3 = purchased after that click)
    * — the live dashboard the batch query computes retrospectively.
    *
    * Equivalence with the batch windows: events are applied in
    * event-time order with first-qualifying-wins transitions, which
    * reproduces MIN(view), MIN(click > t1), MIN(purchase > t2) exactly
    * — a funnel stage, once reached, is never revised by later events.
    * Cross-batch LATE arrivals (ts ≤ the state's last applied event)
    * are dropped, same fencing discipline as [[longestRunPerUser]]: a
    * late earlier view could in principle lower t1 and admit an
    * intermediate click the batch pass would count — the documented
    * stream-vs-batch trade-off, bounded by the source's ordering
    * guarantees. State is 4 longs per user — O(active users), evictable
    * via ProcessingTimeTimeout like the other stateful ops.
    */
  def funnelStage(
      clicks: Dataset[Click],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      timeoutDuration: String = "1 hour"): Dataset[UserFunnel] = {
    require(
      timeout == GroupStateTimeout.NoTimeout ||
        timeout == GroupStateTimeout.ProcessingTimeTimeout,
      s"funnelStage: unsupported timeout mode $timeout")
    import clicks.sparkSession.implicits._
    val Unset = Long.MinValue
    clicks
      .groupByKey(_.userId)
      .mapGroupsWithState(timeout) {
        (userId: Long, rows: Iterator[Click], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            UserFunnel(userId,
              Seq(last.t1, last.t2, last.t3).count(_ != Unset))
          } else {
            var st = state.getOption
              .getOrElse(FunnelState(Unset, Unset, Unset, Unset))
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
              .filter(_.ts.getTime > st.lastTs)
            sorted.foreach { c =>
              val t = c.ts.getTime
              c.eventType match {
                case "view" if st.t1 == Unset =>
                  st = st.copy(t1 = t)
                case "click" if st.t2 == Unset && st.t1 != Unset && t > st.t1 =>
                  st = st.copy(t2 = t)
                case "purchase" if st.t3 == Unset && st.t2 != Unset && t > st.t2 =>
                  st = st.copy(t3 = t)
                case _ => ()
              }
              st = st.copy(lastTs = t)
            }
            state.update(st)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout) {
              state.setTimeoutDuration(timeoutDuration)
            }
            UserFunnel(userId, Seq(st.t1, st.t2, st.t3).count(_ != Unset))
          }
      }
  }

  /** Custom keyed state (§2.11 UDF surface analog for streams): per-user
    * longest run of consecutive same-type events, maintained with
    * mapGroupsWithState. State carries both the best and the in-progress
    * run so a run spanning two micro-batches still counts.
    *
    * Production deployments pass ProcessingTimeTimeout (+ a timeout
    * duration) so abandoned users drop from the store; note that with a
    * timeout registered the engine schedules continuous no-data
    * micro-batches just to fire expirations — an always-on cost, which
    * is why it isn't the default here.
    */
  def longestRunPerUser(
      clicks: Dataset[Click],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      timeoutDuration: String = "1 hour"): Dataset[UserRun] = {
    require(
      timeout == GroupStateTimeout.NoTimeout ||
        timeout == GroupStateTimeout.ProcessingTimeTimeout,
      s"longestRunPerUser: unsupported timeout mode $timeout " +
        "(EventTimeTimeout would need a watermark + setTimeoutTimestamp)")
    import clicks.sparkSession.implicits._
    clicks
      .groupByKey(_.userId)
      .mapGroupsWithState(timeout) {
        (userId: Long, rows: Iterator[Click], state: GroupState[RunState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            UserRun(userId, last.best, last.lastType)
          } else {
            val prior = state.getOption.getOrElse(RunState(0, 0, "", Long.MinValue))
            // event-time order within the batch: state transitions are
            // order-sensitive, so sort the (small, per-user) group.
            // Events at or before the state's last-applied timestamp are
            // LATE ARRIVALS from an earlier micro-batch — applying them
            // after newer events would corrupt the run, so drop them
            // (the cross-batch analog of a watermark).
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
              .filter(_.ts.getTime > prior.lastTs)
            var best = prior.best
            var run = prior.cur
            var lastType = prior.lastType
            var lastTs = prior.lastTs
            sorted.foreach { c =>
              run = if (c.eventType == lastType) run + 1 else 1
              lastType = c.eventType
              lastTs = c.ts.getTime
              if (run > best) best = run
            }
            state.update(RunState(best, run, lastType, lastTs))
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout) {
              state.setTimeoutDuration(timeoutDuration)
            }
            UserRun(userId, best, lastType)
          }
      }
  }

  final case class Ev(userId: Long, ts: java.sql.Timestamp,
    eventType: String, value: Double)
  /** Recent touches, DESCENDING ts, capped; lastType collapses a
    * same-millisecond view+click to the MAX type, same as the batch
    * operator's pre-collapse.
    */
  final case class Touch(ts: Long, tt: String)
  final case class AttState(touches: List[Touch])
  final case class AttributedPurchase(userId: Long,
    ts: java.sql.Timestamp, value: Double, touchType: String)

  /** Streaming last-touch attribution — the live counterpart of the
    * batch `ev_attribution` operator (llm.PipelineOps.attributionOf,
    * which runs the custom ASOF exec): each purchase is attributed to
    * the latest view-or-click at or before it by the same user,
    * 'organic' when none.
    *
    * The ASOF lookup becomes per-user KEYED STATE: a bounded
    * most-recent-touch buffer (default 32) ordered by event time, so a
    * purchase arriving moderately late — after a touch with a LATER
    * timestamp already landed — still binds to its true predecessor,
    * which a single last-touch register would get wrong. Same-timestamp
    * view+click collapses to the MAX event type, exactly the batch
    * pre-collapse, so stream and batch cannot diverge on ties. A
    * purchase older than the whole buffer is the documented lateness
    * bound (buffer depth × touch rate), the state-size/correctness
    * trade every streaming attribution system makes; state is O(active
    * users × maxTouches), evictable via ProcessingTimeTimeout like the
    * other stateful ops.
    */
  def attribution(
      events: Dataset[Ev],
      maxTouches: Int = 32): Dataset[AttributedPurchase] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[AttState]) =>
          var touches = state.getOption.map(_.touches).getOrElse(Nil)
          val out = List.newBuilder[AttributedPurchase]
          // MICROsecond event time (getTime is millis; the fraction
          // lives in getNanos) — ties must collapse at exactly the
          // precision the batch ASOF compares at
          def micros(ts: java.sql.Timestamp): Long =
            math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
          rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
            val t = micros(e.ts)
            e.eventType match {
              case "view" | "click" =>
                val (same, rest) = touches.partition(_.ts == t)
                val merged = Touch(t,
                  (e.eventType :: same.map(_.tt)).max) // MAX-type collapse
                touches = (merged :: rest).sortBy(-_.ts).take(maxTouches)
              case "purchase" =>
                val tt = touches.find(_.ts <= t).map(_.tt).getOrElse("organic")
                out += AttributedPurchase(userId, e.ts, e.value, tt)
              case _ => ()
            }
          }
          state.update(AttState(touches))
          out.result().iterator
      }
  }
}
