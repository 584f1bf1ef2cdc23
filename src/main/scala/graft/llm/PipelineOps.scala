package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Q

/** End-to-end pipeline compositions (BASELINE.json north star): the
  * point of an analytics engine for training-data work is not any single
  * operator but that the stages COMPOSE into one distributed plan — no
  * materialization between filter, scrub, dedup, and reporting. These
  * queries chain the single-purpose operators from TextOps/DedupOps the
  * way a production corpus-prep job would, and stay oracle-checkable.
  */
object PipelineOps {

  /** The classic corpus-prep funnel as ONE plan: quality gate (TextOps
    * tx_quality_score formula) → PII scrub (tx_pii_scrub patterns) →
    * exact dedup on the scrubbed digest (DedupOps dd_exact shape) →
    * per-language funnel report (raw → passed → unique, tokens kept,
    * mean quality).
    *
    * Scale layout: everything before the dedup window is a pure per-doc
    * projection (no shuffle); the dedup shuffles the 128-bit digest,
    * never the text; the report aggregation carries 5 rows per
    * partition; the raw-counts side is a second small aggregate joined
    * null-safely on lang (broadcast — it is |langs| rows). Two shuffles
    * + one broadcast at any corpus size. The mean quality is routed
    * through DECIMAL so partial-aggregation order can't skew the
    * float sum vs the single-threaded oracle.
    */
  val pFunnel = Q(
    "pipe_funnel",
    """WITH raw AS (
      |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |scored AS (
      |  SELECT doc_id, lang, text,
      |    0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')))
      |    + 0.5 * LEAST(len(string_split(text, ' ')) / 100.0, 1.0) AS quality
      |  FROM documents),
      |scrubbed AS (
      |  SELECT doc_id, lang, quality,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(text,
      |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g'),
      |      '[0-9]{9,}', '<ID>', 'g') AS clean
      |  FROM scored WHERE quality >= 0.52),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY md5(clean) ORDER BY doc_id) AS rn
      |  FROM scrubbed)
      |SELECT r.lang, r.n_docs,
      |  CAST(COUNT(s.doc_id) AS BIGINT) AS n_pass,
      |  CAST(COALESCE(SUM(CASE WHEN s.rn = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_unique,
      |  CAST(COALESCE(SUM(CASE WHEN s.rn = 1
      |    THEN len(string_split(s.clean, ' ')) ELSE 0 END), 0) AS BIGINT) AS tokens_kept,
      |  ROUND(CAST(SUM(CAST(ROUND(s.quality, 6) AS DECIMAL(18,6))) AS DOUBLE)
      |    / COUNT(s.doc_id), 6) AS avg_quality
      |FROM raw r LEFT JOIN ranked s ON r.lang IS NOT DISTINCT FROM s.lang
      |GROUP BY r.lang, r.n_docs
      |ORDER BY r.lang ASC NULLS LAST""".stripMargin
  ) { s =>
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9][0-9 -]{7,}[0-9]"
    val longId = "[0-9]{9,}"
    val docs = s.table("documents")
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val quality = lit(0.5) * (size(array_distinct(toks)).cast(DoubleType) / nTok) +
      lit(0.5) * least(nTok / 100.0, lit(1.0))
    val raw = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val pass = docs
      .filter(quality >= 0.52)
      .select(col("doc_id"), col("lang"), quality.as("quality"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), email, "<EMAIL>"),
            phone, "<PHONE>"),
          longId, "<ID>").as("clean"))
    // dd_exact shape: shuffle carries the digest, never the text
    val ranked = pass.withColumn("rn",
      row_number().over(
        Window.partitionBy(md5(col("clean").cast(BinaryType)))
          .orderBy(col("doc_id"))))
    val report = ranked.groupBy(col("lang").as("plang")).agg(
      count(lit(1)).as("n_pass"),
      sum(when(col("rn") === 1, 1).otherwise(0)).cast(LongType).as("n_unique"),
      sum(when(col("rn") === 1, size(split(col("clean"), " "))).otherwise(0))
        .cast(LongType).as("tokens_kept"),
      round(sum(round(col("quality"), 6).cast(DecimalType(18, 6))).cast(DoubleType)
        / count(lit(1)), 6).as("avg_quality"))
    raw.join(broadcast(report), raw("lang") <=> col("plang"), "left")
      .select(raw("lang"), col("n_docs"),
        coalesce(col("n_pass"), lit(0L)).as("n_pass"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"),
        col("avg_quality"))
      .orderBy(raw("lang").asc_nulls_last)
  }

  /** Gap-based sessionization over the event stream — the
    * sample-construction stage of behavioral / conversational training
    * data: events more than 8 h apart start a new session; sessions are
    * numbered per user in time order and reported with extent and size.
    *
    * Scale layout: ONE shuffle on user_id serves both windows (lag and
    * the running session counter share the partitioning and sort), and
    * the per-session rollup reuses it (partial aggregation on already
    * co-located keys). Session boundaries are epoch SECONDS (BIGINT) —
    * the deterministic cross-engine currency for the ns-origin event
    * timestamps.
    */
  val pSessionize = Q(
    "ev_sessionize",
    """WITH flags AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR date_diff('second', lag(ts) OVER w, ts) > 28800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |sess AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |      ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
      |  FROM flags)
      |SELECT user_id, session_id,
      |  COUNT(*) AS n_events,
      |  CAST(date_diff('second', TIMESTAMP '1970-01-01', MIN(ts)) AS BIGINT) AS start_s,
      |  CAST(date_diff('second', TIMESTAMP '1970-01-01', MAX(ts)) AS BIGINT) AS end_s,
      |  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS dur_s
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id ASC NULLS LAST, session_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val epoch = (c: org.apache.spark.sql.Column) =>
      c.cast(TimestampType).cast(LongType) // session tz is UTC
    val flags = s.table("events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("is_new",
        when(lag(col("ts"), 1).over(w).isNull ||
          epoch(col("ts")) - epoch(lag(col("ts"), 1).over(w)) > 28800, 1)
          .otherwise(0))
    val sess = flags.withColumn("session_id",
      sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast(IntegerType))
    sess.groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        epoch(min(col("ts"))).as("start_s"),
        epoch(max(col("ts"))).as("end_s"),
        (epoch(max(col("ts"))) - epoch(min(col("ts")))).as("dur_s"))
      .orderBy(col("user_id").asc_nulls_last, col("session_id").asc_nulls_last)
  }

  val all: Seq[Q] = Seq(pFunnel, pSessionize)
}
