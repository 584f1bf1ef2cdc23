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
    s"""WITH raw AS (
      |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |scored AS (
      |  SELECT doc_id, lang, text,
      |    ${TextOps.qualitySql} AS quality
      |  FROM documents),
      |scrubbed AS (
      |  SELECT doc_id, lang, quality,
      |    ${TextOps.scrubSql("text")} AS clean
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
    // quality gate + scrub are TextOps' shared stage definitions — the
    // pipeline cannot drift from tx_quality_score / tx_pii_scrub
    val docs = s.table("documents")
    val quality = TextOps.qualityCol(col("text"))
    val raw = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val pass = docs
      .filter(quality >= 0.52)
      .select(col("doc_id"), col("lang"), quality.as("quality"),
        TextOps.scrubCol(col("text")).as("clean"))
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
      // preSort (r19): no range-sampling re-exec of the dedup window +
      // report joins; n_pass defeats the lang-key elision
      .transform(graft.engine.Par.preSort(_, col("lang"), col("n_pass")))
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
    // explicit NULLS LAST: Spark's bare ASC is NULLS FIRST, DuckDB's is
    // NULLS LAST — a NULL ts would shift session numbering between
    // engines (latent with this fixture; the discipline is the point)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
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
      .transform(graft.engine.Par.preSort(_, col("user_id"), col("session_id"))) // preSort (r18): no range-sampling re-exec
      .orderBy(col("user_id").asc_nulls_last, col("session_id").asc_nulls_last)
  }

  /** Ordered conversion funnel over the event stream — the product-
    * analytics staple: of all users, how many ever viewed; of those,
    * how many clicked AFTER their first view; of those, how many
    * purchased AFTER that click. Order matters (a purchase before the
    * first view does not count), which is what separates this from
    * three independent COUNT(DISTINCT)s.
    *
    * Scale layout: all three stage timestamps are windows over the SAME
    * (user_id) partitioning — one shuffle; the per-user collapse
    * (groupBy user_id) reuses that partitioning (EnsureRequirements
    * adds no exchange), and the final one-row summary is a partial/
    * final aggregate over one row per user.
    */
  val pFunnelEvents = Q(
    "ev_funnel",
    """WITH st AS (
      |  SELECT user_id, ts, event_type,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1
      |  FROM events),
      |st2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
      |    OVER (PARTITION BY user_id) AS t2
      |  FROM st),
      |st3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
      |    OVER (PARTITION BY user_id) AS t3
      |  FROM st2),
      |u AS (
      |  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      |  FROM st3 GROUP BY user_id)
      |SELECT
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(COUNT(t1) AS BIGINT) AS n_view,
      |  CAST(COUNT(t2) AS BIGINT) AS n_view_click,
      |  CAST(COUNT(t3) AS BIGINT) AS n_full_funnel,
      |  ROUND(CAST(COUNT(t2) AS DOUBLE) / NULLIF(COUNT(t1), 0), 6) AS conv_click,
      |  ROUND(CAST(COUNT(t3) AS DOUBLE) / NULLIF(COUNT(t2), 0), 6) AS conv_purchase
      |FROM u""".stripMargin
  ) { s => funnelOf(s.table("events")) }

  /** Funnel core over any (user_id, ts, event_type) relation — factored
    * for the hand-built ordering spec; plan notes on ev_funnel above.
    */
  private[graft] def funnelOf(events: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("user_id"))
    val st = events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
    val st2 = st.withColumn("t2",
      min(when(col("event_type") === "click" && col("ts") > col("t1"),
        col("ts"))).over(w))
    val st3 = st2.withColumn("t3",
      min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
        col("ts"))).over(w))
    val u = st3.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
    u.agg(
      count(lit(1)).as("n_users"),
      count(col("t1")).as("n_view"),
      count(col("t2")).as("n_view_click"),
      count(col("t3")).as("n_full_funnel"),
      round(count(col("t2")).cast(DoubleType) /
        nullif(count(col("t1")), lit(0L)), 6).as("conv_click"),
      round(count(col("t3")).cast(DoubleType) /
        nullif(count(col("t2")), lit(0L)), 6).as("conv_purchase"))
  }

  /** Day-N cohort retention over the event stream — the second
    * product-analytics staple: users are cohorted by their first active
    * day; each cohort reports how many came back exactly 1 and 7 days
    * later.
    *
    * Scale layout: the first-day aggregate and the distinct (user, day)
    * activity relation both shuffle on user_id, and their join reuses
    * that key; the per-cohort rollup then PRE-COLLAPSES to one row per
    * (cohort, user) carrying two booleans, so the final aggregate is a
    * plain partial/final count — no COUNT(DISTINCT) Expand. The
    * three-distinct-counts formulation tripled the rollup input and
    * spilled 877 MB at the 100× tier; this shape spills nothing (the
    * oracle keeps the declarative COUNT(DISTINCT CASE …) form — same
    * result, different engine-side plan).
    */
  val pRetention = Q(
    "ev_retention",
    """WITH first AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
      |  FROM events GROUP BY user_id),
      |act AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |j AS (
      |  SELECT f.cohort, a.user_id, date_diff('day', f.cohort, a.day) AS off
      |  FROM act a JOIN first f USING (user_id))
      |SELECT cohort,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cohort_size,
      |  CAST(COUNT(DISTINCT CASE WHEN off = 1 THEN user_id END) AS BIGINT) AS d1_retained,
      |  CAST(COUNT(DISTINCT CASE WHEN off = 7 THEN user_id END) AS BIGINT) AS d7_retained,
      |  ROUND(CAST(COUNT(DISTINCT CASE WHEN off = 1 THEN user_id END) AS DOUBLE)
      |    / COUNT(DISTINCT user_id), 6) AS d1_rate,
      |  ROUND(CAST(COUNT(DISTINCT CASE WHEN off = 7 THEN user_id END) AS DOUBLE)
      |    / COUNT(DISTINCT user_id), 6) AS d7_rate
      |FROM j GROUP BY cohort
      |ORDER BY cohort ASC NULLS LAST""".stripMargin
  ) { s =>
    val first = s.table("events").groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort"))
    val act = s.table("events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val j = act.join(first, "user_id")
      .select(col("cohort"), col("user_id"),
        datediff(col("day"), col("cohort")).as("off"))
    // one row per (cohort, user): act is distinct per (user, day) and a
    // user has ONE cohort, so this groupBy also rides the user_id
    // partitioning from the join
    val perUser = j.groupBy(col("cohort"), col("user_id"))
      .agg(max(col("off") === 1).as("d1"), max(col("off") === 7).as("d7"))
    val d1c = sum(when(col("d1"), 1L).otherwise(0L))
    val d7c = sum(when(col("d7"), 1L).otherwise(0L))
    perUser.groupBy(col("cohort"))
      .agg(
        count(lit(1)).as("cohort_size"),
        d1c.as("d1_retained"),
        d7c.as("d7_retained"),
        round(d1c.cast(DoubleType) / count(lit(1)), 6).as("d1_rate"),
        round(d7c.cast(DoubleType) / count(lit(1)), 6).as("d7_rate"))
      // preSort (r18; keys widened r19 — bare cohort was elided against
      // the groupBy(cohort) partitioning, leaving the double-exec)
      .transform(graft.engine.Par.preSort(_, col("cohort"), col("cohort_size")))
      .orderBy(col("cohort").asc_nulls_last)
  }

  /** Last-touch attribution over the event stream — the third
    * product-analytics staple, and a COMPOSITION of the engine's custom
    * ASOF operator (plans.AsOfJoinPlan: LogicalPlan + SparkStrategy +
    * streaming-merge exec) with an aggregation report: each purchase is
    * attributed to the latest view-or-click at or before it by the same
    * user; purchases with no preceding touch are 'organic'.
    *
    * Touches are pre-collapsed per (user_id, ts) with a deterministic
    * winner (MAX(event_type)) so a same-microsecond view+click cannot
    * make the nearest-predecessor choice engine-dependent — BOTH sides
    * run the same collapse. Scale: the ASOF exec shuffles each side
    * once on user_id and merges in-partition with O(1) state; the
    * report is a 3-row aggregate. Purchase values route through
    * DECIMAL.
    */
  val pAttribution = Q(
    "ev_attribution",
    """WITH t AS (
      |  SELECT user_id, ts, MAX(event_type) AS touch_type
      |  FROM events WHERE event_type IN ('view', 'click')
      |  GROUP BY user_id, ts)
      |SELECT COALESCE(t.touch_type, 'organic') AS touch_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN t
      |  ON p.user_id = t.user_id AND p.ts >= t.ts
      |GROUP BY 1
      |ORDER BY touch_type ASC NULLS LAST""".stripMargin
  ) { s =>
    attributionOf(s, s.table("events"))
  }

  /** The ev_attribution plan over an arbitrary events relation — shared
    * with StreamingSpec's stream-vs-batch differential (the streaming
    * counterpart is streaming.EventStream.attribution).
    */
  private[graft] def attributionOf(s: org.apache.spark.sql.SparkSession,
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val touches = events
      .filter(col("event_type").isin("view", "click"))
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_type")).as("tt"))
    graft.plans.AsOfJoinPlan.asof(s, purchases, touches, "user_id", "ts",
      Seq("tt" -> "touch_type"))
      .groupBy(coalesce(col("touch_type"), lit("organic")).as("touch_type"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("attributed_value"))
      // preSort (r18; keys widened r19 — bare touch_type was elided, see ev_retention)
      .transform(graft.engine.Par.preSort(_, col("touch_type"), col("n_purchases")))
      .orderBy(col("touch_type").asc_nulls_last)
  }

  /** Full dedup COMPACTION as one plan — the production corpus-shrink
    * job: exact dedup (digest window, keep min id) over a corpus with
    * both verbatim copies (+2·offset) and 80%-prefix near-dups (+offset),
    * then MinHash/LSH near-dup removal among the exact survivors
    * (banded candidates → shingle-jaccard ≥ 0.3 → drop the later id),
    * then a one-row funnel report.
    *
    * Scale layout: stage 1 is ONE shuffle on the 128-bit digest; stage 2
    * is the dd_minhash_lsh layout (banded buckets confine the pair
    * explosion, the quadratic verify runs only on candidates); the
    * report is three tiny aggregates cross-joined — no driver action
    * anywhere in the plan. The exact-survivor and shingle relations are
    * CacheOnce'd (each feeds ≥2 consumers).
    */
  val pCompact = Q(
    "pipe_compact",
    {
      val D = DedupOps
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + ${D.idOffsetSql} AS doc_id,
         |    array_to_string(list_slice(string_split(text, ' '), 1,
         |      GREATEST(3, CAST(FLOOR(len(string_split(text, ' ')) * 4 / 5) AS INT))), ' ') AS text
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2 * ${D.idOffsetSql} AS doc_id, text FROM documents),
         |exact AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
         |    FROM corpus) x WHERE doc_id = keeper),
         |sh AS (SELECT doc_id, ${D.shinglesSql} AS sh FROM exact),
         |sig AS (SELECT doc_id,
         |  ${(0 until D.K).map(i => s"${D.minhashSql(i)} AS mh$i").mkString(", ")}
         |  FROM (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM sh) h),
         |bands AS (
         |  ${(0 until D.BANDS).map(b =>
              s"SELECT doc_id, $b AS band, md5(mh${2 * b} || mh${2 * b + 1}) AS bucket FROM sig")
              .mkString(" UNION ALL ")}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |drops AS (
         |  SELECT DISTINCT c.id_b AS doc_id
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.id_a
         |  JOIN sh sb ON sb.doc_id = c.id_b
         |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |        len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.3),
         |final AS (
         |  SELECT e.doc_id, e.text FROM exact e
         |  LEFT JOIN drops d ON e.doc_id = d.doc_id WHERE d.doc_id IS NULL)
         |SELECT
         |  (SELECT COUNT(*) FROM corpus) AS n_raw,
         |  (SELECT COUNT(*) FROM exact) AS n_exact,
         |  COUNT(*) AS n_final,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens_final
         |FROM final""".stripMargin
    }
  ) { s =>
    val D = DedupOps
    val toks = split(col("text"), " ")
    val cut = greatest(lit(3), floor(size(toks) * 4 / 5).cast(IntegerType))
    val base = s.table("documents").select(col("doc_id"), col("text"))
    // corpus-derived copy offset (not a constant): hard-coded offsets
    // collided with real doc_ids past 10k docs — see DedupOps.idOffset
    val off = D.idOffset(s)
    val corpus = base
      .union(base.select((col("doc_id") + off).as("doc_id"),
        array_join(slice(toks, lit(1), cut), " ").as("text")))
      .union(base.select((col("doc_id") + 2 * off).as("doc_id"), col("text")))
    // stage 1 — exact: one digest shuffle, keep the minimum id
    val exact = graft.engine.CacheOnce(
      graft.engine.CacheOnce.dsKey(s, "pipe_compact/exact"), // r15 sweep
      corpus
        .withColumn("keeper", min(col("doc_id")).over(
          Window.partitionBy(md5(col("text").cast(BinaryType)))))
        .filter(col("doc_id") === col("keeper"))
        .select(col("doc_id"), col("text")))
    // stage 2 — near-dup among survivors: the dd_minhash_lsh layout
    val sh = graft.engine.CacheOnce(
      graft.engine.CacheOnce.dsKey(s, "pipe_compact/sh"),
      exact.select(col("doc_id"), D.shinglesPadded(col("text")).as("sh")))
    val sig = exact.select(col("doc_id"),
      graft.engine.expressions.OptimizerBarrier( // 3×-eval guard (r12)
        graft.engine.GraftColumns.minhashSig(col("text"), D.K)).as("sig"))
    val bands = graft.engine.CacheOnce(
      graft.engine.CacheOnce.dsKey(s, "pipe_compact/bands"),
      sig.select(col("doc_id"), explode(D.bandStructs(col("sig"))).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket")))
    val cand = D.lshCandidates(bands,
      cacheKey = graft.engine.CacheOnce.dsKey(s, "pipe_compact"))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
      size(array_union(col("sh_a"), col("sh_b")))
    val drops = cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .filter(jac >= 0.3)
      .select(col("id_b").as("doc_id")).distinct()
    val fin = exact.join(drops, Seq("doc_id"), "left_anti")
    // stage 3 — funnel report: three tiny aggregates, cross-joined
    corpus.agg(count(lit(1)).as("n_raw"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(fin.agg(
        count(lit(1)).as("n_final"),
        sum(size(split(col("text"), " "))).cast(LongType).as("tokens_final")))
  }

  /** Embedding near-duplicate COMPACTION as one plan — the
    * vector-corpus counterpart of pipe_compact: random-hyperplane
    * signature blocking (2 bands × 6 bits of the shared
    * SimilarityOps.hyperplaneSig) → candidate pairs within a band
    * bucket (through DedupOps.lshCandidates, so the hot-bucket guard
    * applies) → exact-cosine verify > 0.35 over only the candidates →
    * drop the later vec_id → one-row funnel report.
    *
    * Scale layout: signatures are a pure projection (planes ride the
    * plan as literals); candidates shuffle on (band, bucket) with the
    * quadratic confined to buckets (capped); the verify re-reads raw
    * vectors for candidate ids only — the corpus never self-joins. The
    * cosine is the same left-to-right double fold the oracle's
    * list_cosine_similarity computes, so the verify threshold is
    * engine-portable bit-for-bit.
    *
    * The oracle SQL models the HOT-BUCKET CAP explicitly (bsize > 100 →
    * star pairs against the bucket minimum): with only 2⁶ buckets per
    * band, a 20k-vector corpus averages >300 members per bucket, and
    * the 10× scale gate caught the uncapped oracle exploding to 7.2M
    * candidate pairs where the engine's guarded path carries 48.5k —
    * the cap is part of the operator's CONTRACT, so the oracle states
    * it too.
    */
  val pEmbed = Q(
    "pipe_embed_dedup",
    """WITH planes AS (
      |  SELECT p,
      |    list_transform(range(64), d ->
      |      CASE WHEN (strpos('0123456789abcdef',
      |        substr(md5(p::VARCHAR || ':' || d::VARCHAR), 2, 1)) - 1) % 2 = 0
      |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS plane
      |  FROM range(12) t(p)),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM embeddings),
      |bits AS (
      |  SELECT e.vec_id, p.p,
      |    CASE WHEN list_dot_product(e.v, p.plane) > 0 THEN '1' ELSE '0' END AS bit
      |  FROM e CROSS JOIN planes p),
      |sigs AS (SELECT vec_id, string_agg(bit, '' ORDER BY p) AS sig
      |         FROM bits GROUP BY vec_id),
      |bands AS (
      |  SELECT vec_id, 0 AS band, substr(sig, 1, 6) AS bucket FROM sigs
      |  UNION ALL
      |  SELECT vec_id, 1 AS band, substr(sig, 7, 6) AS bucket FROM sigs),
      |sized AS (
      |  SELECT vec_id, band, bucket,
      |    COUNT(*) OVER (PARTITION BY band, bucket) AS bsize,
      |    MIN(vec_id) OVER (PARTITION BY band, bucket) AS brep
      |  FROM bands),
      |cand AS (
      |  SELECT DISTINCT id_a, id_b FROM (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |    FROM sized a JOIN sized b
      |      ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
      |    WHERE a.bsize <= 100
      |    UNION ALL
      |    SELECT brep AS id_a, vec_id AS id_b
      |    FROM sized WHERE bsize > 100 AND vec_id <> brep) u),
      |verified AS (
      |  SELECT c.id_a, c.id_b
      |  FROM cand c
      |  JOIN e ea ON ea.vec_id = c.id_a
      |  JOIN e eb ON eb.vec_id = c.id_b
      |  WHERE list_cosine_similarity(ea.v, eb.v) > 0.35),
      |drops AS (SELECT DISTINCT id_b FROM verified)
      |SELECT
      |  (SELECT COUNT(*) FROM embeddings) AS n_vectors,
      |  (SELECT COUNT(*) FROM cand) AS n_candidates,
      |  (SELECT COUNT(*) FROM verified) AS n_pairs,
      |  COUNT(*) AS n_dropped
      |FROM drops""".stripMargin
  ) { s =>
    import graft.engine.expressions.VectorMath.dot
    val sigs = s.table("embeddings")
      .select(col("vec_id"), graft.engine.expressions.OptimizerBarrier(
        SimilarityOps.hyperplaneSig(col("embedding"), 12)).as("sig"))
    // 2 bands × 6 bits in ONE generator pass (the dd_minhash_lsh band
    // layout); lshCandidates brings the hot-bucket star guard with it
    val bands = sigs
      .select(col("vec_id").as("doc_id"), explode(array(
        struct(lit(0).as("band"), substring(col("sig"), 1, 6).as("bucket")),
        struct(lit(1).as("band"), substring(col("sig"), 7, 6).as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = graft.engine.CacheOnce(
      graft.engine.CacheOnce.dsKey(s, "pipe_embed/cand"), // r15 sweep
      DedupOps.lshCandidates(bands))
    val e = s.table("embeddings").select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("v"),
      sqrt(dot(col("embedding"), col("embedding"))).as("n"))
    val verified = graft.engine.CacheOnce(
      graft.engine.CacheOnce.dsKey(s, "pipe_embed/verified"),
      cand
        .join(e.select(col("vec_id").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
        .join(e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
        .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) > 0.35)
        .select(col("id_a"), col("id_b")))
    val drops = verified.select(col("id_b")).distinct()
    s.table("embeddings").agg(count(lit(1)).as("n_vectors"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(verified.agg(count(lit(1)).as("n_pairs")))
      .crossJoin(drops.agg(count(lit(1)).as("n_dropped")))
  }

  /** Domain-mix sampling — the final stage of corpus prep: given a
    * per-domain (here: per-language) token budget, select a
    * deterministic sample of documents that fills each domain's quota.
    * Selection order is a salted hash of doc_id, NOT a random() — the
    * same mix reproduces bit-for-bit on any cluster size, reruns are
    * idempotent, and adding documents later only changes the tail of
    * each domain's selection (hash order is stable under inserts).
    * A document is kept while its domain's budget is unexhausted when
    * it starts (cum - n_tok < quota), so every domain overshoots by at
    * most one document — the standard budget-fill convention.
    *
    * Scale: ONE shuffle (hash-partition by lang for the cumulative-sum
    * window) over (doc_id, lang, n_tok, rk) — the text never moves; the
    * report aggregation reuses the same partitioning, so
    * EnsureRequirements adds no second exchange. At 100 TB the window
    * within a domain is sequential by nature (a running total), which
    * is why the shuffled rows carry 4 small columns, not documents.
    */
  val pDomainMix = Q(
    "pipe_domain_mix",
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    md5('mix' || CAST(doc_id AS VARCHAR)) AS rk
      |  FROM documents),
      |c AS (
      |  SELECT *, SUM(n_tok) OVER (
      |    PARTITION BY lang ORDER BY rk ASC, doc_id ASC) AS cum
      |  FROM d),
      |sel AS (SELECT * FROM c WHERE cum - n_tok < 2000)
      |SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
      |  MIN(rk) AS first_pick
      |FROM sel GROUP BY lang
      |ORDER BY lang ASC NULLS LAST""".stripMargin
  ) { s =>
    val quota = 2000L
    val d = s.table("documents").select(
      col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast(LongType).as("n_tok"),
      md5(concat(lit("mix"), col("doc_id").cast(StringType)).cast(BinaryType)).as("rk"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("rk").asc, col("doc_id").asc)
    d.withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") - col("n_tok") < quota)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tokens"),
        min(col("rk")).as("first_pick"))
      .transform(graft.engine.Par.preSort(_, col("lang"))) // preSort (r18): no range-sampling re-exec
      .orderBy(col("lang").asc_nulls_last)
  }

  /** Daily event-volume anomaly detection — the monitoring staple over
    * an event stream: for each (event_type, day), flag days whose count
    * sits more than 2 sample standard deviations from that type's daily
    * mean.
    *
    * Numeric determinism: the per-type mean/variance are derived from
    * EXACT DECIMAL sums (Σn and Σn² over integer day-counts commute
    * under any partial-aggregation order), cast to DOUBLE only for the
    * final mean/var/z arithmetic — identical IEEE expressions on both
    * engines, so even the pre-round |z| > 2 cut cannot disagree.
    *
    * Scale: one shuffle to (event_type, day) counts — everything after
    * runs on |types|×|days| rows: the per-type moment aggregate is tiny
    * and broadcast back onto the daily relation. Event payloads never
    * move; adding years of history grows the post-shuffle relation
    * linearly in days, not events.
    */
  val pAnomaly = Q(
    "ev_anomaly",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type,
      |    COUNT(*) AS n_days,
      |    SUM(CAST(n AS DECIMAL(18,0))) AS s1,
      |    SUM(CAST(n AS DECIMAL(18,0)) * CAST(n AS DECIMAL(18,0))) AS s2
      |  FROM daily GROUP BY 1),
      |z AS (
      |  SELECT d.event_type, d.day, d.n,
      |    (CAST(d.n AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n_days) /
      |      SQRT((CAST(s.s2 AS DOUBLE) - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / s.n_days)
      |           / (s.n_days - 1)) AS zs
      |  FROM daily d JOIN stats s ON d.event_type = s.event_type
      |  WHERE s.n_days > 1)
      |SELECT event_type, day, n, ROUND(zs, 6) AS z
      |FROM z WHERE ABS(zs) > 2
      |ORDER BY event_type ASC NULLS LAST, day ASC NULLS LAST""".stripMargin
  ) { s =>
    val daily = s.table("events")
      .groupBy(col("event_type"), col("ts").cast(DateType).as("day"))
      .agg(count(lit(1)).as("n"))
    val dec = col("n").cast(DecimalType(18, 0))
    val stats = daily.groupBy(col("event_type").as("set"))
      .agg(count(lit(1)).as("n_days"),
        sum(dec).as("s1"), sum(dec * dec).as("s2"))
      .filter(col("n_days") > 1)
    val mean = col("s1").cast(DoubleType) / col("n_days")
    val variance = (col("s2").cast(DoubleType) -
      col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / col("n_days")) /
      (col("n_days") - 1)
    val zs = (col("n").cast(DoubleType) - mean) / sqrt(variance)
    daily.join(broadcast(stats), daily("event_type") === col("set"))
      .withColumn("zs", zs)
      .filter(abs(col("zs")) > 2)
      .select(col("event_type"), col("day"), col("n"), round(col("zs"), 6).as("z"))
      // preSort (r18; keys widened r19 — (event_type, day) was elided
      // against the daily-count groupBy's identical partitioning)
      .transform(graft.engine.Par.preSort(_,
        col("event_type"), col("day"), col("z")))
      .orderBy(col("event_type").asc_nulls_last, col("day").asc_nulls_last)
  }

  /** Deterministic stratified sampling — cap every language stratum at
    * CAP docs, keeping the CAP smallest md5(doc_id) values (a seedless,
    * reproducible uniform draw both engines can restate).
    *
    * The scale shape is the TWO-PHASE TOP-K, and on Spark 4.x the
    * single declarative rank-limit window IS that shape: Catalyst's
    * InferWindowGroupLimit inserts a map-side `WindowGroupLimit
    * (Partial)` BEFORE the stratum shuffle, so every map partition
    * forwards at most CAP rows per lang and a 90%-English corpus lands
    * ≤ CAP×maps rows on one reducer instead of the whole stratum —
    * exactly the salted pre-prune, minus the extra exchange a
    * hand-salted first phase would add (measured: the hand-salted
    * variant plans one more hashpartitioning). PlanSpec pins the
    * Partial group-limit so a regression to full-stratum shuffling
    * can't land silently.
    */
  val pMixSample = Q(
    "pipe_mix_sample",
    """SELECT doc_id, lang, rn FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
      |  FROM documents) t
      |WHERE rn <= 30
      |ORDER BY lang ASC NULLS LAST, rn ASC NULLS LAST""".stripMargin
  ) { s =>
    val cap = 30
    val hashed = s.table("documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast(StringType).cast(BinaryType)).as("h"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("doc_id"), col("lang"), col("rn"))
      // no preSort (r18): the single-exchange two-phase group-limit
      // shape is pinned (PlanSpec) and the post-exchange re-exec is a
      // bounded ≤cap·strata relation — nothing to save
      .orderBy(col("lang").asc_nulls_last, col("rn").asc_nulls_last)
  }

  /** Deterministic train/validation holdout split (round 9): the
    * standard salted-hash split every training pipeline needs — a doc's
    * split must be a pure function of its id (stable under re-runs,
    * re-partitioning, and corpus growth; never random()). The bucket is
    * the md5 hex prefix compared LEXICALLY ('e6' ≈ 90%), the same
    * engine-neutral trick pipe_domain_mix's pick key uses — no
    * hex-to-int conversion, which the two engines spell differently.
    * Scale shape: one codegen'd projection + one partial/final agg, no
    * per-split scans.
    */
  val pTrainSplit = Q(
    "pipe_train_split",
    """WITH tagged AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CASE WHEN substr(md5('split42' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
      |      THEN 'train' ELSE 'valid' END AS split
      |  FROM documents)
      |SELECT split,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM tagged GROUP BY split
      |ORDER BY split ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"),
        when(substring(md5(concat(lit("split42"),
          col("doc_id").cast(StringType)).cast(BinaryType)), 1, 2) < "e6", "train")
          .otherwise("valid").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast(LongType).as("tokens"),
        min(col("doc_id")).as("first_doc"))
      // preSort (r18; keys widened r19 — bare split was elided, see ev_retention)
      .transform(graft.engine.Par.preSort(_, col("split"), col("n_docs")))
      .orderBy(col("split").asc_nulls_last)
  }

  /** Sequence packing (r14): greedy next-fit of documents into
    * fixed-token-budget training sequences (capacity 200 tokens) — THE
    * data-prep step between chunking and tokenization in an LLM
    * pipeline (padding waste ⇒ wasted FLOPs; packing recovers it).
    * Next-fit is inherently sequential — bin state is a running fold no
    * window function expresses — so the stream is BLOCKED first:
    * packing runs independently inside each block of 100 consecutive
    * doc_ids (bins never cross blocks, by contract). That makes the op
    * embarrassingly parallel at any scale — one shuffle on the block
    * key, then a bounded in-task fold per block (same justified
    * flatMapGroups class as the HNSW cells: genuinely sequential state
    * over a construction-bounded group). A doc longer than the capacity
    * opens its own (oversized) bin — next-fit always places a doc.
    *
    * Oracle: the same fold spelled as a DuckDB recursive CTE that
    * advances every block one row per iteration (depth = block size,
    * bounded by construction).
    */
  val pPack = Q(
    "pipe_pack",
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, CAST(FLOOR(doc_id / 100) AS INT) AS block,
      |    CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
      |    CAST(row_number() OVER (PARTITION BY CAST(FLOOR(doc_id / 100) AS INT)
      |      ORDER BY doc_id) AS INT) AS rn
      |  FROM documents),
      |pack AS (
      |  SELECT block, rn, doc_id, n_tok, 0 AS bin, 0 AS pos, n_tok AS fill
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.block, d.rn, d.doc_id, d.n_tok,
      |    CASE WHEN p.fill + d.n_tok <= 200 THEN p.bin ELSE p.bin + 1 END,
      |    CASE WHEN p.fill + d.n_tok <= 200 THEN p.pos + 1 ELSE 0 END,
      |    CASE WHEN p.fill + d.n_tok <= 200 THEN p.fill + d.n_tok ELSE d.n_tok END
      |  FROM pack p JOIN d ON d.block = p.block AND d.rn = p.rn + 1)
      |SELECT doc_id, block, CAST(bin AS INT) AS bin, CAST(pos AS INT) AS pos, n_tok
      |FROM pack ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    packBlocks(
      s.table("documents").select(col("doc_id"),
        floor(col("doc_id") / 100).cast(IntegerType).as("block"),
        size(split(col("text"), " ")).as("n_tok")),
      cap = 200)
  }

  /** Next-fit packing of a (doc_id, block, n_tok) relation — split out
    * so the spec can pin the fold on hand-built sizes (oversize docs,
    * exact fills, block independence); the oracle pins fixture scale.
    */
  private[graft] def packBlocks(perDoc: org.apache.spark.sql.DataFrame,
      cap: Int): org.apache.spark.sql.DataFrame = {
    val s = perDoc.sparkSession
    import s.implicits._
    perDoc.as[(Long, Int, Int)]
      .groupByKey(_._2)
      .flatMapGroups { (block: Int, it: Iterator[(Long, Int, Int)]) =>
        // doc_id order IS the packing order (the blocking key is a
        // doc_id range, so the sort is total within the group)
        val docs = it.toArray.sortBy(_._1)
        val out = new Array[(Long, Int, Int, Int, Int)](docs.length)
        var bin = 0; var fill = 0; var pos = -1
        var i = 0
        while (i < docs.length) {
          val (id, _, nt) = docs(i)
          if (i == 0) { fill = nt; pos = 0 }
          else if (fill + nt <= cap) { fill += nt; pos += 1 }
          else { bin += 1; fill = nt; pos = 0 }
          out(i) = (id, block, bin, pos, nt)
          i += 1
        }
        out.iterator
      }
      .toDF("doc_id", "block", "bin", "pos", "n_tok")
      .transform(graft.engine.Par.preSort(_, col("doc_id"))) // preSort (r18): no range-sampling re-exec
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Train/valid split-leakage audit (r14): the eval-hygiene complement
    * to pipe_train_split — for every VALID document, the fraction of
    * its 3-token shingles that also occur anywhere in the TRAIN split
    * (the same split function, verbatim). High leak_frac means the
    * holdout is contaminated by near-copies in train and its loss is a
    * lie. Composes the pipe_train_split hash split with the
    * tx_decontaminate shingle machinery — but where decontaminate's
    * benchmark side is bounded-by-construction (broadcast-gated), BOTH
    * split sides here are corpus-sized, so the posture is a digest
    * shuffle join, never a broadcast.
    *
    * Scale layout: shingles travel as md5 digests on both sides (the
    * tx_dup_coverage discipline — text never shuffles); train distinct
    * digests is one partial/final aggregate; the coverage join + per-doc
    * count shuffles digests only.
    */
  val pLeakage = Q(
    "pipe_leakage",
    s"""WITH tagged AS (
       |  SELECT doc_id, text,
       |    CASE WHEN substr(md5('split42' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
       |      THEN 'train' ELSE 'valid' END AS split
       |  FROM documents),
       |tsh AS (
       |  SELECT DISTINCT md5(unnest(${graft.llm.DedupOps.shinglesSql})) AS d
       |  FROM tagged WHERE split = 'train'),
       |vsh AS (SELECT doc_id, ${graft.llm.DedupOps.shinglesSql} AS sh
       |  FROM tagged WHERE split = 'valid'),
       |v AS (SELECT doc_id, md5(unnest(sh)) AS d FROM vsh),
       |hits AS (
       |  SELECT v.doc_id, COUNT(*) AS n_hits
       |  FROM v JOIN tsh USING (d) GROUP BY v.doc_id)
       |SELECT vsh.doc_id,
       |  CAST(len(vsh.sh) AS INT) AS n_shingles,
       |  CAST(COALESCE(h.n_hits, 0) AS INT) AS n_leaked,
       |  ROUND(COALESCE(h.n_hits, 0) * 1.0 / len(vsh.sh), 6) AS leak_frac,
       |  (COALESCE(h.n_hits, 0) * 1.0 / len(vsh.sh)) >= 0.5 AS flagged
       |FROM vsh LEFT JOIN hits h USING (doc_id)
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    import graft.engine.expressions.OptimizerBarrier
    val split = when(substring(md5(concat(lit("split42"),
      col("doc_id").cast(StringType)).cast(BinaryType)), 1, 2) < "e6", "train")
      .otherwise("valid")
    val tagged = s.table("documents")
      .select(col("doc_id"), col("text"), split.as("split"))
    // shingle kernels BARRIERED below their explodes (the r12 lesson:
    // the optimizer otherwise clones them into inferred generator
    // filters — 3 evaluations per document)
    val tsh = tagged.filter(col("split") === "train")
      .select(OptimizerBarrier(DedupOps.shinglesPadded(col("text"))).as("__sh"))
      .select(explode(col("__sh")).as("s"))
      .select(md5(col("s").cast(BinaryType)).as("d"))
      .distinct()
    // read twice (per-doc sizes + the hit join) — CacheOnce, same as
    // dd_minhash_lsh's shingle relation
    val vsh = graft.engine.CacheOnce(
      graft.engine.Tables.dirOf(s).getOrElse("?") + "/pipe_leakage/vsh",
      tagged.filter(col("split") === "valid")
        .select(col("doc_id"),
          OptimizerBarrier(DedupOps.shinglesPadded(col("text"))).as("sh")))
    val v = vsh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), md5(col("s").cast(BinaryType)).as("d"))
    val hits = v.join(tsh, "d")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    vsh.select(col("doc_id"), size(col("sh")).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).cast(IntegerType).as("n_leaked"),
        round(coalesce(col("n_hits"), lit(0L)) * 1.0 / col("n_shingles"), 6)
          .as("leak_frac"),
        (coalesce(col("n_hits"), lit(0L)) * 1.0 / col("n_shingles") >= 0.5)
          .as("flagged"))
      .transform(graft.engine.Par.preSort(_, col("doc_id"))) // preSort (r18): no range-sampling re-exec
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** The composed Lee-et-al. cleaning pipeline (r15): document-level
    * exact dedup (keep the minimum id per content digest — pipe_compact
    * stage 1 verbatim, exercised by a planted verbatim-copy layer),
    * then SPAN-level duplicate removal over the survivors
    * (tx_span_dedup's keep-first machinery, [[TextOps.spanDedupOf]]),
    * reported as the one-row corpus summary a pipeline run logs:
    * raw/surviving doc counts, docs touched by span cuts, token totals
    * before/removed, removed fraction. The composition is the point —
    * doc-level dedup alone leaves the cross-doc repeated runs that
    * span removal cuts, and both stages reuse the shared operators, so
    * a fix in either cannot drift between standalone and pipeline.
    *
    * Scale layout: stage 1 is one digest-keyed window (same shuffle
    * class as pipe_compact); stage 2 inherits tx_span_dedup's layout
    * (digest shuffles, per-row span algebra, one doc_id stitch); the
    * report is a single partial/final aggregate over the narrow span
    * relation plus a count of the raw layer — no driver-side action.
    */
  val pSpanClean = Q(
    "pipe_span_clean",
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${graft.llm.DedupOps.idOffsetSql} AS doc_id, text
       |  FROM documents),
       |exact AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |      MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
       |    FROM corpus) x WHERE doc_id = keeper),
       |tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM exact WHERE text IS NOT NULL),
       |g AS (
       |  SELECT doc_id, unnest(generate_series(1, len(toks) - 9)) AS i, toks
       |  FROM tok),
       |gh AS (
       |  SELECT doc_id, i, md5(array_to_string(toks[i:i+9], ' ')) AS h FROM g),
       |dup AS (
       |  SELECT h, MIN(doc_id) AS lo FROM gh GROUP BY h
       |  HAVING MIN(doc_id) <> MAX(doc_id)),
       |rem AS (
       |  SELECT gh.doc_id, gh.i FROM gh JOIN dup USING (h)
       |  WHERE gh.doc_id > dup.lo),
       |cov AS (
       |  SELECT DISTINCT doc_id, i + u.o AS p
       |  FROM rem, (SELECT unnest(generate_series(0, 9)) AS o) u),
       |per AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id)
       |SELECT
       |  (SELECT COUNT(*) FROM corpus) AS n_raw,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN COALESCE(p.n_removed, 0) > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_touched,
       |  CAST(SUM(len(t.toks)) AS BIGINT) AS tokens_total,
       |  CAST(SUM(COALESCE(p.n_removed, 0)) AS BIGINT) AS tokens_removed,
       |  ROUND(SUM(COALESCE(p.n_removed, 0)) * 1.0 / SUM(len(t.toks)), 6)
       |    AS removed_frac
       |FROM tok t LEFT JOIN per p USING (doc_id)""".stripMargin
  ) { s =>
    val D = graft.llm.DedupOps
    val base = s.table("documents").select(col("doc_id"), col("text"))
    val off = D.idOffset(s)
    val corpus = base.union(
      base.select((col("doc_id") + off).as("doc_id"), col("text")))
    val exact = corpus
      .withColumn("keeper", min(col("doc_id")).over(
        Window.partitionBy(md5(col("text").cast(BinaryType)))))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("text"))
    val spans = graft.llm.TextOps.spanDedupOf(exact,
      graft.engine.Tables.dirOf(s).getOrElse("?") + "/pipe_span_clean")
    val summary = spans.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("n_removed") > 0, 1).otherwise(0)).cast(LongType)
        .as("n_touched"),
      sum(col("n_tok")).cast(LongType).as("tokens_total"),
      sum(col("n_removed")).cast(LongType).as("tokens_removed"),
      round(sum(col("n_removed")) * lit(1.0) / sum(col("n_tok")), 6)
        .as("removed_frac"))
    corpus.agg(count(lit(1)).as("n_raw")).crossJoin(summary)
      .select(col("n_raw"), col("n_docs"), col("n_touched"),
        col("tokens_total"), col("tokens_removed"), col("removed_frac"))
  }

  val all: Seq[Q] = Seq(pFunnel, pSessionize, pCompact, pEmbed, pDomainMix,
    pFunnelEvents, pRetention, pAttribution, pAnomaly, pMixSample,
    pTrainSplit, pPack, pLeakage, pSpanClean)
}
