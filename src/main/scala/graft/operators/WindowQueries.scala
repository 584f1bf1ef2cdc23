package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Q

/** Window functions — SURVEY.md §2.5 (W1–W8). W6 GROUPS/EXCLUDE frames
  * have no Spark primitive: GROUPS runs as dense_rank + RANGE-over-rank,
  * EXCLUDE as frame-aggregate minus the excluded rows' contribution
  * (with empty-frame NULL guards).
  *
  * Determinism: every window ORDER BY ends in a unique key so rank/lag
  * results are total-order stable. Scale: windows shuffle once on the
  * partition key; per-user partitions are small and uniform in the
  * fixtures (the giant-single-partition cliff is documented in §7.5).
  */
object WindowQueries {

  /** W1: ranking family over per-customer order history. */
  val w1 = Q(
    "w1_ranking",
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS rn,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  ROUND(percent_rank() OVER w, 6) AS prnk,
      |  ROUND(cume_dist() OVER w, 6) AS cdist,
      |  ntile(4) OVER w AS quart
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    s.table("orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        round(cume_dist().over(w), 6).as("cdist"),
        ntile(4).over(w).as("quart"))
      // preSort (r18): the final ORDER BY's range sampling otherwise
      // re-runs the whole ranking window a second time
      .transform(graft.engine.Par.preSort(_, col("o_custkey"), col("o_orderkey")))
      .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
  }

  /** W2: analytic family — lag/lead with defaults, first/last/nth value. */
  val w2 = Q(
    "w2_lag_lead",
    """SELECT user_id, event_id,
      |  lag(event_type) OVER w AS prev_type,
      |  lead(event_type, 2, 'none') OVER w AS next2_type,
      |  first_value(event_type) OVER w AS first_type,
      |  last_value(event_type) OVER w AS last_type,
      |  nth_value(event_type, 2) OVER w AS second_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    s.table("events")
      .select(
        col("user_id"), col("event_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 2, "none").over(w).as("next2_type"),
        first_value(col("event_type")).over(w).as("first_type"),
        last_value(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      // preSort (r18): see w1 — one window execution, not two
      .transform(graft.engine.Par.preSort(_, col("user_id"), col("event_id")))
      .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
  }

  /** W3: aggregates over an unordered window (whole-partition frame). */
  val w3 = Q(
    "w3_agg_over",
    """SELECT o_orderkey, o_custkey,
      |  COUNT(*) OVER w AS n_cust_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS cust_total,
      |  MIN(o_orderdate) OVER w AS first_date
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey)
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    val w = Window.partitionBy(col("o_custkey"))
    s.table("orders")
      .select(
        col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(w).as("n_cust_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType).as("cust_total"),
        min(col("o_orderdate")).over(w).as("first_date"))
      // preSort (r18): see w1 — one window execution, not two
      .transform(graft.engine.Par.preSort(_, col("o_orderkey")))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  /** W4: ROWS frame — moving sum/avg over the last 3 rows. */
  val w4 = Q(
    "w4_rows_frame",
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
      |    (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum,
      |  COUNT(*) OVER
      |    (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
      |FROM events
      |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    s.table("events")
      .select(
        col("user_id"), col("event_id"),
        sum(col("value").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(-2, Window.currentRow))
          .cast(DoubleType).as("mov_sum"),
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_n"))
      // preSort (r18): see w1 — one window execution, not two
      .transform(graft.engine.Par.preSort(_, col("user_id"), col("event_id")))
      .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
  }

  /** W5: RANGE frame — value-based (numeric) and interval-based (time).
    *
    * Partitioned by status and with a selective band on purpose: Spark
    * recomputes a moving-range-frame aggregate from scratch each time
    * the frame start advances (no segment tree like DuckDB's), so an
    * unpartitioned window with a frame covering ~10% of the table is
    * O(n·frame) on a single task — 28s at sf0.1 when this query was
    * written that way. Partition + narrow band is the shape that
    * survives scale.
    */
  val w5 = Q(
    "w5_range_frame",
    """SELECT o_orderkey, o_totalprice,
      |  COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC
      |    RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS n_near
      |FROM orders
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc)
      .rangeBetween(-500, Window.currentRow)
    // preSort: the final ORDER BY's range sampling otherwise re-runs
    // the whole window (measured: two 0.4s window stages per run)
    graft.engine.Par.preSort(
      s.table("orders")
        .select(
          col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_near")),
      col("o_orderkey"))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  /** W5b: interval RANGE over event time (SQL form on both sides). */
  val w5b = Q(
    "w5_range_interval",
    """SELECT user_id, event_id,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts ASC
      |    RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
      |FROM events
      |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin
  ) { s =>
    // preSort (r18): see w1 — one window execution, not two (the ORDER
    // BY moves to the DataFrame tail so the hash exchange sits between)
    graft.engine.Par.preSort(
      s.sql(
        """SELECT user_id, event_id,
          |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts ASC
          |    RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
          |FROM events""".stripMargin),
      col("user_id"), col("event_id"))
      .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
  }

  /** W6: GROUPS frame — Spark (and DuckDB 1.0) lack GROUPS mode; a
    * GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING frame is a RANGE ±1
    * frame over the peer-group index (SURVEY §2.5 W6). The naive rewrite
    * is a single unpartitioned dense_rank — a one-partition cliff at
    * scale — so the engine computes the global group index PARTITIONED:
    * dense_rank within year(o_orderdate) plus a cross-partition offset
    * (cumulative distinct-date counts, a #years-sized relation), then
    * the per-group neighborhood sum via a ±1 band self-join over the
    * #groups-sized per-rank totals. Every window in the plan is
    * partitioned; the only global structures are the two tiny aggregate
    * relations, both broadcast. The oracle spells the same semantics as
    * DuckDB's two-level window — an independent formulation.
    */
  val w6 = Q(
    "w6_groups_frame",
    """SELECT o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (ORDER BY dr RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
      |    AS grp_sum
      |FROM (SELECT o_orderkey, o_orderdate, o_totalprice,
      |        dense_rank() OVER (ORDER BY o_orderdate ASC) AS dr
      |      FROM orders WHERE o_custkey < 30) t
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    // NULL dates take a sentinel max-year so they survive the offset
    // equi-join below AND land in the last peer group, matching the
    // oracle's NULLS-LAST dense_rank (countDistinct skips NULL dates, so
    // the sentinel year contributes no offset — correct, nothing follows
    // it). year(NULL) would otherwise silently drop the row at the join.
    val base = s.table("orders").filter(col("o_custkey") < 30)
      .withColumn("__y", coalesce(year(col("o_orderdate")), lit(Int.MaxValue)))
    // per-year local dense rank: the ONLY row-scale window, partitioned
    val ranked = base.withColumn("__dr_local",
      dense_rank().over(
        Window.partitionBy(col("__y")).orderBy(col("o_orderdate").asc)))
    // cross-partition offsets: distinct dates per year, cumulated by a
    // triangular self-join over the #years-sized relation (no window)
    val perYear = base.groupBy(col("__y"))
      .agg(countDistinct(col("o_orderdate")).as("__nd"))
    val offsets = perYear.as("a")
      .join(perYear.as("b"), col("b.__y") < col("a.__y"), "left")
      .groupBy(col("a.__y").as("__y"))
      .agg(coalesce(sum(col("b.__nd")), lit(0L)).as("__off"))
    val global = ranked.join(broadcast(offsets), "__y")
      .withColumn("dr", col("__dr_local") + col("__off"))
    // per-group totals (#groups rows), neighborhood ±1 via band self-join
    val rankSums = global.groupBy(col("dr"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("__rsum"))
    val nbr = rankSums.as("x")
      .join(broadcast(rankSums.as("n")),
        col("n.dr") >= col("x.dr") - 1 && col("n.dr") <= col("x.dr") + 1)
      .groupBy(col("x.dr").as("dr"))
      .agg(sum(col("n.__rsum")).as("__gsum"))
    global.join(broadcast(nbr), "dr")
      .select(col("o_orderkey"), col("o_orderdate"),
        col("__gsum").cast(DoubleType).as("grp_sum"))
      // preSort (r18): see w1 — one pass over the ranked window + joins
      .transform(graft.engine.Par.preSort(_, col("o_orderkey")))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  /** W6b: EXCLUDE CURRENT ROW / EXCLUDE GROUP — Spark has no EXCLUDE, so
    * the engine subtracts the excluded contribution from the frame
    * aggregate (frame − current row; frame − peer-group sum). The oracle
    * uses DuckDB's NATIVE `EXCLUDE` clause — a genuinely independent
    * implementation of the same semantics.
    */
  val w6b = Q(
    "w6_exclude",
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |     ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW)
      |    AS DOUBLE) AS sum_excl_self,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC
      |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)
      |    AS DOUBLE) AS sum_excl_peers
      |FROM orders
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    val d = col("o_totalprice").cast(DecimalType(18, 2))
    val wOrd = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    // peers share the same ORDER BY value: their sum comes from an
    // unordered window partitioned by (custkey, orderdate)
    val wPeers = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
    // count guards: SUM over an empty post-EXCLUDE frame is NULL in the
    // dialect, while frame_sum − excluded_sum would yield 0
    val rowsFrame = wOrd.rowsBetween(-2, 2)
    // RANGE frame orders by date ALONE (a tiebreaker would shrink the
    // peer group to a single row and change which ties the frame admits)
    val cumFrame = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    s.table("orders")
      .select(
        col("o_orderkey"),
        when(count(lit(1)).over(rowsFrame) > 1,
          sum(d).over(rowsFrame) - d)
          .cast(DoubleType).as("sum_excl_self"),
        when(count(lit(1)).over(cumFrame) > count(lit(1)).over(wPeers),
          sum(d).over(cumFrame) - sum(d).over(wPeers))
          .cast(DoubleType).as("sum_excl_peers"))
      // preSort (r18): see w1 — one pass over the three windows, not two
      .transform(graft.engine.Par.preSort(_, col("o_orderkey")))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  /** W7: named WINDOW clause shared by several functions — exercised by
    * w1/w2/w3 SQL oracles; Spark-side SQL form here.
    */
  val w7 = Q(
    "w7_named_window",
    """SELECT o_orderkey,
      |  row_number() OVER w AS rn,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    // preSort (r18): see w1 — one window execution, not two
    graft.engine.Par.preSort(
      s.sql(
        """SELECT o_orderkey,
          |  row_number() OVER w AS rn,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_total
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin),
      col("o_orderkey"))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  /** W8: QUALIFY — DuckDB dialect filter-on-window; Spark rewrite is
    * window column + filter (SURVEY §2.5 W8): latest order per customer.
    */
  val w8 = Q(
    "w8_qualify",
    """SELECT o_custkey, o_orderkey, o_orderdate
      |FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      |ORDER BY o_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    s.table("orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      // preSort (r18; keys widened r19 — bare o_custkey was elided
      // against the window's o_custkey partitioning)
      .transform(graft.engine.Par.preSort(_,
        col("o_custkey"), col("o_orderkey")))
      .orderBy(col("o_custkey").asc_nulls_last)
  }

  /** W9 (round 9): aggregate FILTER over a window — DuckDB-native
    * syntax, which Spark rejects outright; the dialect folds the
    * predicate into a CASE-guarded argument (GatewaySpec pins the
    * rewrite), and the Spark side here IS that folded form. Running
    * DECIMAL sum + conditional count on one user shuffle; ties broken
    * by event_id so the running frames are deterministic.
    */
  val w9 = Q(
    "w9_window_filter",
    """SELECT event_id AS k,
      |  CAST(count(*) FILTER (WHERE value > 0.5) OVER (
      |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt_hi,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
      |    FILTER (WHERE event_type = 'click') OVER (
      |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS DOUBLE) AS click_sum
      |FROM events WHERE event_id < 5000
      |ORDER BY k ASC NULLS LAST""".stripMargin
  ) { s =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    s.table("events").filter(col("event_id") < 5000)
      .select(col("event_id").as("k"),
        count(when(col("value") > 0.5, lit(1)))
          .over(w.rowsBetween(-3, 0)).cast(LongType).as("cnt_hi"),
        sum(when(col("event_type") === "click",
          col("value").cast(DecimalType(18, 6))))
          .over(w).cast(DoubleType).as("click_sum"))
      // preSort (r18): see w1 — one pass over both windows, not two
      .transform(graft.engine.Par.preSort(_, col("k")))
      .orderBy(col("k").asc_nulls_last)
  }

  val all: Seq[Q] = Seq(w1, w2, w3, w4, w5, w5b, w6, w6b, w7, w8, w9)
}
