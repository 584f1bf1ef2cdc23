package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Dialect, Q}

/** Projection / filter / predicate operators — SURVEY.md §2.2 (P1–P10).
  * All narrow transformations: no shuffle, filters and projections land
  * in the parquet scan (PushedFilters / ReadSchema), so every one of
  * these scales linearly with input on a cluster.
  */
object FilterQueries {

  /** P1: projection with aliases + computed expressions. */
  val p1 = Q(
    "p1_project_alias",
    """SELECT r_regionkey AS rk, UPPER(r_name) AS uname,
      |       r_regionkey + 100 AS rk_shift
      |FROM region ORDER BY rk ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("region")
      .select(
        col("r_regionkey").as("rk"),
        upper(col("r_name")).as("uname"),
        (col("r_regionkey") + 100).as("rk_shift"))
      .orderBy(col("rk").asc_nulls_last)
  }

  /** P2: WHERE filter pushed to the scan. */
  val p2 = Q(
    "p2_filter_where",
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_returnflag = 'A'
      |ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("lineitem")
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "A")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
  }

  /** P3: boolean predicate composition (AND/OR/NOT, 3-valued logic). */
  val p3 = Q(
    "p3_bool_predicates",
    """SELECT c_custkey, c_acctbal, c_mktsegment
      |FROM customer
      |WHERE (c_acctbal > 5000.0 OR c_mktsegment = 'BUILDING')
      |  AND NOT (c_nationkey = 3)
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("customer")
      .filter((col("c_acctbal") > 5000.0 || col("c_mktsegment") === "BUILDING")
        && !(col("c_nationkey") === 3))
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey").asc_nulls_last)
  }

  /** P4: BETWEEN + IN (value list). */
  val p4 = Q(
    "p4_between_in",
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_totalprice BETWEEN 100000.0 AND 150000.0
      |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("orders")
      .filter(col("o_totalprice").between(100000.0, 150000.0)
        && col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  /** P4b: IN (subquery) — Catalyst rewrites to a left-semi join, which at
    * scale broadcasts the (small, aggregated) subquery side.
    */
  val p4b = Q(
    "p4_in_subquery",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.sql("""SELECT c_custkey, c_name
            |FROM customer
            |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
            |ORDER BY c_custkey ASC NULLS LAST""".stripMargin)
  }

  /** P5: IS NULL / null-safe comparison (IS [NOT] DISTINCT FROM ≡ <=>).
    * Fixtures have no nulls, so nulls are injected with NULLIF.
    */
  val p5 = Q(
    "p5_null_safe",
    """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg,
      |       (NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'AUTOMOBILE') AS is_auto,
      |       (NULLIF(c_mktsegment, 'BUILDING') IS NULL) AS seg_null
      |FROM customer
      |WHERE c_custkey < 200
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    val seg = nullif(col("c_mktsegment"), lit("BUILDING"))
    s.table("customer")
      .filter(col("c_custkey") < 200)
      .select(
        col("c_custkey"),
        seg.as("seg"),
        (seg <=> "AUTOMOBILE").as("is_auto"),
        seg.isNull.as("seg_null"))
      .orderBy(col("c_custkey").asc_nulls_last)
  }

  /** P6: LIKE / ILIKE / GLOB (translated to rlike) / regex match. */
  val p6 = Q(
    "p6_like_glob_regex",
    """SELECT p_partkey, p_name,
      |       (p_name LIKE '%re%') AS has_re,
      |       (p_name ILIKE 'SMALL%') AS is_small,
      |       (p_name GLOB '*bolt') AS glob_bolt,
      |       regexp_matches(p_name, '^(red|blue) ') AS re_color
      |FROM part
      |ORDER BY p_partkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("part")
      .select(
        col("p_partkey"), col("p_name"),
        col("p_name").like("%re%").as("has_re"),
        col("p_name").ilike("SMALL%").as("is_small"),
        col("p_name").rlike(Dialect.globToRegex("*bolt")).as("glob_bolt"),
        col("p_name").rlike("^(red|blue) ").as("re_color"))
      .orderBy(col("p_partkey").asc_nulls_last)
  }

  /** P7: CASE WHEN (searched + simple). */
  val p7 = Q(
    "p7_case_when",
    """SELECT o_orderkey,
      |       CASE WHEN o_totalprice > 300000.0 THEN 'big'
      |            WHEN o_totalprice > 100000.0 THEN 'mid'
      |            ELSE 'small' END AS size_band,
      |       CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open'
      |            ELSE 'other' END AS status_word
      |FROM orders
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("orders")
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000.0, "big")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("small").as("size_band"),
        when(col("o_orderstatus") === "F", "final")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("other").as("status_word"))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  /** P8: CAST / TRY_CAST. Note: double→int is avoided (DuckDB rounds,
    * Spark truncates); string→int, ts→date, double→decimal agree.
    */
  val p8 = Q(
    "p8_cast_try_cast",
    """SELECT o_orderkey,
      |       CAST(o_orderkey AS VARCHAR) AS key_str,
      |       CAST(o_orderdate AS DATE) AS odate,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
      |       TRY_CAST(o_orderstatus AS INTEGER) AS status_int,
      |       TRY_CAST(SUBSTR(CAST(o_orderkey AS VARCHAR), 1, 2) AS INTEGER) AS key2
      |FROM orders
      |WHERE o_orderkey < 500
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("orders")
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        col("o_orderkey").cast(StringType).as("key_str"),
        col("o_orderdate").cast(DateType).as("odate"),
        // DECIMAL cast is still under test; the compare surface re-casts to
        // DOUBLE because decimal128 crosses the verify hasher differently
        col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType).as("price_dec"),
        expr("try_cast(o_orderstatus AS INT)").as("status_int"),
        expr("try_cast(substr(cast(o_orderkey AS STRING), 1, 2) AS INT)").as("key2"))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  /** P9: DISTINCT projection. */
  val p9 = Q(
    "p9_distinct",
    """SELECT DISTINCT c_nationkey, c_mktsegment
      |FROM customer
      |ORDER BY c_nationkey ASC NULLS LAST, c_mktsegment ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("customer")
      .select(col("c_nationkey"), col("c_mktsegment"))
      .distinct()
      .orderBy(col("c_nationkey").asc_nulls_last, col("c_mktsegment").asc_nulls_last)
  }

  /** P10: COALESCE / NULLIF / IFNULL / GREATEST / LEAST. */
  val p10 = Q(
    "p10_null_scalars",
    """SELECT s_suppkey,
      |       COALESCE(NULLIF(s_name, 'Supplier#000000000'), 'anon') AS name_or_anon,
      |       IFNULL(NULLIF(s_nationkey, 0), -1) AS nat_or_neg,
      |       GREATEST(s_acctbal, 0.0) AS bal_floor,
      |       LEAST(s_acctbal, 1000.0) AS bal_cap
      |FROM supplier
      |ORDER BY s_suppkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("supplier")
      .select(
        col("s_suppkey"),
        coalesce(nullif(col("s_name"), lit("Supplier#000000000")), lit("anon")).as("name_or_anon"),
        ifnull(nullif(col("s_nationkey"), lit(0)), lit(-1)).as("nat_or_neg"),
        greatest(col("s_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("s_acctbal"), lit(1000.0)).as("bal_cap"))
      .orderBy(col("s_suppkey").asc_nulls_last)
  }

  val all: Seq[Q] = Seq(p1, p2, p3, p4, p4b, p5, p6, p7, p8, p9, p10)
}
