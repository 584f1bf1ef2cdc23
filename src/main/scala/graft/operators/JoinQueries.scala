package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Det, Q}

/** Join operators — SURVEY.md §2.3 (J1–J10 except J7 ASOF, which lives in
  * AsOfQueries). Logical semantics mapped to Spark joins; physical choice
  * left to Catalyst/AQE. `broadcast()` hints appear ONLY on relations
  * whose cardinality is fixed by the schema (region/nation: 5/25 rows) —
  * SF-proportional tables like supplier are never hinted, because a hint
  * overrides the size threshold and turns into a driver OOM at 100 TB;
  * CBO/AQE still broadcasts them by size at the tiers where they fit.
  */
object JoinQueries {

  /** J1: inner equi-join chain fact→dims; nation hinted (25 rows),
    * supplier broadcast-by-size; revenue by nation. At 100 TB the only
    * shuffle is the final groupBy on 25 keys (supplier, no longer
    * broadcast-able, co-shuffles with lineitem on suppkey).
    */
  val j1 = Q(
    "j1_inner_join",
    s"""SELECT n_name,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name ASC NULLS LAST""".stripMargin
  ) { s =>
    val d = (c: String) => col(c).cast(DecimalType(18, 2))
    s.table("lineitem")
      .join(s.table("supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(s.table("nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(d("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - d("l_discount")))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name").asc_nulls_last)
  }

  /** J2: LEFT OUTER — customers with zero orders keep a row. */
  val j2 = Q(
    "j2_left_outer",
    s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey
       |ORDER BY c_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("customer")
      .join(s.table("orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast(DecimalType(18, 2))), lit(0))
          .cast(DoubleType).as("spend"))
      .orderBy(col("c_custkey").asc_nulls_last)
  }

  /** J2b: RIGHT OUTER (mirror form). */
  val j2b = Q(
    "j2_right_outer",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("orders")
      .join(s.table("customer"), col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey").asc_nulls_last)
  }

  /** J2c: FULL OUTER over two disjoint-keyed aggregates (nulls on both
    * sides: not every nation has suppliers, and vice versa at small sf).
    */
  val j2c = Q(
    "j2_full_outer",
    """WITH cs AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
      |     ss AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
      |SELECT COALESCE(cs.k, ss.k) AS k, n_cust, n_supp
      |FROM cs FULL OUTER JOIN ss ON cs.k = ss.k
      |ORDER BY k ASC NULLS LAST""".stripMargin
  ) { s =>
    val cs = s.table("customer").groupBy(col("c_nationkey").as("k"))
      .agg(count(lit(1)).as("n_cust"))
    val ss = s.table("supplier").groupBy(col("s_nationkey").as("k2"))
      .agg(count(lit(1)).as("n_supp"))
    cs.join(ss, col("k") === col("k2"), "full")
      .select(coalesce(col("k"), col("k2")).as("k"), col("n_cust"), col("n_supp"))
      .orderBy(col("k").asc_nulls_last)
  }

  /** J3: CROSS join (tiny × tiny). */
  val j3 = Q(
    "j3_cross_join",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("region").crossJoin(s.table("nation"))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name").asc_nulls_last, col("n_name").asc_nulls_last)
  }

  /** J4: LEFT SEMI (EXISTS). */
  val j4 = Q(
    "j4_semi_join",
    """SELECT c_custkey FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    val big = s.table("orders").filter(col("o_totalprice") > 300000.0)
    s.table("customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey").asc_nulls_last)
  }

  /** J5: LEFT ANTI (NOT EXISTS). */
  val j5 = Q(
    "j5_anti_join",
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("customer")
      .join(s.table("orders").filter(col("o_totalprice") > 350000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey").asc_nulls_last)
  }

  /** J6: equi-join with inequality residual (range predicate) — per-order
    * count of line items shipped strictly after the order date.
    */
  val j6 = Q(
    "j6_ineq_join",
    """SELECT o_orderkey, COUNT(l_linenumber) AS n_late
      |FROM orders JOIN lineitem
      |  ON o_orderkey = l_orderkey AND l_shipdate > o_orderdate
      |GROUP BY o_orderkey
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("orders")
      .join(s.table("lineitem"),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_linenumber")).as("n_late"))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  /** J6b: pure inequality (theta) join — supplier pairs ranked by balance.
    * DuckDB uses IEJoin; Spark picks BroadcastNestedLoop BY SIZE here
    * (no hint — supplier grows with SF, and a forced broadcast of an
    * SF-proportional side is a 100 TB OOM). The scale path for
    * inequality joins is j6_band_join (engine/RangeJoin); this shape
    * exists to pin the theta-join semantics.
    */
  val j6b = Q(
    "j6_theta_join",
    """SELECT a.s_suppkey AS lo, COUNT(*) AS n_richer
      |FROM supplier a JOIN supplier b
      |  ON a.s_acctbal < b.s_acctbal
      |GROUP BY a.s_suppkey
      |ORDER BY lo ASC NULLS LAST""".stripMargin
  ) { s =>
    val a = s.table("supplier").select(col("s_suppkey").as("lo"), col("s_acctbal").as("bal_a"))
    val b = s.table("supplier").select(col("s_acctbal").as("bal_b"))
    a.join(b, col("bal_a") < col("bal_b"))
      .groupBy(col("lo"))
      .agg(count(lit(1)).as("n_richer"))
      .orderBy(col("lo").asc_nulls_last)
  }

  /** J8: USING / NATURAL join (SQL form; Spark parser supports both). */
  val j8 = Q(
    "j8_using_join",
    """SELECT regionkey, r_name, n_name
      |FROM (SELECT r_regionkey AS regionkey, r_name FROM region) r
      |JOIN (SELECT n_regionkey AS regionkey, n_name FROM nation) n
      |USING (regionkey)
      |ORDER BY regionkey ASC NULLS LAST, n_name ASC NULLS LAST""".stripMargin
  ) { s =>
    s.sql("""SELECT regionkey, r_name, n_name
            |FROM (SELECT r_regionkey AS regionkey, r_name FROM region) r
            |JOIN (SELECT n_regionkey AS regionkey, n_name FROM nation) n
            |USING (regionkey)
            |ORDER BY regionkey ASC NULLS LAST, n_name ASC NULLS LAST""".stripMargin)
  }

  /** J9: LATERAL correlated subquery — top-2 suppliers per nation. */
  val j9 = Q(
    "j9_lateral_join",
    """SELECT n_nationkey, s_name
      |FROM nation, LATERAL (
      |  SELECT s_name FROM supplier
      |  WHERE s_nationkey = n_nationkey
      |  ORDER BY s_acctbal DESC NULLS LAST, s_suppkey ASC NULLS LAST
      |  LIMIT 2) top2
      |ORDER BY n_nationkey ASC NULLS LAST, s_name ASC NULLS LAST""".stripMargin
  ) { s =>
    s.sql("""SELECT n_nationkey, s_name
            |FROM nation, LATERAL (
            |  SELECT s_name FROM supplier
            |  WHERE s_nationkey = n_nationkey
            |  ORDER BY s_acctbal DESC NULLS LAST, s_suppkey ASC NULLS LAST
            |  LIMIT 2) top2
            |ORDER BY n_nationkey ASC NULLS LAST, s_name ASC NULLS LAST""".stripMargin)
  }

  /** J10: positional join — zip two explicitly sorted sides by row index
    * (SURVEY §2.3 J10; DuckDB: POSITIONAL JOIN on ordered subqueries).
    * Row index via a row_number window over the side's declared order:
    * stays in the SQL layer (codegen, no RDD round-trip, no
    * zipWithIndex count pass). The unpartitioned window is INHERENT
    * here, not a cliff — positional semantics require a total order, so
    * any implementation funnels each side through one task; the
    * operator is defined on small, explicitly-ordered inputs.
    */
  val j10 = Q(
    "j10_positional_join",
    """SELECT r.r_name, n.n_name
      |FROM (SELECT r_name FROM region ORDER BY r_name) r
      |POSITIONAL JOIN
      |(SELECT n_name FROM nation ORDER BY n_name LIMIT 5) n
      |ORDER BY r_name ASC NULLS LAST""".stripMargin
  ) { s =>
    import org.apache.spark.sql.expressions.Window
    def withPos(df: DataFrame, order: org.apache.spark.sql.Column): DataFrame =
      df.withColumn("pos", row_number().over(Window.orderBy(order)))
    val r = withPos(s.table("region").select(col("r_name")),
      col("r_name").asc_nulls_last)
    val n = withPos(s.table("nation").select(col("n_name")).orderBy(col("n_name").asc_nulls_last).limit(5),
      col("n_name").asc_nulls_last)
    r.join(n, "pos").select(col("r_name"), col("n_name"))
      .orderBy(col("r_name").asc_nulls_last)
  }


  /** J6c: large-large band join via graft.engine.RangeJoin.distanceBand —
    * the shuffle-bound form of an inequality join (a bare |a−b| ≤ w
    * predicate plans as BroadcastNestedLoop, the 100 TB scaling cliff).
    * Oracle: plain theta join, independent of the banding rewrite.
    */
  val j6c = Q(
    "j6_band_join",
    """SELECT c_custkey, s_suppkey,
      |  ROUND(c_acctbal - s_acctbal, 2) AS diff
      |FROM customer, supplier
      |WHERE abs(c_acctbal - s_acctbal) <= 1.0
      |ORDER BY c_custkey ASC NULLS LAST, s_suppkey ASC NULLS LAST""".stripMargin
  ) { s =>
    val pairs = graft.engine.RangeJoin.distanceBand(
      s.table("customer").select(col("c_custkey"), col("c_acctbal")),
      "c_acctbal",
      s.table("supplier").select(col("s_suppkey"), col("s_acctbal")),
      "s_acctbal",
      width = 1.0)
    pairs.select(col("c_custkey"), col("s_suppkey"),
      round(col("c_acctbal") - col("s_acctbal"), 2).as("diff"))
      .orderBy(col("c_custkey").asc_nulls_last, col("s_suppkey").asc_nulls_last)
  }

  /** J11 (beyond the reference): SALTED equi-join — the skew-mitigation
    * form of J1 (engine.Skew.saltedJoin). The fact side joins the
    * supplier dimension on a deliberately skew-prone key through an
    * 8-way salt; the oracle is the PLAIN join SQL, so the gate proves
    * salting is result-invariant, which is the entire point of the
    * rewrite. At 100 TB this is the shape for a hot key that AQE's
    * skew handling can't reach (hash joins, pre-aggregated inputs).
    */
  val j11 = Q(
    "j11_salted_join",
    """SELECT l.l_orderkey, l.l_linenumber, s.s_name
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |WHERE l.l_orderkey < 500
      |ORDER BY l.l_orderkey ASC NULLS LAST, l.l_linenumber ASC NULLS LAST""".stripMargin
  ) { s =>
    val l = s.table("lineitem").filter(col("l_orderkey") < 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_suppkey").as("__k"))
    val sup = s.table("supplier")
      .select(col("s_suppkey").as("__k"), col("s_name"))
    graft.engine.Skew.saltedJoin(l, sup, "__k", salt = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      .orderBy(col("l_orderkey").asc_nulls_last,
        col("l_linenumber").asc_nulls_last)
  }

  val all: Seq[Q] = Seq(j1, j2, j2b, j2c, j3, j4, j5, j6, j6b, j6c, j8, j9, j10, j11)
}
