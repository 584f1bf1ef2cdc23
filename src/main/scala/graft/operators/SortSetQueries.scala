package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.Q

/** Sort / limit / top-k (SURVEY.md §2.6 O1–O5) and set operations
  * (§2.7 U1–U4).
  *
  * Scale notes: ORDER BY is a range-partitioned total sort (sampled
  * boundaries — no single-reducer sort); ORDER BY + LIMIT fuses into
  * TakeOrderedAndProject (per-partition top-k + driver merge of k·p rows,
  * no shuffle of the full data); set ops are hash shuffles on all columns.
  */
object SortSetQueries {

  /** O1: multi-key ASC/DESC total sort. */
  val o1 = Q(
    "o1_multisort",
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders
      |ORDER BY o_orderstatus ASC NULLS LAST, o_totalprice DESC NULLS LAST,
      |         o_orderkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(
        col("o_orderstatus").asc_nulls_last,
        col("o_totalprice").desc_nulls_last,
        col("o_orderkey").asc_nulls_last)
  }

  /** O2: explicit NULLS FIRST/LAST (nulls injected — fixtures have none).
    * DuckDB and Spark disagree on default null order (SURVEY §2.6 O2), so
    * both sides spell it out.
    */
  val o2 = Q(
    "o2_nulls_order",
    """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
      |FROM customer WHERE c_custkey < 100
      |ORDER BY seg DESC NULLS FIRST, c_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("customer")
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey"), nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
      .orderBy(col("seg").desc_nulls_first, col("c_custkey").asc_nulls_last)
  }

  /** O3: LIMIT + OFFSET over a total order. */
  val o3 = Q(
    "o3_limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey ASC NULLS LAST LIMIT 20 OFFSET 10""".stripMargin
  ) { s =>
    s.table("orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey").asc_nulls_last)
      .offset(10).limit(20)
  }

  /** O4: top-k — Catalyst fuses to TakeOrderedAndProject (no total sort). */
  val o4 = Q(
    "o4_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
      |LIMIT 5""".stripMargin
  ) { s =>
    s.table("orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_last)
      .limit(5)
  }

  /** O5: ORDER BY computed expression. */
  val o5 = Q(
    "o5_order_by_expr",
    """SELECT p_partkey, p_name FROM part
      |ORDER BY LENGTH(p_name) ASC NULLS LAST, p_partkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("part")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(length(col("p_name")).asc_nulls_last, col("p_partkey").asc_nulls_last)
  }

  /** U1: UNION ALL + UNION (dedup) by position. */
  val u1 = Q(
    "u1_union",
    """WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000.0),
      |     b AS (SELECT s_nationkey AS k FROM supplier)
      |SELECT k, COUNT(*) AS n FROM (SELECT k FROM a UNION ALL SELECT k FROM b) u
      |GROUP BY k
      |ORDER BY k ASC NULLS LAST""".stripMargin
  ) { s =>
    val a = s.table("customer").filter(col("c_acctbal") > 9000.0)
      .select(col("c_nationkey").as("k"))
    val b = s.table("supplier").select(col("s_nationkey").as("k"))
    a.union(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k").asc_nulls_last)
  }

  /** U1b: UNION with dedup. */
  val u1b = Q(
    "u1_union_distinct",
    """SELECT c_nationkey AS k FROM customer
      |UNION SELECT s_nationkey AS k FROM supplier
      |ORDER BY k ASC NULLS LAST""".stripMargin
  ) { s =>
    val a = s.table("customer").select(col("c_nationkey").as("k"))
    val b = s.table("supplier").select(col("s_nationkey").as("k"))
    a.union(b).distinct().orderBy(col("k").asc_nulls_last)
  }

  /** U2: UNION BY NAME — columns matched by name, not position. */
  val u2 = Q(
    "u2_union_by_name",
    """SELECT r_regionkey AS key, r_name AS name FROM region
      |UNION ALL BY NAME
      |SELECT n_name AS name, n_nationkey AS key FROM nation
      |ORDER BY key ASC NULLS LAST, name ASC NULLS LAST""".stripMargin
  ) { s =>
    val a = s.table("region").select(col("r_regionkey").as("key"), col("r_name").as("name"))
    val b = s.table("nation").select(col("n_name").as("name"), col("n_nationkey").as("key"))
    a.unionByName(b).orderBy(col("key").asc_nulls_last, col("name").asc_nulls_last)
  }

  /** U3: INTERSECT + INTERSECT ALL. */
  val u3 = Q(
    "u3_intersect",
    """SELECT c_nationkey AS k FROM customer
      |INTERSECT
      |SELECT s_nationkey AS k FROM supplier
      |ORDER BY k ASC NULLS LAST""".stripMargin
  ) { s =>
    val a = s.table("customer").select(col("c_nationkey").as("k"))
    val b = s.table("supplier").select(col("s_nationkey").as("k"))
    a.intersect(b).orderBy(col("k").asc_nulls_last)
  }

  val u3b = Q(
    "u3_intersect_all",
    """WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_custkey < 50),
      |     b AS (SELECT n_nationkey AS k FROM nation)
      |SELECT k FROM a INTERSECT ALL SELECT k FROM b
      |ORDER BY k ASC NULLS LAST""".stripMargin
  ) { s =>
    val a = s.table("customer").filter(col("c_custkey") < 50).select(col("c_nationkey").as("k"))
    val b = s.table("nation").select(col("n_nationkey").as("k"))
    a.intersectAll(b).orderBy(col("k").asc_nulls_last)
  }

  /** U4: EXCEPT + EXCEPT ALL. */
  val u4 = Q(
    "u4_except",
    """SELECT n_nationkey AS k FROM nation
      |EXCEPT
      |SELECT s_nationkey AS k FROM supplier WHERE s_suppkey < 30
      |ORDER BY k ASC NULLS LAST""".stripMargin
  ) { s =>
    val a = s.table("nation").select(col("n_nationkey").as("k"))
    val b = s.table("supplier").filter(col("s_suppkey") < 30)
      .select(col("s_nationkey").as("k"))
    a.except(b).orderBy(col("k").asc_nulls_last)
  }

  val u4b = Q(
    "u4_except_all",
    """WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_custkey < 50),
      |     b AS (SELECT n_nationkey AS k FROM nation)
      |SELECT k FROM a EXCEPT ALL SELECT k FROM b
      |ORDER BY k ASC NULLS LAST""".stripMargin
  ) { s =>
    val a = s.table("customer").filter(col("c_custkey") < 50).select(col("c_nationkey").as("k"))
    val b = s.table("nation").select(col("n_nationkey").as("k"))
    a.exceptAll(b).orderBy(col("k").asc_nulls_last)
  }

  val all: Seq[Q] = Seq(o1, o2, o3, o4, o5, u1, u1b, u2, u3, u3b, u4, u4b)
}
