package graft.operators

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Q

/** Table functions, generators, sampling, reshaping — SURVEY.md §2.9
  * (T1–T7). Generators are lazy/distributed (`spark.range` partitions the
  * id space; `explode` is a Catalyst Generator — no driver materialization).
  */
object GeneratorQueries {

  /** T1: integer range + stepped/date series. */
  val t1 = Q(
    "t1_range_series",
    """SELECT r.range AS id,
      |  CAST(to_json(generate_series(1, 3)) AS VARCHAR) AS ser,
      |  CAST(to_json(generate_series(0, 10, 5)) AS VARCHAR) AS ser_step
      |FROM range(5) r
      |ORDER BY id ASC NULLS LAST""".stripMargin
  ) { s =>
    // series JSON-serialized on both sides: the verify gate row-sorts with
    // pandas, which cannot sort raw array cells
    s.range(5).toDF("id").select(
      col("id"),
      to_json(sequence(lit(1), lit(3))).as("ser"),
      to_json(sequence(lit(0), lit(10), lit(5))).as("ser_step"))
      .orderBy(col("id").asc_nulls_last)
  }

  /** T1b: date series (explode ≡ unnest of generate_series). */
  val t1b = Q(
    "t1_date_series",
    """SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-06-01',
      |                                   INTERVAL '1' MONTH)) AS DATE) AS d""".stripMargin
  ) { s =>
    s.range(1).select(
      explode(sequence(
        lit("2024-01-01").cast(DateType),
        lit("2024-06-01").cast(DateType),
        expr("INTERVAL 1 MONTH"))).as("d"))
  }

  /** T2: unnest/explode of a computed list, with per-row aggregation —
    * word histogram over a slice of the documents corpus.
    */
  val t2 = Q(
    "t2_unnest",
    """SELECT w AS word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS w
      |      FROM documents WHERE doc_id < 50) t
      |GROUP BY w
      |ORDER BY n DESC NULLS LAST, word ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("documents").filter(col("doc_id") < 50)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc_nulls_last, col("word").asc_nulls_last)
  }

  /** T2b: positional unnest (posexplode); DuckDB via generate_series
    * index join (no WITH ORDINALITY in 1.0).
    */
  val t2b = Q(
    "t2_posexplode",
    """SELECT p_partkey AS k, CAST(i.i AS INT) AS pos, l[i.i] AS v
      |FROM (SELECT p_partkey, [p_size, p_size * 2, p_size + 5] AS l
      |      FROM part WHERE p_partkey < 100) t,
      |     UNNEST(generate_series(1, len(l))) i(i)
      |ORDER BY k ASC NULLS LAST, pos ASC NULLS LAST""".stripMargin
  ) { s =>
    val sz = col("p_size")
    s.table("part").filter(col("p_partkey") < 100)
      .select(col("p_partkey").as("k"),
        posexplode(array(sz, sz * 2, sz + 5)))
      .select(col("k"), (col("pos") + 1).as("pos"), col("col").as("v"))
      .orderBy(col("k").asc_nulls_last, col("pos").asc_nulls_last)
  }

  /** T3: sampling. Engine RNG seeds aren't portable, so the ORACLE-CHECKED
    * form is a deterministic hash sample — `md5(key)` prefix bucket, the
    * standard reproducible-sampling idiom at scale (stable across runs,
    * engines, and partitionings; ~12.5% here via a 2-of-16 hex bucket).
    * Native seeded Bernoulli `.sample()` stays spec-tested in OperatorSpec.
    */
  val t3 = Q(
    "t3_sample",
    """SELECT l_orderkey, l_linenumber
      |FROM lineitem
      |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
      |             CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1')
      |ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST""".stripMargin
  ) { s =>
    // preSort: the final ORDER BY's range sampling otherwise re-runs
    // the scan + md5 filter (the query's whole body) a second time
    graft.engine.Par.preSort(
      s.table("lineitem")
        .filter(substring(md5(concat(
          col("l_orderkey").cast(StringType), lit("-"),
          col("l_linenumber").cast(StringType)).cast(BinaryType)), 1, 1)
          .isin("0", "1"))
        .select(col("l_orderkey"), col("l_linenumber")),
      col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
  }

  /** T4: PIVOT (static value list) — wide counts by linestatus. */
  val t4 = Q(
    "t4_pivot",
    """SELECT l_returnflag,
      |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F,
      |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .na.fill(0L)
      // preSort (r19): no range-sampling re-exec of the pivot aggregate;
      // the F column defeats the flag-key elision
      .transform(graft.engine.Par.preSort(_, col("l_returnflag"), col("F")))
      .orderBy(col("l_returnflag").asc_nulls_last)
  }

  /** T4b: UNPIVOT / melt. */
  val t4b = Q(
    "t4_unpivot",
    """SELECT c_custkey, k AS metric, v AS val
      |FROM (UNPIVOT (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal,
      |               CAST(c_nationkey AS DOUBLE) AS nat
      |               FROM customer WHERE c_custkey < 100)
      |      ON bal, nat INTO NAME k VALUE v)
      |ORDER BY c_custkey ASC NULLS LAST, metric ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("customer").filter(col("c_custkey") < 100)
      .select(col("c_custkey"),
        col("c_acctbal").cast(DoubleType).as("bal"),
        col("c_nationkey").cast(DoubleType).as("nat"))
      .unpivot(Array(col("c_custkey")), Array(col("bal"), col("nat")), "metric", "val")
      .orderBy(col("c_custkey").asc_nulls_last, col("metric").asc_nulls_last)
  }

  /** T5: VALUES inline table. */
  val t5 = Q(
    "t5_values",
    """SELECT i, s FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) t(i, s)
      |ORDER BY i ASC NULLS LAST""".stripMargin
  ) { s =>
    s.sql("""SELECT i, s FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) t(i, s)
            |ORDER BY i ASC NULLS LAST""".stripMargin)
  }

  /** T6: chained CTEs with reuse. */
  val t6 = Q(
    "t6_cte",
    """WITH big AS (SELECT * FROM orders WHERE o_totalprice > 250000.0),
      |     by_cust AS (SELECT o_custkey, COUNT(*) AS n FROM big GROUP BY o_custkey)
      |SELECT b.o_custkey, b.n
      |FROM by_cust b JOIN by_cust b2 ON b.o_custkey = b2.o_custkey
      |ORDER BY b.o_custkey ASC NULLS LAST""".stripMargin
  ) { s =>
    s.sql(
      """WITH big AS (SELECT * FROM orders WHERE o_totalprice > 250000.0),
        |     by_cust AS (SELECT o_custkey, COUNT(*) AS n FROM big GROUP BY o_custkey)
        |SELECT b.o_custkey, b.n
        |FROM by_cust b JOIN by_cust b2 ON b.o_custkey = b2.o_custkey
        |ORDER BY b.o_custkey ASC NULLS LAST""".stripMargin)
  }

  /** T4c: DYNAMIC pivot — the value list is discovered from the data
    * (two-pass: distinct scan, then pivot), matching DuckDB's `PIVOT …
    * ON col USING agg` which never takes a static list. Missing combos
    * are 0 (DuckDB count pivot semantics).
    */
  /** Hard cap on a dynamic pivot's discovered column set. A pivot wider
    * than this is a modeling error; the limit(max+1) keeps the distinct
    * scan's driver-side result bounded even when the input column is
    * high-cardinality at scale (the shuffle still runs, but the collect
    * can never exceed max+1 rows).
    */
  private[graft] val MaxPivotColumns = 10000

  /** Discover a pivot domain with the cardinality guard enforced, not
    * advisory: collect at most max+1 distinct values and fail fast if
    * the domain exceeds the cap.
    */
  private[graft] def pivotDomain(df: DataFrame, column: String): Seq[Any] = {
    // any pivot-key type (DuckDB pivots on ints, dates, …); NULL keys
    // are dropped from the domain — DuckDB 1.0 pinned (no NULL column)
    val values = df.select(col(column)).distinct()
      .limit(MaxPivotColumns + 1).collect().map(_.get(0)).filter(_ != null)
    if (values.length > MaxPivotColumns)
      throw new IllegalArgumentException(
        s"dynamic pivot on '$column' exceeds $MaxPivotColumns distinct values; " +
          "pivot on a lower-cardinality column or supply an explicit IN list")
    // natural ascending order when the type is comparable (2020 < 2021,
    // numerically — lexicographic would misorder), stringified otherwise
    values.sortWith {
      case (a: Comparable[_], b) if a.getClass == b.getClass =>
        a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      case (a, b) => String.valueOf(a) < String.valueOf(b)
    }.toSeq
  }

  val t4c = Q(
    "t4_pivot_dynamic",
    """PIVOT orders ON o_orderpriority USING count(*) GROUP BY o_orderstatus
      |ORDER BY o_orderstatus ASC NULLS LAST""".stripMargin
  ) { s =>
    // pass 1: the pivot column's value set, cardinality-capped
    val values = pivotDomain(s.table("orders"), "o_orderpriority")
    s.table("orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", values)
      .agg(count(lit(1)))
      .na.fill(0L)
      // preSort (r19): no range-sampling re-exec of the pivot aggregate;
      // the first pivot-value column defeats the status-key elision
      .transform(d => graft.engine.Par.preSort(d,
        col("o_orderstatus"), col(d.columns(1))))
      .orderBy(col("o_orderstatus").asc_nulls_last)
  }

  /** T6b: WITH RECURSIVE — multi-path BFS with depth over a synthetic
    * DAG derived from `nation` (a → a+4 and a → 2a+3, forward edges
    * only, so the fixpoint terminates when the frontier empties — no
    * artificial depth guard driving dead iterations). The engine runs
    * graft.engine.Recursive.fixpoint (semi-naive iteration); the oracle
    * runs DuckDB's native recursive CTE — independent implementations
    * of the same fixpoint.
    */
  val t6b: Q = Q(
    "t6_recursive_cte",
    (s: SparkSession, dir: String) => t6bBody(s, dir),
    Some("""WITH RECURSIVE edges AS (
      |  SELECT n_nationkey AS a, CAST(n_nationkey + 4 AS BIGINT) AS b
      |  FROM nation WHERE n_nationkey + 4 <= 24
      |  UNION ALL
      |  SELECT n_nationkey AS a, CAST(n_nationkey * 2 + 3 AS BIGINT) AS b
      |  FROM nation WHERE n_nationkey * 2 + 3 <= 24),
      |r(node, depth) AS (
      |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
      |  UNION
      |  SELECT e.b AS node, r.depth + 1 AS depth
      |  FROM r JOIN edges e ON e.a = r.node)
      |SELECT node, CAST(MIN(depth) AS INT) AS depth FROM r GROUP BY node
      |ORDER BY depth ASC NULLS LAST, node ASC NULLS LAST""".stripMargin))

  private def t6bBody(s: SparkSession, dir: String): DataFrame = {
    // Recursion is a micro-batch workload — ≤25-row frontiers, many
    // small jobs — so the fixpoint runs on an ISOLATED session tuned
    // for that shape: interpreted execution (codegen compile costs more
    // than interpreting tiny rows; measured 5.5s → 3.9s cold on this
    // query) and one shuffle partition. newSession() shares the
    // SparkContext and cache but not conf, so the serving session's
    // settings — and the other queries running concurrently in the
    // bench — are untouched. At 100 TB the frontier sizing flips and
    // the DEFAULT session (codegen + AQE) is the right home; the knobs
    // are per-workload, not engine-global.
    val iso = s.newSession()
    iso.conf.set("spark.sql.codegen.wholeStage", "false")
    iso.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    iso.conf.set("spark.sql.shuffle.partitions", "1")
    // AQE re-plans + stage-materializes every round's micro-job; at
    // ≤25-row deltas that's pure overhead (measured ~2× per round)
    iso.conf.set("spark.sql.adaptive.enabled", "false")
    // only the one table the recursion reads — a full register would
    // pay 10 parquet footer reads on the cold isolated session
    graft.engine.Tables.load(iso, dir, "nation").createOrReplaceTempView("nation")
    val nk = col("n_nationkey")
    // The edge relation is bounded by construction (≤25 nation keys), so
    // inline it as a MAP LITERAL: each fixpoint step becomes a pure
    // projection (explode of a map lookup) with ZERO exchanges — the
    // same data movement as a broadcast join, but the "broadcast" rides
    // the serialized plan instead of a per-round exchange job (measured
    // ~2× per round vs broadcast-join steps). This is the inlined-
    // dimension special case; unbounded edge relations keep the general
    // broadcast-join step form — Recursive.fixpoint takes any
    // DataFrame => DataFrame and doesn't care which.
    val edgeMap: Map[Long, Seq[Long]] =
      iso.table("nation").select(nk.cast(LongType)).collect().map(_.getLong(0))
        .flatMap(a => Seq(a -> (a + 4), a -> (2 * a + 3)).filter(_._2 <= 24))
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).toSeq) }
    val edgeLookup = typedLit(edgeMap)
    val seed = iso.range(1).select(lit(0L).as("node"), lit(0).as("depth"))
    // unroll 8: the +4 chain bounds the longest path at 6 hops, so one
    // unrolled round enumerates every (node, depth) pair and the second
    // is the empty-delta convergence check — 2 materializations total.
    // try_element_at (not element_at): missing key must be a no-match
    // (NULL → explode drops the row), not an ANSI error.
    val reached = graft.engine.Recursive.fixpoint(seed, maxIter = 32, unroll = 8) { frontier =>
      frontier.select(
        explode(try_element_at(edgeLookup, col("node"))).as("node"),
        (col("depth") + 1).as("depth"))
    }
    reached.groupBy(col("node"))
      .agg(min(col("depth")).cast(IntegerType).as("depth"))
      .orderBy(col("depth").asc_nulls_last, col("node").asc_nulls_last)
  }

  /** T7: DESCRIBE/SUMMARIZE as hand-written per-column statistics (one
    * row per column: count/nulls/min/max/mean), oracle-checked — the
    * `summary()` convenience form stays exercised by the gateway's
    * SUMMARIZE statement (GatewaySpec). Mean routes the double sum
    * through DECIMAL so both engines compute the identical exact value
    * (SURVEY §7.4 determinism discipline).
    */
  val t7 = Q(
    "t7_describe",
    """SELECT 'l_quantity' AS column_name,
      |  count(l_quantity) AS n,
      |  CAST(count(*) - count(l_quantity) AS BIGINT) AS n_null,
      |  CAST(min(l_quantity) AS DOUBLE) AS minv,
      |  CAST(max(l_quantity) AS DOUBLE) AS maxv,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)
      |       / count(l_quantity) AS DOUBLE) AS meanv
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_extendedprice' AS column_name,
      |  count(l_extendedprice) AS n,
      |  CAST(count(*) - count(l_extendedprice) AS BIGINT) AS n_null,
      |  CAST(min(l_extendedprice) AS DOUBLE) AS minv,
      |  CAST(max(l_extendedprice) AS DOUBLE) AS maxv,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)
      |       / count(l_extendedprice) AS DOUBLE) AS meanv
      |FROM lineitem
      |ORDER BY column_name ASC NULLS LAST""".stripMargin
  ) { s =>
    def describe(c: String) = s.table("lineitem").agg(
      count(col(c)).as("n"),
      (count(lit(1)) - count(col(c))).as("n_null"),
      min(col(c)).cast(DoubleType).as("minv"),
      max(col(c)).cast(DoubleType).as("maxv"),
      (sum(col(c).cast(DecimalType(30, 4))).cast(DoubleType) /
        count(col(c))).cast(DoubleType).as("meanv"))
      .select(lit(c).as("column_name"), col("n"), col("n_null"),
        col("minv"), col("maxv"), col("meanv"))
    describe("l_quantity").unionByName(describe("l_extendedprice"))
      .orderBy(col("column_name").asc_nulls_last)
  }

  /** S7: catalog introspection as a DataFrame (reference: duckdb_tables()
    * via /root/reference/main.go:77).
    */
  /** S7: live catalog listing, oracle-checked on the stable projection —
    * the fixture relation NAMES (both engines register the same ten
    * parquet views; DuckDB's information_schema is the oracle's catalog
    * surface). Restricted to the fixture set so concurrently-running
    * queries' temp views can't race into the row set; the LIVE listing
    * itself (listTables at plan time) is what's under test, and
    * GatewaySpec covers the DDL-visibility half.
    */
  val s7 = Q(
    "s7_catalog",
    s"""SELECT table_name AS name FROM information_schema.tables
       |WHERE table_name IN (${graft.engine.Tables.names.map(n => s"'$n'").mkString(", ")})
       |ORDER BY name ASC NULLS LAST""".stripMargin
  ) { s =>
    import s.implicits._
    val fixture = graft.engine.Tables.names.toSet
    // live SessionCatalog listing on the driver (same objects the
    // Catalog API Dataset reports) — the Dataset form ran a whole Spark
    // job of catalog-metadata RPCs per call (0.38 s at sf0.1, r8's only
    // per-query regression); the listing lands in a local relation
    graft.sources.LiveCatalog.listLive(s)
      .map(_._1).filter(fixture.contains).toDF("name")
      .orderBy(col("name").asc_nulls_last)
  }

  val all: Seq[Q] = Seq(t1, t1b, t2, t2b, t3, t4, t4b, t4c, t5, t6, t6b, t7, s7)
}
