package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM fork, build.sbt). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same ANSI default as Verify/Bench/Serve (SURVEY §7.3)
      .config("spark.sql.ansi.enabled", "true")
      // native TimeType, same as the Verify/Bench/Gateway builders —
      // f_time no longer mutates session conf from inside its lambda
      .config("spark.sql.timeType.enabled", "true")
      // the full serving stack (dialect parser + ASOF strategy +
      // ReadOnlyGuard) — every spec's SQL exercises the injected parser
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // serving contract, same as Verify/Bench: the SHARED session's
    // function registry is immutable — a spec needing the dialect
    // builds a child session (Functions.isolated / newSession). A late
    // register here throws, which is the canary this freeze exists for
    // (r8: a concurrent register flipped f_math's factorial mid-run).
    graft.engine.Functions.freeze(s)
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class QuerySpec extends AnyFunSuite {
  import TestSpark._

  test("entry smoke: >0 rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at sf0.001 and most return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("q1_pricing: 6 groups (3 returnflags × 2 linestatus)") {
    val rows = SparkEntry.queries("q1_pricing")(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(0)).toSet == Set("A", "N", "R"))
  }

  test("every query with an oracle has matching column aliases discipline") {
    // oracleSql keys must be a subset of queries keys
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("dd_semantic_ivf renders its trained centroids into the oracle at dump time") {
    // run once so the quantizer is trained+memoized for this dataset
    SparkEntry.queries("dd_semantic_ivf")(spark, sf).count()
    val sql = SparkEntry.oracleSql("dd_semantic_ivf")
    assert(sql.contains("WITH cents(cid, c, nrm) AS (VALUES"),
      "oracle must embed the centroid VALUES table")
    // all 16 trained lists ride as DOUBLE[] literals
    (0 until graft.llm.DedupOps.SemanticIvfLists).foreach { i =>
      assert(sql.contains(s"($i, ["), s"centroid $i missing from oracle")
    }
    // rendering is deterministic for a fixed dataset (memoized training)
    assert(SparkEntry.oracleSql("dd_semantic_ivf") == sql,
      "dynamic oracle must be stable across dumps of the same dataset")
  }
}
