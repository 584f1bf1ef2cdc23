package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.engine.OutputContract

/** The output-edge type contract as a build-time gate (VERDICT r9 item
  * 2): two consecutive rounds shipped a DECIMAL-typed final column
  * (r8 f_math.bigfact, r9 q8_market_share) that was value-correct but
  * hash-red at the driver. Prose didn't hold; this spec retro-fails any
  * reintroduction before the driver ever sees it (Verify additionally
  * enforces the same check at dump time).
  */
class OutputContractSpec extends AnyFunSuite {
  import TestSpark._

  test("no declared query emits DECIMAL/interval/instant-timestamp at the output edge") {
    val bad = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val vs = OutputContract.violations(fn(spark, sf).schema)
      if (vs.isEmpty) Nil else Seq(s"$name -> ${vs.mkString("; ")}")
    }
    assert(bad.isEmpty, s"\noutput-type contract violations:\n${bad.mkString("\n")}")
  }

  test("the gate itself catches the r9 regressions (retro-fail check)") {
    // exactly q8's old output shape: DECIMAL(18,6) ratio
    val q8old = StructType(Seq(
      StructField("o_year", IntegerType),
      StructField("mkt_share", DecimalType(18, 6))))
    assert(OutputContract.violations(q8old).exists(_.contains("mkt_share")))
    // exactly f_math's old bigfact: DECIMAL(38,0) HUGEINT carrier
    val fmOld = StructType(Seq(StructField("bigfact", DecimalType(38, 0))))
    assert(OutputContract.violations(fmOld).nonEmpty)
    // nested decimal is caught too (comparator descends into objects)
    val nested = StructType(Seq(StructField("s",
      StructType(Seq(StructField("d", DecimalType(10, 2)))))))
    assert(OutputContract.violations(nested).exists(_.contains("s.d")))
    // instant timestamp flagged, NTZ passes
    assert(OutputContract.violations(
      StructType(Seq(StructField("t", TimestampType)))).nonEmpty)
    assert(OutputContract.violations(StructType(Seq(
      StructField("t", TimestampNTZType),
      StructField("d", DoubleType),
      StructField("s", StringType)))).isEmpty)
    intercept[IllegalStateException] {
      OutputContract.enforce("q8_market_share", q8old)
    }
  }
}
