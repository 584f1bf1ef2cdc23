package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** S3/S4 source coverage (SURVEY.md §2.1): CSV with header+inference and
  * JSON (newline-delimited) scans must round-trip the same relational
  * content as the parquet fixtures. (No DuckDB oracle: the driver's
  * oracle runs on the parquet tables only, so these are ScalaTest-gated;
  * the derived files are written to a temp dir from fixture data.)
  */
class SourceSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-src").toString

  test("S3: csv scan with header + schema inference round-trips") {
    val src = spark.read.parquet(s"$sf/nation.parquet")
    src.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.count() == 25)
    assert(back.schema("n_nationkey").dataType.typeName == "integer")
    val names = back.orderBy("n_nationkey").select("n_name")
      .collect().map(_.getString(0)).toSeq
    val expect = src.orderBy("n_nationkey").select("n_name")
      .collect().map(_.getString(0)).toSeq
    assert(names == expect)
  }

  test("S4: json scan infers nested schema and values") {
    val src = spark.read.parquet(s"$sf/region.parquet")
      .select(col("r_regionkey"), struct(col("r_name").as("name")).as("meta"))
    src.coalesce(1).write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json")
    assert(back.count() == 5)
    assert(back.select("meta.name").collect().map(_.getString(0)).toSet ==
      Set("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
  }

  test("S2: multi-file glob union") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    li.limit(10).write.mode("overwrite").parquet(s"$tmp/multi/part1")
    li.limit(5).write.mode("overwrite").parquet(s"$tmp/multi/part2")
    val all = spark.read.parquet(s"$tmp/multi/part1", s"$tmp/multi/part2")
    assert(all.count() == 15)
  }

  test("S8/S9: parquet sink round-trip preserves schema and rows") {
    val df = SparkEntry.queries("q1_pricing")(spark, sf)
    df.write.mode("overwrite").parquet(s"$tmp/q1_out")
    val back = spark.read.parquet(s"$tmp/q1_out")
    // parquet reads relax nullability; compare name+type only
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == df.count())
  }
}
