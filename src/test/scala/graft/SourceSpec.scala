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

  test("read_* scanner options (DuckDB 1.0 pinned): delim, columns, names, filename, lists") {
    val gw = graft.engine.Gateway.open(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-io")
    val csv = dir.resolve("a.csv")
    java.nio.file.Files.writeString(csv, "x|y\n1|foo\n2|bar\n")
    val jsonArr = dir.resolve("b.json")
    java.nio.file.Files.writeString(jsonArr, """[{"a":1},{"a":2}]""")
    def rows(q: String) = gw.sql(q).collect()

    // delim + header (DuckDB: [(1,'foo'),(2,'bar')], x inferred integral)
    val r1 = rows(s"SELECT * FROM read_csv('$csv', delim='|', header=true) ORDER BY x")
    assert(r1.map(r => (r.get(0).toString.toLong, r.getString(1))).toSeq ==
      Seq((1L, "foo"), (2L, "bar")))
    // all_varchar: everything strings
    val r2 = rows(s"SELECT * FROM read_csv('$csv', delim='|', header=true, all_varchar=true) ORDER BY x")
    assert(r2.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "foo"), ("2", "bar")))
    // explicit columns schema — typed exactly, no inference pass
    val r3 = gw.sql(
      s"SELECT * FROM read_csv('$csv', delim='|', columns={'x':'BIGINT','y':'VARCHAR'}) ORDER BY x")
    assert(r3.schema("x").dataType.typeName == "long")
    assert(r3.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "foo"), (2L, "bar")))
    // filename=true appends the source path, DuckDB spelling (no scheme)
    val r4 = rows(s"SELECT filename, x FROM read_csv('$csv', delim='|', header=true, filename=true) ORDER BY x LIMIT 1")
    assert(r4.head.getString(0) == csv.toString, r4.head.getString(0))
    // json format='array' (one top-level array per file)
    val r5 = rows(s"SELECT a FROM read_json('$jsonArr', format='array') ORDER BY a")
    assert(r5.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // multi-file list + union_by_name
    val r6 = rows("SELECT count(*) AS n FROM read_parquet(" +
      s"['$sf/nation.parquet','$sf/region.parquet'], union_by_name=true)")
    assert(r6.head.getLong(0) == 30L)
    // unsupported options are a diagnostic, never a silent semantic drop
    val e = intercept[Exception](rows(
      s"SELECT * FROM read_csv('$csv', new_line='foo')"))
    assert(e.getMessage.contains("unsupported option"), e.getMessage)
  }
}
