package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: time one query end-to-end outside the bench harness. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Tables.register(spark, sfDir)
    spark.table("lineitem").groupBy("l_returnflag").count().collect()
    val name = args.headOption.getOrElse("t6_recursive_cte")
    sys.env.get("PROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(s"[probe] run $i: ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
