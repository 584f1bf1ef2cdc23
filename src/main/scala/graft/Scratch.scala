package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe main; not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.register(spark, "/root/testdata/sf0.001")
    for (t <- graft.engine.Tables.names) {
      val df = spark.table(t)
      println(s"== $t: ${df.count()} rows")
      df.printSchema()
    }
    spark.table("events").show(3, false)
    spark.stop()
  }
}
