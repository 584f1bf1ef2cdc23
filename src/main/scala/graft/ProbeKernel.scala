package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: isolated throughput of the IVF assignment kernel
  * (IvfNearest top-n over a k×dim centroid matrix) — flops/s with and
  * without whole-stage codegen, to attribute the tier-3 assignment
  * wall. Usage: runMain graft.ProbeKernel [rows] [k] [dim] [n]
  */
object ProbeKernel {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(5102)
    val dim = args.drop(2).headOption.map(_.toInt).getOrElse(32)
    val n = args.drop(3).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rng = new java.util.Random(7)
    val cents = Array.fill(k)(Array.fill(dim)(rng.nextDouble()))
    val cn = graft.engine.expressions.IvfNearest.norms(cents)
    spark.range(rows).select(col("id"),
      expr(s"transform(sequence(1, $dim), i -> " +
        "cast(pmod(hash(id, i), 1000) as double) / 1000.0)").as("v"))
      .write.mode("overwrite").parquet("/tmp/kbench_vecs")
    val vecs = spark.read.parquet("/tmp/kbench_vecs")
    for (wscg <- Seq("true", "false"); pass <- 1 to 2) {
      spark.conf.set("spark.sql.codegen.wholeStage", wscg)
      val t0 = System.nanoTime()
      val cells = vecs.select(element_at(
          graft.engine.expressions.IvfNearest(col("v"), cents, cn, false, n),
          1).as("c"))
        .groupBy("c").count().count()
      val w = (System.nanoTime() - t0) / 1e9
      val gflops = rows.toDouble * k * dim * 2 / w / 1e9
      System.err.println(
        f"[kbench] wscg=$wscg pass=$pass n=$n cells=$cells wall=$w%.1fs " +
          f"dot-gflops=$gflops%.2f")
    }
    spark.stop()
  }
}
