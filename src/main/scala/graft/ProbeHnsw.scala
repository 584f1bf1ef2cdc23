package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r13 graph-index label-kNN path: wall, stage-level
  * shuffle/spill, and recall@3 vs the sampled exact in-label reference
  * at a given (m, efC, efS) — optionally through the r14 monster-cell
  * shard composition (shardThreshold/shardProbes force it at any tier).
  * Usage: runMain graft.ProbeHnsw [dir] [efS] [m] [efC] [exactBelow]
  *          [shardThreshold] [shardProbes]
  */
object ProbeHnsw {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val efS = args.drop(1).headOption.map(_.toInt).getOrElse(96)
    val m = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val efC = args.drop(3).headOption.map(_.toInt).getOrElse(128)
    val exactBelow = args.drop(4).headOption.map(_.toInt).getOrElse(4096)
    val shardThreshold = args.drop(5).headOption.map(_.toInt).getOrElse(1 << 20)
    val shardProbes = args.drop(6).headOption.map(_.toInt).getOrElse(0) // 0 = derived policy (shardProbesFor), the production default
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Tables.register(spark, dir)

    val spill = new java.util.concurrent.atomic.AtomicLong
    val shuffle = new java.util.concurrent.atomic.AtomicLong
    val peak = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val mt = te.taskMetrics
        if (mt != null) {
          spill.addAndGet(mt.diskBytesSpilled)
          shuffle.addAndGet(mt.shuffleWriteMetrics.bytesWritten)
          peak.getAndAccumulate(mt.peakExecutionMemory, math.max)
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val cpu = Option(i.taskMetrics).map(_.executorCpuTime / 1e9).getOrElse(-1.0)
        val run = Option(i.taskMetrics).map(_.executorRunTime / 1e3).getOrElse(-1.0)
        System.err.println(f"[stage] ${i.stageId}%3d tasks=${i.numTasks}%4d " +
          f"run=${run}%8.1fs cpu=${cpu}%8.1fs  ${i.name.takeWhile(_ != '(')}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val df = graft.llm.SimilarityOps
      .labelKnnHnsw(spark, exactBelow, m, efC, efS, shardThreshold, shardProbes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t1 = System.nanoTime()
    val n = df.count()
    spark.sparkContext.removeSparkListener(listener)
    System.err.println(f"[probe] hnsw query: ${(System.nanoTime() - t1) / 1e9}%.1fs " +
      f"rows=$n spill=${spill.get / 1e9}%.1fGB " +
      f"shuffle=${shuffle.get / 1e6}%.0fMB peakTask=${peak.get / 1e6}%.0fMB")
    val nEmb = spark.table("embeddings").count()
    def edges(d: org.apache.spark.sql.DataFrame) =
      graft.engine.CacheOnce.scoped {
        d.select(col("vec_id"), col("nb")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    val exact = edges(graft.llm.SimilarityOps.labelKnnExactSample(spark))
    val approx = edges(
      df.filter(graft.llm.SimilarityOps.labelKnnSamplePred(1000, nEmb)))
    System.err.println(f"[probe] recall@3 = " +
      f"${approx.intersect(exact).size.toDouble / exact.size}%.4f " +
      f"(efS=$efS m=$m efC=$efC exactBelow=$exactBelow " +
      f"shardThreshold=$shardThreshold shardProbes=$shardProbes)")
    spark.stop()
  }
}
