package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev sweep for the graph-index label-kNN: build each label cell's
  * HNSW ONCE, then probe recall@3 at several efS values using only the
  * ~1k-vector exact-reference sample (full-corpus queries are the wall;
  * the recall estimate doesn't need them).
  * Usage: runMain graft.ProbeHnswSweep [dir] [m] [efC] [efS,efS,...]
  */
object ProbeHnswSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val efC = args.drop(2).headOption.map(_.toInt).getOrElse(128)
    val efSs = args.drop(3).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(96, 128, 192, 256, 384))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Tables.register(spark, dir)
    import spark.implicits._

    val nEmb = spark.table("embeddings").count()
    val sampleIds = spark.table("embeddings")
      .filter(graft.llm.SimilarityOps.labelKnnSamplePred(1000, nEmb))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    System.err.println(s"[sweep] sample=${sampleIds.size} of $nEmb")
    val sampleBc = spark.sparkContext.broadcast(sampleIds)
    val efList = efSs

    val t0 = System.nanoTime()
    val hits = spark.table("embeddings")
      .select(col("label"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (label: Int, it: Iterator[(Int, Long, Array[Float])]) =>
        val cell = it.toArray.sortBy(_._2)
        val ids = cell.map(_._2)
        val vecs = cell.map(_._3)
        val tb = System.nanoTime()
        val h = graft.llm.Hnsw.build(vecs, m, efC)
        System.err.println(f"[sweep] label=$label n=${ids.length} " +
          f"build=${(System.nanoTime() - tb) / 1e9}%.1fs")
        val probe = ids.indices.filter(i => sampleBc.value.contains(ids(i)))
        val oi = new Array[Int](3); val os = new Array[Double](3)
        val tq = System.nanoTime()
        // explicit loops: oi/os are SHARED buffers — results must be
        // copied out before the next search overwrites them
        val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
        for (ef <- efList; i <- probe) {
          val c = h.searchTopK(i, ef, 3, oi, os)
          var t = 0
          while (t < c) { out += ((ef, ids(i), ids(oi(t)))); t += 1 }
        }
        System.err.println(f"[sweep] label=$label query(${probe.size}x" +
          f"${efList.size})=${(System.nanoTime() - tq) / 1e9}%.1fs")
        out.iterator
      }.collect()
    System.err.println(f"[sweep] total=${(System.nanoTime() - t0) / 1e9}%.1fs")

    val exact = graft.engine.CacheOnce.scoped {
      graft.llm.SimilarityOps.labelKnnExactSample(spark)
        .select(col("vec_id"), col("nb")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    efList.foreach { ef =>
      val approx = hits.collect { case (e, v, nb) if e == ef => (v, nb) }.toSet
      System.err.println(f"[sweep] efS=$ef%4d recall@3=" +
        f"${approx.intersect(exact).size.toDouble / exact.size}%.4f")
    }
    spark.stop()
  }
}
