package graft.llm

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Lloyd's k-means over an embedding column — the coarse
  * quantizer for the IVF index (SimilarityOps.v4). Each iteration is two
  * shuffle-bound DataFrame jobs, the textbook cluster layout:
  *
  *  - ASSIGN: corpus × broadcast(centroids) cross join, per-row argmax
  *    by dot/||c|| (row norm constant within the per-row window — see
  *    SimilarityOps.nearestLists); linear in the corpus, centroids ride
  *    the closure, never a shuffle of the corpus by centroid.
  *  - UPDATE: posexplode each assigned vector to (cluster, dim, value),
  *    one groupBy (cluster, dim) mean, regroup to arrays. Shuffle volume
  *    is corpus × dim scalars — the same order as reading the vectors —
  *    and the result is k×dim values, collected to the driver because
  *    the NEXT iteration broadcasts exactly that (centroids are
  *    broadcast-sized by definition or IVF doesn't work).
  *
  * Determinism (§7.4 discipline): means route through DECIMAL so
  * accumulation order can't wiggle low bits; argmax ties break on
  * cluster id; empty clusters keep their previous centroid. Same seed →
  * same clustering, run to run, any partitioning.
  */
object KMeans {

  private def dot(x: Column, y: Column): Column =
    graft.engine.expressions.VectorMath.dot(x, y)

  /** `iters` Lloyd rounds from the given initial centroids.
    *
    * @param emb       (id, vec) relation; `vecCol` must be a numeric array
    * @param init      initial centroids, cid → vector (e.g. a
    *                  deterministic sample)
    * @param l2        assign by squared-L2 (product-quantization
    *                  codebooks) instead of the default cosine argmax
    *                  (IVF coarse quantizer). ||x−c||² ranks as
    *                  ||c||² − 2·x·c — the row's own norm is constant
    *                  under the argmin, so the assign stays one dot per
    *                  (row, centroid) either way.
    * @return          cid → centroid vector, same cids as `init`
    */
  def lloyd(
      emb: DataFrame,
      vecCol: String,
      init: Seq[(Int, Array[Double])],
      iters: Int,
      l2: Boolean = false): Seq[(Int, Array[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    var cents = init
    for (_ <- 0 until iters) {
      val cdf = broadcast(
        cents.toDF("cid", "ce")
          .withColumn("cn", sqrt(dot(col("ce"), col("ce")))))
      // ASSIGN: nearest centroid per row (cosine argmax; dot/cn — the
      // row's own norm is constant under the argmax). Aggregate argmax
      // (min_by on a (−sim, cid) ordering struct), NOT a window: the
      // expanded corpus×k rows for one row id are co-located after the
      // broadcast cross join, so partial aggregation collapses them
      // map-side and the exchange carries corpus-sized data once —
      // a row_number window would shuffle the full k-fold expansion
      val score =
        if (l2) col("cn") * col("cn") - lit(2.0) * dot(col(vecCol), col("ce"))
        else -(dot(col(vecCol), col("ce")) / col("cn"))
      val assigned = emb
        .withColumn("__rid", monotonically_increasing_id())
        .crossJoin(cdf)
        .groupBy(col("__rid"))
        .agg(min_by(
          struct(col("cid"), col(vecCol).as("__v")),
          struct(score.as("s"), col("cid"))).as("best"))
        .select(col("best.cid").as("cid"), col("best.__v").as("__v"))
      // UPDATE: element-wise DECIMAL-routed mean per cluster
      val means = assigned
        .select(col("cid"), posexplode(col("__v")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("col").cast(DecimalType(30, 10))) / count(lit(1)))
          .cast(DoubleType).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), expr("transform(pm, x -> x.m)").as("ce"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      // empty clusters keep their previous centroid
      cents = cents.map { case (cid, prev) => cid -> means.getOrElse(cid, prev) }
    }
    cents
  }
}
