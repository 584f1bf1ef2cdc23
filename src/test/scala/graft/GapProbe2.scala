package graft

object GapProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val gw = graft.engine.Gateway.open(spark, TestSpark.sf)
    val probes = Seq(
      "SELECT product(l_linenumber) FROM lineitem WHERE l_orderkey < 10",
      "SELECT entropy(o_orderstatus) FROM orders",
      "SELECT histogram(o_orderstatus) FROM orders",
      "SELECT quantile_cont(o_totalprice, 0.5) FROM orders",
      "SELECT quantile_disc(o_totalprice, 0.5) FROM orders",
      "SELECT quantile_cont(o_totalprice, [0.25, 0.5]) FROM orders",
      "SELECT mad(o_totalprice) FROM orders",
      "SELECT arg_min(o_orderkey, o_totalprice), arg_max(o_orderkey, o_totalprice) FROM orders",
      "SELECT bit_xor(o_orderkey) FROM orders",
      "SELECT bool_and(o_totalprice > 0), bool_or(o_totalprice > 1e9) FROM orders",
      "SELECT favg(o_totalprice), fsum(o_totalprice) FROM orders",
      "SELECT skewness(o_totalprice), kurtosis(o_totalprice) FROM orders",
      "SELECT regr_slope(o_totalprice, o_orderkey), regr_r2(o_totalprice, o_orderkey) FROM orders",
      "SELECT corr(o_totalprice, o_orderkey), covar_samp(o_totalprice, o_orderkey) FROM orders",
      "SELECT median(o_totalprice) FROM orders",
      "SELECT approx_quantile(o_totalprice, 0.5) FROM orders",
      "SELECT string_agg(DISTINCT o_orderstatus, ',') FROM orders",
      "SELECT count(*) FILTER (o_totalprice > 1000) FROM orders",
      "SELECT last(o_orderkey ORDER BY o_totalprice) FROM orders",
      "SELECT date_trunc('week', TIMESTAMP '2024-01-10 01:02:03')",
      "SELECT epoch_ns(TIMESTAMP '2024-01-01')",
      "SELECT timezone('UTC', TIMESTAMP '2024-01-01')",
      "SELECT to_days(30), to_hours(5)",
      "SELECT current_setting('TimeZone')",
      "SELECT dayofweek(DATE '2024-01-07'), dayofyear(DATE '2024-02-01')",
      "SELECT datetrunc('month', DATE '2024-02-15')",
      "SELECT timestamp '2024-01-01' + INTERVAL 3 DAY",
      "SELECT INTERVAL '3 days'",
      "SELECT nextafter(1.0, 2.0)",
      "SELECT xor(5, 3)",
      "SELECT ntile(4) OVER (ORDER BY o_orderkey), cume_dist() OVER (ORDER BY o_orderkey) FROM orders LIMIT 3",
      "SELECT mode() WITHIN GROUP (ORDER BY o_orderstatus) FROM orders",
      "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) FROM orders",
      "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) FROM orders"
    )
    var fails = 0
    probes.foreach { q =>
      try { gw.sql(q).collect() }
      catch { case e: Throwable =>
        fails += 1
        println(s"GAP: $q  => ${e.getMessage.linesIterator.find(_.trim.nonEmpty).getOrElse("").take(110)}")
      }
    }
    println(s"GAPTOTAL: $fails of ${probes.length}")
    spark.stop()
  }
}
