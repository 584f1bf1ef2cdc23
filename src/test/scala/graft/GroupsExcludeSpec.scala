package graft

import org.scalatest.funsuite.AnyFunSuite

/** GROUPS frames COMPOSED with EXCLUDE (r12 verdict task 3 — the last
  * loud-error window shape). DuckDB 1.0 can't oracle GROUPS at all, so
  * the pin is three-legged:
  *   1. a 360-cell randomized sweep against an INDEPENDENT Scala
  *      reference evaluator implementing the SQL:2011 GROUPS-frame +
  *      frame-exclusion semantics directly (peer groups by null-safe
  *      key equality, frame bounds in group units, exclusion before
  *      aggregation) — tied order keys throughout, the case the
  *      peer-distinct differential can't see;
  *   2. a distinct-key differential: with unique order keys every peer
  *      group is a singleton, so GROUPS ≡ ROWS must hold for EVERY
  *      aggregate and mode — including the order-sensitive collect
  *      family, checked against the (r12 value-pinned) ROWS×EXCLUDE
  *      path;
  *   3. hand-computed literal pins for the tied corner cases.
  */
class GroupsExcludeSpec extends AnyFunSuite {
  import TestSpark._

  // ---- the independent reference evaluator --------------------------

  private case class R(id: Int, g: Int, k: Option[Int], v: Option[Int])

  /** Frame bound in GROUP units: None = unbounded, Some(d) = offset d
    * from the current row's peer group (negative = preceding).
    */
  private def frameRows(part: Seq[R], cur: R,
      lo: Option[Int], hi: Option[Int], mode: String): Seq[R] = {
    // peer groups in ORDER BY k ASC NULLS LAST order (null==null)
    val sorted = part.sortBy(r => (r.k.isEmpty, r.k.getOrElse(0), r.id))
    val groups = scala.collection.mutable.ArrayBuffer[Vector[R]]()
    sorted.foreach { r =>
      if (groups.nonEmpty && groups.last.head.k == r.k)
        groups(groups.length - 1) = groups.last :+ r
      else groups += Vector(r)
    }
    val gi = groups.indexWhere(_.exists(_.id == cur.id))
    val glo = lo.map(d => math.max(0, gi + d)).getOrElse(0)
    val ghi = hi.map(d => math.min(groups.length - 1, gi + d))
      .getOrElse(groups.length - 1)
    val inFrame =
      if (glo > ghi) Vector.empty[R]
      else (glo to ghi).flatMap(groups(_)).toVector
    mode match {
      case "NO OTHERS" => inFrame
      case "CURRENT ROW" => inFrame.filterNot(_.id == cur.id)
      case "GROUP" => inFrame.filterNot(_.k == cur.k)
      case "TIES" => inFrame.filter(r => r.k != cur.k || r.id == cur.id)
    }
  }

  private def refAgg(agg: String, rows: Seq[R]): Option[Any] = agg match {
    case "COUNT(*)" => Some(rows.size.toLong)
    case "COUNT(v)" => Some(rows.count(_.v.isDefined).toLong)
    case "SUM(v)" =>
      val vs = rows.flatMap(_.v)
      if (vs.isEmpty) None else Some(vs.map(_.toLong).sum)
    case "MIN(v)" =>
      val vs = rows.flatMap(_.v); if (vs.isEmpty) None else Some(vs.min)
    case "MAX(v)" =>
      val vs = rows.flatMap(_.v); if (vs.isEmpty) None else Some(vs.max)
    case "AVG(v)" =>
      val vs = rows.flatMap(_.v)
      if (vs.isEmpty) None
      else Some(vs.map(_.toLong).sum.toDouble / vs.size)
  }

  private def cellEq(agg: String, got: Any, want: Option[Any]): Boolean =
    (got, want) match {
      case (null, None) => true
      case (null, _) | (_, None) => false
      case (g: Double, Some(w: Double)) =>
        math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w))
      case (g, Some(w)) => g == w
    }

  private def frameSql(lo: Option[Int], hi: Option[Int]): String = {
    def b(o: Option[Int], side: String) = o match {
      case None => s"UNBOUNDED $side"
      case Some(0) => "CURRENT ROW"
      case Some(d) if d < 0 => s"${-d} PRECEDING"
      case Some(d) => s"$d FOLLOWING"
    }
    s"BETWEEN ${b(lo, "PRECEDING")} AND ${b(hi, "FOLLOWING")}"
  }

  test("360-cell sweep: GROUPS×EXCLUDE equals the SQL:2011 reference on tied keys") {
    val rnd = new scala.util.Random(1301)
    val aggs = Seq("COUNT(*)", "COUNT(v)", "SUM(v)", "MIN(v)", "MAX(v)", "AVG(v)")
    val modes = Seq("CURRENT ROW", "GROUP", "TIES")
    var cells = 0
    for (ds <- 0 until 20) {
      val n = 30 + rnd.nextInt(40)
      val rows = (0 until n).map { i =>
        R(i, rnd.nextInt(3),
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(5)), // heavy ties
          if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(100) - 50))
      }
      val frames = Seq(
        (Some(-1), Some(1)), (None, Some(0)), (Some(0), None),
        (Some(-2), Some(-1)), (None, None), (Some(-1), Some(2)))
      val picked = rnd.shuffle(frames).take(3)
      // one statement computes every (agg × mode) for 3 frames
      val exprs = for {
        ((lo, hi), fi) <- picked.zipWithIndex
        (a, ai) <- aggs.zipWithIndex
        (m, mi) <- modes.zipWithIndex
      } yield (s"c${fi}_${ai}_$mi",
        s"$a OVER (PARTITION BY g ORDER BY k ASC NULLS LAST " +
          s"GROUPS ${frameSql(lo, hi)} EXCLUDE $m) AS c${fi}_${ai}_$mi",
        (lo, hi), a, m)
      import spark.implicits._
      rows.map(r => (r.id, r.g, r.k, r.v))
        .toDF("id", "g", "k", "v").createOrReplaceTempView("gx_t")
      val sql = s"SELECT id, ${exprs.map(_._2).mkString(", ")} FROM gx_t"
      val got = spark.sql(graft.engine.Dialect.rewrite(sql)).collect()
        .map(r => r.getInt(0) -> r).toMap
      val parts = rows.groupBy(_.g)
      rows.foreach { cur =>
        val part = parts(cur.g)
        exprs.foreach { case (cn, _, (lo, hi), a, m) =>
          val want = refAgg(a, frameRows(part, cur, lo, hi, m))
          val gotV = got(cur.id).getAs[Any](cn)
          assert(cellEq(a, gotV, want),
            s"ds=$ds id=${cur.id} $a GROUPS ${frameSql(lo, hi)} EXCLUDE $m: " +
              s"got $gotV want $want")
        }
      }
      cells += exprs.size
    }
    assert(cells >= 360, s"sweep too small: $cells cells")
  }

  test("distinct keys: GROUPS ≡ ROWS for every aggregate incl. the collect family") {
    val rnd = new scala.util.Random(1302)
    val aggs = Seq("SUM(v)", "COUNT(*)", "MIN(v)", "ARRAY_AGG(v)",
      "FIRST(v)", "STRING_AGG(v, ',')")
    val modes = Seq("CURRENT ROW", "GROUP", "TIES", "NO OTHERS")
    for (ds <- 0 until 10) {
      val n = 25 + rnd.nextInt(25)
      val keys = rnd.shuffle((0 until 200).toList).take(n) // unique keys
      val rows = (0 until n).map { i =>
        R(i, rnd.nextInt(2), Some(keys(i)),
          if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(50)))
      }
      val (lo, hi) = Seq((Some(-2), Some(1)), (None, Some(0)),
        (Some(-1), Some(1)))(rnd.nextInt(3))
      val exprs = for {
        (a, ai) <- aggs.zipWithIndex
        (m, mi) <- modes.zipWithIndex
        (fm, fn) <- Seq("GROUPS" -> "g", "ROWS" -> "r")
      } yield s"$a OVER (PARTITION BY g ORDER BY k ASC NULLS LAST " +
        s"$fm ${frameSql(lo, hi)} EXCLUDE $m) AS ${fn}_${ai}_$mi"
      import spark.implicits._
      rows.map(r => (r.id, r.g, r.k, r.v))
        .toDF("id", "g", "k", "v").createOrReplaceTempView("gx_t")
      val sql = s"SELECT id, ${exprs.mkString(", ")} FROM gx_t"
      val got = spark.sql(graft.engine.Dialect.rewrite(sql)).collect()
      got.foreach { r =>
        for (ai <- aggs.indices; mi <- modes.indices) {
          val g = r.getAs[Any](s"g_${ai}_$mi")
          val w = r.getAs[Any](s"r_${ai}_$mi")
          assert(if (g == null) w == null else g == w,
            s"ds=$ds id=${r.getInt(0)} ${aggs(ai)} EXCLUDE ${modes(mi)}: " +
              s"GROUPS=$g ROWS=$w")
        }
      }
    }
  }

  test("window-FILTER x GROUPS x EXCLUDE sweep: collect family vs the reference") {
    // the r13 residual, served in r14: FIRST/LAST/ANY_VALUE/ARRAY_AGG
    // with FILTER over a GROUPS frame composed with EXCLUDE. The
    // collect fold strips the EXCLUDE, emits GROUPS windows, and the
    // (later) GROUPS pass rewrites them to the rank-keyed RANGE
    // spelling. Reference = frameRows (SQL:2011 groups + exclusion) →
    // FILTER pred → positional/collect semantics. (pred, v) are
    // PEER-UNIFORM functions of the order key, so tied intra-peer
    // collect order — unspecified in both engines — cannot leak into
    // the compared values.
    val rnd = new scala.util.Random(1403)
    def predOf(k: Option[Int]): Boolean = k.exists(_ % 2 == 0)
    def vOf(k: Option[Int]): Option[Int] =
      k.flatMap(kk => if (kk % 3 == 0) None else Some(kk * 7))
    // FIRST/LAST/ANY_VALUE/ARRAY_AGG exercise the collect fold; SUM and
    // COUNT exercise the CASE-WHEN arm composed with the same
    // EXCLUDE-subtraction + GROUPS passes
    val fns = Seq("FIRST", "LAST", "ANY_VALUE", "ARRAY_AGG", "SUM", "COUNT")
    val modes = Seq("NO OTHERS", "CURRENT ROW", "GROUP", "TIES")
    var cells = 0
    for (ds <- 0 until 6) {
      val n = 24 + rnd.nextInt(24)
      val rows = (0 until n).map { i =>
        val k = if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(6))
        R(i, rnd.nextInt(2), k, vOf(k))
      }
      import spark.implicits._
      rows.map(r => (r.id, r.g, r.k, r.v))
        .toDF("id", "g", "k", "v").createOrReplaceTempView("gxf_t")
      val frames = Seq(
        (Some(-1), Some(1)), (None, Some(0)), (Some(0), None), (None, None))
      for (m <- modes) {
        val exprs = for {
          ((lo, hi), fi) <- frames.zipWithIndex
          (f, ai) <- fns.zipWithIndex
        } yield (s"c${fi}_$ai", f, (lo, hi),
          s"$f(v) FILTER (WHERE k % 2 = 0) OVER (PARTITION BY g " +
            s"ORDER BY k ASC NULLS LAST GROUPS ${frameSql(lo, hi)} " +
            s"EXCLUDE $m) AS c${fi}_$ai")
        val sql = s"SELECT id, ${exprs.map(_._4).mkString(", ")} FROM gxf_t"
        val got = spark.sql(graft.engine.Dialect.rewrite(sql)).collect()
          .map(r => r.getInt(0) -> r).toMap
        val parts = rows.groupBy(_.g)
        rows.foreach { cur =>
          val part = parts(cur.g)
          exprs.foreach { case (cn, f, (lo, hi), _) =>
            val kept = frameRows(part, cur, lo, hi, m).filter(r => predOf(r.k))
            val want: Any = f match {
              case "FIRST" => kept.headOption.flatMap(_.v).orNull
              case "LAST" => kept.lastOption.flatMap(_.v).orNull
              case "ANY_VALUE" => kept.flatMap(_.v).headOption.orNull
              case "ARRAY_AGG" =>
                if (kept.isEmpty) null
                else kept.map(_.v.map(x => x: Any).orNull)
              case "SUM" =>
                val vs = kept.flatMap(_.v)
                if (vs.isEmpty) null else vs.map(_.toLong).sum
              case "COUNT" => kept.count(_.v.isDefined).toLong
            }
            val gotV = got(cur.id).getAs[Any](cn) match {
              case s: scala.collection.Seq[_] => s.toSeq
              case x => x
            }
            assert(gotV == want,
              s"ds=$ds id=${cur.id} $f FILTER GROUPS ${frameSql(lo, hi)} " +
                s"EXCLUDE $m: got $gotV want $want")
            cells += 1
          }
        }
      }
    }
    assert(cells >= 300, s"sweep too small: $cells value cells")
  }

  test("rank reuse is confined to the pass's own wrapper chain (r14, ADVICE r13)") {
    import spark.implicits._
    // A user FROM-subquery exposing a column whose declaration matches
    // the injected-rank SIGNATURE exactly (`dense_rank() OVER (ORDER BY
    // k) AS __gdr` — the text a view expansion of an earlier rewrite
    // carries). The outer GROUPS window must NOT reuse it: that rank is
    // keyed to the UNFILTERED inner rowset, and after WHERE k <> 2 it
    // has gaps, so RANGE over it silently diverges from the GROUPS
    // frame (buggy reuse here: 10/70/70 instead of 40/80/70). The fix
    // only reuses ranks declared in this scope's own
    // `( … ) __graft_groupsN` wrappers.
    Seq((0, 1, 10), (1, 2, 20), (2, 3, 30), (3, 4, 40))
      .toDF("id", "k", "v").createOrReplaceTempView("gx_nest")
    val sql = """SELECT id,
      |SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s
      |FROM (SELECT id, k, v, dense_rank() OVER (ORDER BY k) AS __gdr FROM gx_nest) u
      |WHERE k <> 2 ORDER BY id""".stripMargin
    val got = spark.sql(graft.engine.Dialect.rewrite(sql)).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == Seq((0, 40L), (2, 80L), (3, 70L)))
    // and genuine same-scope reuse still works: two windows over one
    // spec share ONE injected rank (no stacked wrappers)
    val sql2 = """SELECT id,
      |SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s1,
      |COUNT(*) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS c1
      |FROM gx_nest ORDER BY id""".stripMargin
    val rewritten = graft.engine.Dialect.rewrite(sql2)
    assert("__graft_groups".r.findAllIn(rewritten).size == 1, rewritten)
    val got2 = spark.sql(rewritten).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got2.toSeq == Seq((0, 30L, 2L), (1, 60L, 3L), (2, 90L, 3L), (3, 70L, 2L)))
  }

  test("hand-pinned tied corners") {
    import spark.implicits._
    // g=0, k tied pairs: ids 0,1 share k=1; ids 2,3 share k=2; id 4 k=3
    Seq((0, 0, 1, 10), (1, 0, 1, 20), (2, 0, 2, 30), (3, 0, 2, 40),
      (4, 0, 3, 50))
      .toDF("id", "g", "k", "v").createOrReplaceTempView("gx_pin")
    val sql = """SELECT id,
      |SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS xg,
      |SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS xt,
      |SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS xc
      |FROM gx_pin ORDER BY id""".stripMargin
    val got = spark.sql(graft.engine.Dialect.rewrite(sql)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // frame(id0) = groups{k=1,k=2} = {10,20,30,40}
    //   EXCLUDE GROUP drops k=1 → 70; TIES drops 20 keeps own 10 → 80;
    //   CURRENT ROW drops own 10 → 90
    // frame(id2) = all = 150; GROUP drops k=2 → 80; TIES → 110; CUR → 120
    // frame(id4) = groups{k=2,k=3} = 120; GROUP drops 50 → 70;
    //   TIES keeps own → 120; CUR drops own → 70
    assert(got.toSeq == Seq(
      (0, 70L, 80L, 90L), (1, 70L, 90L, 80L),
      (2, 80L, 110L, 120L), (3, 80L, 120L, 110L),
      (4, 70L, 120L, 70L)))
  }
}
