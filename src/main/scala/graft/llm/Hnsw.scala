package graft.llm

/** Deterministic in-memory HNSW (Malkov & Yashunin, arXiv:1603.09320)
  * over ONE label cell's vectors — the structural remedy for flat IVF's
  * measured recall decay (SCALE.md r12 frontier ladder: recall@3 0.835
  * at the 100× tier → 0.5685 at 1000× at constant probe budget).
  *
  * Why a graph index: flat IVF's recall tracks probe COVERAGE, so
  * holding recall while the corpus grows means per-vector work grows
  * ~linearly with the corpus (total ~quadratic). A navigable
  * small-world graph replaces coverage with O(log n) greedy routing:
  * build is ~n·efC distance evaluations, query ~efS·log n — total work
  * stays sub-quadratic at every tier, and recall is set by ef, not by
  * the corpus size.
  *
  * DESIGN CONSTRAINTS (all load-bearing):
  *  - Fully deterministic: level assignment is splitmix64 of the node
  *    INDEX (callers insert in sorted-vec_id order), every comparison
  *    breaks ties on (sim DESC, index ASC) — the same total order as
  *    the oracle's `row_number() OVER (ORDER BY sim DESC, nb ASC)` —
  *    and there is no RNG anywhere else, so two builds over the same
  *    cell give identical graphs and identical query answers.
  *  - Oracle arithmetic: similarities are computed EXACTLY like the
  *    engine's codegen kernel and DuckDB's list_cosine_similarity —
  *    left-to-right double accumulation over (double)(float) elements,
  *    dot / (sqrt(norm_a) · sqrt(norm_b)).
  *  - Single-threaded per cell, zero allocation in the hot loops: the
  *    cell's vectors live in ONE flat float slab (no per-row pointer
  *    chase in the distance kernel — the IvfNearest r12 lesson),
  *    adjacency in fixed int slabs, visited marks generation-stamped,
  *    heaps and drain buffers instance-reused. One instance serves one
  *    Spark task.
  *
  * 100 TB contract: the graph is built per label cell inside one task
  * (embeddings-only rows — 200k × 64-dim floats ≈ 60 MB incl. the
  * adjacency slabs), cells distribute across executors. A cell too big
  * for one task shards by the per-label IVF router first (the same
  * blocking the flat path uses) with one graph per (label, shard) —
  * IMPLEMENTED in SimilarityOps.labelKnnHnsw's cellShardThreshold path
  * (r14): symmetric shard emission, per-shard [[Hnsw.cellTopKRaw]],
  * exact-dedup merge via TopKEdgeAgg. The budget-vs-recall trade of
  * that composition is measured in SCALE.md, not hidden.
  */
final class Hnsw private (
    flat: Array[Float],
    norms: Array[Double],
    dim: Int,
    m: Int,
    efC: Int) {

  private val n = norms.length
  private val m0 = 2 * m
  private val mL = 1.0 / math.log(m.toDouble)

  private[llm] val levels = new Array[Int](n)
  // level-0 adjacency: fixed m0-slot slab per node
  private val adj0 = new Array[Int](n * m0)
  private val deg0 = new Array[Int](n)
  // upper levels: lazily allocated per node, m slots per level
  private val adjU = new Array[Array[Int]](n)
  private val degU = new Array[Array[Int]](n)

  private var entry = -1
  private var maxLevel = -1

  // single-threaded scratch (one Hnsw instance per task)
  private val visited = new Array[Int](n)
  private var gen = 0
  private val cand = new Hnsw.DHeap(bestOnTop = true)
  private val res = new Hnsw.DHeap(bestOnTop = false)
  private var drainS = new Array[Double](math.max(efC, 8))
  private var drainI = new Array[Int](math.max(efC, 8))

  /** Cosine between corpus vectors qi and j — the engine's exact
    * oracle arithmetic over the flat slab.
    */
  @inline private def sim(qi: Int, j: Int): Double = {
    val a = qi * dim
    val b = j * dim
    var s = 0.0
    var t = 0
    while (t < dim) { s += flat(a + t).toDouble * flat(b + t).toDouble; t += 1 }
    s / (norms(qi) * norms(j))
  }

  @inline private def better(s1: Double, i1: Int, s2: Double, i2: Int): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  /** splitmix64 of the node index → geometric level (deterministic). */
  private def levelOf(i: Int): Int = {
    var h = i.toLong * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^= h >>> 31
    val u = ((h >>> 11) + 1).toDouble / 9.007199254740993e15 // (0, 1]
    math.min((-math.log(u) * mL).toInt, 24)
  }

  /** Greedy hill-climb at an upper level (lc ≥ 1). */
  private def greedy(qi: Int, ep0: Int, lc: Int): Int = {
    var ep = ep0
    var es = sim(qi, ep)
    var improved = true
    while (improved) {
      improved = false
      val arr = adjU(ep); val base = (lc - 1) * m; val deg = degU(ep)(lc - 1)
      var t = 0
      while (t < deg) {
        val nb = arr(base + t)
        val s = sim(qi, nb)
        if (better(s, nb, es, ep)) { es = s; ep = nb; improved = true }
        t += 1
      }
    }
    ep
  }

  /** Beam search at one level; results land in `res` (worst-on-top,
    * size ≤ ef). Classic HNSW SEARCH-LAYER with the deterministic
    * (sim, index) total order throughout.
    */
  private def searchLayer(qi: Int, ep: Int, ef: Int, lc: Int): Unit = {
    gen += 1
    cand.clear(); res.clear()
    val s0 = sim(qi, ep)
    visited(ep) = gen
    cand.push(s0, ep); res.push(s0, ep)
    var done = false
    while (!done && cand.size > 0) {
      val cs = cand.topSim; val ci = cand.topIdx
      if (res.size >= ef && !better(cs, ci, res.topSim, res.topIdx)) done = true
      else {
        cand.pop()
        var arr: Array[Int] = null; var base = 0; var deg = 0
        if (lc == 0) { arr = adj0; base = ci * m0; deg = deg0(ci) }
        else { arr = adjU(ci); base = (lc - 1) * m; deg = degU(ci)(lc - 1) }
        var t = 0
        while (t < deg) {
          val nb = arr(base + t)
          if (visited(nb) != gen) {
            visited(nb) = gen
            val s = sim(qi, nb)
            if (res.size < ef) { cand.push(s, nb); res.push(s, nb) }
            else if (better(s, nb, res.topSim, res.topIdx)) {
              cand.push(s, nb); res.push(s, nb); res.pop()
            }
          }
          t += 1
        }
      }
    }
  }

  /** Drain `res` (worst-first) into drainS/drainI best-first; returns
    * the count. Instance buffers — zero allocation per call.
    */
  private def drainRes(): Int = {
    val cnt = res.size
    if (cnt > drainS.length) {
      drainS = new Array[Double](cnt * 2)
      drainI = new Array[Int](cnt * 2)
    }
    var t = cnt - 1
    while (t >= 0) {
      drainS(t) = res.topSim; drainI(t) = res.topIdx; res.pop(); t -= 1
    }
    cnt
  }

  /** Append b to a's level-lc list, evicting the single worst entry
    * (by sim TO a) on overflow — the simple shrink; deterministic.
    */
  private def link(a: Int, b: Int, lc: Int): Unit = {
    val mm = if (lc == 0) m0 else m
    val arr = if (lc == 0) adj0 else adjU(a)
    val base = if (lc == 0) a * m0 else (lc - 1) * m
    val dg = if (lc == 0) deg0(a) else degU(a)(lc - 1)
    if (dg < mm) {
      arr(base + dg) = b
      if (lc == 0) deg0(a) += 1 else degU(a)(lc - 1) += 1
    } else {
      var wS = sim(a, b); var wI = b; var wPos = -1
      var t = 0
      while (t < mm) {
        val c = arr(base + t); val s = sim(a, c)
        if (better(wS, wI, s, c)) { wS = s; wI = c; wPos = t }
        t += 1
      }
      if (wPos >= 0) arr(base + wPos) = b // b survives, worst evicted
    }
  }

  private def insert(i: Int): Unit = {
    val li = levels(i)
    if (entry < 0) { entry = i; maxLevel = li; return }
    var ep = entry
    var lc = maxLevel
    while (lc > li) { ep = greedy(i, ep, lc); lc -= 1 }
    lc = math.min(maxLevel, li)
    while (lc >= 0) {
      searchLayer(i, ep, efC, lc)
      val cnt = drainRes()
      ep = drainI(0)
      val take = math.min(if (lc == 0) m0 else m, cnt)
      var u = 0
      while (u < take) {
        val nb = drainI(u)
        link(i, nb, lc)
        link(nb, i, lc)
        u += 1
      }
      lc -= 1
    }
    if (li > maxLevel) { maxLevel = li; entry = i }
  }

  /** Top-k in-graph neighbors of corpus vector `i`, excluding itself.
    * Fills outIdx/outSim best-first; returns the count (≤ k).
    */
  def searchTopK(i: Int, efS: Int, k: Int,
      outIdx: Array[Int], outSim: Array[Double]): Int = {
    var ep = entry
    var lc = maxLevel
    while (lc >= 1) { ep = greedy(i, ep, lc); lc -= 1 }
    searchLayer(i, ep, math.max(efS, k + 1), 0)
    val cnt = drainRes()
    var o = 0; var u = 0
    while (u < cnt && o < k) {
      if (drainI(u) != i) { outIdx(o) = drainI(u); outSim(o) = drainS(u); o += 1 }
      u += 1
    }
    o
  }
}

object Hnsw {

  /** Build over a cell's vectors; callers pass vectors in sorted-vec_id
    * order (index order IS the tie-break order).
    *
    * PRECONDITION (enforced): every vector has a non-zero norm. A
    * zero-norm vector makes sim() NaN, and NaN compares false under
    * every predicate — heap and insertion order would become
    * STRUCTURAL rather than value-ordered, silently breaking the
    * deterministic (sim DESC, idx ASC) total order the whole design
    * depends on, and diverging from the oracle (which sorts NaN as
    * greatest under DESC). Failing loudly here is the contract; the
    * exact arm in [[cellTopK]] enforces the same.
    */
  def build(vecs: Array[Array[Float]], m: Int = 16, efC: Int = 128): Hnsw = {
    val n = vecs.length
    val dim = if (n == 0) 0 else vecs(0).length
    val flat = new Array[Float](n * dim)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = vecs(i)
      System.arraycopy(v, 0, flat, i * dim, dim)
      var s = 0.0
      var j = 0
      while (j < dim) { s += v(j).toDouble * v(j).toDouble; j += 1 }
      norms(i) = math.sqrt(s)
      require(norms(i) > 0,
        s"hnsw: zero-norm vector at cell index $i — cosine kNN is " +
          "undefined for the zero vector (NaN sims would break the " +
          "deterministic total order); filter or re-embed such rows")
      i += 1
    }
    val h = new Hnsw(flat, norms, dim, m, efC)
    i = 0
    while (i < n) {
      val lv = h.levelOf(i)
      h.levels(i) = lv
      if (lv > 0) {
        h.adjU(i) = new Array[Int](lv * m)
        h.degU(i) = new Array[Int](lv)
      }
      i += 1
    }
    i = 0
    while (i < n) { h.insert(i); i += 1 }
    h
  }

  /** Spark's round(col, 6) arithmetic (HALF_UP over the shortest
    * decimal representation) — emitted sims must hash-match the SQL
    * spelling's ROUND(sim, 6).
    */
  @inline def round6(s: Double): Double =
    if (java.lang.Double.isNaN(s) || java.lang.Double.isInfinite(s)) s
    else BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One label cell → its exact-or-graph kNN edges
    * (vec_id, nb, sim6, rn), rn 1-based under (sim DESC, nb ASC).
    *
    * `ids`/`vecs` MUST be aligned and sorted by id ascending. Cells at
    * or below `exactBelow` run the exact O(n²·dim) scan — at that size
    * it is cheaper than building the graph, and it makes the fixture
    * config oracle-EQUAL by construction (the same posture as
    * labelKnnIvf's perLabel=1). Larger cells build the graph:
    * ~n·efC·log n build + n·efS query distance evaluations — the
    * sub-quadratic path the 1000× tier needs.
    */
  def cellTopK(ids: Array[Long], vecs: Array[Array[Float]], k: Int,
      exactBelow: Int, m: Int, efC: Int, efS: Int)
      : Iterator[(Long, Long, Double, Int)] =
    cellTopKRaw(ids, vecs, k, exactBelow, m, efC, efS)
      .map { case (v, nb, s, rn) => (v, nb, round6(s), rn) }

  /** [[cellTopK]] with RAW (unrounded) sims — the sharded composition's
    * building block: per-shard candidates must merge and re-rank on the
    * exact double the single-graph path ranks on, so rounding waits
    * until after the cross-shard top-k (the same discipline as
    * topKEdges' fold-then-round).
    */
  def cellTopKRaw(ids: Array[Long], vecs: Array[Array[Float]], k: Int,
      exactBelow: Int, m: Int, efC: Int, efS: Int)
      : Iterator[(Long, Long, Double, Int)] = {
    val n = ids.length
    if (n <= 1) return Iterator.empty
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Int)](
      math.min(n.toLong * k, Int.MaxValue / 64).toInt)
    if (n <= exactBelow) {
      val dim = vecs(0).length
      val flat = new Array[Float](n * dim)
      val norms = new Array[Double](n)
      var i = 0
      while (i < n) {
        val v = vecs(i)
        System.arraycopy(v, 0, flat, i * dim, dim)
        var s = 0.0
        var j = 0
        while (j < dim) { s += v(j).toDouble * v(j).toDouble; j += 1 }
        norms(i) = math.sqrt(s)
        require(norms(i) > 0,
          s"hnsw: zero-norm vector at cell index $i — cosine kNN is " +
            "undefined for the zero vector; filter or re-embed such rows")
        i += 1
      }
      val kk = math.min(k, n - 1)
      val bS = new Array[Double](kk); val bI = new Array[Int](kk)
      i = 0
      while (i < n) {
        val qb = i * dim; val qn = norms(i)
        var filled = 0
        var j = 0
        while (j < n) {
          if (j != i) {
            val vb = j * dim
            var s = 0.0
            var t = 0
            while (t < dim) { s += flat(qb + t).toDouble * flat(vb + t).toDouble; t += 1 }
            s /= (qn * norms(j))
            // insertion under (sim DESC, idx ASC) — the oracle's order
            if (filled < kk) {
              var p = filled
              while (p > 0 && (s > bS(p - 1) || (s == bS(p - 1) && j < bI(p - 1)))) {
                bS(p) = bS(p - 1); bI(p) = bI(p - 1); p -= 1
              }
              bS(p) = s; bI(p) = j; filled += 1
            } else if (s > bS(kk - 1) || (s == bS(kk - 1) && j < bI(kk - 1))) {
              var p = kk - 1
              while (p > 0 && (s > bS(p - 1) || (s == bS(p - 1) && j < bI(p - 1)))) {
                bS(p) = bS(p - 1); bI(p) = bI(p - 1); p -= 1
              }
              bS(p) = s; bI(p) = j
            }
          }
          j += 1
        }
        var r = 0
        while (r < filled) {
          out += ((ids(i), ids(bI(r)), bS(r), r + 1))
          r += 1
        }
        i += 1
      }
    } else {
      val h = build(vecs, m, efC)
      val oi = new Array[Int](k); val os = new Array[Double](k)
      var i = 0
      while (i < n) {
        val c = h.searchTopK(i, efS, k, oi, os)
        var t = 0
        while (t < c) {
          out += ((ids(i), ids(oi(t)), os(t), t + 1))
          t += 1
        }
        i += 1
      }
    }
    out.iterator
  }

  /** Primitive binary heap over (sim, idx) with the deterministic
    * (sim, idx) total order. bestOnTop=true → top is the BEST
    * (sim DESC, idx ASC); false → top is the WORST.
    */
  private[llm] final class DHeap(bestOnTop: Boolean) {
    private var sims = new Array[Double](64)
    private var idxs = new Array[Int](64)
    var size = 0

    def clear(): Unit = size = 0
    def topSim: Double = sims(0)
    def topIdx: Int = idxs(0)

    @inline private def above(s1: Double, i1: Int, s2: Double, i2: Int): Boolean =
      if (bestOnTop) s1 > s2 || (s1 == s2 && i1 < i2)
      else s1 < s2 || (s1 == s2 && i1 > i2)

    def push(s: Double, i: Int): Unit = {
      if (size == sims.length) {
        sims = java.util.Arrays.copyOf(sims, size * 2)
        idxs = java.util.Arrays.copyOf(idxs, size * 2)
      }
      var c = size
      sims(c) = s; idxs(c) = i
      size += 1
      while (c > 0) {
        val p = (c - 1) >> 1
        if (above(sims(c), idxs(c), sims(p), idxs(p))) {
          val ts = sims(c); val ti = idxs(c)
          sims(c) = sims(p); idxs(c) = idxs(p)
          sims(p) = ts; idxs(p) = ti
          c = p
        } else c = 0
      }
    }

    def pop(): Unit = {
      size -= 1
      sims(0) = sims(size); idxs(0) = idxs(size)
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = l + 1
        var b = c
        if (l < size && above(sims(l), idxs(l), sims(b), idxs(b))) b = l
        if (r < size && above(sims(r), idxs(r), sims(b), idxs(b))) b = r
        if (b == c) done = true
        else {
          val ts = sims(c); val ti = idxs(c)
          sims(c) = sims(b); idxs(c) = idxs(b)
          sims(b) = ts; idxs(b) = ti
          c = b
        }
      }
    }
  }
}
