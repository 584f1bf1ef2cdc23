package graft.llm

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed POINT-LOOKUP index for the ingest-dedup classifier — the
  * below-scan-floor posture for the near arm (SCALE.md §r16 named it as
  * the next structural step; VERDICT r16 item 3).
  *
  * Why it exists: the stream-static faces of `dd_incremental`
  * (DocStream.classifyIngest / DedupOps.classifyBatch) re-execute the
  * corpus index relations every trigger — even fully cached and
  * semi-pruned, a bounded 1000-doc trigger pays one pass over the 5M-row
  * cached relations (~9.7 s at the 1000× tier). A bounded ingest batch
  * is a point-lookup workload: ~1k digest probes, ~4k bucket probes,
  * ~KB-scale candidate verifies. Candidate keys are uniformly
  * distributed (md5 buckets), so NO scan-side pruning can help — file
  * or row-group skipping, cached-batch min/max stats, and broadcast
  * semi-joins all degrade to a full pass when the probe keys cover the
  * key space (measured: the r16 semi-prune cut 44 s → 14.3 s and hit
  * exactly that floor). Sub-scan cost needs a HASH index.
  *
  * Shape: one open-addressed hash slab PER PARTITION, held in a
  * persisted `RDD[HashSlab]` (the classic IndexedRDD layout). A probe
  * batch repartitions BY THE SAME partitioner (shuffling only the tiny
  * batch side) and `zipPartitions` does per-partition hash lookups —
  * per-trigger cost is two KB-scale shuffles plus O(candidates) probe
  * work, independent of corpus size. `mapPartitions` is justified here
  * (SURVEY §7.1 preference order, last resort): Catalyst has no
  * point-lookup operator — every declarative spelling is a join, and
  * every join against a corpus-sized relation is a scan or a shuffle of
  * that relation.
  *
  * 100 TB posture: slabs are per-partition and size with the corpus /
  * executor count (a 1000-executor cluster holds ~100 MB/slab for a
  * 100 TB corpus' digests+bands+shingle hashes — the text itself never
  * enters the index); probes shuffle only the ingest batch. Refresh =
  * rebuild the RDD and swap the memo entry (no query restart — the
  * opposite trade from the state-store exact arm, whose refresh is a
  * restart but whose state survives a driver bounce via the checkpoint).
  *
  * Exactness contract (the one approximation, stated): digest keys are
  * the FULL 128-bit md5 values (zero-collision by construction — same
  * bits the batch classifier equi-joins on); (band, bucket) keys are
  * the bucket md5 XORed with a full-width splitmix64 expansion of the
  * band id folded into BOTH words ([[bandKey]]) — within one band the
  * fold is a bijection (zero-collision, like the digests), and a
  * CROSS-band collision needs the two buckets' 128-bit md5 difference
  * to equal the two bands' mask difference, P ≈ 2⁻¹²⁸ per pair — the
  * same class as an md5 collision itself, which the 128-bit claim
  * already accepts (r17 ADVICE: the earlier high-word-only fold left
  * this surface undocumented). Only
  * the near-arm VERIFY runs on 64-bit xxhash64 images of the 3-token
  * shingles instead of the strings: |A∩B| / |A∪B| over hash sets equals
  * the string-set jaccard unless two DISTINCT shingles in the same
  * compared pair collide — P ≈ s²/2⁶⁵ per pair (s ≈ 50 shingles/doc),
  * ~1e-13 per verify, ~1e-5 per 10⁸-pair corpus run. The differential
  * spec pins equality with the string-set classifier on every fixture
  * and adversarial corpus; the fixture-contract declared query
  * (`dd_incremental_lookup`) proves it against the DuckDB oracle every
  * round.
  */
object LookupIndex {

  /** Open-addressed 128-bit-key → long-slice hash slab. Keys live in two
    * parallel long arrays; values are (offset, length) slices into one
    * packed `pool` array — no per-entry objects, so a 5M-doc partition's
    * slab is ~tens of MB of primitive arrays (the flat-slab idiom
    * `Hnsw.scala` already uses). Linear probing, capacity = next power
    * of two ≥ 2n. Immutable after build.
    */
  final class HashSlab(n: Int) extends Serializable {
    private val capBits = {
      var b = 1
      while ((1 << b) < math.max(2, n * 2)) b += 1
      b
    }
    private val cap = 1 << capBits
    private val mask = cap - 1
    private val keysHi = new Array[Long](cap)
    private val keysLo = new Array[Long](cap)
    // off == -1 marks an empty slot ((0,0) is a legal key: cid 0)
    private val offs = Array.fill(cap)(-1)
    private val lens = new Array[Int](cap)
    private var pool = new Array[Long](math.max(16, n * 2))
    private var poolLen = 0
    private var entries = 0

    private def slot(hi: Long, lo: Long): Int = {
      // splitmix64-style finalizer over the xor-fold — md5 bits are
      // already uniform, this just decorrelates from the partitioner
      var x = hi ^ (lo * 0x9E3779B97F4A7C15L)
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      (x ^ (x >>> 31)).toInt & mask
    }

    /** Insert; duplicate keys are a build error (callers pre-aggregate). */
    def put(hi: Long, lo: Long, vs: Array[Long]): Unit = {
      require(entries < cap, "HashSlab over capacity")
      var i = slot(hi, lo)
      while (offs(i) != -1) {
        require(!(keysHi(i) == hi && keysLo(i) == lo),
          s"HashSlab duplicate key ($hi,$lo)")
        i = (i + 1) & mask
      }
      if (poolLen + vs.length > pool.length)
        pool = java.util.Arrays.copyOf(pool,
          math.max(pool.length * 2, poolLen + vs.length))
      System.arraycopy(vs, 0, pool, poolLen, vs.length)
      keysHi(i) = hi; keysLo(i) = lo
      offs(i) = poolLen; lens(i) = vs.length
      poolLen += vs.length
      entries += 1
    }

    /** The value slice for a key, or null. `f(pool, off, len)` avoids an
      * allocation on the miss path; `get` copies for convenience.
      */
    def get(hi: Long, lo: Long): Array[Long] = {
      var i = slot(hi, lo)
      while (offs(i) != -1) {
        if (keysHi(i) == hi && keysLo(i) == lo)
          return java.util.Arrays.copyOfRange(
            pool, offs(i), offs(i) + lens(i))
        i = (i + 1) & mask
      }
      null
    }

    def size: Int = entries
    /** Shrink the pool to fit (called once, after the last put). */
    def seal(): HashSlab = {
      if (pool.length > poolLen) pool = java.util.Arrays.copyOf(pool, poolLen)
      this
    }
  }

  /** The three slab RDDs an ingest batch probes, plus their shared
    * partitioner (probes must route with the SAME partitioner).
    */
  final case class Index(
      digests: RDD[HashSlab], // md5(text)128 → [min owning cid]
      bands: RDD[HashSlab], // bandKey(band, bucket-md5) → capped member cids
      shingles: RDD[HashSlab], // (0, cid) → sorted distinct xxhash64(shingle)
      parts: Int) {
    def partitioner = new HashPartitioner(parts)
  }

  /** Partition-routing key for a 128-bit slab key: must match on the
    * build and probe sides. Boxed-Long hashCode (hi^lo folded) feeds the
    * HashPartitioner.
    */
  private[llm] def routeKey(hi: Long, lo: Long): Long = hi ^ lo

  /** Full-width band mask: splitmix64 finalizer over (band + 1) · golden
    * gamma — a bijection on 64 bits, so distinct bands get distinct
    * masks (band 0 included; the +1 keeps its mask non-zero).
    */
  private[graft] def bandMask(band: Int): Long = {
    var x = (band.toLong + 1L) * 0x9E3779B97F4A7C15L
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 128-bit slab key for a (band, bucket-md5) pair: the band's
    * full-width mask folded into BOTH md5 words (the low word takes the
    * mask rotated so the two words don't cancel in routeKey's hi^lo).
    * See the exactness contract above for the collision argument.
    */
  private[graft] def bandKey(band: Int, hi: Long, lo: Long): (Long, Long) = {
    val m = bandMask(band)
    (hi ^ m, lo ^ java.lang.Long.rotateLeft(m, 32))
  }

  /** 128-bit md5 hex → (hi, lo). The hex strings come from Spark's own
    * `md5()` (lowercase, 32 chars).
    */
  private[graft] def hexToPair(h: String): (Long, Long) =
    (java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16),
      java.lang.Long.parseUnsignedLong(h.substring(16, 32), 16))

  /** Hashed shingle set: sorted distinct xxhash64 images of the 3-token
    * shingles — the one 64-bit surface (see the exactness contract
    * above). Sorted so the jaccard merge is O(|A|+|B|) with no scratch.
    */
  private[llm] def hashedShingles(text: org.apache.spark.sql.Column) =
    array_sort(array_distinct(transform(
      graft.engine.GraftColumns.shingles3(text), s => xxhash64(s))))

  /** Jaccard over two sorted distinct long arrays, rounded like the
    * classifier: ROUND(|∩| / |∪|, 6) with HALF_UP — the same BigDecimal
    * semantics as Catalyst's `round`, so thresholds agree bit-for-bit
    * with the string-set spelling.
    */
  private[graft] def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else round6(inter.toDouble / union)
  }

  /** ROUND(v, 6) with Catalyst's exact semantics: Spark's Round on
    * DoubleType goes through scala.math.BigDecimal(v) (the
    * shortest-representation expansion, java BigDecimal.valueOf) with
    * HALF_UP — mirrored here so slab-side kernels agree bit-for-bit
    * with the declarative spelling at rounding boundaries. NaN and
    * infinities pass through like Catalyst's round (BigDecimal would
    * throw — a zero-norm vector's 0/0 cosine must yield the same NaN
    * row the declarative spelling yields, not kill the task).
    */
  private[graft] def round6(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else scala.math.BigDecimal(v)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Build one slab per partition from pre-aggregated (hi, lo, values)
    * entries, routed by the shared partitioner.
    */
  private[llm] def slabRdd(entries: RDD[(Long, Long, Array[Long])], parts: Int)
      : RDD[HashSlab] =
    entries
      .map { case (hi, lo, vs) => (routeKey(hi, lo), (hi, lo, vs)) }
      .partitionBy(new HashPartitioner(parts))
      .mapPartitions({ it =>
        val buf = it.map(_._2).toArray
        val slab = new HashSlab(buf.length)
        buf.foreach { case (hi, lo, vs) => slab.put(hi, lo, vs) }
        Iterator.single(slab.seal())
      }, preservesPartitioning = false)

  /** Build the index from the SAME corpus-side relations the batch
    * classifier joins ([[DedupOps.corpusSideRelations]]) — capped band
    * membership and digest orientation are identical by construction.
    * Eagerly materialized (offline build step, like the ANN indexes).
    */
  private[llm] def build(cEx: DataFrame, cBands: DataFrame, cSh: DataFrame,
      parts: Int): Index = {
    val digestEntries = cEx
      .groupBy(col("h")).agg(min(col("cid")).as("cid"))
      .select(col("h"), col("cid"))
      .rdd.map { r =>
        val (hi, lo) = hexToPair(r.getString(0))
        (hi, lo, Array(r.getLong(1)))
      }
    // capped members per bucket, min cid first (orientation-stable)
    val bandEntries = cBands
      .groupBy(col("band"), col("bucket"))
      .agg(array_sort(collect_list(col("cid"))).as("cids"))
      .rdd.map { r =>
        val (hi0, lo0) = hexToPair(r.getString(1))
        val (hi, lo) = bandKey(r.getInt(0), hi0, lo0)
        (hi, lo, r.getSeq[Long](2).toArray)
      }
    val shingleEntries = cSh
      .select(col("cid"), hashedShingles(col("text")).as("shh"))
      .rdd.map { r => (0L, r.getLong(0), r.getSeq[Long](1).toArray) }
    val idx = Index(
      slabRdd(digestEntries, parts).persist(StorageLevel.MEMORY_AND_DISK),
      slabRdd(bandEntries, parts).persist(StorageLevel.MEMORY_AND_DISK),
      slabRdd(shingleEntries, parts).persist(StorageLevel.MEMORY_AND_DISK),
      parts)
    idx.digests.count(); idx.bands.count(); idx.shingles.count()
    idx
  }

  /** Memoized per dataset root (the incrementalIndex discipline):
    * rebuild-and-swap is the refresh path, `release` drops a root.
    */
  // Access-ordered LRU capped at MaxRoots: these entries pin
  // corpus-scale persisted RDDs, so a multi-root serving session must
  // not accumulate one index per root forever (the CacheOnce
  // MaxEntries discipline, on entries orders of magnitude heavier);
  // an evicted root's slabs unpersist and rebuild on next use —
  // counted and logged via [[stats]] (r17 VERDICT wrong-#2: a silent
  // 50–94 s rebuild per query is the failure class counters catch).
  private[graft] val MaxRoots: Int =
    sys.env.getOrElse("SPARK_GRAFT_SLAB_ROOTS", "4").toInt
  private val byDataset: LruMemo[Index] =
    new LruMemo[Index]("LookupIndex.byDataset", MaxRoots, { idx =>
      idx.digests.unpersist(false)
      idx.bands.unpersist(false)
      idx.shingles.unpersist(false)
    })
  private[graft] def stats: MemoStats = byDataset.stats

  /** Memo key root: the registered dataset dir. Fails fast when the
    * session has no registered dataset — a shared "?" sentinel would
    * silently serve one corpus's digest/band/shingle slabs against
    * another unregistered session's batch in the same JVM (r17 ADVICE;
    * the same discipline as SimilarityOps.datasetKey). Hand-built spec
    * corpora use the un-memoized [[forCorpus]].
    */
  private def datasetKey(s: SparkSession): String =
    graft.engine.Tables.dirOf(s).getOrElse(throw new IllegalStateException(
      "LookupIndex.forDataset requires a registered dataset " +
        "(Tables.register) — refusing to memoize under a shared key; " +
        "use forCorpus for unregistered corpora"))

  /** Slab count for a corpus of `nDocs` rows: sized so each slab holds
    * a bounded key range (~50k docs' digests/bands/shingles ≈ tens of
    * MB) — the corpus drives the width, not a constant. Floored at an
    * eighth of the cluster's parallelism so probe stages of a BIG
    * ingest batch against a small corpus still spread, and never below
    * 2. The r18 sweep on this host (5k-doc fixture, 32 cores, isolated
    * steady dd_incremental_lookup): 4 slabs = 0.79 s, 8 = 0.89 s,
    * 16 = 1.22 s, 32 = 1.41 s — every probe stage pays per-task
    * scheduling for KB-scale work, so width beyond the data is pure
    * overhead. Any production corpus clears 400k docs and the data term
    * takes over; the floor only governs toy corpora. Env-overridable
    * for re-sweeps.
    */
  private[graft] def slabParts(s: SparkSession, nDocs: Long): Int =
    sys.env.get("SPARK_GRAFT_SLAB_PARTS").flatMap(_.toIntOption).getOrElse {
      val byData = math.ceil(nDocs / 50000.0).toInt
      val floor = math.max(2, s.sparkContext.defaultParallelism / 8)
      math.max(floor, byData)
    }

  /** `parts` ≤ 0 (the serving default) derives the slab count from the
    * corpus via [[slabParts]]; an explicit positive value pins it (the
    * ScaleBench multi-root proxy builds distinct memo entries that way).
    */
  private[graft] def forDataset(s: SparkSession, parts0: Int = -1): Index =
    byDataset.get(datasetKey(s) + s"/$parts0") {
      val corpus = s.table("documents").select(col("doc_id"), col("text"))
      val parts =
        if (parts0 > 0) parts0 else slabParts(s, corpus.count())
      // cSh here is the RAW corpus (cid, text) — hashedShingles runs
      // inside build, so the fat string shingle sets never materialize
      val (ex, bands, _) =
        DedupOps.corpusSideRelations(corpus, DedupOps.HOT_BUCKET_CAP)
      build(ex, bands,
        corpus.select(col("doc_id").as("cid"), col("text")), parts)
    }

  private[graft] def warm(s: SparkSession): Unit = { forDataset(s); () }

  /** Un-memoized build from an arbitrary (doc_id, text) corpus — the
    * spec path (adversarial hand-built corpora, custom caps).
    */
  private[graft] def forCorpus(corpus: DataFrame, cap: Int = DedupOps.HOT_BUCKET_CAP,
      parts: Int = 4): Index = {
    val (ex, bands, _) = DedupOps.corpusSideRelations(corpus, cap)
    build(ex, bands, corpus.select(col("doc_id").as("cid"), col("text")), parts)
  }

  /** Drop (and unpersist) the memoized index for a dataset root —
    * the refresh/reclaim path.
    */
  private[graft] def release(s: SparkSession): Unit =
    // no registered dataset → nothing was ever memoized (forDataset
    // fails fast on that case); releasing is a no-op, not an error
    graft.engine.Tables.dirOf(s).foreach(dir => byDataset.release(dir + "/"))

  /** Classify an ingest batch (doc_id, text) against the point-lookup
    * index — result-identical to [[DedupOps.classifyBatch]] (same
    * verdict precedence, same min-cid orientation, same capped
    * candidates, same ROUND(j,6) ≥ 0.3 verify; see the exactness
    * contract). Per-batch cost: one pass over the BATCH to derive
    * digests/bands/hashed shingles, two batch-sized probe shuffles, and
    * O(candidates) slab lookups — nothing corpus-sized moves or scans.
    */
  private[graft] def classifyBatchIndexed(batch: DataFrame, idx: Index)
      : DataFrame = {
    val s = batch.sparkSession
    val part = idx.partitioner
    // one batch-side kernel pass, materialized as ONE shuffle (r18): the
    // exact, candidate and verify arms all consume [[prepped]]'s shuffle
    // files — the digest/minhash/shingle kernel map runs ONCE per
    // execution (it was recomputed per arm before: 3 × ~0.5 s single-task
    // at sf0.1). A persist would not survive the lazy return (a scoped
    // persist is released before the sink executes); a shuffle dependency
    // does, and its reduce side is exactly the id-keyed layout the
    // verify join needs (zero extra shuffle there).
    val prep = prepped(batch, idx)
    locally {
      // exact arm: 128-bit digest point lookups
      val exHits: RDD[(Long, Long)] = prep
        .map { case (id, (hi, lo, _, _)) => (routeKey(hi, lo), (hi, lo, id)) }
        .partitionBy(part)
        .zipPartitions(idx.digests) { (pit, sit) =>
          if (!sit.hasNext) Iterator.empty
          else {
            val slab = sit.next()
            pit.flatMap { case (_, (hi, lo, id)) =>
              val v = slab.get(hi, lo)
              if (v == null) Iterator.empty else Iterator.single((id, v(0)))
            }
          }
        }
      // candidate + verify arms (shared with nearMatchesIndexed)
      val nearHits = nearHitsOf(prep, idx)
      // verdict assembly — back in DataFrame land, same tail as
      // classifyBatch: exact > near > new, min matching cid
      import s.implicits._
      val ex = exHits.toDF("doc_id", "cid")
        .groupBy("doc_id").agg(min(col("cid")).as("ex_match"))
      val near = nearHits.toDF("doc_id", "cid")
        .groupBy("doc_id").agg(min(col("cid")).as("nd_match"))
      batch.select(col("doc_id"))
        .join(ex, Seq("doc_id"), "left")
        .join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("ex_match").isNotNull, "exact_dup")
            .when(col("nd_match").isNotNull, "near_dup")
            .otherwise("new").as("verdict"),
          when(col("ex_match").isNotNull, col("ex_match"))
            .otherwise(col("nd_match")).as("match_id"))
        // preSort (r19): no range-sampling re-exec of the verdict joins
        // (same tail as DedupOps.classifyBatch)
        .transform(graft.engine.Par.preSort(_, col("doc_id"), col("verdict")))
        .orderBy(col("doc_id").asc_nulls_last)
    }
  }

  /** One batch-side kernel pass for the probe arms: doc_id → (digest
    * hi/lo, band slab keys [hi0,lo0,hi1,lo1,...], hashed shingles) —
    * spread across the cluster ahead of the kernel (the fixture scans
    * are single-row-group, guide §2.5), then shuffled ONCE by the slab
    * partitioner keyed on doc_id. Every downstream arm re-reads these
    * shuffle files instead of re-running the kernel, and the id-keyed
    * partitioning is exactly what the verify join needs.
    */
  private def prepped(batch: DataFrame, idx: Index)
      : RDD[(Long, (Long, Long, Array[Long], Array[Long]))] = {
    import graft.engine.expressions.OptimizerBarrier
    // byte-adaptive fan-out: the kernel costs ~CPU-per-KB, so width
    // derives from the batch's estimated bytes (≈64 KB of text per
    // task), capped at the cluster's parallelism — and SKIPPED when the
    // batch already has that many partitions (a corpus-sized batch's
    // scan splits naturally; repartitioning its text would be a pure
    // extra shuffle, and a KB-scale streaming trigger stays one task
    // instead of paying 32 tasks of scheduling)
    val dp = batch.sparkSession.sparkContext.defaultParallelism
    val est = batch.queryExecution.optimizedPlan.stats.sizeInBytes
    val width = (est / (64L << 10)).min(BigInt(dp)).max(BigInt(1)).toInt
    val spread =
      if (batch.rdd.getNumPartitions >= width) batch
      else batch.repartition(width, col("doc_id"))
    spread
      .select(
        col("doc_id"),
        md5(col("text").cast(BinaryType)).as("h"),
        DedupOps.bandStructs(
          OptimizerBarrier(graft.engine.GraftColumns.minhashSig(col("text"), DedupOps.K)))
          .as("bands"),
        hashedShingles(col("text")).as("shh"))
      .rdd.map { r =>
        val (hi, lo) = hexToPair(r.getString(1))
        val bs = r.getSeq[Row](2)
        val bandKeys = new Array[Long](bs.length * 2)
        var i = 0
        bs.foreach { b =>
          val (bh0, bl0) = hexToPair(b.getString(1))
          val (bh, bl) = bandKey(b.getInt(0), bh0, bl0)
          bandKeys(i) = bh; bandKeys(i + 1) = bl; i += 2
        }
        (r.getLong(0), (hi, lo, bandKeys, r.getSeq[Long](3).toArray))
      }
      .partitionBy(idx.partitioner)
  }

  /** Near-arm-only face for the staged ingest composition: (doc_id,
    * nd_match) for batch docs with a verified near match — the survivors
    * of the exact gate probe only bands + shingles here.
    */
  /** Candidate probe + shingle verify over [[prepped]] rows — shared by
    * [[classifyBatchIndexed]] and [[nearMatchesIndexed]].
    * Emits verified (doc_id, cid) near hits.
    *
    * Shuffle discipline (the r17 ENOSPC lesson, corpus-sized batches):
    * the hashed-shingle payload must NOT ride the band probes — ×BANDS
    * duplication times candidate fan-out sort-merged ~30 GB of scratch
    * for a 5M-doc batch and hit disk. Spelled so the payload moves at
    * most twice: bare (bucket, id) probes → bare (cid, id) pairs,
    * DEDUPED while still payload-free, then ONE id-keyed join attaches
    * shh (each doc's shingles shuffle once — and since [[prepped]] is
    * already id-partitioned by the same partitioner, that side of the
    * join moves nothing), then one route-by-cid carries shh once per
    * DISTINCT surviving pair to its verify slab. A bounded trigger pays
    * one extra tiny shuffle (~0.1 s); a corpus-sized batch drops from
    * ~30 GB of scratch to ~(batch + distinct pairs) — measured in
    * SCALE.md §r17.
    */
  private def nearHitsOf(
      rows: RDD[(Long, (Long, Long, Array[Long], Array[Long]))], idx: Index)
      : RDD[(Long, Long)] = {
    val part = idx.partitioner
    // bare band probes: (bucket-key route, (hi, lo, id)) — no payload
    val pairs: RDD[(Long, Long)] = rows
      .flatMap { case (id, (_, _, bandKeys, _)) =>
        (0 until bandKeys.length / 2).iterator.map { j =>
          val hi = bandKeys(2 * j); val lo = bandKeys(2 * j + 1)
          (routeKey(hi, lo), (hi, lo, id))
        }
      }
      .partitionBy(part)
      .zipPartitions(idx.bands) { (pit, sit) =>
        if (!sit.hasNext) Iterator.empty
        else {
          val slab = sit.next()
          pit.flatMap { case (_, (hi, lo, id)) =>
            val cids = slab.get(hi, lo)
            if (cids == null) Iterator.empty
            else cids.iterator.map(cid => (cid, id))
          }
        }
      }
    // dedup (cid, id) while payload-free (bands hitting the same pair)
    val distinctPairs = pairs
      .map(p => (p, null: Null)).reduceByKey(part, (a, _) => a).keys
    // attach each doc's hashed shingles ONCE (id-keyed join), then
    // route by cid to the verify slab; mapValues keeps rows' id
    // partitioning, so the join only shuffles the bare pairs
    val shhById = rows.mapValues { case (_, _, _, shh) => shh }
    distinctPairs
      .map { case (cid, id) => (id, cid) }
      .join(shhById, part)
      .map { case (id, (cid, shh)) => (routeKey(0L, cid), (cid, id, shh)) }
      .partitionBy(part)
      .zipPartitions(idx.shingles) { (pit, sit) =>
        if (!sit.hasNext) Iterator.empty
        else {
          val slab = sit.next()
          pit.flatMap { case (_, (cid, id, shh)) =>
            val cshh = slab.get(0L, cid)
            if (cshh != null && jaccardSorted(shh, cshh) >= 0.3)
              Iterator.single((id, cid))
            else Iterator.empty
          }
        }
      }
  }

  private[graft] def nearMatchesIndexed(batch: DataFrame, idx: Index)
      : DataFrame = {
    val s = batch.sparkSession
    // the shared kernel pass also digests the batch (the exact arm's
    // column); here that 128-bit md5 per row is unused — the price of
    // one prep shape for both faces, and small next to the minhash
    import s.implicits._
    nearHitsOf(prepped(batch, idx), idx).toDF("doc_id", "cid")
      .groupBy("doc_id").agg(min(col("cid")).as("nd_match"))
  }
}
