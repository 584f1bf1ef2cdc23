package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Q

/** Deduplication operators for LLM training-data pipelines (BASELINE.json;
  * SURVEY.md §7.2 item 6 / §7.5 scale notes).
  *
  * The fixture corpus has no verbatim duplicates, so dedup queries build a
  * duplicated corpus from the fixtures themselves: `documents` UNION ALL a
  * copy (doc_id + corpus-derived offset) whose text is truncated to the first 80% of
  * tokens — a realistic near-duplicate population with known answers.
  *
  * All hashing is md5-based so the DuckDB oracle computes the identical
  * signatures — the comparison checks the *algorithm*, not a private hash.
  *
  * Scale: exact dedup shuffles on a 128-bit digest (never the full text);
  * MinHash/LSH shuffles (band, bucket) pairs — the O(n²) pair explosion is
  * confined to same-bucket candidates, which is the standard web-scale
  * dedup layout (one shuffle per band, then a verified pair join).
  */
object DedupOps {

  /** One past the corpus' max doc_id — the id offset for synthetic
    * copies. Previously hard-coded 10000/20000, which COLLIDED with
    * real ids once the corpus grew past 10k docs: the 10× scale run
    * caught dupCorpus holding 100k rows with only 60k distinct ids
    * (the star labeling faithfully reported every duplicated node).
    * Corpus-derived, so the precondition holds at any scale. Memoized
    * per dataset root; min/max resolve from parquet footer stats.
    */
  private val idOffsets =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def idOffset(s: SparkSession): Long = {
    val key = graft.engine.Tables.dirOf(s)
      .getOrElse("session:" + System.identityHashCode(s))
    idOffsets.computeIfAbsent(key, _ =>
      s.table("documents").agg(max(col("doc_id"))).first().getLong(0) + 1)
  }
  /** The same offset in oracle SQL (DuckDB computes it itself). */
  private[llm] val idOffsetSql = "(SELECT MAX(doc_id) + 1 FROM documents)"

  /** Duplicated corpus: original docs + 80%-prefix copies at id+offset. */
  private[graft] def dupCorpus(s: SparkSession): DataFrame = {
    val toks = split(col("text"), " ")
    val cut = greatest(lit(3), floor(size(toks) * 4 / 5).cast(IntegerType))
    val copy = s.table("documents").select(
      (col("doc_id") + idOffset(s)).as("doc_id"),
      array_join(slice(toks, lit(1), cut), " ").as("text"))
    s.table("documents").select(col("doc_id"), col("text")).union(copy)
  }

  private val dupCorpusSql =
    s"""SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + $idOffsetSql AS doc_id,
      |  array_to_string(list_slice(string_split(text, ' '), 1,
      |    GREATEST(3, CAST(FLOOR(len(string_split(text, ' ')) * 4 / 5) AS INT))), ' ') AS text
      |FROM documents""".stripMargin

  /** Exact dedup: group on md5(text), keep the minimum doc_id, report the
    * dropped ids. (On the raw corpus this is the identity; here the
    * corpus is doubled with *verbatim* copies at id+2·offset to give the op
    * real work.)
    */
  val d1 = Q(
    "dd_exact",
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2 * $idOffsetSql AS doc_id, text FROM documents),
      |keep AS (
      |  SELECT md5(text) AS h, MIN(doc_id) AS keeper FROM corpus GROUP BY md5(text))
      |SELECT c.doc_id, k.keeper
      |FROM corpus c JOIN keep k ON md5(c.text) = k.h
      |WHERE c.doc_id <> k.keeper
      |ORDER BY c.doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    // one shuffle (window on the digest), not groupBy + self-join: the
    // keeper is min(doc_id) over rows sharing a hash, and each text is
    // md5'd exactly once
    val base = s.table("documents").select(col("doc_id"), col("text"))
    val corpus = base.union(
      base.select((col("doc_id") + 2 * idOffset(s)).as("doc_id"), col("text")))
      .withColumn("h", md5(col("text").cast(BinaryType)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    corpus.withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), col("keeper"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  // ---- MinHash + LSH ------------------------------------------------
  // k = 8 md5-based minhashes over 3-token shingles; 4 bands × 2 rows.
  // shared with the streaming ingest filter (streaming.DocStream):
  // identical signatures + banding on both paths, so a document the
  // stream admits hashes into exactly the buckets the batch pass reads
  private[graft] val K = 8
  private[graft] val BANDS = 4

  /** Banded LSH buckets from a minhash signature: BANDS structs of
    * (band, md5(two adjacent 16-bit slices)) — one generator pass.
    */
  private[graft] def bandStructs(sig: Column): Column =
    array((0 until BANDS).map { b =>
      struct(lit(b).as("band"),
        md5(concat(element_at(sig, 2 * b + 1), element_at(sig, 2 * b + 2))
          .cast(BinaryType)).as("bucket"))
    }: _*)

  private[llm] val shinglesSql =
    """list_distinct(list_transform(
      |  generate_series(1, GREATEST(len(string_split(text, ' ')) - 2, 1)),
      |  i -> string_split(text, ' ')[i] || ' ' ||
      |       COALESCE(string_split(text, ' ')[i+1], '') || ' ' ||
      |       COALESCE(string_split(text, ' ')[i+2], '')))""".stripMargin.replace("\n", " ")

  /** Candidate-pair cap per LSH bucket. Buckets at or below the cap do
    * the standard all-pairs candidate join; a bucket ABOVE it ("hot")
    * degrades to a star pattern — every member pairs with the bucket's
    * minimum doc_id — turning a boilerplate-heavy corpus's would-be
    * O(n²) pair explosion into O(n) while still linking every member of
    * the bucket to one keeper (mass duplicates all verify against the
    * representative, which is what a compaction keeps anyway). 100 is
    * ~40× the largest fixture bucket, so oracle-checked outputs are
    * byte-identical; the adversarial spec exercises the guard directly.
    */
  private[graft] val HOT_BUCKET_CAP = 100

  /** LSH candidate pairs (id_a < id_b, distinct) from a bands relation
    * (doc_id, band, bucket), with the hot-bucket guard above.
    *
    * `cacheKey` (r19): the sized/representative window relation has
    * THREE consumers (both candidate-join sides + the hot-star arm),
    * and Spark executed the whole Exchange→Sort→Window subtree once
    * PER CONSUMER — the r18 "exchange reuse" assumption did not hold
    * once AQE turned the b-side into a broadcast (measured: three
    * 8-task window stages per dd_minhash_lsh execution, each scanning
    * the cached bands and writing its own 1.5 MB exchange). Callers
    * with a dataset-scoped key cache `sized` once (CacheOnce, bounded);
    * steady state then reads a KB-scale cached relation three times and
    * the window runs exactly once per session. Window (not a
    * collect_list aggregate) stays deliberately: WindowExec spills a
    * degenerate hot bucket to disk, a per-bucket array would not.
    */
  private[graft] def lshCandidates(
      bands: DataFrame, cap: Int = HOT_BUCKET_CAP,
      cacheKey: String = null): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket"))
    val sized0 = bands
      .withColumn("bsize", count(lit(1)).over(w))
      .withColumn("brep", min(col("doc_id")).over(w))
    val sized = if (cacheKey == null) sized0
      else graft.engine.CacheOnce(cacheKey + "/sized", sized0)
    val small = sized.filter(col("bsize") <= cap)
    val allPairs = small.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
      .join(small.select(col("doc_id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // star pattern: brep is the bucket minimum, so brep < doc_id holds
    // for every emitted pair and the (id_a < id_b) orientation is kept
    val hotStar = sized.filter(col("bsize") > cap && col("doc_id") =!= col("brep"))
      .select(col("brep").as("id_a"), col("doc_id").as("id_b"))
    allPairs.union(hotStar).distinct()
  }

  /** Spark-side shingle set (distinct 3-grams of the token list,
    * ''-padded tail — both engines compute identical shingles): the
    * native engine.expressions.Shingles3 kernel. The declarative
    * slice+zip_with formulation it replaced ran ~20× slower (HOFs are
    * interpreted per element); its history is in the Shingles3 spec,
    * which pins equivalence.
    */
  private[llm] def shinglesPadded(text: Column): Column =
    graft.engine.GraftColumns.shingles3(text)

  /** minhash_i = min over shingles of the i-th 16-bit hex slice of ONE
    * md5 per shingle (md5 bits are independent, so 8 slices ≈ 8 hash
    * functions at 1/8 the digest cost — the difference between 28M and
    * 3.5M md5 calls at sf0.1, and proportionally at 100 TB). Spark side
    * computes this natively (engine.expressions.MinHashSig); this is
    * the oracle's declarative formulation of the same kernel.
    */
  private[llm] def minhashSql(i: Int): String =
    s"list_aggregate(list_transform(hs, h -> substr(h, ${4 * i + 1}, 4)), 'min')"

  /** MinHash-LSH near-dup pairs: signature → band buckets → candidate
    * pairs sharing any bucket → verified shingle-set jaccard ≥ 0.3.
    */
  val d2 = Q(
    "dd_minhash_lsh",
    s"""WITH corpus AS ($dupCorpusSql),
       |sh AS (SELECT doc_id, $shinglesSql AS sh FROM corpus),
       |sig AS (SELECT doc_id, sh,
       |  ${(0 until K).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
       |  FROM (SELECT doc_id, sh, list_transform(sh, s -> md5(s)) AS hs FROM sh) h),
       |bands AS (
       |  ${(0 until BANDS).map(b =>
            s"SELECT doc_id, $b AS band, md5(mh${2 * b} || mh${2 * b + 1}) AS bucket FROM sig")
            .mkString(" UNION ALL ")}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |verified AS (
       |  SELECT c.id_a, c.id_b,
       |    ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |          len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jac
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.id_a
       |  JOIN sh sb ON sb.doc_id = c.id_b)
       |SELECT id_a, id_b, jac FROM verified WHERE jac >= 0.3
       |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin
  ) { s =>
    // the SAME spread shape as verifiedEdges (r18): Spark's CacheManager
    // is plan-keyed, so keeping this plan identical to dd_components'
    // edge kernel lets the family share ONE cached shingle/bands copy
    val corpus = graft.engine.Par.spreadCached(dupCorpus(s), col("doc_id"))
    // CacheOnce (bounded persist): the shingle relation feeds both the
    // signature build and the verification joins — 3× recompute without
    // it; the keyed cache releases the previous run's blocks so a
    // long-lived serving session holds at most one copy
    val sh = graft.engine.CacheOnce(
      graft.engine.CacheOnce.dsKey(s, "dd_minhash_lsh/sh"),
      corpus.select(col("doc_id"), shinglesPadded(col("text")).as("sh")))
    // signature via the native one-pass MinHashSig expression (tokenize →
    // shingle → md5 → per-slice minima in one loop, no intermediate
    // arrays); computes exactly what the declarative shingle+md5+minhash
    // chain computes, so the oracle SQL is unchanged
    // the signature kernel is BARRIERED: the optimizer otherwise
    // substitutes it into the inferred explode filter (size>0,
    // isnotnull) below — 3 evaluations per document (the r12
    // OptimizerBarrier lesson, measured on the IVF assignment)
    val sig = corpus.select(col("doc_id"),
      graft.engine.expressions.OptimizerBarrier(
        graft.engine.GraftColumns.minhashSig(col("text"), K)).as("sig"))
    // one generator pass, NOT a 4-way union (a union would re-run the
    // whole signature computation once per band); cached because the
    // bucket self-join reads this relation twice — without it every
    // per-shingle md5 runs 2×, which dominated the bench
    val bands = graft.engine.CacheOnce(
      graft.engine.CacheOnce.dsKey(s, "dd_minhash_lsh/bands"),
      sig.select(col("doc_id"), explode(bandStructs(col("sig"))).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket")))
    val cand = lshCandidates(bands,
      cacheKey = graft.engine.CacheOnce.dsKey(s, "dd_minhash_lsh"))
    val sa = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val sb = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))), 6).as("jac"))
      .filter(col("jac") >= 0.3)
      // preSort (r19): the final ORDER BY's range sampling otherwise
      // re-executes the whole verify-join subtree (measured: a second
      // zero-shuffle-write pass per execution). jac joins the keys so
      // the planted exchange is not elided as redundant against the
      // candidate distinct's (id_a, id_b) partitioning.
      .transform(graft.engine.Par.preSort(_,
        col("id_a"), col("id_b"), col("jac")))
      .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
  }

  /** SimHash (16-bit, md5-nibble hyperplanes): per-token hash nibbles
    * vote each signature bit up/down; near-identical docs land on equal
    * or 1-bit-apart signatures. Output: per-doc signature bits.
    */
  val d4 = Q(
    "dd_simhash",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
       |  FROM documents),
       |votes AS (
       |  SELECT doc_id,
       |    ${(1 to 16).map(j =>
            s"SUM(CASE WHEN substr(md5(t), $j, 1) >= '8' THEN 1 ELSE -1 END) AS v$j")
            .mkString(", ")}
       |  FROM tok GROUP BY doc_id)
       |SELECT doc_id,
       |  ${(1 to 16).map(j => s"CASE WHEN v$j > 0 THEN '1' ELSE '0' END").mkString(" || ")} AS simhash
       |FROM votes ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val tok = s.table("documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
    val voteAggs = (1 to 16).map { j =>
      sum(when(substring(md5(col("t").cast(BinaryType)), j, 1) >= "8", 1)
        .otherwise(-1)).as(s"v$j")
    }
    val votes = tok.groupBy(col("doc_id"))
      .agg(voteAggs.head, voteAggs.tail: _*)
    votes.select(col("doc_id"),
      concat((1 to 16).map(j =>
        when(col(s"v$j") > 0, "1").otherwise("0")): _*).as("simhash"))
      // preSort (r19): without it the range sampling re-runs the final
      // 16-vote aggregate merge; simhash joins the key so the exchange
      // is not elided against the groupBy(doc_id) partitioning
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("simhash")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Pairwise n-gram (3-shingle) jaccard over a corpus slice — the exact
    * verification kernel that LSH approximates. Quadratic by design;
    * bounded to a 60-doc block (at scale this is only ever run on
    * same-bucket candidates, see dd_minhash_lsh).
    */
  val d5 = Q(
    "dd_ngram_jaccard",
    s"""WITH docs AS (
       |  SELECT doc_id, $shinglesSql AS sh
       |  FROM documents WHERE doc_id < 60)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |        len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jac
       |FROM docs a JOIN docs b ON a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.02
       |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin
  ) { s =>
    val docs = s.table("documents").filter(col("doc_id") < 60)
      .select(col("doc_id"), shinglesPadded(col("text")).as("sh"))
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
      size(array_union(col("sh_a"), col("sh_b")))
    a.join(b, col("id_a") < col("id_b"))
      .filter(jac >= 0.02)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jac"))
      .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
  }

  /** Asymmetric containment dedup — the near-dup class symmetric
    * jaccard MISSES: a short document wholly contained in a longer one
    * (a quote, an excerpt, a page embedded in a crawl of the full
    * site) has low jaccard (the union is dominated by the long side)
    * but containment |A∩B| / |A| ≈ 1 on the short side. Emits both
    * directions plus which side is the contained one.
    *
    * Same bounded-pair discipline as dd_ngram_jaccard (the all-pairs
    * form is the correctness kernel; at corpus scale the pair stream
    * comes from LSH candidates — [[verifiedEdges]] — and this metric
    * replaces the jaccard verify).
    */
  val d7 = Q(
    "dd_containment",
    s"""WITH docs AS (
       |  SELECT doc_id, $shinglesSql AS sh
       |  FROM documents WHERE doc_id < 60)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6) AS cont_a,
       |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh), 6) AS cont_b,
       |  CASE WHEN len(a.sh) <= len(b.sh) THEN a.doc_id ELSE b.doc_id END AS contained_id
       |FROM docs a JOIN docs b ON a.doc_id < b.doc_id
       |WHERE GREATEST(
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh),
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh)) >= 0.05
       |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin
  ) { s =>
    containmentOf(
      s.table("documents").filter(col("doc_id") < 60), minCont = 0.05)
  }

  /** Containment core over any (doc_id, text) relation — factored for
    * the hand-built direction spec; notes on dd_containment above.
    */
  private[graft] def containmentOf(
      corpus: DataFrame, minCont: Double): DataFrame = {
    val docs = corpus
      .select(col("doc_id"), shinglesPadded(col("text")).as("sh"))
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType)
    val contA = inter / size(col("sh_a"))
    val contB = inter / size(col("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(greatest(contA, contB) >= minCont)
      .select(col("id_a"), col("id_b"),
        round(contA, 6).as("cont_a"),
        round(contB, 6).as("cont_b"),
        when(size(col("sh_a")) <= size(col("sh_b")), col("id_a"))
          .otherwise(col("id_b")).as("contained_id"))
      .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
  }

  /** SemDeDup-style semantic dedup over the embedding corpus (Abbas et
    * al. 2023, arXiv:2303.09540 — public method): cluster vectors,
    * compare each member ONLY to its cluster representative, drop
    * members whose cosine to the representative exceeds the threshold.
    * The point vs pairwise near-dup (pipe_embed_dedup) is the cost
    * model: one comparison per vector — O(n) verify work, no
    * candidate-pair stream at all.
    *
    * Clusters here are the 12-bit hyperplane signature (deterministic,
    * shared with nn_lsh_buckets/pipe_embed_dedup — SQL-expressible, so
    * the oracle replays it exactly). The production posture — the
    * TRAINED IVF k-means lists as the clustering, same rep-compare plan
    * shape — is the declared query [[d8b dd_semantic_ivf]] below.
    * Representative = the cluster's minimum vec_id. Emits every
    * non-singleton member with its cosine and the drop verdict.
    *
    * Scale: ONE shuffle on the signature serves the representative
    * aggregate and the member join; the per-member cosine is a codegen
    * kernel against the rep's vector fetched by equi-join — at any
    * corpus size the work is |corpus| dot products, executor-local.
    */
  val d8 = Q(
    "dd_semantic",
    """WITH planes AS (
      |  SELECT p,
      |    list_transform(range(64), d ->
      |      CASE WHEN (strpos('0123456789abcdef',
      |        substr(md5(p::VARCHAR || ':' || d::VARCHAR), 2, 1)) - 1) % 2 = 0
      |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS plane
      |  FROM range(12) t(p)),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM embeddings),
      |bits AS (
      |  SELECT e.vec_id, p.p,
      |    CASE WHEN list_dot_product(e.v, p.plane) > 0 THEN '1' ELSE '0' END AS bit
      |  FROM e CROSS JOIN planes p),
      |sigs AS (SELECT vec_id, string_agg(bit, '' ORDER BY p) AS sig
      |         FROM bits GROUP BY vec_id),
      |rep AS (SELECT sig, MIN(vec_id) AS rep_id, COUNT(*) AS cluster_size
      |        FROM sigs GROUP BY sig),
      |j AS (
      |  SELECT s.vec_id, r.rep_id, r.cluster_size,
      |    list_dot_product(ea.v, eb.v) /
      |      (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
      |  FROM sigs s
      |  JOIN rep r USING (sig)
      |  JOIN e ea ON ea.vec_id = s.vec_id
      |  JOIN e eb ON eb.vec_id = r.rep_id
      |  WHERE s.vec_id <> r.rep_id)
      |SELECT vec_id, rep_id, CAST(cluster_size AS BIGINT) AS cluster_size,
      |  ROUND(cos, 6) AS cos, cos >= 0.2 AS dropped
      |FROM j ORDER BY vec_id ASC NULLS LAST""".stripMargin
  ) { s =>
    semanticDedupOf(s.table("embeddings"), "dd_semantic", minCos = 0.2)
  }

  /** dd_semantic's PRODUCTION clustering (r15 VERDICT item 4, promoted
    * from a scaladoc sentence to an oracled query): SemDeDup with the
    * cluster structure being the TRAINED per-dataset IVF coarse
    * quantizer (SimilarityOps.buildIvfIndex — Lloyd's k-means, 3
    * rounds, deterministic md5-ordered sample init) instead of the
    * hyperplane signature. Assignment is the IVF list choice itself:
    * argmax dot(v, c)/||c|| over the 16 trained centroids via the
    * codegen IvfNearest kernel (ties → lowest cid), i.e. exactly the
    * list the vector would live in inside the nn_ivf_topk index. Then
    * the dd_semantic rep-compare shape verbatim: rep = min vec_id per
    * list, one cosine per member against its rep, drop at ≥ 0.2.
    *
    * Oracle: Lloyd's means are distributed floating-point sums, so NO
    * SQL can restate the TRAINING bit-for-bit (summation order). What
    * the oracle CAN restate exactly — the nn_ivf_topk discipline — is
    * everything downstream of the trained constants: the centroids and
    * their engine-fold norms ride the oracle as DOUBLE[] literals
    * (rendered at dump time via Q.dynOracle, Double.toString
    * round-trips exactly and list_dot_product folds left-to-right like
    * IvfNearest), making assignment, rep choice, cluster sizes,
    * cosines and verdicts all bit-comparable. Training itself is
    * pinned by KMeansSpec/ANN recall ladders, same split as the ANN
    * indexes (ann-benchmarks style: build offline, measure the served
    * path).
    *
    * Scale (the reason this is the production posture): assignment is
    * a MAP-ONLY projection against 16 broadcast-literal centroids — at
    * 100 TB the only exchanges are the 16-row rep aggregate and the
    * broadcast of 16 rep vectors back onto the corpus; the hyperplane
    * variant's signature shuffle disappears entirely. Trained lists
    * also cluster semantically (vs the hyperplane's fixed random
    * cuts), which is what SemDeDup's rep-compare quality depends on —
    * and granularity is the quality knob: production sizes nlists with
    * the corpus ([[semanticIvfListsFor]], √n-class) rather than this
    * fixture constant. Measured (SCALE.md §r17, 2M vectors): √n lists
    * raise mean member→rep cosine 0.150 → 0.225 and the dropped share
    * 34% → 59% at the fixed 0.2 threshold, for n·√n map-only
    * assignment flops and a sample-capped (~constant) k-means build.
    */
  private[graft] val SemanticIvfLists = 16

  /** Corpus-scaled cluster count for the PRODUCTION SemDeDup posture
    * (r16 VERDICT wrong-#3): SemDeDup's dedup QUALITY depends on
    * cluster granularity — the paper sizes cluster counts with the
    * corpus, and a fixed 16 means 125k-vector clusters compared
    * against ONE representative at the 1000× tier. √n-class sizing
    * (the ANN ladder discipline: cells stay ~√n so assignment flops
    * n·√n and rep-compare stays O(n)) with the fixture constant as the
    * floor — the DECLARED query keeps [[SemanticIvfLists]] for oracle
    * stability; this knob is the scale path, measured as a quality
    * curve (mean member→rep cosine, dropped fraction vs nlists) in
    * SCALE.md's ladder.
    */
  private[graft] def semanticIvfListsFor(n: Long): Int =
    math.max(SemanticIvfLists,
      math.min(4096, math.round(math.sqrt(n.toDouble)).toInt))

  private[graft] def semanticIvfCents(
      s: SparkSession): (Array[Array[Double]], Array[Double]) =
    semanticIvfCentsAt(s, SemanticIvfLists)

  private[graft] def semanticIvfCentsAt(
      s: SparkSession, nlists: Int): (Array[Array[Double]], Array[Double]) = {
    val cents = SimilarityOps.buildIvfIndex(s, nlists)
      .sortBy(_._1).map(_._2).toArray
    (cents, graft.engine.expressions.IvfNearest.norms(cents))
  }

  private def semanticIvfOracle(): String = {
    val s0 = SparkSession.active
    val s = if (graft.engine.Tables.dirOf(s0).isDefined) s0 else {
      // incidental consumers (specs reading OTHER entries force the
      // whole oracleSql map) can render before any registration: give
      // them the tiny fixture on an isolated child session. The real
      // dump paths (Verify / Bench's oracle_sql.json) always run with
      // the target dir registered on the active session, so this
      // fallback never decides a driver artifact.
      val c = s0.newSession()
      graft.engine.Tables.register(c, "/root/testdata/sf0.001")
      c
    }
    val (cents, cn) = semanticIvfCents(s)
    val values = cents.indices.map { i =>
      s"($i, [${cents(i).map(_.toString).mkString(", ")}]::DOUBLE[], ${cn(i)})"
    }.mkString(",\n    ")
    s"""WITH cents(cid, c, nrm) AS (VALUES
       |    $values),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM embeddings),
       |asg AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_dot_product(e.v, c.c) / c.nrm DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cents c) x
       |  WHERE rn = 1),
       |rep AS (SELECT cid, MIN(vec_id) AS rep_id, COUNT(*) AS cluster_size
       |        FROM asg GROUP BY cid),
       |j AS (
       |  SELECT a.vec_id, r.rep_id, r.cluster_size,
       |    list_dot_product(ea.v, eb.v) /
       |      (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
       |  FROM asg a
       |  JOIN rep r USING (cid)
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = r.rep_id
       |  WHERE a.vec_id <> r.rep_id)
       |SELECT vec_id, rep_id, CAST(cluster_size AS BIGINT) AS cluster_size,
       |  ROUND(cos, 6) AS cos, cos >= 0.2 AS dropped
       |FROM j ORDER BY vec_id ASC NULLS LAST""".stripMargin
  }

  val d8b: Q = Q.dynOracle("dd_semantic_ivf")(semanticIvfOracle()) { s =>
    semanticDedupIvfAt(s, SemanticIvfLists)
  }

  /** The dd_semantic_ivf body over an arbitrary trained cluster count —
    * the corpus-scaled production path ([[semanticIvfListsFor]]); the
    * declared query calls it at the fixture constant.
    */
  private[graft] def semanticDedupIvfAt(s: SparkSession, nlists: Int)
      : DataFrame = {
    import graft.engine.GraftColumns.dot
    val (cents, cn) = semanticIvfCentsAt(s, nlists)
    // map-only assignment: the nn_ivf coarse-quantizer kernel, n=1 —
    // max dot/||c||, ties to the lowest cid (IvfNearest.assign's
    // insertion order == the oracle's ORDER BY d DESC, cid ASC). Above
    // SimilarityOps.CoarseAssignAbove lists the assignment goes
    // two-level (quantizer-assisted — sublinear in nlists; the declared
    // query's 16 lists stay brute and oracle-exact)
    val asg = s.table("embeddings").select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("v"),
      element_at(SimilarityOps.nearestListsColFor(
        s, col("embedding"), cents, cn, 1, s"sem/$nlists"), 1).as("cid"))
    // rep = the list's min-id member, its VECTOR carried through the
    // same 16-row aggregate via min_by (vec_id is unique, so min_by is
    // deterministic and equals the oracle's rep_id equi-join) — no
    // third scan, and the broadcast side is an Aggregate, bounded by
    // nlists by construction
    val rep = asg.groupBy(col("cid"))
      .agg(min(col("vec_id")).as("rep_id"), count(lit(1)).as("cluster_size"),
        min_by(col("v"), col("vec_id")).as("vb"))
    val cos = dot(col("v"), col("vb")) /
      (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("vb"), col("vb"))))
    asg.join(broadcast(rep), "cid")
      .filter(col("vec_id") =!= col("rep_id"))
      .select(col("vec_id"), col("rep_id"), col("cluster_size"),
        round(cos, 6).as("cos"), (cos >= 0.2).as("dropped"))
      // preSort (r19): no range-sampling re-exec of the assignment +
      // rep-compare body
      .transform(graft.engine.Par.preSort(_, col("vec_id")))
      .orderBy(col("vec_id").asc_nulls_last)
  }

  /** Semantic-dedup core over any (vec_id, embedding) relation —
    * factored for the hand-built cluster spec; notes on dd_semantic
    * above.
    */
  private[graft] def semanticDedupOf(
      embeddings: DataFrame, tag: String, minCos: Double): DataFrame = {
    import graft.engine.GraftColumns.dot
    // dataset-scoped cache keys (r15 sweep): tag alone thrashed the slot
    // when the bench alternated warm-dir and fixture datasets
    val k = graft.engine.CacheOnce.dsKey(embeddings.sparkSession, tag)
    val e = embeddings.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("v"))
    val sigs = graft.engine.CacheOnce(s"$k/sigs",
      embeddings.select(col("vec_id"),
        SimilarityOps.hyperplaneSig(col("embedding"), 12).as("sig")))
    val rep = sigs.groupBy(col("sig"))
      .agg(min(col("vec_id")).as("rep_id"), count(lit(1)).as("cluster_size"))
    val cos = dot(col("va"), col("vb")) /
      (sqrt(dot(col("va"), col("va"))) * sqrt(dot(col("vb"), col("vb"))))
    sigs.join(rep, "sig")
      .filter(col("vec_id") =!= col("rep_id"))
      .join(e.select(col("vec_id"), col("v").as("va")), "vec_id")
      .join(e.select(col("vec_id").as("rep_id"), col("v").as("vb")), "rep_id")
      .select(col("vec_id"), col("rep_id"), col("cluster_size"),
        round(cos, 6).as("cos"), (cos >= minCos).as("dropped"))
      // preSort (r19): no range-sampling re-exec of the rep-compare joins
      .transform(graft.engine.Par.preSort(_, col("vec_id")))
      .orderBy(col("vec_id").asc_nulls_last)
  }

  /** Verified near-dup edges (id_a < id_b, jaccard ≥ `minJac`) over a
    * corpus — the shared kernel of dd_minhash_lsh and dd_components:
    * signature → banded buckets → guarded candidates → shingle-set
    * verification. `tag` keys the CacheOnce slots so concurrent queries
    * don't fight over one cache entry.
    */
  private[graft] def verifiedEdges(
      corpus: DataFrame, tag: String, minJac: Double): DataFrame = {
    val k = graft.engine.CacheOnce.dsKey(corpus.sparkSession, tag) // r15 sweep
    // spread ahead of the shingle/minhash kernels (r18, guide §2.5):
    // the fixture scans are single-row-group, so the kernels otherwise
    // run 1-2 tasks wide on a 32-core host
    val c = graft.engine.Par.spreadCached(corpus, col("doc_id"))
    val sh = graft.engine.CacheOnce(s"$k/sh",
      c.select(col("doc_id"), shinglesPadded(col("text")).as("sh")))
    val sig = c.select(col("doc_id"),
      graft.engine.expressions.OptimizerBarrier( // 3×-eval guard, as above
        graft.engine.GraftColumns.minhashSig(col("text"), K)).as("sig"))
    val bands = graft.engine.CacheOnce(s"$k/bands",
      sig.select(col("doc_id"), explode(bandStructs(col("sig"))).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket")))
    val cand = lshCandidates(bands, cacheKey = k)
    val sa = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val sb = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
        size(array_union(col("sh_a"), col("sh_b"))) >= minJac)
      .select(col("id_a"), col("id_b"))
  }

  /** Connected components over the verified near-dup graph: each doc is
    * labeled with the MINIMUM doc_id reachable through near-dup edges —
    * the component representative a compaction keeps. LSH pairs alone
    * under-merge (A~B and B~C near-dups can leave A,C unpaired); real
    * dedup pipelines close the pair graph into components first, and
    * this is the operator that does it.
    *
    * Scale: min-label propagation, NOT pairwise transitive closure.
    * Closure materializes the reach relation — Σ|component|² rows — and
    * a corpus whose near-dup clusters are large (mass boilerplate)
    * turns that quadratic: measured 79 s at sf0.1 on this suite before
    * the swap, starving every concurrent query. Propagation state is
    * one (node, label) row per node, each round is one equi-join + one
    * min-aggregate on the same key, and rounds = graph diameter (dup
    * clusters are shallow; the hot-bucket star guard bounds
    * boilerplate clusters at diameter 2). The oracle keeps the closure
    * formulation (pair space is fine at oracle scale, sf0.01) and
    * aggregates it to the same (doc_id, component, csize) shape.
    */
  val d6 = Q(
    "dd_components",
    s"""WITH RECURSIVE corpus AS ($dupCorpusSql),
       |sh AS (SELECT doc_id, $shinglesSql AS sh FROM corpus),
       |sig AS (SELECT doc_id, sh,
       |  ${(0 until K).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
       |  FROM (SELECT doc_id, sh, list_transform(sh, s -> md5(s)) AS hs FROM sh) h),
       |bands AS (
       |  ${(0 until BANDS).map(b =>
            s"SELECT doc_id, $b AS band, md5(mh${2 * b} || mh${2 * b + 1}) AS bucket FROM sig")
            .mkString(" UNION ALL ")}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |edges AS (
       |  SELECT c.id_a, c.id_b
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.id_a
       |  JOIN sh sb ON sb.doc_id = c.id_b
       |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |        len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.3),
       |sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM edges
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM edges),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM corpus
       |  UNION
       |  SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
       |comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a)
       |SELECT c.doc_id, c.component, CAST(n.cnt AS BIGINT) AS csize
       |FROM comp c
       |JOIN (SELECT component, COUNT(*) AS cnt FROM comp GROUP BY component) n
       |  USING (component)
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val corpus = dupCorpus(s)
    components(corpus.select(col("doc_id")),
      verifiedEdges(corpus, "dd_components", 0.3), "dd_components")
      // preSort (r19): the range sampling otherwise re-runs the
      // label×size join of the final fixpoint state
      .transform(graft.engine.Par.preSort(_, col("doc_id")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Min-label connected components: (doc_id, component, csize) for
    * every node, component = min doc_id reachable over the UNDIRECTED
    * closure of `edges` (id_a, id_b), csize = component population.
    * Label-propagation fixpoint: state is ONE row per node; each round
    * propagates labels across edges and keeps the per-node minimum;
    * labels only decrease, so the label SUM is a monotone convergence
    * metric — equal sums ⇔ no label moved ⇔ done (one cheap aggregate
    * per round, no change-detection join). Factored for the hand-graph
    * spec; scale notes on dd_components above.
    */
  private[graft] def components(
      nodes: DataFrame, edges: DataFrame, tag: String,
      starAfter: Int = 16): DataFrame = {
    // symmetric edge list, cached: re-read every round — without the
    // persist each round re-runs the whole edge-producing pipeline
    val sym = graft.engine.CacheOnce(
      graft.engine.CacheOnce.dsKey(nodes.sparkSession, s"$tag/sym"), // r15 sweep
      edges.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(edges.select(col("id_b").as("src"), col("id_a").as("dst"))))
    // checkpoint + label sum in ONE job (r18): the convergence metric
    // was a second action per round (checkpoint job + DECIMAL-sum job).
    // localCheckpointWithLongColSum keeps the exact-at-any-node-count
    // guarantee (64-bit chunks spill into BigInteger before overflow —
    // a bare Long sum could overflow on a 100 TB corpus's id space and
    // fake convergence).
    def ckptSum(df: DataFrame): (DataFrame, java.math.BigInteger) =
      org.apache.spark.sql.GraftPlans.localCheckpointWithLongColSum(df, 1)
    var (labels, prev) = ckptSum(
      nodes.select(col("doc_id"), col("doc_id").as("component")))
    var converged = false
    val maxIter = 50
    var it = 0
    // warm-up round cap — same contract as Recursive.fixpoint's:
    // thread-confined to Bench's graft-warm-* pool (r15 ADVICE), so a
    // serving query racing the warm pass can never see truncated labels
    val warmCap = graft.engine.Recursive.warmFixpointCap
    while (!converged && it < maxIter && warmCap.forall(it < _)) {
      if (it == starAfter) {
        // Adversarially deep graph (near-dup chain drifting across LSH
        // buckets): propagation + shortcutting has not converged in
        // `starAfter` rounds, so switch to the large-star/small-star
        // algorithm — provably O(log² n) rounds with per-round state
        // bounded by the CURRENT edge list (the union-based shortcut
        // rounds instead re-feed the full label relation every round).
        // Restarting from the original edges is correct regardless of
        // partial progress; the fallback trades the lost rounds for a
        // convergence bound that no longer depends on graph diameter.
        // The trigger sits at 16 (doubling starts at round 5, so by 16
        // it has covered diameter ~2^11 ≈ 2k): the round-8 sf10
        // measurement showed firing at 10 ABANDONS a doubling run that
        // would converge by round ~13 on a diameter-400 component —
        // 167 s for trigger-at-10 vs 13.6 s letting doubling finish,
        // at 1M nodes (SCALE.md). Star remains the guard for genuinely
        // deeper graphs.
        org.apache.spark.sql.GraftPlans.checkpointRdd(labels)
          .foreach(_.unpersist(blocking = false))
        labels = starLabels(nodes,
          sym.select(col("src").as("id_a"), col("dst").as("id_b")))
        converged = true
      } else {
      val prop = labels.join(sym, col("doc_id") === col("src"))
        .select(col("dst").as("doc_id"), col("component"))
      // Pointer doubling (shortcutting) on DEEP graphs only: from round 6
      // also propagate the label OF the label — label(v) :=
      // min(label(v), label(label(v))). Every label is some node's doc_id
      // (min over seen ids, seeded with own id), so the self-join is
      // total. Edge-propagation alone needs rounds = graph diameter; with
      // shortcutting the label tree halves in height each round, so a
      // chain of near-dups drifting across LSH buckets converges in
      // O(log diameter) instead of hitting maxIter. Typical corpora
      // (diameter ≤ hot-bucket star bound) converge before the extra
      // join's cost is ever paid.
      val base = labels.union(prop)
      val withShortcut =
        if (it < 5) base
        else base.union(labels.as("a")
          .join(labels.as("b"), col("a.component") === col("b.doc_id"))
          .select(col("a.doc_id").as("doc_id"),
            col("b.component").as("component")))
      // checkpoint (truncates lineage: plan depth stays O(1)) and the
      // convergence sum in one job — see ckptSum above
      val (next, cur) = ckptSum(withShortcut
        .groupBy(col("doc_id")).agg(min(col("component")).as("component")))
      // null sum = empty node set (degenerate but legal input)
      converged = (cur == null && prev == null) ||
        (cur != null && prev != null && cur.compareTo(prev) == 0)
      // the retired round's checkpoint blocks are dead the moment `next`
      // materialized — release them now instead of waiting for a GC that
      // a large idle heap may not run for minutes (blocks otherwise
      // accumulate across rounds AND across concurrent queries)
      org.apache.spark.sql.GraftPlans.checkpointRdd(labels)
        .foreach(_.unpersist(blocking = false))
      prev = cur
      labels = next
      }
      it += 1
    }
    if (!converged && warmCap.isEmpty)
      throw new IllegalStateException(
        s"components: no convergence after $maxIter rounds " +
          s"(with pointer doubling this bounds diameter by ~2^$maxIter)")
    if (!converged)
      System.err.println(s"[warm] components TRUNCATED at $it rounds " +
        s"(cap ${warmCap.get}) — warm-pass plan compilation only, result discarded")
    // the FINAL round's blocks feed the returned plan — release them only
    // when the enclosing query's scratch scope closes
    org.apache.spark.sql.GraftPlans.checkpointRdd(labels)
      .foreach(graft.engine.CacheOnce.deferRelease)
    val sizes = labels.groupBy(col("component")).agg(count(lit(1)).as("csize"))
    labels.join(sizes, "component")
      .select(col("doc_id"), col("component"), col("csize"))
  }

  /** Connected-component labels (doc_id, component) via alternating
    * large-star/small-star edge rewriting (the MapReduce CC algorithm of
    * Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14 — public algorithm, re-expressed as DataFrame rounds):
    *
    *  - large-star(u): every neighbor v > u is re-pointed at
    *    m = min(N(u) ∪ {u});
    *  - small-star(u), over edges oriented child(u) > parent(v): every
    *    parent and u itself are re-pointed at the minimum parent.
    *
    * Each combined round is two groupBy-min + join passes over the
    * current edge list and converges in O(log² n) rounds INDEPENDENT of
    * graph diameter — the fallback bound for adversarially deep dup
    * chains where propagation rounds ∝ diameter. At fixpoint the edge
    * list IS the component mapping: stars (child → min-root). Singletons
    * never appear in edges and keep their own id via the left join.
    */
  private[graft] def starLabels(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // canonical orientation child > parent; self-loops dropped
    var e = edges
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v")).distinct().localCheckpoint()
    // edge-set fixpoint check: (count, order-free hash sum) — exact
    // equality of sets is an except() anti-join; the pair collides only
    // if xxhash64 collides across the whole set sum, acceptable for a
    // convergence test backed by the maxIter guard
    def chk(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast(DecimalType(38, 0)))).first()
      (r.getLong(0), r.getDecimal(1))
    }
    var prev = chk(e)
    var it = 0
    val maxIter = 60
    var done = false
    while (!done && it < maxIter) {
      // large-star over the SYMMETRIC adjacency
      val symE = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = symE.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = symE.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
      // small-star over child>parent orientation (large's output keeps it:
      // emitted (v, m) has v > u ≥ m)
      val minsS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = large.join(minsS, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(minsS.select(col("u"), col("m").as("v")))
        .distinct()
      val next = small.localCheckpoint()
      val cur = chk(next)
      done = cur == prev
      org.apache.spark.sql.GraftPlans.checkpointRdd(e)
        .foreach(_.unpersist(blocking = false))
      e = next
      prev = cur
      it += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"starLabels: no convergence after $maxIter star rounds")
    val lab = nodes.select(col("doc_id"))
      .join(e.select(col("u").as("doc_id"), col("v").as("comp")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("component"))
      .localCheckpoint()
    org.apache.spark.sql.GraftPlans.checkpointRdd(e)
      .foreach(_.unpersist(blocking = false))
    lab
  }

  /** Canonical-representative selection (round 9): the standard step
    * AFTER any dedup pass — per duplicate cluster keep ONE document, by
    * the usual pipeline policy "longest wins, ties to the smallest id"
    * (e.g. RefinedWeb/CCNet keep-heuristics; public lineage). Clusters
    * here are the cheap blocking key the corpus actually collides on (a
    * 3-token prefix fingerprint); the SAME shape composes over any
    * cluster label (dd_exact digests, dd_components labels). One
    * shuffle: rank inside the cluster window, aggregate the survivors.
    */
  val d9 = Q(
    "dd_keep_longest",
    """WITH blocked AS (
      |  SELECT doc_id, n_chars,
      |    array_to_string(string_split(text, ' ')[1:3], ' ') AS ck
      |  FROM documents),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY ck ORDER BY n_chars DESC, doc_id ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY ck) AS members
      |  FROM blocked)
      |SELECT ck, CAST(members AS BIGINT) AS dup_cnt,
      |  doc_id AS rep_id, CAST(n_chars AS BIGINT) AS rep_chars
      |FROM ranked WHERE rn = 1 AND members > 1
      |ORDER BY ck ASC NULLS LAST""".stripMargin
  ) { s =>
    val ck = array_join(slice(split(col("text"), " "), 1, 3), " ")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ck"))
    s.table("documents")
      .select(col("doc_id"), col("n_chars"), ck.as("ck"))
      .withColumn("rn", row_number().over(
        w.orderBy(col("n_chars").desc, col("doc_id").asc)))
      .withColumn("members", count(lit(1)).over(w))
      .filter(col("rn") === 1 && col("members") > 1)
      .select(col("ck"), col("members").cast(LongType).as("dup_cnt"),
        col("doc_id").as("rep_id"), col("n_chars").cast(LongType).as("rep_chars"))
      // preSort (r19): no range-sampling re-exec of the ranking windows.
      // Keyed on rep_id (unique per output row) rather than ck: a
      // ck-prefixed hash key would both be elided against the window's
      // ck partitioning AND double-count in PlanSpec's one-ck-exchange
      // pin; any spreading key works — the final sort pins row order.
      .transform(graft.engine.Par.preSort(_, col("rep_id")))
      .orderBy(col("ck").asc_nulls_last)
  }

  /** The d2 signature+banding chain in oracle SQL over a named shingle
    * relation — `${p}_sig` (8 minhash slices) and `${p}_bands` (4 band
    * buckets), verbatim the dd_minhash_lsh formulation so the two
    * operators cannot drift.
    */
  private def sigBandsSqlFor(shRel: String, p: String): String = {
    val mh = (0 until K).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")
    val bands = (0 until BANDS).map(b =>
      s"SELECT doc_id, $b AS band, md5(mh${2 * b} || mh${2 * b + 1}) AS bucket FROM ${p}_sig")
      .mkString(" UNION ALL ")
    s"""${p}_sig AS (SELECT doc_id, $mh FROM
       |  (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM $shRel) h),
       |${p}_bands AS ($bands)""".stripMargin
  }

  /** Incremental ingest dedup (r14): the production shape — a NEW BATCH
    * arrives and must be classified against the EXISTING corpus without
    * re-deduping the corpus (a crawler's daily delta vs 100 TB of
    * history). Verdicts, in precedence order: `exact_dup` (digest
    * matches a corpus doc), `near_dup` (shares an LSH band bucket with
    * a corpus doc AND verified shingle jaccard ≥ 0.3 — the d2
    * signatures verbatim), else `new`; `match_id` is the smallest
    * matching corpus id (NULL for new). The batch is corpus-derived,
    * per source doc_id mod 3 — a verbatim copy (exact), an 80%-token
    * prefix (high-probability near: ~0.75-jaccard pairs can still miss
    * all 4 LSH bands a few percent of the time, so the verdict is
    * banding-scoped by spec rather than guaranteed by construction —
    * both engines apply the same banding, which is what the oracle
    * checks), a token-reversal (new: 3-gram shingles are
    * direction-sensitive, so reversal shares almost none).
    *
    * Scale layout: the corpus side is touched exactly twice, both times
    * as NARROW relations — a 128-bit digest (exact arm) and (band,
    * bucket) keys (near arm); full corpus text never shuffles, and
    * candidate verification joins shingle SETS only for bucket-matched
    * pairs. Corpus bucket membership is capped at [[HOT_BUCKET_CAP]]
    * smallest ids per bucket (the d2 hot-bucket discipline, adapted:
    * a boilerplate mega-bucket otherwise multiplies every batch probe
    * by its size) — and the cap is PART OF THE CONTRACT, so the oracle
    * SQL states it too (`c_capped`; the r14 mm_phash_dedup lesson —
    * an uncapped oracle diverges the moment a tier corpus crosses the
    * cap). In a real deployment the
    * corpus digests/buckets are a precomputed index and the batch side
    * is bounded by the ingest window; here both build in-plan, which
    * is the conservative (join, not broadcast) posture.
    */
  val d10 = Q(
    "dd_incremental",
    s"""WITH batch AS (
       |  SELECT doc_id + $idOffsetSql AS doc_id,
       |    CASE CAST(doc_id % 3 AS INT)
       |      WHEN 0 THEN text
       |      WHEN 1 THEN array_to_string(list_slice(string_split(text, ' '), 1,
       |        GREATEST(3, CAST(FLOOR(len(string_split(text, ' ')) * 4 / 5) AS INT))), ' ')
       |      ELSE array_to_string(list_reverse(string_split(text, ' ')), ' ')
       |    END AS text
       |  FROM documents),
       |corpus AS (SELECT doc_id, text FROM documents),
       |ex AS (
       |  SELECT b.doc_id, MIN(c.doc_id) AS match_id
       |  FROM batch b JOIN corpus c ON md5(b.text) = md5(c.text)
       |  GROUP BY b.doc_id),
       |bsh AS (SELECT doc_id, $shinglesSql AS sh FROM batch),
       |csh AS (SELECT doc_id, $shinglesSql AS sh FROM corpus),
       |${sigBandsSqlFor("bsh", "b")},
       |${sigBandsSqlFor("csh", "c")},
       |c_capped AS (
       |  SELECT doc_id, band, bucket FROM (
       |    SELECT doc_id, band, bucket,
       |      row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS brn
       |    FROM c_bands) r WHERE brn <= $HOT_BUCKET_CAP),
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
       |  FROM b_bands b JOIN c_capped c ON b.band = c.band AND b.bucket = c.bucket),
       |near AS (
       |  SELECT bid AS doc_id, MIN(cid) AS match_id
       |  FROM cand
       |  JOIN bsh ON bsh.doc_id = cand.bid
       |  JOIN csh ON csh.doc_id = cand.cid
       |  WHERE ROUND(CAST(len(list_intersect(bsh.sh, csh.sh)) AS DOUBLE) /
       |        len(list_distinct(list_concat(bsh.sh, csh.sh))), 6) >= 0.3
       |  GROUP BY bid)
       |SELECT b.doc_id,
       |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
       |       WHEN n.doc_id IS NOT NULL THEN 'near_dup'
       |       ELSE 'new' END AS verdict,
       |  CASE WHEN e.doc_id IS NOT NULL THEN e.match_id ELSE n.match_id END AS match_id
       |FROM batch b
       |LEFT JOIN ex e ON e.doc_id = b.doc_id
       |LEFT JOIN near n ON n.doc_id = b.doc_id
       |ORDER BY b.doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val corpus = s.table("documents").select(col("doc_id"), col("text"))
    incrementalVerdicts(syntheticBatch(s), corpus, HOT_BUCKET_CAP)
  }

  /** The corpus-derived ingest batch both dd_incremental arms classify
    * (per source doc_id mod 3: verbatim / 80%-prefix / reversal — see
    * the d10 scaladoc). CacheOnce'd under a dataset-prefixed key so the
    * bench's warm-dir and served-fixture sessions don't evict each
    * other's copy, and so d10/d11 share one cached batch.
    */
  private def syntheticBatch(s: org.apache.spark.sql.SparkSession): DataFrame = {
    val toks = split(col("text"), " ")
    val cut = greatest(lit(3), floor(size(toks) * 4 / 5).cast(IntegerType))
    graft.engine.CacheOnce(
      graft.engine.Tables.dirOf(s).getOrElse("?") + "/dd_incremental/batch",
      s.table("documents").select(
        (col("doc_id") + idOffset(s)).as("doc_id"),
        when(col("doc_id") % 3 === 0, col("text"))
          .when(col("doc_id") % 3 === 1, array_join(slice(toks, lit(1), cut), " "))
          .otherwise(array_join(reverse(toks), " ")).as("text")))
  }

  /** The dd_incremental classification over any (doc_id, text) batch /
    * corpus pair — split out so the spec can pin the hot-bucket guard
    * and verdict precedence on adversarial hand-built corpora. The
    * corpus side builds in-plan here (the conservative posture); the
    * indexed path ([[incrementalIndex]] + [[classifyBatch]]) feeds the
    * SAME classification code the precomputed relations instead.
    */
  private[graft] def incrementalVerdicts(batch: DataFrame, corpus: DataFrame,
      cap: Int): DataFrame = {
    val (ex, bands, csh) = corpusSideRelations(corpus, cap)
    classifyBatch(batch, ex, bands, csh)
  }

  /** (doc_id → band, bucket) rows via the one-pass minhash kernel —
    * BARRIERED like d2: the optimizer otherwise clones the kernel into
    * inferred generator/notnull filters.
    */
  private def bandsOf(src: DataFrame, out: String) = {
    import graft.engine.expressions.OptimizerBarrier
    src
      .select(col("doc_id").as(out),
        OptimizerBarrier(graft.engine.GraftColumns.minhashSig(col("text"), K))
          .as("sig"))
      .select(col(out), explode(bandStructs(col("sig"))).as("bb"))
      .select(col(out), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** The three corpus-side relations every ingest batch probes: content
    * digests (exact arm), capped LSH band buckets (candidate arm), and
    * shingle sets (verify arm). All keyed by corpus id; full text never
    * leaves the corpus scan.
    */
  private[graft] def corpusSideRelations(corpus0: DataFrame, cap: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    // spread ahead of the digest/minhash/shingle kernels (r18, guide
    // §2.5): single-row-group fixture scans otherwise run them 1-task
    val corpus = graft.engine.Par.spreadCached(corpus0, col("doc_id"))
    val ex = corpus.select(col("doc_id").as("cid"),
      md5(col("text").cast(BinaryType)).as("h"))
    // hot-bucket guard on the corpus side: keep the cap smallest ids
    // per bucket (windowed on the same key the join shuffles on, so
    // EnsureRequirements reuses the exchange); ~40× headroom at fixture
    // scale ⇒ nothing dropped ⇒ oracle-identical
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("cid").asc)
    val cBands = bandsOf(corpus, "cid")
      .withColumn("brn", row_number().over(wB))
      .filter(col("brn") <= cap).drop("brn")
    val csh = corpus.select(col("doc_id").as("cid"),
      shinglesPadded(col("text")).as("sh_c"))
    (ex, cBands, csh)
  }

  /** Near arm only: (doc_id, nd_match) for batch docs with a verified
    * near match — band-bucket candidates against the capped corpus
    * bands, shingle-jaccard verify at ROUND(j,6) ≥ 0.3, min matching
    * cid. Split out of [[classifyBatch]] (pure extraction, plan
    * unchanged) so the staged ingest composition can run it on the
    * exact gate's SURVIVORS alone (DocStream.classifyIngestStaged).
    *
    * pruneVerify — the BOUNDED-INGEST posture (streaming classifyIngest,
    * the window harness): semi-prune the index's FAT payload (per-doc
    * shingle sets) by the candidate cid set before the verify join.
    * Measured at the 1000× tier (5M-doc index, 1000-doc trigger): the
    * direct spelling sort-merged the whole shingle relation per batch
    * (3.9 GB exchanged, median 44 s/trigger REGARDLESS of batch size);
    * pruned, AQE broadcasts the KB-scale cid set and the fat relation
    * reduces to a cached scan + survivor-only join — median 14.3 s.
    * Default OFF because a CORPUS-SIZED batch (the declared queries'
    * fixture contract) is the opposite regime: its cid set ≈ the whole
    * corpus, the semi-join prunes nothing and costs an extra pass —
    * measured 0.66 → 1.25 s isolated at sf0.1. The two spellings are
    * result-identical; StreamingSpec pins stream(pruned) == batch
    * (direct) equality.
    */
  private[graft] def nearMatches(batch: DataFrame, cBands: DataFrame,
      cSh: DataFrame, pruneVerify: Boolean): DataFrame = {
    val cand = bandsOf(batch, "bid").join(cBands, Seq("band", "bucket"))
      .select(col("bid"), col("cid")).distinct()
    val bsh = batch.select(col("doc_id").as("bid"), shinglesPadded(col("text")).as("sh_b"))
    val verifySide =
      if (pruneVerify) {
        val candCids = cand.groupBy(col("cid")).agg(count(lit(1))).select(col("cid"))
        cSh.join(candCids, "cid")
      } else cSh
    cand.join(bsh, "bid").join(verifySide, "cid")
      .filter(round(size(array_intersect(col("sh_b"), col("sh_c"))).cast(DoubleType) /
        size(array_union(col("sh_b"), col("sh_c"))), 6) >= 0.3)
      .groupBy(col("bid").as("doc_id")).agg(min(col("cid")).as("nd_match"))
  }

  /** Online ingest classification against corpus-side relations
    * (in-plan or precomputed — same code either way): exact arm is one
    * digest equi-join, near arm is band-bucket candidates + shingle
    * jaccard verify, verdict precedence exact > near > new with the
    * smallest matching corpus id.
    */
  private[graft] def classifyBatch(batch: DataFrame, cEx: DataFrame,
      cBands: DataFrame, cSh: DataFrame,
      pruneVerify: Boolean = false): DataFrame = {
    // exact arm: one digest equi-join — 128 bits per side, never text
    val ex = batch
      .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("h"))
      .join(cEx, "h")
      .groupBy(col("doc_id")).agg(min(col("cid")).as("ex_match"))
    val near = nearMatches(batch, cBands, cSh, pruneVerify)
    batch.select(col("doc_id"))
      .join(ex, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_match").isNotNull, "exact_dup")
          .when(col("nd_match").isNotNull, "near_dup")
          .otherwise("new").as("verdict"),
        when(col("ex_match").isNotNull, col("ex_match"))
          .otherwise(col("nd_match")).as("match_id"))
      // preSort (r19): no range-sampling re-exec of the verdict joins;
      // verdict joins the key so the exchange is not elided against the
      // doc_id-keyed join partitioning
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("verdict")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** PRECOMPUTED corpus dedup index (r15, the production posture the
    * r14 watch item asked for): the three corpus-side relations built
    * ONCE per dataset and persisted (CacheOnce — on a cluster these are
    * written tables, refreshed as the corpus grows), so an ingest batch
    * pays only batch-side work plus joins against the index. This is
    * the answer to the measured ×180 candidate-shuffle slope at 100×:
    * that slope was the corpus side REBUILDING per query; indexed, the
    * online cost is ∝ batch size (digest join + capped bucket probe +
    * shingle verify of bucket-matched candidates). Index size is honest:
    * digests + capped bands are narrow; the shingle relation is
    * O(corpus tokens) — the verification payload — but it is only ever
    * JOINED on candidate cids, never scanned per batch.
    */
  private[graft] def incrementalIndex(s: org.apache.spark.sql.SparkSession,
      cap: Int): (DataFrame, DataFrame, DataFrame) = {
    val key = graft.engine.Tables.dirOf(s).getOrElse("?")
    val corpus = s.table("documents").select(col("doc_id"), col("text"))
    val (ex, bands, csh) = corpusSideRelations(corpus, cap)
    (graft.engine.CacheOnce(key + "/ddinc:h", ex),
      graft.engine.CacheOnce(key + "/ddinc:bands", bands),
      graft.engine.CacheOnce(key + "/ddinc:sh", csh))
  }

  /** Materialize the incremental-dedup index (offline build step — the
    * ann-benchmarks split the bench applies to the ANN indexes).
    */
  private[graft] def warmIncrementalIndex(
      s: org.apache.spark.sql.SparkSession): Unit = {
    val (ex, bands, csh) = incrementalIndex(s, HOT_BUCKET_CAP)
    ex.count(); bands.count(); csh.count()
  }

  /** The indexed ingest path exercised through the driver's oracle gate:
    * identical contract (and oracle SQL) to dd_incremental — the oracle
    * cannot tell WHEN the corpus side was computed, which is the point:
    * the precomputed-index rewrite is result-invariant by construction,
    * and the gate proves it every round on real data.
    */
  val d11 = Q(
    "dd_incremental_indexed",
    d10.oracle.get
  ) { s =>
    val (ex, bands, csh) = incrementalIndex(s, HOT_BUCKET_CAP)
    classifyBatch(syntheticBatch(s), ex, bands, csh)
  }

  /** The POINT-LOOKUP ingest path through the oracle gate (r17): the
    * same contract and oracle SQL as dd_incremental, classified by
    * [[LookupIndex.classifyBatchIndexed]] — per-partition hash slabs
    * probed by the batch, nothing corpus-sized scanned or shuffled.
    * Identical verdicts by construction (same capped candidates, same
    * digest/bucket bits, same ROUND(j,6) ≥ 0.3 verify; the shingle
    * verify runs on 64-bit hashes — see LookupIndex's exactness
    * contract) — and the gate proves it on real data every round, the
    * dd_incremental_indexed discipline. This is the posture a
    * low-latency ingest deployment runs; the scan-based faces remain
    * the arbitrary-refresh / no-prebuilt-state fallbacks.
    */
  val d12 = Q(
    "dd_incremental_lookup",
    d10.oracle.get
  ) { s =>
    LookupIndex.classifyBatchIndexed(syntheticBatch(s), LookupIndex.forDataset(s))
  }

  val all: Seq[Q] = Seq(d1, d2, d4, d5, d6, d7, d8, d8b, d9, d10, d11, d12)
}
