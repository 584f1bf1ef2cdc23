package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Q

/** Text-analysis operators for LLM-scale data pipelines (BASELINE.json
  * north star; SURVEY.md §7.2 item 6): corpus stats, quality scoring,
  * token counting, n-gram language ID, document fingerprinting — all over
  * the `documents` fixture, all narrow/shuffle-light plans that scale
  * linearly (per-doc projections; aggregations shuffle only small
  * per-group states; the lang-ID profile is a broadcast-size dimension).
  */
object TextOps {

  // ---- shared stage definitions -------------------------------------
  // One definition per pattern/formula on EACH side (Spark + oracle
  // SQL), shared with PipelineOps.pipe_funnel — the composition reuses
  // these so a fix to a scrub regex or the quality blend cannot drift
  // between the standalone operator and the pipeline (same discipline
  // as DedupOps.bandStructs). The regex strings are valid verbatim in
  // both java.util.regex and DuckDB's RE2.
  private[llm] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[llm] val PhoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"
  private[llm] val IdRe = "[0-9]{9,}"

  private[llm] def scrubCol(text: org.apache.spark.sql.Column) =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IdRe, "<ID>")

  private[llm] def scrubSql(in: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($in, " +
      s"'$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g'), " +
      s"'$IdRe', '<ID>', 'g')"

  /** Blended 0..1 quality score: type-token ratio and length, half each. */
  private[llm] def qualityCol(text: org.apache.spark.sql.Column) = {
    val toks = split(text, " ")
    val nTok = size(toks)
    lit(0.5) * (size(array_distinct(toks)).cast(DoubleType) / nTok) +
      lit(0.5) * least(nTok / 100.0, lit(1.0))
  }

  private[llm] val qualitySql: String =
    """0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')))
      |    + 0.5 * LEAST(len(string_split(text, ' ')) / 100.0, 1.0)""".stripMargin

  /** Corpus statistics per language: doc counts, token totals/averages,
    * stopword ratio. One partial/final aggregation — at 100 TB the
    * shuffle carries 5 rows per partition.
    */
  val tStats = Q(
    "tx_corpus_stats",
    """SELECT lang,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  (CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)) AS avg_tokens,
      |  (CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)) AS avg_chars,
      |  (CAST(SUM(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))) AS DOUBLE)
      |    / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)) AS stopword_ratio
      |FROM documents GROUP BY lang
      |ORDER BY lang ASC NULLS LAST""".stripMargin
  ) { s =>
    val toks = split(col("text"), " ")
    s.table("documents")
      .select(col("lang"), col("n_chars"), size(toks).as("n_tok"),
        size(filter(toks, t => t === "the" || t === "a")).as("n_stop"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast(LongType).as("total_tokens"),
        (sum(col("n_tok")).cast(DoubleType) / count(lit(1))).as("avg_tokens"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
        (sum(col("n_stop")).cast(DoubleType) / sum(col("n_tok")).cast(DoubleType))
          .as("stopword_ratio"))
      .orderBy(col("lang").asc_nulls_last)
  }

  /** Per-document quality scoring: type-token ratio, mean token length,
    * and a blended 0..1 quality score — the filter stage of a training-
    * data pipeline.
    */
  val tQuality = Q(
    "tx_quality_score",
    s"""SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_types,
      |  (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' '))) AS ttr,
      |  (CAST(list_aggregate(list_transform(string_split(text, ' '), t -> len(t)), 'sum') AS DOUBLE)
      |    / len(string_split(text, ' '))) AS mean_tok_len,
      |  ROUND($qualitySql, 6) AS quality
      |FROM documents WHERE doc_id < 200
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val nTypes = size(array_distinct(toks))
    s.table("documents").filter(col("doc_id") < 200)
      .select(
        col("doc_id"),
        nTok.as("n_tok"),
        nTypes.as("n_types"),
        (nTypes.cast(DoubleType) / nTok).as("ttr"),
        (aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
          .cast(DoubleType) / nTok).as("mean_tok_len"),
        round(qualityCol(col("text")), 6).as("quality"))
      .transform(graft.engine.Par.preSort(_, col("doc_id"))) // preSort (r18): no range-sampling re-exec
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Token counting: whitespace tokens vs a BPE-ish regex segmentation
    * (letter runs / digit runs / single non-space symbols).
    */
  val tTokens = Q(
    "tx_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS INT) AS re_tokens,
      |  CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("documents").select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("re_tokens"),
      col("n_chars").cast(LongType).as("n_chars"))
      .transform(graft.engine.Par.preSort(_, col("doc_id"))) // preSort (r18): no range-sampling re-exec
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Language ID by n-gram/token profile: build a top-10-token profile
    * per language from the corpus (deterministic tie-breaks), broadcast
    * it, then classify each document by profile overlap. Two shuffles:
    * profile build (tiny) and the final order; classification joins
    * against a broadcast 50-row profile.
    */
  val tLangId = Q(
    "tx_lang_id",
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents),
      |freq AS (
      |  SELECT lang, t, COUNT(*) AS n FROM tok GROUP BY lang, t),
      |prof AS (
      |  SELECT lang, t FROM (
      |    SELECT lang, t, row_number() OVER
      |      (PARTITION BY lang ORDER BY n DESC, t ASC) AS rn
      |    FROM freq) f WHERE rn <= 10),
      |docs AS (
      |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
      |  FROM documents WHERE doc_id < 100),
      |scores AS (
      |  SELECT d.doc_id, d.lang, p.plang AS cand,
      |         len(list_intersect(d.toks, p.toks)) AS hits
      |  FROM docs d CROSS JOIN
      |       (SELECT lang AS plang, list(t) AS toks FROM prof GROUP BY lang) p),
      |best AS (
      |  SELECT doc_id, lang, cand AS predicted FROM (
      |    SELECT *, row_number() OVER
      |      (PARTITION BY doc_id ORDER BY hits DESC, cand ASC) AS rn
      |    FROM scores) x WHERE rn = 1)
      |SELECT doc_id, lang, predicted, (lang = predicted) AS correct
      |FROM best ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val docsAll = s.table("documents")
    val tok = docsAll.select(col("lang"), explode(split(col("text"), " ")).as("t"))
    val freq = tok.groupBy(col("lang"), col("t")).agg(count(lit(1)).as("n"))
    val wProf = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("t").asc)
    val prof = freq.withColumn("rn", row_number().over(wProf)).filter(col("rn") <= 10)
      .groupBy(col("lang").as("cand"))
      .agg(sort_array(collect_list(col("t"))).as("prof_toks"))
    val docs = docsAll.filter(col("doc_id") < 100)
      .select(col("doc_id"), col("lang"), array_distinct(split(col("text"), " ")).as("toks"))
    val scores = docs.crossJoin(broadcast(prof))
      .select(col("doc_id"), col("lang"), col("cand"),
        size(array_intersect(col("toks"), col("prof_toks"))).as("hits"))
    val wBest = Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("cand").asc)
    scores.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand").as("predicted"),
        (col("lang") === col("cand")).as("correct"))
      // preSort (r18; keys widened r19 — the bare doc_id key was elided
      // against the doc_id-keyed window/join partitioning, leaving the
      // double-exec in place)
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("predicted")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Document fingerprinting: content fingerprint (order-insensitive md5
    * of the sorted distinct token set) + prefix fingerprint (first 8
    * tokens), with a same-prefix group count — the cheap pre-cluster
    * stage of near-dup detection.
    */
  val tFingerprint = Q(
    "tx_fingerprint",
    """WITH fp AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp_content,
      |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp_prefix
      |  FROM documents)
      |SELECT doc_id, fp_content, fp_prefix,
      |  COUNT(*) OVER (PARTITION BY fp_prefix) AS n_same_prefix
      |FROM fp ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val toks = split(col("text"), " ")
    val fp = s.table("documents").select(
      col("doc_id"),
      md5(array_join(sort_array(array_distinct(toks)), " ").cast(BinaryType)).as("fp_content"),
      md5(array_join(slice(toks, 1, 8), " ").cast(BinaryType)).as("fp_prefix"))
    fp.withColumn("n_same_prefix",
        count(lit(1)).over(Window.partitionBy(col("fp_prefix"))))
      .transform(graft.engine.Par.preSort(_, col("doc_id"))) // preSort (r18): no range-sampling re-exec
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** PII scrubbing — the redaction stage every training-data pipeline
    * runs before tokenization: emails, phone-shaped numbers and long
    * digit runs (account/id-shaped) replaced with typed placeholders,
    * plus per-doc redaction counts for pipeline monitoring. Pure
    * projection (no shuffle, linear at any scale); patterns stay in the
    * RE2 ∩ java.util.regex common subset so the Spark engine and the
    * DuckDB oracle compile them identically.
    */
  val tScrub = Q(
    "tx_pii_scrub",
    s"""SELECT doc_id,
      |  ${scrubSql("text")} AS scrubbed,
      |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '$IdRe')) AS INT) AS n_ids
      |FROM documents WHERE doc_id < 200
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    s.table("documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        scrubCol(col("text")).as("scrubbed"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("text"), lit(IdRe), lit(0)))
          .as("n_ids"))
      .transform(graft.engine.Par.preSort(_, col("doc_id"))) // preSort (r18): no range-sampling re-exec
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Corpus-level boilerplate removal — the C4-pipeline step that strips
    * content appearing in most documents (headers, footers, navigation):
    * tokens whose document frequency exceeds half the corpus are
    * discovered with one small aggregation (distinct tokens per doc →
    * df), broadcast as a single array, and filtered out of each document
    * with an order-preserving lambda (never array_except — set semantics
    * would also dedup the kept tokens). Two shuffles total: the df
    * aggregation (token-sized state) and the final sort; the rebuild is
    * a pure projection against the broadcast list.
    */
  val tBoiler = Q(
    "tx_boilerplate",
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
      |df AS (
      |  SELECT t, COUNT(*) AS n_docs FROM (
      |    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      |    FROM docs) u GROUP BY t),
      |bp AS (
      |  SELECT list(t ORDER BY t) AS toks FROM df
      |  WHERE n_docs > (SELECT COUNT(*) FROM docs) / 2)
      |SELECT d.doc_id,
      |  COALESCE(array_to_string(list_filter(string_split(d.text, ' '),
      |    x -> NOT COALESCE(list_contains(b.toks, x), FALSE)), ' '), '') AS cleaned,
      |  CAST(len(string_split(d.text, ' ')) -
      |    len(list_filter(string_split(d.text, ' '),
      |      x -> NOT COALESCE(list_contains(b.toks, x), FALSE))) AS INT) AS n_removed
      |FROM docs d CROSS JOIN bp b
      |ORDER BY d.doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val docs = s.table("documents").filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ")
    val df = docs
      .select(col("doc_id"), explode(array_distinct(toks)).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n_docs"))
    // corpus size rides the plan as a 1-row cross join — no driver
    // action during query build
    val total = docs.agg(count(lit(1)).as("__n"))
    val bp = df.crossJoin(broadcast(total))
      .filter(col("n_docs") > col("__n") / 2)
      .agg(sort_array(collect_list(col("t"))).as("bp"))
    // one pass: kept tokens once, removals by size subtraction; cleaned
    // coalesced to '' so a NULL text matches the oracle's COALESCE
    docs.crossJoin(broadcast(bp))
      .withColumn("__kept", filter(toks, x => !array_contains(col("bp"), x)))
      .select(col("doc_id"),
        coalesce(array_join(col("__kept"), " "), lit("")).as("cleaned"),
        (size(toks) - size(col("__kept"))).cast(IntegerType).as("n_removed"))
      .transform(graft.engine.Par.preSort(_, col("doc_id"))) // preSort (r18): no range-sampling re-exec
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Gopher-style repetition signals — the quality filters that catch
    * degenerate generated/boilerplate text the length/TTR blend misses:
    * duplicate-token fraction and the mass of the single most frequent
    * bigram. Both signals are PER-DOCUMENT, so the whole query is a
    * map: the top bigram comes from sorting the doc's own bigram array
    * and scanning for the longest run — no explode, no (doc_id, bigram)
    * shuffle, no window. At corpus scale this is embarrassingly
    * parallel; the only exchange is the presentation ORDER BY.
    * (The earlier explode+groupBy+window formulation shuffled every
    * bigram string twice — measured 7.8s of the sf0.1 suite vs ~1s as
    * a map.)
    *
    * Tie-break on the top bigram is deterministic by construction:
    * highest count first, then lexicographically smallest bigram (the
    * run scan only replaces the champion on a STRICTLY longer run, and
    * runs arrive in ascending bigram order).
    */
  val tRepetition = Q(
    "tx_repetition",
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |big AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, GREATEST(len(toks) - 1, 1)),
      |    i -> toks[i] || ' ' || COALESCE(toks[i + 1], ''))) AS bg
      |  FROM tok),
      |cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg),
      |top AS (
      |  SELECT doc_id, bg, c,
      |    SUM(c) OVER (PARTITION BY doc_id) AS total,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, bg ASC) AS rn
      |  FROM cnt),
      |dup AS (
      |  SELECT doc_id, toks,
      |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dtf
      |  FROM tok)
      |SELECT d.doc_id,
      |  ROUND(d.dtf, 6) AS dup_token_frac,
      |  t.bg AS top_bigram,
      |  ROUND(CAST(t.c AS DOUBLE) / t.total, 6) AS top_bigram_frac,
      |  (d.dtf > 0.3 OR CAST(t.c AS DOUBLE) / t.total > 0.18) AS flagged
      |FROM dup d JOIN top t ON d.doc_id = t.doc_id AND t.rn = 1
      |ORDER BY d.doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    // no preSort here (r18): the zero-shuffle pure-map shape is pinned
    // (PlanSpec) — an output exchange would cost ∝ corpus at scale for
    // a ~0.15 s local saving
    repetitionOf(s.table("documents"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Repetition signals over any (doc_id, text) relation — factored for
    * the hand-built edge-case spec; plan notes on tx_repetition above.
    */
  private[graft] def repetitionOf(docs: org.apache.spark.sql.DataFrame) = {
    val toks = split(col("text"), " ")
    // bigrams keep duplicates (frequency is the signal) — 1-based
    // element_at matches the oracle's 1-based list indexing, and the
    // COALESCE('')-padded tail keeps the single-token edge case
    // identical. try_element_at for the i+1 probe: on a single-token
    // doc the index runs past the list, where DuckDB yields NULL but
    // ANSI element_at would throw.
    // the top-bigram signal is computed by the TopBigram codegen kernel
    // (expressions/TopBigram.scala): one hash loop over the doc's own
    // bigrams, identical semantics to the oracle's explode→count→top-1
    // chain. text IS NULL drops the row, matching the old inner join
    // against the exploded bigrams (and the oracle's unnest of a NULL
    // list).
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        (lit(1.0) - size(array_distinct(toks)).cast(DoubleType) / size(toks)).as("dtf"),
        graft.engine.GraftColumns.topBigram(col("text")).as("tb"))
      .select(col("doc_id"), col("dtf"),
        col("tb.bg").as("bg"), col("tb.c").as("c"), col("tb.total").as("total"))
      .select(col("doc_id"),
        round(col("dtf"), 6).as("dup_token_frac"),
        col("bg").as("top_bigram"),
        round(col("c").cast(DoubleType) / col("total"), 6).as("top_bigram_frac"),
        (col("dtf") > 0.3 || col("c").cast(DoubleType) / col("total") > 0.18).as("flagged"))
  }

  /** Benchmark decontamination — the eval-hygiene step every training
    * pipeline runs before a model ships: drop (here: flag) training
    * documents that share an n-gram shingle with the held-out benchmark
    * set. The benchmark side is USUALLY the small side (benchmarks are
    * thousands of docs against a corpus of billions), so its distinct
    * shingle set is built once and broadcast — the corpus never
    * shuffles; each partition probes the broadcast hash set. The
    * broadcast is size-GATED, not assumed: [[contaminationHits]]
    * measures the benchmark relation and falls back to a two-sided
    * shuffle join when it exceeds the session broadcast threshold.
    *
    * The fixture's benchmark is the doc_id % 13 slice of `documents`
    * CAPPED at doc_id < 2600 (≤200 docs at ANY scale factor) —
    * deterministic, non-trivial overlap, and fixed-size BY CONSTRUCTION
    * so the broadcast(bench) hint's small-side assumption can never be
    * invalidated by a larger corpus (an uncapped %13 slice grows
    * linearly with the corpus and would eventually OOM the broadcast).
    */
  val tDecontaminate = Q(
    "tx_decontaminate",
    s"""WITH sh AS (SELECT doc_id, ${DedupOps.shinglesSql} AS sh FROM documents),
       |bench AS (
       |  SELECT DISTINCT unnest(sh) AS s FROM sh
       |  WHERE doc_id % 13 = 0 AND doc_id < 2600),
       |cand AS (
       |  SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 13 <> 0),
       |hits AS (
       |  SELECT c.doc_id, COUNT(DISTINCT c.s) AS n_hits
       |  FROM cand c JOIN bench b ON c.s = b.s GROUP BY c.doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  COALESCE(h.n_hits, 0) > 0 AS contaminated
       |FROM (SELECT doc_id FROM sh WHERE doc_id % 13 <> 0) d
       |LEFT JOIN hits h ON d.doc_id = h.doc_id
       |ORDER BY d.doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    val docs = s.table("documents").select(col("doc_id"),
      graft.engine.GraftColumns.shingles3(col("text")).as("sh"))
    val bench = docs.filter(col("doc_id") % 13 === 0 && col("doc_id") < 2600)
      .select(explode(col("sh")).as("s")).distinct()
    val cand = docs.filter(col("doc_id") % 13 =!= 0)
    val hits = contaminationHits(
      cand.select(col("doc_id"), explode(col("sh")).as("s")),
      bench, "tx_decontaminate")
    cand.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
      // preSort (r18; keys widened r19 — bare doc_id was elided, see tx_lang_id)
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("n_hits")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Per-doc contamination hit counts (doc_id, n_hits) for a candidate
    * (doc_id, s) shingle stream probed against a benchmark shingle
    * relation (s). The join strategy is decided by MEASUREMENT, not a
    * hard-coded hint: one bounded aggregate over the benchmark side
    * (cost ∝ the side being gated, never the corpus) counts rows and
    * string bytes; only when that upper-bound estimate fits the
    * session's autoBroadcastJoinThreshold is the benchmark broadcast.
    * Otherwise BOTH sides shuffle on the shingle key — the corpus pays
    * one exchange, but nothing tries to hash an oversized relation into
    * executor memory. The pre-pass also warms the CacheOnce copy the
    * join itself reuses, so the benchmark pipeline runs once either way.
    */
  private[graft] def contaminationHits(
      cand: org.apache.spark.sql.DataFrame,
      bench: org.apache.spark.sql.DataFrame,
      tag: String): org.apache.spark.sql.DataFrame = {
    val sess = cand.sparkSession
    val threshold = sess.sessionState.conf.autoBroadcastJoinThreshold
    val b = graft.engine.CacheOnce(
      graft.engine.CacheOnce.dsKey(sess, s"$tag/bench"), bench) // r15 sweep
    val m = b.agg(count(lit(1)),
      coalesce(sum(length(col("s"))), lit(0L))).first()
    // UTF-16 chars ×2 + ~48 bytes/row hash-relation overhead: a
    // deliberate over-estimate — the failure mode of under-estimating
    // is an executor OOM, of over-estimating one extra exchange
    val estBytes = m.getLong(1) * 2L + m.getLong(0) * 48L
    // the __measured_broadcast__ alias is a CONTRACT with PlanSpec's
    // forced-broadcast guard: it asserts this hint was applied only
    // after an actual size measurement against the session threshold
    // (the two lines above). Never alias an unmeasured broadcast.
    val benchSide =
      if (threshold > 0 && estBytes <= threshold)
        broadcast(b.alias("__measured_broadcast__"))
      else b
    cand.join(benchSide, "s")
      .groupBy(col("doc_id")).agg(countDistinct(col("s")).as("n_hits"))
  }

  /** Self-trained bigram language-model scoring — the CCNet/Gopher-style
    * perplexity filter every corpus-prep pipeline runs: score each
    * document by the average log-probability of its word bigrams under
    * an add-one-smoothed bigram model trained on the corpus itself,
    * then flag the low-likelihood tail (boilerplate, non-language,
    * mojibake score far below running text).
    *
    * logp(w1 w2) = ln((C(w1,w2) + 1) / (C(w1) + V)), V = |vocab|.
    *
    * Scale layout: the bigram stream is a per-doc projection (explode,
    * no text shuffle — bigram strings only); model training is two
    * partial/final count aggregations (map-side combine carries one row
    * per distinct gram per partition); scoring is a shuffle join on the
    * bigram key — the model stays DISTRIBUTED (a corpus-scale bigram
    * table can be billions of rows; nothing here assumes it fits one
    * node, unlike a broadcast-top-K variant, which is the cheaper knob
    * when a capped model is acceptable). The per-doc average routes
    * each ln term through ROUND+DECIMAL so partial-agg order cannot
    * skew the float sum vs the single-threaded oracle.
    */
  val tBigramLm = Q(
    "tx_bigram_lm",
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |big AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS bg
      |  FROM tok),
      |bc AS (SELECT bg, COUNT(*) AS cb FROM big GROUP BY bg),
      |uc AS (SELECT w, COUNT(*) AS cu FROM (
      |  SELECT unnest(toks) AS w FROM tok) GROUP BY w),
      |v AS (SELECT COUNT(*) AS v FROM uc),
      |terms AS (
      |  SELECT b.doc_id,
      |    ROUND(ln((bc.cb + 1.0) / (uc.cu + v.v)), 9) AS lp
      |  FROM big b
      |  JOIN bc USING (bg)
      |  JOIN uc ON uc.w = string_split(b.bg, ' ')[1]
      |  CROSS JOIN v),
      |sc AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams,
      |    CAST(SUM(CAST(lp AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS alp
      |  FROM terms GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  ROUND(COALESCE(sc.alp, 0.0), 6) AS avg_logprob,
      |  COALESCE(sc.alp, 0.0) < -9.0 AS low_quality
      |FROM tok t LEFT JOIN sc USING (doc_id)
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s => bigramLmOf(s.table("documents"), "tx_bigram_lm") }

  /** Bigram-LM core over any (doc_id, text) relation — factored for the
    * hand-built smoothing/edge spec; plan notes on tx_bigram_lm above.
    */
  private[graft] def bigramLmOf(
      docs: org.apache.spark.sql.DataFrame, tag: String) = {
    val k = graft.engine.CacheOnce.dsKey(docs.sparkSession, tag) // r15 sweep
    val toks = split(col("text"), " ")
    val n = size(toks)
    // 1-based element_at matches the oracle's list indexing; the
    // when-guard keeps sequence() ascending (sequence(1,0) would count
    // DOWN in Spark where generate_series yields empty)
    val bigrams = when(n >= 2,
      transform(sequence(lit(1), n - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    // the gram kernels are BARRIERED below their explodes: the
    // optimizer otherwise substitutes them into the inferred generator
    // filters — 3 evaluations per document (r12 OptimizerBarrier
    // lesson; the bigram transform and the tokenizer are the per-doc
    // hot kernels of this operator)
    val big = graft.engine.CacheOnce(s"$k/big",
      docs.select(col("doc_id"), graft.engine.expressions.OptimizerBarrier(bigrams).as("__bg"))
        .select(col("doc_id"), explode(col("__bg")).as("bg")))
    val bc = big.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val uc = graft.engine.CacheOnce(s"$k/uc",
      docs.select(graft.engine.expressions.OptimizerBarrier(toks).as("__t"))
        .select(explode(col("__t")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu")))
    val v = uc.agg(count(lit(1)).as("v"))
    // lp is a function of the BIGRAM alone, so the smoothing join
    // (bc⨝uc⨝v) runs at DISTINCT-GRAM scale — the former spelling
    // joined the occurrence stream twice (big⨝bc on bg, then ⨝uc on
    // the first word), putting the second join at occurrence scale.
    // The occurrence stream now touches exactly one join (bg → lp) and
    // one aggregation (doc_id); values are bit-identical (the same
    // round(lp,9)::DECIMAL term sums per occurrence either way).
    // Deliberately NOT pre-aggregated to (doc_id, bg, c): measured at
    // the 100× tier the per-doc dedup doesn't collapse (word-soup docs
    // repeat few bigrams) while the extra (doc_id, bg) hash shuffle
    // costs +700 MB. The trained model is CacheOnce'd: the two-join
    // lineage hides its size from the planner (measured: the scoring
    // join planned as a sort-merge and shuffled the 95M-row occurrence
    // stream); materialized stats let Catalyst broadcast a small model
    // and shuffle a genuinely large one — the same adaptive behavior
    // the former per-occurrence spelling got from joining bc/uc raw.
    val lpByBg = graft.engine.CacheOnce(s"$k/lp", bc
      .join(uc, element_at(split(col("bg"), " "), 1) === col("w"))
      .crossJoin(broadcast(v))
      .select(col("bg"),
        round(log((col("cb") + 1.0) / (col("cu") + col("v"))), 9)
          .cast(DecimalType(28, 9)).as("lp")))
    val sc = big.join(lpByBg, "bg")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("lp")).cast(DoubleType) / count(lit(1))).as("alp"))
    docs.select(col("doc_id"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("alp"), lit(0.0)), 6).as("avg_logprob"),
        (coalesce(col("alp"), lit(0.0)) < -9.0).as("low_quality"))
      // preSort (r18; keys widened r19 — bare doc_id was elided, see tx_lang_id)
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("n_bigrams")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Duplicate-text coverage (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", arXiv:2107.06499 — public
    * method): for each document, the fraction of its 10-gram windows
    * that also appear in ANOTHER document. Near-1 coverage = the doc is
    * assembled from text duplicated elsewhere (mirrors, boilerplate,
    * quote farms) even when no single pair-level near-dup fires —
    * the corpus-level complement to dd_* pair detection. Within-doc
    * repetition deliberately does NOT count (tx_repetition's signal):
    * a gram is "duplicated" only when seen in >1 DISTINCT doc.
    *
    * Scale layout: grams travel as 128-bit digests, never text; the
    * gram-frequency table is a partial/final count aggregation and the
    * coverage join shuffles on the digest — the same distributed-model
    * shape as tx_bigram_lm (nothing broadcast, nothing driver-side).
    */
  val tDupCoverage = Q(
    "tx_dup_coverage",
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(toks) - 9),
      |    i -> md5(array_to_string(toks[i:i+9], ' ')))) AS h
      |  FROM tok),
      |cnt AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY h),
      |per AS (
      |  SELECT g.doc_id, COUNT(*) AS n_grams,
      |    COUNT(*) FILTER (cnt.nd > 1) AS n_dup
      |  FROM g JOIN cnt USING (h) GROUP BY g.doc_id)
      |SELECT t.doc_id,
      |  CAST(COALESCE(per.n_grams, 0) AS BIGINT) AS n_grams,
      |  CAST(COALESCE(per.n_dup, 0) AS BIGINT) AS n_dup,
      |  ROUND(COALESCE(CAST(per.n_dup AS DOUBLE) / per.n_grams, 0.0), 6) AS dup_frac,
      |  COALESCE(CAST(per.n_dup AS DOUBLE) / per.n_grams, 0.0) > 0.5 AS flagged
      |FROM tok t LEFT JOIN per USING (doc_id)
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s => dupCoverageOf(s.table("documents"), "tx_dup_coverage") }

  /** Dup-coverage core over any (doc_id, text) relation — factored for
    * the hand-built planted-duplicate spec; notes on tx_dup_coverage
    * above.
    */
  private[graft] def dupCoverageOf(
      docs: org.apache.spark.sql.DataFrame, tag: String) = {
    val k = graft.engine.CacheOnce.dsKey(docs.sparkSession, tag) // r15 sweep
    val toks = split(col("text"), " ")
    val n = size(toks)
    // 10-token windows, 1-based inclusive slice — matches the oracle's
    // toks[i:i+9]; digests only (md5 of the joined window) leave the doc
    val grams = when(n >= 10,
      transform(sequence(lit(1), n - 9),
        i => md5(concat_ws(" ", slice(toks, i, lit(10))).cast(BinaryType))))
      .otherwise(array().cast(ArrayType(StringType)))
    val g = graft.engine.CacheOnce(s"$k/g",
      graft.engine.Par.spreadCached(docs, col("doc_id")) // single-row-group scan fan-out (r18)
        .select(col("doc_id"), graft.engine.expressions.OptimizerBarrier(grams).as("__g")) // 3×-eval guard (r12)
        .select(col("doc_id"), explode(col("__g")).as("h")))
    // only the DUPLICATED digests come back to the gram relation: an
    // inner join with the full per-digest counts sort-merged the whole
    // gram relation (95M rows / 2.9 GB of sort spill at the 100× tier);
    // the dup set is the minority by construction, the left join is
    // hinted shuffle-hash so the gram side streams unsorted, and
    // n_grams/n_dup fall out of count(*) / count(flag) identically
    // "appears in ANOTHER document" needs no distinct COUNT — it is
    // exactly min(doc_id) != max(doc_id): fixed-width agg states, no
    // partial-distinct dedup pass over the (h, doc_id) pairs (that pass
    // spilled a deterministic 2.9 GB in-suite at the 100× tier)
    val dup = g.groupBy(col("h"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select(col("h"), lit(true).as("isdup"))
    val per = g.join(dup.hint("shuffle_hash"), Seq("h"), "left")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_grams"),
        count(col("isdup")).as("n_dup"))
    val frac = col("n_dup").cast(DoubleType) / col("n_grams")
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(coalesce(frac, lit(0.0)), 6).as("dup_frac"),
        (coalesce(frac, lit(0.0)) > 0.5).as("flagged"))
      // preSort (r18; keys widened r19 — bare doc_id was elided, see tx_lang_id)
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("n_grams")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Span-level duplicate-text REMOVAL (Lee et al. 2022, arXiv:2107.06499
    * ExactSubstr, public method): where tx_dup_coverage MEASURES span
    * duplication and dd_* drops whole documents, this emits the
    * span-cleaned corpus — the repeated ≥10-token runs cut out of every
    * document except the first (smallest doc_id) owner. Keep-first
    * policy: an occurrence of a cross-doc-duplicated 10-gram is
    * removable iff its doc_id is greater than the gram's minimum owning
    * doc_id, so exactly one copy of every duplicated run survives the
    * corpus (within-doc repetition alone never triggers removal —
    * tx_repetition's signal, same boundary as tx_dup_coverage). A token
    * is removed when ANY removable window covers it; maximal removed
    * runs are reported as `spans` ("s-e,..." 1-based inclusive) and the
    * cleaned text as `kept_md5` (the tx_chunk discipline: a digest
    * verifies CONTENT without re-materializing the corpus).
    *
    * Scale layout: grams travel as (doc_id, pos, 128-bit digest) — the
    * only shuffles before the final stitch are digest-keyed (dup-set
    * aggregation + removable-occurrence join) and a doc_id groupBy of
    * bare ints; covered positions expand WINDOW→tokens per-row with
    * higher-order functions after that groupBy, never as exploded rows.
    * Document text moves exactly once, in the final doc_id-keyed stitch
    * join (shuffle-hash, no sort) — on a corpus bucketed by doc_id that
    * join is shuffle-free, and there is no formulation that rewrites
    * text without co-locating text with its span list. The oracle
    * restates the same keep-first spans via gaps-and-islands windows.
    */
  val tSpanDedup = Q(
    "tx_span_dedup",
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents WHERE text IS NOT NULL),
      |g AS (
      |  SELECT doc_id, unnest(generate_series(1, len(toks) - 9)) AS i, toks
      |  FROM tok),
      |gh AS (
      |  SELECT doc_id, i, md5(array_to_string(toks[i:i+9], ' ')) AS h FROM g),
      |dup AS (
      |  SELECT h, MIN(doc_id) AS lo FROM gh GROUP BY h
      |  HAVING MIN(doc_id) <> MAX(doc_id)),
      |rem AS (
      |  SELECT gh.doc_id, gh.i FROM gh JOIN dup USING (h)
      |  WHERE gh.doc_id > dup.lo),
      |cov AS (
      |  SELECT DISTINCT doc_id, i + u.o AS p
      |  FROM rem, (SELECT unnest(generate_series(0, 9)) AS o) u),
      |isl AS (
      |  SELECT doc_id, p,
      |    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
      |  FROM cov),
      |sp AS (
      |  SELECT doc_id, grp, MIN(p) AS s, MAX(p) AS e
      |  FROM isl GROUP BY doc_id, grp),
      |spd AS (
      |  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_spans,
      |    CAST(SUM(e - s + 1) AS INT) AS n_removed,
      |    string_agg(CAST(s AS VARCHAR) || '-' || CAST(e AS VARCHAR), ','
      |      ORDER BY s) AS spans
      |  FROM sp GROUP BY doc_id),
      |covl AS (SELECT doc_id, list(p ORDER BY p) AS ps FROM cov GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(len(t.toks) AS INT) AS n_tok,
      |  COALESCE(d.n_removed, 0) AS n_removed,
      |  COALESCE(d.n_spans, 0) AS n_spans,
      |  d.spans AS spans,
      |  ROUND((len(t.toks) - COALESCE(d.n_removed, 0)) * 1.0 / len(t.toks), 6)
      |    AS kept_frac,
      |  md5(COALESCE(array_to_string(list_transform(
      |    list_filter(generate_series(1, len(t.toks)),
      |      p -> NOT list_contains(COALESCE(c.ps, []), p)),
      |    p -> t.toks[p]), ' '), '')) AS kept_md5
      |FROM tok t
      |LEFT JOIN spd d USING (doc_id)
      |LEFT JOIN covl c USING (doc_id)
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s => spanDedupOf(s.table("documents"),
    graft.engine.Tables.dirOf(s).getOrElse("?") + "/tx_span_dedup") }

  /** Span-removal core over any (doc_id, text) relation — factored for
    * the hand-built planted-run spec; semantics and scale notes on
    * tx_span_dedup above.
    */
  private[graft] def spanDedupOf(
      docs: org.apache.spark.sql.DataFrame, tag: String) = {
    val k = graft.engine.CacheOnce.dsKey(docs.sparkSession, tag) // r15 sweep
    val toksAll = split(col("text"), " ")
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), toksAll.as("toks"), size(toksAll).as("n"))
    // position-tagged 10-gram digests: the explode emits (doc_id, i)
    // and the digest is computed once per window AFTER the generator,
    // so nothing needs an OptimizerBarrier; toks is pruned before any
    // exchange (PlanSpec pins it)
    // spread ahead of the window digests (r18, guide §2.5): the fixture
    // scan is single-row-group, so without the fan-out the ~1M-window
    // md5 build runs as ONE task (0.7 s of a 1.6 s isolated steady)
    val g = graft.engine.CacheOnce(s"$k/g",
      graft.engine.Par.spreadCached(base.filter(col("n") >= 10), col("doc_id"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(1), col("n") - 9)).as("i"))
        .select(col("doc_id"), col("i"),
          md5(concat_ws(" ", slice(col("toks"), col("i"), lit(10)))
            .cast(BinaryType)).as("h")))
    // keep-first dup set: digest → smallest owning doc, duplicated
    // digests only ("another document" = min != max, the
    // tx_dup_coverage fixed-width-agg discipline — no distinct pass)
    val dup = g.groupBy(col("h"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select(col("h"), col("lo"))
    // occurrences removable in every doc AFTER the first owner; the
    // dup side is the minority by construction → shuffle-hash so the
    // gram side streams unsorted (the tx_dup_coverage spill lesson)
    val rem = g.join(dup.hint("shuffle_hash"), Seq("h"))
      .filter(col("doc_id") > col("lo"))
      .select(col("doc_id"), col("i"))
    // per-doc covered positions: ONE doc_id shuffle of bare window
    // starts, then window→token expansion and span algebra per-row
    // with higher-order functions (never exploded back into rows)
    val ps = sort_array(array_distinct(flatten(
      transform(col("is"), i => sequence(i, i + 9)))))
    val covl = rem.groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("is"))
      .select(col("doc_id"), ps.as("ps"))
    // maximal runs from the sorted position array: an element starts a
    // span when its predecessor isn't p-1, ends one when its successor
    // isn't p+1 (shifted-array zip — no index lambdas, no element_at(0))
    val m = size(col("ps"))
    val prevArr = concat(array(lit(-2)), slice(col("ps"), lit(1), greatest(m - 1, lit(0))))
    val nextArr = concat(slice(col("ps"), lit(2), greatest(m - 1, lit(0))), array(lit(-2)))
    val starts = filter(
      zip_with(col("ps"), prevArr, (a, b) => when(a =!= b + 1, a)),
      x => x.isNotNull)
    val ends = filter(
      zip_with(col("ps"), nextArr, (a, b) => when(b =!= a + 1, a)),
      x => x.isNotNull)
    val spansCol = array_join(zip_with(starts, ends,
      (s0, e0) => concat(s0.cast(StringType), lit("-"), e0.cast(StringType))), ",")
    val spd = covl.select(col("doc_id"), col("ps"),
      m.as("n_removed"), size(starts).as("n_spans"), spansCol.as("spans"))
    // final stitch: text meets its span list exactly once, on the
    // storage key; kept tokens = positions outside the covered set
    val psOr = coalesce(col("ps"), array().cast(ArrayType(IntegerType)))
    // array_except, not a per-position array_contains filter: contains
    // scans the covered list per token → O(n_tok × n_removed) on
    // exactly the long heavily-duplicated docs this operator targets;
    // except is O(n+m) and order-preserving on the (duplicate-free,
    // sorted) position sequence
    val kept = transform(
      array_except(sequence(lit(1), col("n")), psOr),
      p => element_at(col("toks"), p))
    base.join(spd.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n").as("n_tok"),
        coalesce(col("n_removed"), lit(0)).as("n_removed"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        col("spans"),
        round((col("n") - coalesce(col("n_removed"), lit(0))) * lit(1.0)
          / col("n"), 6).as("kept_frac"),
        md5(concat_ws(" ", kept).cast(BinaryType)).as("kept_md5"))
      // preSort (r18; keys widened r19 — bare doc_id was elided against
      // the doc_id-keyed stitch join, leaving the span rewrite + kept_md5
      // to run twice per execution)
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("n_tok")))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Per-language top-10 terms by TF-IDF — the corpus-characterization
    * report (what distinguishes each language/domain slice) and the
    * keyword stage of classic retrieval.
    *
    * tfidf(lang, t) = tf(lang, t) · ln((N + 1) / (df(t) + 1)).
    *
    * Scale layout: tf and df are partial/final count aggregations; the
    * scoring join shuffles on the term key. The top-k is TWO-STAGE —
    * per (lang, hash-bucket) row_number keeps ≤ 10 rows per bucket,
    * then the per-lang window ranks only ≤ 10·32 survivors — because a
    * single window PARTITION BY lang puts an entire language's vocab
    * (millions of terms at corpus scale) through one task. Monotone
    * ordering makes the two-stage result exactly the global top-10, so
    * the oracle keeps the one-window formulation. Scores are rounded
    * BEFORE ranking on both sides so float ties collapse and the term
    * tie-break decides deterministically.
    */
  val tTfidf = Q(
    "tx_tfidf_terms",
    """WITH tok AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      |tfc AS (
      |  SELECT lang, term, COUNT(*) AS tf FROM (
      |    SELECT lang, unnest(toks) AS term FROM tok) GROUP BY lang, term),
      |dfc AS (
      |  SELECT term, COUNT(*) AS df FROM (
      |    SELECT doc_id, unnest(list_distinct(toks)) AS term FROM tok)
      |  GROUP BY term),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT lang, term, tf, df,
      |    ROUND(tf * ln((n.n + 1.0) / (df + 1.0)), 6) AS tfidf
      |  FROM tfc JOIN dfc USING (term) CROSS JOIN n),
      |top AS (
      |  SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY lang ORDER BY tfidf DESC, term ASC) AS rank
      |  FROM scored)
      |SELECT lang, CAST(rank AS INT) AS rank, term,
      |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
      |FROM top WHERE rank <= 10
      |ORDER BY lang ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin
  ) { s =>
    val docs = s.table("documents")
    val toks = split(col("text"), " ")
    val tfc = docs.select(col("lang"), graft.engine.expressions.OptimizerBarrier(toks).as("__t")) // 3×-eval guard
      .select(col("lang"), explode(col("__t")).as("term"))
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("tf"))
    val dfc = docs
      .select(col("doc_id"), graft.engine.expressions.OptimizerBarrier(array_distinct(toks)).as("__t"))
      .select(col("doc_id"), explode(col("__t")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tfc.join(dfc, "term").crossJoin(broadcast(n))
      .select(col("lang"), col("term"), col("tf"), col("df"),
        round(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)), 6).as("tfidf"))
    val ord = Seq(col("tfidf").desc, col("term").asc)
    val wBucket = Window
      .partitionBy(col("lang"), pmod(hash(col("term")), lit(32)))
      .orderBy(ord: _*)
    val wLang = Window.partitionBy(col("lang")).orderBy(ord: _*)
    scored
      .withColumn("brn", row_number().over(wBucket)).filter(col("brn") <= 10)
      .withColumn("rank", row_number().over(wLang)).filter(col("rank") <= 10)
      .select(col("lang"), col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
      // preSort (r19): no range-sampling re-exec of the two-stage top-k
      .transform(graft.engine.Par.preSort(_, col("lang"), col("rank")))
      .orderBy(col("lang").asc_nulls_last, col("rank").asc_nulls_last)
  }

  /** Per-SOURCE (domain) filter signals (round 9): the domain-level
    * quality table a web-corpus pipeline filters on before any per-doc
    * pass (RefinedWeb-style URL/domain filtering, public lineage) —
    * docs, token mass, mean stopword density, lexical diversity
    * (distinct-token share), and the dominant language per source.
    * Scale shape: per-doc signals are one codegen'd projection; the
    * per-source rollup is a partial/final agg on the source key; the
    * dominant language is a second, narrower aggregate over the same
    * projected scan ((source,lang) counts → per-source max_by), whose
    * source-keyed result is catalog-sized and broadcast-joins back.
    */
  val tSourceStats = Q(
    "tx_source_stats",
    """WITH d AS (
      |  SELECT source, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
      |  FROM documents),
      |per_lang AS (
      |  SELECT source, lang, COUNT(*) AS c FROM d GROUP BY source, lang)
      |SELECT d.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
      |  CAST(ROUND(SUM(n_stop) * 1.0 / SUM(n_tok), 6) AS DOUBLE) AS stopword_ratio,
      |  CAST(ROUND(SUM(n_uniq) * 1.0 / SUM(n_tok), 6) AS DOUBLE) AS diversity,
      |  (SELECT lang FROM per_lang p WHERE p.source = d.source
      |   ORDER BY c DESC, lang DESC LIMIT 1) AS top_lang
      |FROM d GROUP BY d.source
      |ORDER BY d.source ASC NULLS LAST""".stripMargin
  ) { s =>
    val toks = split(col("text"), " ")
    val perDoc = s.table("documents").select(
      col("source"), col("lang"),
      size(toks).cast(LongType).as("n_tok"),
      size(array_distinct(toks)).cast(LongType).as("n_uniq"),
      size(filter(toks, t => t === "the" || t === "a"))
        .cast(LongType).as("n_stop"))
    // dominant language: group on (source, lang) first (same upstream
    // scan), then max_by on the (count, lang) struct — lang inside the
    // comparison key makes ties deterministic (matches the oracle's
    // ORDER BY c DESC, lang DESC LIMIT 1)
    val topLang = perDoc.groupBy(col("source").as("src2"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("src2"))
      .agg(max_by(col("lang"), struct(col("c"), col("lang"))).as("top_lang"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast(LongType).as("tokens"),
        round(sum(col("n_stop")) * 1.0 / sum(col("n_tok")), 6)
          .cast(DoubleType).as("stopword_ratio"),
        round(sum(col("n_uniq")) * 1.0 / sum(col("n_tok")), 6)
          .cast(DoubleType).as("diversity"))
      .join(topLang, col("source") === col("src2"))
      .select(col("source"), col("n_docs"), col("tokens"),
        col("stopword_ratio"), col("diversity"), col("top_lang"))
      // preSort (r19): no range-sampling re-exec of the stats aggregate
      // + top-lang join; n_docs defeats the source-key elision
      .transform(graft.engine.Par.preSort(_, col("source"), col("n_docs")))
      .orderBy(col("source").asc_nulls_last)
  }

  /** Token-window document chunking (r14): the map stage that turns a
    * corpus into fixed-budget training windows — 40-token chunks at
    * stride 30 (10-token overlap), the standard context-window prep
    * before tokenization. Chunk count is 1 + ceil((n−W)/S) so every
    * token is covered and no chunk starts past the text (a doc at or
    * under one window yields exactly one chunk); the tail chunk may be
    * short but never empty.
    *
    * Scale layout: a pure per-doc projection + generator — ZERO
    * shuffles before the contract sort (at 100 TB this runs map-only,
    * parallel with the scan). The output carries the chunk's md5, not
    * its text: the contract verifies CONTENT (any slice/boundary bug
    * changes the digest) while the emitted relation stays ~40 bytes a
    * row instead of re-materializing the corpus ×1.33.
    */
  val tChunk = Q(
    "tx_chunk",
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |         len(string_split(text, ' ')) AS n
      |  FROM documents WHERE text IS NOT NULL),
      |c AS (
      |  SELECT doc_id, toks, n,
      |    CAST(unnest(generate_series(0,
      |      GREATEST(0, CAST(CEIL((n - 40) / 30.0) AS INT)))) AS INT) AS chunk_id
      |  FROM d)
      |SELECT doc_id, chunk_id,
      |  CAST(chunk_id * 30 + 1 AS INT) AS start_tok,
      |  CAST(LEAST(40, n - chunk_id * 30) AS INT) AS n_tok,
      |  md5(array_to_string(list_slice(toks, chunk_id * 30 + 1,
      |    LEAST(chunk_id * 30 + 40, n)), ' ')) AS chunk_md5
      |FROM c
      |ORDER BY doc_id ASC NULLS LAST, chunk_id ASC NULLS LAST""".stripMargin
  ) { s => chunksOf(s.table("documents")) }

  /** The tx_chunk plan over any (doc_id, text) relation — split out so
    * the spec can pin the window/stride boundary algebra on hand-built
    * token counts (the oracle pins fixture-scale content).
    */
  private[graft] def chunksOf(docs: org.apache.spark.sql.DataFrame,
      window: Int = 40, stride: Int = 30) = {
    val toks = split(col("text"), " ")
    val nTokC = col("chunk_id") * stride
    docs
      // NULL text would give size(split(NULL)) = -1 under legacy
      // sizeOfNull and emit one phantom chunk with n_tok=-1 while the
      // oracle's GREATEST/LEAST (NULL-ignoring) would emit n_tok=40 —
      // guard on both sides (WHERE text IS NOT NULL in the oracle)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("toks"), size(toks).as("n"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0),
          greatest(lit(0L), ceil((col("n") - window) / lit(stride.toDouble)))
            .cast(IntegerType))).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        (nTokC + 1).as("start_tok"),
        least(lit(window), col("n") - nTokC).as("n_tok"),
        md5(array_join(slice(col("toks"), nTokC + 1,
          least(lit(window), col("n") - nTokC)), " ")
          .cast(BinaryType)).as("chunk_md5"))
      .transform(graft.engine.Par.preSort(_, col("doc_id"), col("chunk_id"))) // preSort (r18)
      .orderBy(col("doc_id").asc_nulls_last, col("chunk_id").asc_nulls_last)
  }

  /** Character-entropy quality signal (r14): Shannon entropy in bits
    * per character, distinct-char count, and the dominant character's
    * mass — the CCNet-class "text vs noise" gate (low entropy = runs /
    * boilerplate / padding; high = encrypted or binary-ish junk).
    *
    * Spark side is ONE codegen kernel per document
    * (expressions/CharStats.scala) — the declarative spelling the
    * oracle uses would explode the corpus into a row PER CHARACTER
    * (a 100 TB scan becomes a 100 TB+ shuffle); the kernel keeps the
    * whole query a pure map. Determinism: per-term round(−p·ln p, 9)
    * summed exactly (the tx_bigram_lm DECIMAL discipline) on BOTH
    * sides, ln↔Math.log (the proven pair), bits division once after
    * the sum.
    */
  val tEntropy = Q(
    "tx_entropy",
    """WITH ch AS (
      |  SELECT doc_id, text, unnest(generate_series(1, len(text))) AS i
      |  FROM documents),
      |cc AS (
      |  SELECT doc_id, substr(text, i, 1) AS c, COUNT(*) AS n
      |  FROM ch GROUP BY doc_id, substr(text, i, 1)),
      |tot AS (
      |  SELECT doc_id, SUM(n) AS nn, CAST(COUNT(*) AS INT) AS nd, MAX(n) AS mx
      |  FROM cc GROUP BY doc_id),
      |ent AS (
      |  SELECT cc.doc_id,
      |    CAST(SUM(CAST(ROUND(-(cc.n * 1.0 / t.nn) * ln(cc.n * 1.0 / t.nn), 9)
      |      AS DECIMAL(28,9))) AS DOUBLE) AS hnat
      |  FROM cc JOIN tot t USING (doc_id) GROUP BY cc.doc_id)
      |SELECT t.doc_id,
      |  CAST(t.nn AS BIGINT) AS n_chars,
      |  t.nd AS n_distinct,
      |  ROUND(e.hnat / ln(2.0), 6) AS entropy_bits,
      |  ROUND(t.mx * 1.0 / t.nn, 6) AS max_char_frac
      |FROM tot t JOIN ent e USING (doc_id)
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  ) { s =>
    // empty text yields no char rows in the oracle (generate_series(1,0)
    // is empty) — the length guard keeps the two sides row-identical;
    // the fixture has no empty docs, so at fixture scale it prunes
    // nothing
    s.table("documents")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"),
        graft.engine.GraftColumns.charStats(col("text")).as("cs"))
      .select(col("doc_id"),
        col("cs.n_chars").as("n_chars"),
        col("cs.n_distinct").as("n_distinct"),
        round(col("cs.h_nats") / lit(math.log(2.0)), 6).as("entropy_bits"),
        round(col("cs.max_frac"), 6).as("max_char_frac"))
      // no preSort (r18): pinned zero-shuffle pure map — see tx_repetition
      .orderBy(col("doc_id").asc_nulls_last)
  }

  val all: Seq[Q] =
    Seq(tStats, tQuality, tTokens, tLangId, tFingerprint, tScrub, tBoiler,
      tRepetition, tDecontaminate, tBigramLm, tTfidf, tDupCoverage,
      tSourceStats, tChunk, tEntropy, tSpanDedup)
}
