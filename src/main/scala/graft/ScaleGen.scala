package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic synthetic corpus generator for scale runs ABOVE the
  * read-only `/root/testdata` tiers (which top out at sf0.1). Emits the
  * same ten-table layout and schemas as FIXTURES.md at `mult`× the
  * sf0.1 row counts, so `Tables.register` + every declared query run
  * unchanged against the output directory.
  *
  * Everything derives from `spark.range` + hash columns (xxhash64 →
  * uniforms → Box-Muller gaussians), so generation is itself a
  * distributed, codegen'd, seed-stable pipeline — no driver-side RNG,
  * no collected state, safe to scale the multiplier until disk runs
  * out. Structure matching the fixture corpus' semantics:
  *
  *  - documents: ~1/8 exact duplicates (same text seed), ~1/8 one-word
  *    near-duplicates (MinHash/LSH edges), plus a 400-doc sliding-
  *    window CHAIN (consecutive docs share 39/40 words) — a
  *    diameter-400 near-dup component that forces dd_components past
  *    plain propagation into pointer-doubling/star-fallback territory,
  *    the adversarial shape round 7 could only spec at toy scale;
  *  - embeddings: N(0, 0.15) per-dim noise + a label-dependent shift,
  *    so the IVF coarse quantizer has real cluster structure to find;
  *  - events/orders/lineitem: fixture-shaped categoricals, date ranges
  *    and key distributions (uniform FKs + a 5% hot supplier).
  *
  * Usage: runMain graft.ScaleGen <outDir> [mult]   (default mult=10 —
  * sf1-equivalent; TESTDATA sf0.1 × 10).
  */
object ScaleGen {

  /** sf0.1 row counts (FIXTURES.md) — the multiplier scales these. */
  private val sf01Rows = Map(
    "supplier" -> 1000L, "customer" -> 15000L, "part" -> 20000L,
    "orders" -> 150000L, "lineitem" -> 600000L, "events" -> 100000L,
    "documents" -> 5000L, "embeddings" -> 2000L)

  /** Deterministic uniform in [0, 1): salted xxhash64 of the columns. */
  private def u(salt: Int, cols: Column*): Column =
    (pmod(xxhash64((lit(salt) +: cols): _*), lit(1000000007L))
      .cast(DoubleType) + lit(0.5)) / lit(1000000008.0)

  /** Deterministic standard gaussian (Box-Muller over two uniforms). */
  private def gauss(salt: Int, cols: Column*): Column =
    sqrt(lit(-2.0) * log(u(salt, cols: _*))) *
      cos(lit(2.0 * math.Pi) * u(salt + 7919, cols: _*))

  private def pick(salt: Int, choices: Seq[String], cols: Column*): Column = {
    val arr = array(choices.map(lit): _*)
    element_at(arr, (pmod(xxhash64((lit(salt) +: cols): _*),
      lit(choices.length.toLong)) + 1).cast(IntegerType))
  }

  /** 64-word vocabulary in the fixture corpus' register (word soup of
    * query/engine terms — FIXTURES.md documents.text).
    */
  private val vocab: Seq[String] = Seq(
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "join", "hash", "group", "filter", "index", "column", "row", "page",
    "block", "cache", "spill", "shuffle", "plan", "query", "parse",
    "bind", "optimize", "prune", "push", "fold", "cast", "type", "null",
    "value", "count", "sum", "min", "max", "avg", "rank", "window",
    "frame", "range", "list", "map", "struct", "string", "int", "float",
    "date", "time", "stamp", "zone", "read", "write", "commit", "fetch",
    "batch", "vector", "engine", "disk", "memory", "thread", "task",
    "stage", "job")

  /** Length of the sliding-window near-dup chain at the head of the
    * documents table (fixed, not scaled: its point is DEPTH, and
    * diameter ~400 needs ~log₂400 pointer-doubling rounds > the
    * starAfter=10 fallback trigger).
    */
  val ChainLen = 400L
  private val ChainWords = 40

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args(2): CSV of table names to (re)generate — lets a new
    // table (videos.parquet, r16) be ADDED to an existing tier without
    // rewriting the 22 GB 100× corpus; generation is seed-stable so a
    // partial rewrite is byte-identical to a full one
    val only = args.drop(2).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    generate(spark, outDir, mult, only)
    spark.stop()
  }

  def generate(spark: SparkSession, outDir: String, mult: Int,
      only: Option[Set[String]] = None): Unit = {
    def rows(name: String): Long = sf01Rows(name) * mult
    // file counts sized so partitions land in the 32-128 MB band a real
    // cluster wants, while staying parallel at local[8-32]
    def write(df: DataFrame, name: String, files: Int): Unit =
      if (only.forall(_.contains(name)))
        df.repartition(files).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")

    // -- dimension tables ------------------------------------------------
    write(spark.range(5).select(
      col("id").cast(IntegerType).as("r_regionkey"),
      concat(lit("REGION_"), col("id")).as("r_name")), "region", 1)
    write(spark.range(25).select(
      col("id").cast(IntegerType).as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast(IntegerType).as("n_regionkey")), "nation", 1)
    write(spark.range(rows("supplier")).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), format_string("%09d", col("id"))).as("s_name"),
      pmod(xxhash64(lit(1), col("id")), lit(25L)).cast(IntegerType)
        .as("s_nationkey"),
      round(u(2, col("id")) * 10998.0 - 999.0, 2).as("s_acctbal")),
      "supplier", 1)
    write(spark.range(rows("customer")).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), format_string("%09d", col("id"))).as("c_name"),
      pmod(xxhash64(lit(3), col("id")), lit(25L)).cast(IntegerType)
        .as("c_nationkey"),
      round(u(4, col("id")) * 10998.0 - 999.0, 2).as("c_acctbal"),
      pick(5, Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY"), col("id")).as("c_mktsegment")), "customer", 2)
    write(spark.range(rows("part")).select(
      col("id").as("p_partkey"),
      concat_ws(" ", pick(6, vocab, col("id")),
        pick(7, vocab, col("id"))).as("p_name"),
      concat(lit("Brand#"),
        (pmod(xxhash64(lit(8), col("id")), lit(5L)) + 1),
        (pmod(xxhash64(lit(9), col("id")), lit(5L)) + 1)).as("p_brand"),
      concat_ws(" ",
        pick(10, Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY",
          "PROMO"), col("id")),
        pick(11, Seq("ANODIZED", "BURNISHED", "PLATED", "POLISHED",
          "BRUSHED"), col("id")),
        pick(12, Seq("TIN", "NICKEL", "BRASS", "STEEL", "COPPER"),
          col("id"))).as("p_type"),
      (pmod(xxhash64(lit(13), col("id")), lit(50L)) + 1)
        .cast(IntegerType).as("p_size"),
      round(u(14, col("id")) * 1900.0 + 100.0, 2).as("p_retailprice")),
      "part", 2)

    // -- fact tables -----------------------------------------------------
    val nCust = rows("customer")
    val epoch95 = lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
      .cast(TimestampNTZType)
    write(spark.range(rows("orders")).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(lit(20), col("id")), lit(nCust)).as("o_custkey"),
      pick(21, Seq("F", "F", "O", "O", "P"), col("id")).as("o_orderstatus"),
      round(u(22, col("id")) * 450000.0 + 1000.0, 2).as("o_totalprice"),
      (epoch95 + make_dt_interval(
        (pmod(xxhash64(lit(23), col("id")), lit(2400L))).cast(IntegerType)))
        .as("o_orderdate"),
      pick(24, Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW"), col("id")).as("o_orderpriority")), "orders", 4)
    val nOrd = rows("orders")
    val nSupp = rows("supplier")
    val nPart = rows("part")
    write(spark.range(rows("lineitem")).select(
      pmod(xxhash64(lit(30), col("id")), lit(nOrd)).as("l_orderkey"),
      pmod(xxhash64(lit(31), col("id")), lit(nPart)).as("l_partkey"),
      // 5% hot supplier (skew realism), else uniform
      when(u(32, col("id")) < 0.05, lit(1L))
        .otherwise(pmod(xxhash64(lit(33), col("id")), lit(nSupp)))
        .as("l_suppkey"),
      (pmod(xxhash64(lit(34), col("id")), lit(7L)) + 1)
        .cast(IntegerType).as("l_linenumber"),
      (pmod(xxhash64(lit(35), col("id")), lit(50L)) + 1)
        .cast(DoubleType).as("l_quantity"),
      round(u(36, col("id")) * 90000.0 + 1000.0, 2).as("l_extendedprice"),
      round(pmod(xxhash64(lit(37), col("id")), lit(11L))
        .cast(DoubleType) / 100.0, 2).as("l_discount"),
      round(pmod(xxhash64(lit(38), col("id")), lit(9L))
        .cast(DoubleType) / 100.0, 2).as("l_tax"),
      pick(39, Seq("A", "N", "N", "R"), col("id")).as("l_returnflag"),
      pick(40, Seq("F", "O"), col("id")).as("l_linestatus"),
      (epoch95 + make_dt_interval(
        (pmod(xxhash64(lit(41), col("id")), lit(2500L))).cast(IntegerType)))
        .as("l_shipdate")), "lineitem", 8)

    val epoch24 = lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      .cast(TimestampNTZType)
    write(spark.range(rows("events")).select(
      col("id").as("event_id"),
      (epoch24 + make_dt_interval(lit(0), lit(0), lit(0),
        u(50, col("id")) * 29.0 * 86400.0)).as("ts"),
      pmod(xxhash64(lit(51), col("id")), lit(rows("events") / 20))
        .as("user_id"),
      pick(52, Seq("click", "click", "click", "view", "view", "view",
        "view", "signup", "purchase", "error"), col("id")).as("event_type"),
      round(u(53, col("id")) * 100.0, 3).as("value"),
      concat(lit("{\"k\": "),
        pmod(xxhash64(lit(54), col("id")), lit(100L)), lit("}"))
        .as("props")), "events", 4)

    // -- documents: dup/near-dup/chain structure -------------------------
    val vocabArr = array(vocab.map(lit): _*)
    def word(seed: Column, pos: Column): Column =
      element_at(vocabArr, (pmod(xxhash64(lit(60), seed, pos),
        lit(vocab.length.toLong)) + 1).cast(IntegerType))
    val id = col("id")
    // text seed: ids ≡7 (mod 8) copy the doc 7 below (exact dup pair);
    // ids ≡6 share the seed of the doc 6 below but append one word
    val seedCol = when(id % 8 === 7, id - 7)
      .when((id % 8 === 6) && (id >= ChainLen), id - 6)
      .otherwise(id)
    val bodyLen = (pmod(xxhash64(lit(61), seedCol), lit(40L)) + 30)
      .cast(IntegerType)
    val soupText = concat_ws(" ",
      transform(sequence(lit(0), bodyLen - 1), j => word(seedCol, j)))
    // chain block: doc i = words i..i+39 of one shared stream — each
    // consecutive pair shares 39/40 words (shingle jaccard ≈ 0.86)
    val chainText = concat_ws(" ",
      transform(sequence(id, id + ChainWords - 1), k => word(lit(-1), k)))
    val text = when(id < ChainLen, chainText)
      .when((id % 8 === 6) && (id >= ChainLen),
        concat(soupText, lit(" "), word(id, lit(-2))))
      .otherwise(soupText)
    write(spark.range(rows("documents")).select(
      id.as("doc_id"),
      text.as("text"),
      pick(62, Seq("en", "en", "en", "de", "es", "fr", "zh"), id).as("lang"),
      concat(lit("src"), pmod(xxhash64(lit(63), id), lit(20L))).as("source"),
      length(text).as("n_chars")), "documents", 4)

    // -- videos: GVID payloads STORED once (r16) -------------------------
    // The declared mm_video_meta synthesizes its payload in-plan
    // (fixture contract — documents has no binary column); at the scale
    // tiers that made the row ~80% fixture frame-ENCODES. Writing the
    // payloads here (one-time generation cost) lets ScaleBench measure
    // the operator itself — container parse + ONE decode per clip —
    // over a real stored binary column, which is what a production
    // corpus looks like anyway.
    {
      import spark.implicits._
      val vids = spark.range(rows("documents"))
        .select(col("id")).as[Long]
        .map(i => (i, graft.llm.MultimodalOps.videoPayload(i)))
        .toDF("doc_id", "video")
      write(vids, "videos", 8)
    }

    // -- embeddings: gaussian noise + label-dependent cluster shift ------
    val label = pmod(xxhash64(lit(70), col("id")), lit(10L))
      .cast(IntegerType)
    val emb = transform(sequence(lit(0), lit(63)), i =>
      (gauss(71, col("id"), i) * lit(0.15) +
        (u(72, label, i) - lit(0.5)) * lit(0.2)).cast(FloatType))
    write(spark.range(rows("embeddings")).select(
      col("id").as("vec_id"), emb.as("embedding"), label.as("label")),
      "embeddings", 2)
  }
}
