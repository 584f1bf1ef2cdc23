package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make a
    * downstream json.load fail and silently zero a round's correctness.
    * Shared with Bench's oracle_sql dump.
    */
  private[graft] def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The oracle statement suite as a JSON object (name -> SQL). */
  private[graft] def oracleSqlJson: String = SparkEntry.oracleSql
    .map { case (k, v) => s"${jsonString(k)}: ${jsonString(v)}" }
    .mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional trailing names: dump only those queries (dev-loop use;
    // the driver always runs the full suite)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8") // measured optimum (Bench)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ANSI on by default (SURVEY §7.3): matches DuckDB's
      // error-on-overflow/invalid-cast. Audited 2026-08-12: the full
      // suite is green under BOTH settings (queries are cast-disciplined,
      // TRY_CAST carries the intentional NULL-on-error cases), so the
      // flag changes error behavior, not results. SPARK_GRAFT_ANSI=false
      // opts out.
      .config("spark.sql.ansi.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ANSI", "true"))
      // native TimeType (f_time) — a builder setting, not per-query conf
      // mutation, so concurrent workers never race on session state
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // worker pool (like Bench, same knob semantics): per-query planning
    // overhead overlaps across queries; each query writes its own
    // directory so the writes never contend
    graft.engine.Tables.register(spark, sfDir)
    // the shared session is SERVING from here: builtin resolution must
    // not depend on which worker thread plans first, so any late
    // dialect registration on it throws (r8 f_math regression — a
    // concurrent Functions.register flipped `factorial` mid-run).
    // Dialect-SQL queries use Functions.isolated child sessions.
    graft.engine.Functions.freeze(spark)
    // a typo'd name in the dev-loop args would otherwise be silently
    // dropped and later misreported as "spark output missing"
    (only -- SparkEntry.queries.keySet).foreach { n =>
      System.err.println(s"[verify] WARNING: '$n' matches no SparkEntry.queries key — skipped")
    }
    val queries = SparkEntry.queries.toIndexedSeq
      .filter { case (n, _) => only.isEmpty || only(n) }
    val cursor = new java.util.concurrent.atomic.AtomicInteger(0)
    val poolSize = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", cpus).toInt
    val workers = (1 to math.max(1, poolSize)).map { _ =>
      new Thread(() => {
        var i = cursor.getAndIncrement()
        while (i < queries.length) {
          val (name, fn) = queries(i)
          // scoped: each query's fixpoint checkpoint blocks are released
          // once its dump lands (same hygiene as Bench — dead checkpoint
          // blocks from finished queries must not pressure in-flight ones)
          try graft.engine.CacheOnce.scoped {
            val df = fn(spark, sfDir)
            // executable output-edge type contract (OutputContract
            // scaladoc): a DECIMAL/interval/instant-timestamp output
            // column is a guaranteed driver hash mismatch even on
            // identical values — refuse before dumping so the query
            // shows red HERE, with the offending column named
            graft.engine.OutputContract.enforce(name, df.schema)
            df.coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
          }
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
            // a stale dump from a previous run would make the driver's
            // differential compare read old results and mask the failure
            try {
              val dir = java.nio.file.Paths.get(s"$outDir/$name")
              if (java.nio.file.Files.exists(dir)) {
                java.nio.file.Files.walk(dir)
                  .sorted(java.util.Comparator.reverseOrder())
                  .forEach(p => java.nio.file.Files.deleteIfExists(p))
              }
            } catch { case _: Throwable => }
          }
          i = cursor.getAndIncrement()
        }
      })
    }
    workers.foreach(_.start())
    workers.foreach(_.join())
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleSqlJson)
    spark.stop()
  }
}
