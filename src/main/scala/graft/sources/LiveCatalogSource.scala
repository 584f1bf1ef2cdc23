package graft.sources

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Live `duckdb_*` catalog views (SURVEY §2.1 S7, §2.12): DuckDB's
  * `duckdb_tables()` / `duckdb_settings()` / … are LIVE table functions —
  * a client that creates a view and then lists tables sees it
  * (reference surface: /root/reference/main.go:77 runs
  * `SELECT … FROM duckdb_extensions()`). A snapshot DataFrame taken at
  * Gateway.open can't express that, so these views are backed by a
  * DataSource V2 table whose scan re-reads the owning session's catalog
  * at PLANNING time, once per query: `planInputPartitions` runs on the
  * driver where the catalog lives, embeds the (tiny — catalog-sized)
  * row set into the single input partition, and executors just replay
  * it. No executor ever touches driver state, so the same plan shape is
  * valid on a real cluster.
  */
object LiveCatalog {

  val schemas: Map[String, StructType] = Map(
    "tables" -> StructType(Seq(
      StructField("database_name", StringType),
      StructField("schema_name", StringType),
      StructField("table_name", StringType),
      StructField("table_type", StringType))),
    "views" -> StructType(Seq(
      StructField("database_name", StringType),
      StructField("schema_name", StringType),
      StructField("view_name", StringType))),
    "functions" -> StructType(Seq(
      StructField("database_name", StringType),
      StructField("schema_name", StringType),
      StructField("function_name", StringType),
      StructField("is_temporary", BooleanType))),
    "settings" -> StructType(Seq(
      StructField("name", StringType),
      StructField("value", StringType))),
    // duckdb_columns() shape (DuckDB 1.0 pinned: database_name,
    // schema_name, table_name, column_name, 1-based column_index,
    // data_type in DuckDB spelling, is_nullable BOOLEAN)
    "columns" -> StructType(Seq(
      StructField("database_name", StringType),
      StructField("schema_name", StringType),
      StructField("table_name", StringType),
      StructField("column_name", StringType),
      StructField("column_index", IntegerType),
      StructField("data_type", StringType),
      StructField("is_nullable", BooleanType))),
    // information_schema shapes (ANSI spellings DuckDB serves; BI tools
    // and ADBC GetObjects fallbacks read these)
    "is_tables" -> StructType(Seq(
      StructField("table_catalog", StringType),
      StructField("table_schema", StringType),
      StructField("table_name", StringType),
      StructField("table_type", StringType))),
    "is_columns" -> StructType(Seq(
      StructField("table_catalog", StringType),
      StructField("table_schema", StringType),
      StructField("table_name", StringType),
      StructField("column_name", StringType),
      StructField("ordinal_position", IntegerType),
      StructField("is_nullable", StringType),
      StructField("data_type", StringType))),
    "schemata" -> StructType(Seq(
      StructField("catalog_name", StringType),
      StructField("schema_name", StringType))))

  /** Spark type → DuckDB's type spelling (duckdb_columns/info-schema). */
  def duckTypeName(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case StringType => "VARCHAR"
    case org.apache.spark.sql.types.LongType => "BIGINT"
    case org.apache.spark.sql.types.IntegerType => "INTEGER"
    case org.apache.spark.sql.types.ShortType => "SMALLINT"
    case org.apache.spark.sql.types.ByteType => "TINYINT"
    case org.apache.spark.sql.types.DoubleType => "DOUBLE"
    case org.apache.spark.sql.types.FloatType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case org.apache.spark.sql.types.DateType => "DATE"
    case org.apache.spark.sql.types.TimestampNTZType => "TIMESTAMP"
    case org.apache.spark.sql.types.TimestampType => "TIMESTAMP WITH TIME ZONE"
    case org.apache.spark.sql.types.BinaryType => "BLOB"
    case d: org.apache.spark.sql.types.DecimalType =>
      s"DECIMAL(${d.precision},${d.scale})"
    case a: org.apache.spark.sql.types.ArrayType =>
      duckTypeName(a.elementType) + "[]"
    case m: org.apache.spark.sql.types.MapType =>
      s"MAP(${duckTypeName(m.keyType)}, ${duckTypeName(m.valueType)})"
    case s: StructType =>
      s.fields.map(f => s""""${f.name}" ${duckTypeName(f.dataType)}""")
        .mkString("STRUCT(", ", ", ")")
    case other => other.sql
  }

  /** Sessions are resolved through a weak registry: the scan carries only
    * a string key (serializable into the plan), and a closed gateway's
    * session stays collectable (same rationale as Tables.current).
    */
  private val sessions =
    new ConcurrentHashMap[String, WeakReference[SparkSession]]()
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0)

  def registerSession(sess: SparkSession): String = {
    // purge entries whose referent was collected — a serving process
    // opens one gateway per client, and dead keys would otherwise
    // accumulate for the life of the JVM
    val dead = sessions.entrySet().iterator()
    while (dead.hasNext) if (dead.next().getValue.get() == null) dead.remove()
    val key = s"sess-${nextId.incrementAndGet()}"
    sessions.put(key, new WeakReference(sess))
    key
  }

  private def resolve(key: String): SparkSession =
    Option(sessions.get(key)).flatMap(r => Option(r.get()))
      .getOrElse(throw new IllegalStateException(
        s"live catalog: owning session '$key' is gone"))

  /** The introspection views never list themselves (DuckDB's are
    * functions, not catalog objects).
    */
  private def isSelf(name: String): Boolean = name.startsWith("duckdb_")

  /** Listing invocations, observable so a spec can pin ONE catalog
    * listing per scan planning (VERDICT r8 item 3: the Dataset-based
    * `sess.catalog.listTables().collect()` ran a full Spark JOB per
    * call, repeated per referenced view).
    */
  private[graft] val listingCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Driver-side live listing straight off the SessionCatalog — the
    * same objects `sess.catalog.listTables()` reports, WITHOUT building
    * a Dataset (which runs a Spark job and re-fetches per-table
    * metadata). (name, tableType) pairs, tableType in the Catalog API's
    * spelling ("TEMPORARY" for temp views) so the served rows are
    * byte-identical to the pre-r9 Dataset path.
    */
  private[graft] def listLive(sess: SparkSession): Seq[(String, String)] = {
    listingCount.incrementAndGet()
    val cat = sess.sessionState.catalog
    val db = cat.getCurrentDatabase
    cat.listTables(db).map { ti =>
      val typ =
        if (ti.database.isEmpty || cat.isTempView(ti)) "TEMPORARY"
        else
          try cat.getTableMetadata(ti).tableType.name
          catch { case _: Throwable => "TABLE" }
      (ti.table, typ)
    }.filterNot { case (n, _) => isSelf(n) }
  }

  /** A listed relation's schema without constructing a Dataset: temp
    * views store their analyzed plan in the catalog; only persistent
    * tables fall back to the (heavier) table() analysis.
    */
  private def schemaOf(sess: SparkSession, name: String): StructType =
    try {
      // a CREATE TEMP VIEW stored as an UNRESOLVED plan throws on
      // .schema — fall through to full analysis for those
      sess.sessionState.catalog.getTempView(name)
        .filter(_.resolved).map(_.schema)
        .getOrElse(sess.table(name).schema)
    } catch { case _: Throwable => StructType(Nil) }

  /** Driver-side catalog read; one call (= ONE catalog listing) per
    * query referencing the view.
    */
  def rows(view: String, sessionKey: String): Array[Array[Any]] = {
    val sess = resolve(sessionKey)
    view match {
      case "tables" =>
        listLive(sess)
          .map { case (n, t) => Array[Any]("memory", "main", n, t) }.toArray
      case "views" =>
        listLive(sess)
          .filter { case (_, t) => t.equalsIgnoreCase("VIEW") }
          .map { case (n, _) => Array[Any]("memory", "main", n) }.toArray
      case "functions" =>
        val cat = sess.sessionState.catalog
        val db = cat.getCurrentDatabase
        // session-scoped (no database) = temporary, matching the Catalog
        // API's isTemporary flag this path used to read off the Dataset
        cat.listFunctions(db).map { case (ident, _) =>
          Array[Any]("memory", "main", ident.funcName,
            java.lang.Boolean.valueOf(ident.database.isEmpty))
        }.toArray
      case "settings" =>
        sess.conf.getAll.toArray.sortBy(_._1)
          .map { case (k, v) => Array[Any](k, v) }
      case "columns" | "is_columns" =>
        listLive(sess).flatMap { case (name, _) =>
          schemaOf(sess, name).fields.zipWithIndex.map { case (f, i) =>
            if (view == "columns")
              Array[Any]("memory", "main", name, f.name,
                Integer.valueOf(i + 1), duckTypeName(f.dataType),
                java.lang.Boolean.valueOf(f.nullable))
            else
              Array[Any]("memory", "main", name, f.name,
                Integer.valueOf(i + 1), if (f.nullable) "YES" else "NO",
                duckTypeName(f.dataType))
          }
        }.toArray
      case "is_tables" =>
        // the served fixture tables present as BASE TABLEs (they are the
        // database's tables to a client); everything else the session
        // created is a VIEW
        listLive(sess).map { case (n, _) =>
          Array[Any]("memory", "main", n,
            if (graft.engine.Tables.names.contains(n)) "BASE TABLE"
            else "VIEW")
        }.toArray
      case "schemata" =>
        Array(Array[Any]("memory", "main"),
          Array[Any]("memory", "information_schema"))
      case other =>
        throw new IllegalArgumentException(s"unknown catalog view: $other")
    }
  }
}

/** `spark.read.format("graft.sources.LiveCatalogSource")
  *   .option("view", "tables").option("session", key).load()`
  */
final class LiveCatalogSource extends TableProvider {
  private def opt(m: java.util.Map[String, String], k: String): String = {
    val v = Option(m.get(k)).orElse(Option(m.get(k.toLowerCase))).orNull
    require(v != null, s"LiveCatalogSource requires option '$k'")
    v
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LiveCatalog.schemas(opt(options, "view"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new LiveCatalogTable(opt(properties, "view"), opt(properties, "session"))
}

final class LiveCatalogTable(view: String, sessionKey: String)
    extends Table with SupportsRead {
  override def name(): String = s"duckdb_$view"
  override def schema(): StructType = LiveCatalog.schemas(view)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LiveCatalogScan(view, sessionKey)
    }
}

final class LiveCatalogScan(view: String, sessionKey: String)
    extends Scan with Batch {
  override def readSchema(): StructType = LiveCatalog.schemas(view)
  override def toBatch: Batch = this
  override def description(): String = s"LiveCatalog(duckdb_$view)"

  // driver-side, per query execution: this is where "live" happens.
  // Memoized per SCAN INSTANCE (each query builds a fresh scan, so
  // liveness is untouched): Spark plans a V2 batch's partitions more
  // than once per query (physical planning + AQE stage materialization),
  // and the listing must not repeat per call (VERDICT r8 item 3)
  private lazy val snapshot = LiveCatalog.rows(view, sessionKey)
  override def planInputPartitions(): Array[InputPartition] =
    Array(LiveCatalogPartition(snapshot))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows = p.asInstanceOf[LiveCatalogPartition].rows
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            InternalRow.fromSeq(rows(i).toSeq.map {
              case s: String => UTF8String.fromString(s)
              case other => other
            })
          override def close(): Unit = ()
        }
    }
}

/** Row payload rides inside the partition (catalog-sized, a few KB). */
final case class LiveCatalogPartition(rows: Array[Array[Any]])
    extends InputPartition
