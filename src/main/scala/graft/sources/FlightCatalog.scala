package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, SupportsRead, Table, TableCatalog, TableCapability, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.flight.FlightClientLite

/** ATTACH'd remote Flight catalog (SURVEY §2.1 S6 / §2.12 D7): the
  * reference deploys with `ATTACH 'hello2' (TYPE AIRPORT, location
  * 'grpc://…')` (k8s/main.yaml:155 via the init hook main.go:108),
  * making a remote Flight server's tables queryable by name. The
  * Spark-idiomatic shape is a V2 CatalogPlugin: `ATTACH` (Gateway)
  * binds `spark.sql.catalog.<name>` to this class, after which
  * `SELECT … FROM <name>.main.<table>` resolves through Catalyst like
  * any other catalog — no view materialization, no snapshot.
  *
  * Scale layout: table reads stream Arrow record batches DoGet-side and
  * decode them executor-side (ArrowConverters) — the driver never holds
  * a result; column pruning pushes the projection into the remote SQL,
  * so a 2-column read of a wide remote table ships 2 columns. One
  * endpoint = one input partition (the reference's server returns a
  * single endpoint; a sharded Flight service would map endpoints 1:1 to
  * partitions here).
  *
  * Identifiers are quoted with backticks — the remote peer is a
  * Spark-dialect Flight server (graft.flight.FlightServer); an ANSI
  * peer would need double-quote quoting.
  */
final class FlightCatalog extends CatalogPlugin with TableCatalog {
  private var catalogName: String = _
  private var host: String = "localhost"
  private var port: Int = 32010

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    host = Option(options.get("host")).getOrElse(host)
    port = Option(options.get("port")).map(_.toInt).getOrElse(port)
  }
  override def name(): String = catalogName
  override def defaultNamespace(): Array[String] = Array("main")

  private def withClient[A](f: FlightClientLite => A): A = {
    val c = new FlightClientLite(host, port)
    try f(c)
    finally c.close()
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    withClient { c =>
      c.doGetSql("SELECT table_name FROM duckdb_tables()").rows
        .map(r => Identifier.of(namespace, String.valueOf(r.head))).toArray
    }

  override def loadTable(ident: Identifier): Table = {
    import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
    // the only namespace is main (DuckDB's attached-db layout)
    if (!(ident.namespace.isEmpty || ident.namespace.sameElements(Array("main"))))
      throw new NoSuchTableException(ident)
    val schemaIpc =
      try withClient(
        _.getSchema(s"SELECT * FROM ${FlightCatalog.quote(ident.name)}").schema)
      catch {
        // ONLY a remote analysis failure (unknown table — the peer maps
        // AnalysisException to INVALID_ARGUMENT / NOT_FOUND) surfaces as
        // Spark's standard not-found, which is what the default
        // tableExists() recognizes. Everything else — UNAVAILABLE,
        // DEADLINE_EXCEEDED, INTERNAL, codec failures — is a real fault
        // and must propagate, not masquerade as "table does not exist".
        case e: Exception =>
          val code =
            org.sparkproject.connect.grpc.Status.fromThrowable(e).getCode
          import org.sparkproject.connect.grpc.Status.Code
          if (code == Code.INVALID_ARGUMENT || code == Code.NOT_FOUND)
            throw new NoSuchTableException(ident)
          else throw e
      }
    val schema = org.apache.spark.sql.GraftArrow.sparkSchemaFromIpc(schemaIpc)
    new RemoteFlightTable(host, port, ident.name, schema)
  }

  private def readOnly: Nothing =
    throw new UnsupportedOperationException(
      s"Flight catalog '$catalogName' is read-only")
  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = readOnly
  override def alterTable(ident: Identifier, changes: TableChange*): Table = readOnly
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = readOnly
}

object FlightCatalog {
  def quote(name: String): String = s"`${name.replace("`", "``")}`"
}

final class RemoteFlightTable(
    host: String, port: Int, table: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = table
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan =
        new RemoteFlightScan(host, port, table, tableSchema, required)
    }
}

final class RemoteFlightScan(
    host: String, port: Int, table: String,
    full: StructType, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RemoteFlight($host:$port, $table, cols=${required.fieldNames.mkString(",")})"

  // pruned projection travels INSIDE the remote SQL; a zero-column read
  // (count(*)) still needs row multiplicity, so fetch the narrowest
  // column by type width (never a blob/text column just to count rows)
  // and emit empty rows
  private val fetched: StructType =
    if (required.nonEmpty) required
    else StructType(Seq(full.minBy(_.dataType.defaultSize)))
  private val remoteSql: String =
    s"SELECT ${fetched.fieldNames.map(FlightCatalog.quote).mkString(", ")} " +
      s"FROM ${FlightCatalog.quote(table)}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(RemoteFlightPartition(host, port, remoteSql, fetched,
      emitEmptyRows = required.isEmpty))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val part = p.asInstanceOf[RemoteFlightPartition]
        new RemoteFlightReader(part)
      }
    }
}

final case class RemoteFlightPartition(
    host: String, port: Int, sql: String, fetched: StructType,
    emitEmptyRows: Boolean)
    extends InputPartition

/** Executor-side reader: its own gRPC channel, DoGet(ticket = SQL),
  * record-batch messages re-framed and decoded straight to InternalRows
  * — no arrow-object round trip, no driver involvement. The stream is
  * consumed LAZILY (doGetStream): one in-flight batch end to end, so a
  * remote table larger than executor memory still reads.
  */
final class RemoteFlightReader(part: RemoteFlightPartition)
    extends PartitionReader[InternalRow] {
  private val client = new FlightClientLite(part.host, part.port)
  private val rows: Iterator[InternalRow] =
    try {
      val datas = client.doGetStream(part.sql.getBytes("UTF-8"))
      // first message is the IPC schema; the rest are record batches
      val batches = datas.drop(1).map(graft.flight.FlightResult.encapsulate)
      val decoded = org.apache.spark.sql.GraftArrow
        .rowsFromBatches(batches, part.fetched, "UTC")
      if (part.emitEmptyRows) decoded.map(_ => InternalRow.empty) else decoded
    } catch {
      case e: Throwable => client.close(); throw e // no half-open channel
    }
  override def next(): Boolean = rows.hasNext
  override def get(): InternalRow = rows.next()
  override def close(): Unit = client.close()
}
