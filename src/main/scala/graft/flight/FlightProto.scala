package graft.flight

import org.sparkproject.connect.protobuf.{CodedInputStream, CodedOutputStream}

/** Hand-rolled codec for the handful of Arrow Flight (SQL) protobuf
  * messages the reference's surface uses (field numbers from the public
  * arrow Flight.proto / FlightSql.proto; the reference's handlers are
  * /root/reference/main.go:121-250). The container has no protoc and no
  * arrow-flight jar, but spark-connect ships a shaded protobuf runtime —
  * so the wire format here is REAL protobuf, byte-compatible with
  * pyarrow.flight / ADBC clients, just encoded without generated
  * classes.
  *
  * Only fields the server reads/writes are modeled; unknown fields are
  * skipped on decode (protobuf-standard behavior).
  */
object FlightProto {

  // ---- generic helpers -------------------------------------------------

  private def encode(f: CodedOutputStream => Unit): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = CodedOutputStream.newInstance(baos)
    f(out)
    out.flush()
    baos.toByteArray
  }

  private def decode(bytes: Array[Byte])(f: (CodedInputStream, Int) => Boolean): Unit = {
    val in = CodedInputStream.newInstance(bytes)
    var tag = in.readTag()
    while (tag != 0) {
      if (!f(in, tag >>> 3)) in.skipField(tag)
      tag = in.readTag()
    }
  }

  // ---- Flight.proto messages ------------------------------------------

  /** FlightDescriptor: type=1 (0 UNKNOWN, 1 PATH, 2 CMD), cmd=2, path=3. */
  final case class FlightDescriptor(
      descriptorType: Int,
      cmd: Array[Byte],
      path: Seq[String] = Nil) {
    def toBytes: Array[Byte] = encode { out =>
      if (descriptorType != 0) out.writeInt32(1, descriptorType)
      if (cmd.nonEmpty) out.writeByteArray(2, cmd)
      path.foreach(out.writeString(3, _))
    }
  }
  object FlightDescriptor {
    val CMD = 2
    def fromBytes(bytes: Array[Byte]): FlightDescriptor = {
      var tpe = 0
      var cmd = Array.emptyByteArray
      val path = Seq.newBuilder[String]
      decode(bytes) {
        case (in, 1) => tpe = in.readInt32(); true
        case (in, 2) => cmd = in.readBytes().toByteArray; true
        case (in, 3) => path += in.readString(); true
        case _ => false
      }
      FlightDescriptor(tpe, cmd, path.result())
    }
  }

  /** Ticket: ticket=1 (opaque bytes; the reference uses the raw SQL
    * text, main.go:199 + client/main.py:11).
    */
  final case class Ticket(ticket: Array[Byte]) {
    def toBytes: Array[Byte] = encode(out => out.writeByteArray(1, ticket))
  }
  object Ticket {
    def fromBytes(bytes: Array[Byte]): Ticket = {
      var t = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => t = in.readBytes().toByteArray; true
        case _ => false
      }
      Ticket(t)
    }
  }

  /** Location: uri=1. */
  final case class Location(uri: String) {
    def toBytes: Array[Byte] = encode(out => out.writeString(1, uri))
  }

  /** FlightEndpoint: ticket=1, location=2. */
  final case class FlightEndpoint(ticket: Ticket, locations: Seq[Location] = Nil) {
    def toBytes: Array[Byte] = encode { out =>
      out.writeByteArray(1, ticket.toBytes)
      locations.foreach(l => out.writeByteArray(2, l.toBytes))
    }
  }
  object FlightEndpoint {
    def fromBytes(bytes: Array[Byte]): FlightEndpoint = {
      var t = Ticket(Array.emptyByteArray)
      decode(bytes) {
        case (in, 1) => t = Ticket.fromBytes(in.readBytes().toByteArray); true
        case _ => false
      }
      FlightEndpoint(t)
    }
  }

  /** FlightInfo: schema=1 (IPC-encapsulated Schema message),
    * flight_descriptor=2, endpoint=3, total_records=4, total_bytes=5.
    */
  final case class FlightInfo(
      schema: Array[Byte],
      descriptor: FlightDescriptor,
      endpoints: Seq[FlightEndpoint],
      totalRecords: Long = -1L,
      totalBytes: Long = -1L) {
    def toBytes: Array[Byte] = encode { out =>
      if (schema.nonEmpty) out.writeByteArray(1, schema)
      out.writeByteArray(2, descriptor.toBytes)
      endpoints.foreach(e => out.writeByteArray(3, e.toBytes))
      if (totalRecords != 0) out.writeInt64(4, totalRecords)
      if (totalBytes != 0) out.writeInt64(5, totalBytes)
    }
  }
  object FlightInfo {
    def fromBytes(bytes: Array[Byte]): FlightInfo = {
      var schema = Array.emptyByteArray
      var desc = FlightDescriptor(0, Array.emptyByteArray)
      val eps = Seq.newBuilder[FlightEndpoint]
      // proto3: absent int64 means ZERO (the reference's TotalRecords: 0
      // serializes as field-absent); the Flight convention's "unknown"
      // is an EXPLICIT -1, which is nonzero and therefore on the wire
      var records = 0L
      var total = 0L
      decode(bytes) {
        case (in, 1) => schema = in.readBytes().toByteArray; true
        case (in, 2) => desc = FlightDescriptor.fromBytes(in.readBytes().toByteArray); true
        case (in, 3) => eps += FlightEndpoint.fromBytes(in.readBytes().toByteArray); true
        case (in, 4) => records = in.readInt64(); true
        case (in, 5) => total = in.readInt64(); true
        case _ => false
      }
      FlightInfo(schema, desc, eps.result(), records, total)
    }
  }

  /** SchemaResult (GetSchema response): schema=1. */
  final case class SchemaResult(schema: Array[Byte]) {
    def toBytes: Array[Byte] = encode(out => out.writeByteArray(1, schema))
  }
  object SchemaResult {
    def fromBytes(bytes: Array[Byte]): SchemaResult = {
      var s = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => s = in.readBytes().toByteArray; true
        case _ => false
      }
      SchemaResult(s)
    }
  }

  /** FlightData: flight_descriptor=1, data_header=2 (flatbuffer Message
    * metadata), app_metadata=3, data_body=1000 (the buffer bytes).
    */
  final case class FlightData(
      dataHeader: Array[Byte],
      dataBody: Array[Byte],
      descriptor: Option[FlightDescriptor] = None) {
    def toBytes: Array[Byte] = encode { out =>
      descriptor.foreach(d => out.writeByteArray(1, d.toBytes))
      if (dataHeader.nonEmpty) out.writeByteArray(2, dataHeader)
      if (dataBody.nonEmpty) out.writeByteArray(1000, dataBody)
    }
  }
  object FlightData {
    def fromBytes(bytes: Array[Byte]): FlightData = {
      var header = Array.emptyByteArray
      var body = Array.emptyByteArray
      var desc: Option[FlightDescriptor] = None
      decode(bytes) {
        case (in, 1) =>
          desc = Some(FlightDescriptor.fromBytes(in.readBytes().toByteArray)); true
        case (in, 2) => header = in.readBytes().toByteArray; true
        case (in, 1000) => body = in.readBytes().toByteArray; true
        case _ => false
      }
      FlightData(header, body, desc)
    }
  }

  /** Action (DoAction request): type=1, body=2. */
  final case class Action(actionType: String, body: Array[Byte]) {
    def toBytes: Array[Byte] = encode { out =>
      out.writeString(1, actionType)
      if (body.nonEmpty) out.writeByteArray(2, body)
    }
  }
  object Action {
    def fromBytes(bytes: Array[Byte]): Action = {
      var t = ""
      var b = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => t = in.readString(); true
        case (in, 2) => b = in.readBytes().toByteArray; true
        case _ => false
      }
      Action(t, b)
    }
  }

  /** Result (DoAction response stream element): body=1. */
  final case class ActionResult(body: Array[Byte]) {
    def toBytes: Array[Byte] = encode { out =>
      if (body.nonEmpty) out.writeByteArray(1, body)
    }
  }
  object ActionResult {
    def fromBytes(bytes: Array[Byte]): ActionResult = {
      var b = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => b = in.readBytes().toByteArray; true
        case _ => false
      }
      ActionResult(b)
    }
  }

  /** PutResult (DoPut response stream element): app_metadata=1. */
  final case class PutResult(appMetadata: Array[Byte]) {
    def toBytes: Array[Byte] = encode { out =>
      if (appMetadata.nonEmpty) out.writeByteArray(1, appMetadata)
    }
  }

  /** HandshakeRequest/Response: protocol_version=1, payload=2 (the
    * server echoes — no auth, like the reference).
    */
  final case class Handshake(protocolVersion: Long, payload: Array[Byte]) {
    def toBytes: Array[Byte] = encode { out =>
      if (protocolVersion != 0) out.writeUInt64(1, protocolVersion)
      if (payload.nonEmpty) out.writeByteArray(2, payload)
    }
  }
  object Handshake {
    def fromBytes(bytes: Array[Byte]): Handshake = {
      var v = 0L
      var p = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => v = in.readUInt64(); true
        case (in, 2) => p = in.readBytes().toByteArray; true
        case _ => false
      }
      Handshake(v, p)
    }
  }

  /** ActionType: type=1, description=2 (ListActions response items). */
  final case class ActionType(actionType: String, description: String) {
    def toBytes: Array[Byte] = encode { out =>
      out.writeString(1, actionType)
      out.writeString(2, description)
    }
  }

  // ---- google.protobuf.Any + FlightSql command wrappers ----------------

  /** Any: type_url=1, value=2. Flight SQL wraps every command in an Any
    * inside FlightDescriptor.cmd.
    */
  final case class AnyMsg(typeUrl: String, value: Array[Byte]) {
    def toBytes: Array[Byte] = encode { out =>
      out.writeString(1, typeUrl)
      if (value.nonEmpty) out.writeByteArray(2, value)
    }
  }
  object AnyMsg {
    def fromBytes(bytes: Array[Byte]): AnyMsg = {
      var url = ""
      var v = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => url = in.readString(); true
        case (in, 2) => v = in.readBytes().toByteArray; true
        case _ => false
      }
      AnyMsg(url, v)
    }
  }

  val StatementQueryUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandStatementQuery"
  val GetSqlInfoUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetSqlInfo"
  val TicketStatementQueryUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.TicketStatementQuery"

  /** CommandStatementQuery: query=1, transaction_id=2. */
  final case class CommandStatementQuery(
      query: String, transactionId: Array[Byte] = Array.emptyByteArray) {
    def toBytes: Array[Byte] = encode { out =>
      out.writeString(1, query)
      if (transactionId.nonEmpty) out.writeByteArray(2, transactionId)
    }

    /** The SQL text, honoring the Go flightsql driver's wire quirk the
      * reference serves (/root/reference/main.go:138-139): that driver
      * packs the statement into transaction_id — an embedded message
      * whose first 2 bytes are the inner field tag + length — and leaves
      * query empty; the reference recovers it by stripping those 2
      * bytes. Same recovery here, only when query is absent, so
      * spec-conforming clients (pyarrow, ADBC) are untouched.
      */
    def sqlText: String =
      if (query.nonEmpty || transactionId.length <= 2) query
      else new String(transactionId.drop(2), "UTF-8")
  }
  object CommandStatementQuery {
    def fromBytes(bytes: Array[Byte]): CommandStatementQuery = {
      var q = ""
      var txn = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => q = in.readString(); true
        case (in, 2) => txn = in.readBytes().toByteArray; true
        case _ => false
      }
      CommandStatementQuery(q, txn)
    }
  }

  val PreparedStatementQueryUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandPreparedStatementQuery"
  val CreatePreparedStatementRequestUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.ActionCreatePreparedStatementRequest"
  val CreatePreparedStatementResultUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.ActionCreatePreparedStatementResult"
  val ClosePreparedStatementRequestUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.ActionClosePreparedStatementRequest"

  /** CommandPreparedStatementQuery: prepared_statement_handle=1. */
  final case class CommandPreparedStatementQuery(handle: Array[Byte]) {
    def toBytes: Array[Byte] = encode(out => out.writeByteArray(1, handle))
  }
  object CommandPreparedStatementQuery {
    def fromBytes(bytes: Array[Byte]): CommandPreparedStatementQuery = {
      var h = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => h = in.readBytes().toByteArray; true
        case _ => false
      }
      CommandPreparedStatementQuery(h)
    }
  }

  /** ActionCreatePreparedStatementRequest: query=1, transaction_id=2. */
  final case class ActionCreatePreparedStatementRequest(query: String) {
    def toBytes: Array[Byte] = encode(out => out.writeString(1, query))
  }
  object ActionCreatePreparedStatementRequest {
    def fromBytes(bytes: Array[Byte]): ActionCreatePreparedStatementRequest = {
      var q = ""
      decode(bytes) {
        case (in, 1) => q = in.readString(); true
        case _ => false
      }
      ActionCreatePreparedStatementRequest(q)
    }
  }

  /** ActionCreatePreparedStatementResult: prepared_statement_handle=1,
    * dataset_schema=2 (IPC), parameter_schema=3 (IPC).
    */
  final case class ActionCreatePreparedStatementResult(
      handle: Array[Byte],
      datasetSchema: Array[Byte] = Array.emptyByteArray,
      parameterSchema: Array[Byte] = Array.emptyByteArray) {
    def toBytes: Array[Byte] = encode { out =>
      out.writeByteArray(1, handle)
      if (datasetSchema.nonEmpty) out.writeByteArray(2, datasetSchema)
      if (parameterSchema.nonEmpty) out.writeByteArray(3, parameterSchema)
    }
  }
  object ActionCreatePreparedStatementResult {
    def fromBytes(bytes: Array[Byte]): ActionCreatePreparedStatementResult = {
      var h = Array.emptyByteArray
      var ds = Array.emptyByteArray
      var ps = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => h = in.readBytes().toByteArray; true
        case (in, 2) => ds = in.readBytes().toByteArray; true
        case (in, 3) => ps = in.readBytes().toByteArray; true
        case _ => false
      }
      ActionCreatePreparedStatementResult(h, ds, ps)
    }
  }

  /** ActionClosePreparedStatementRequest: prepared_statement_handle=1. */
  final case class ActionClosePreparedStatementRequest(handle: Array[Byte]) {
    def toBytes: Array[Byte] = encode(out => out.writeByteArray(1, handle))
  }
  object ActionClosePreparedStatementRequest {
    def fromBytes(bytes: Array[Byte]): ActionClosePreparedStatementRequest = {
      var h = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => h = in.readBytes().toByteArray; true
        case _ => false
      }
      ActionClosePreparedStatementRequest(h)
    }
  }

  val GetCatalogsUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetCatalogs"
  val GetDbSchemasUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetDbSchemas"
  val GetTablesUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetTables"
  val GetTableTypesUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetTableTypes"
  // constraint/type-info metadata commands a stock ADBC GetObjects
  // (depth=all) issues; the engine has no declared constraints, so these
  // answer the spec'd schemas with zero rows (FlightServer.metaDf)
  val GetPrimaryKeysUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetPrimaryKeys"
  val GetImportedKeysUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetImportedKeys"
  val GetExportedKeysUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetExportedKeys"
  val GetCrossReferenceUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetCrossReference"
  val GetXdbcTypeInfoUrl =
    "type.googleapis.com/arrow.flight.protocol.sql.CommandGetXdbcTypeInfo"

  /** CommandGetDbSchemas: catalog=1, db_schema_filter_pattern=2. */
  final case class CommandGetDbSchemas(
      catalog: Option[String], schemaPattern: Option[String])
  object CommandGetDbSchemas {
    def fromBytes(bytes: Array[Byte]): CommandGetDbSchemas = {
      var c: Option[String] = None
      var s: Option[String] = None
      decode(bytes) {
        case (in, 1) => c = Some(in.readString()); true
        case (in, 2) => s = Some(in.readString()); true
        case _ => false
      }
      CommandGetDbSchemas(c, s)
    }
  }

  /** CommandGetTables: catalog=1, db_schema_filter_pattern=2,
    * table_name_filter_pattern=3, table_types=4 (repeated),
    * include_schema=5.
    */
  final case class CommandGetTables(
      catalog: Option[String],
      schemaPattern: Option[String],
      tablePattern: Option[String],
      tableTypes: Seq[String],
      includeSchema: Boolean)
  object CommandGetTables {
    def fromBytes(bytes: Array[Byte]): CommandGetTables = {
      var c: Option[String] = None
      var s: Option[String] = None
      var t: Option[String] = None
      val types = Seq.newBuilder[String]
      var inc = false
      decode(bytes) {
        case (in, 1) => c = Some(in.readString()); true
        case (in, 2) => s = Some(in.readString()); true
        case (in, 3) => t = Some(in.readString()); true
        case (in, 4) => types += in.readString(); true
        case (in, 5) => inc = in.readBool(); true
        case _ => false
      }
      CommandGetTables(c, s, t, types.result(), inc)
    }
  }

  /** TicketStatementQuery: statement_handle=1. */
  final case class TicketStatementQuery(statementHandle: Array[Byte]) {
    def toBytes: Array[Byte] = encode(out => out.writeByteArray(1, statementHandle))
  }
  object TicketStatementQuery {
    def fromBytes(bytes: Array[Byte]): TicketStatementQuery = {
      var h = Array.emptyByteArray
      decode(bytes) {
        case (in, 1) => h = in.readBytes().toByteArray; true
        case _ => false
      }
      TicketStatementQuery(h)
    }
  }
}
