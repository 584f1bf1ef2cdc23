package org.apache.spark.sql

import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame}

/** Package-private-access bridge into Spark's Arrow serialization (the
  * same machinery PySpark's collect path uses). Lives in
  * org.apache.spark.sql purely to reach `private[sql]` members; no Spark
  * internals are modified.
  */
object GraftArrow {

  /** Serialize a DataFrame result as an Arrow IPC stream: schema message
    * first, then record batches, pulled partition-at-a-time (incremental
    * delivery like the reference's DoGet loop, main.go:241-243).
    */
  def stream(df: Dataset[Row], maxRecordsPerBatch: Int): Iterator[Array[Byte]] = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession
    val schema = classic.schema
    val timeZone = spark.sessionState.conf.sessionLocalTimeZone
    val arrowSchema = org.apache.spark.sql.util.ArrowUtils.toArrowSchema(
      schema, timeZone, errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val schemaBytes: Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val ch = java.nio.channels.Channels.newChannel(out)
      org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(
        new org.apache.arrow.vector.ipc.WriteChannel(ch), arrowSchema)
      out.toByteArray
    }
    val batches = classic.toArrowBatchRdd.toLocalIterator
    Iterator(schemaBytes) ++ batches
  }
}
