package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
import graft.engine.Gateway

/** Network serving entry point — the reference's client-server role
  * (Arrow Flight SQL on :32010, /root/reference/main.go:254-258) mapped
  * to Spark's native wire protocol: a HiveServer2-compatible Thrift
  * JDBC/ODBC endpoint over the gateway session (BASELINE.json
  * "spark_approach": Spark SQL + JDBC/Thrift server).
  *
  * Any JDBC client (beeline, DBeaver, the hive-jdbc driver) can run the
  * reference's smoke queries unchanged:
  *   SELECT 1 AS a                                   (client/main.py:11)
  *   SELECT extension_name FROM duckdb_extensions()  (client/main.go:27)
  *
  * Usage: runMain graft.Serve [dataDir]  (port: SPARK_GRAFT_THRIFT_PORT,
  * default 10000; blocks until killed).
  */
object Serve {
  /** Start the Thrift server on the gateway's session; returns the bound
    * server for tests to stop.
    */
  def start(spark: SparkSession, dataDir: String): Gateway = {
    val gw = Gateway.open(spark, dataDir)
    // Gateway.open sets spark.graft.readOnly on this session, so the
    // injected GraftSqlParser (ReadOnlyGuard) rejects write/DDL statements
    // from Thrift clients — the gateway-level check alone never sees them
    val classic = gw.session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    HiveThriftServer2.startWithContext(classic.sqlContext)
    gw
  }

  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val port = sys.env.getOrElse("SPARK_GRAFT_THRIFT_PORT", "10000")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // one shared session: thrift client sessions see the gateway's
      // registered temp views (the fixture tables)
      .config("spark.sql.hive.thriftServer.singleSession", "true")
      // DuckDB dialect at the parser level, so raw JDBC SQL (which never
      // passes through Gateway.sql) still gets the rewrites
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("hive.server2.thrift.port", port)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    start(spark, dataDir)
    println(s"graft thrift server on port $port serving $dataDir")
    Thread.currentThread.join() // serve until killed
  }
}
