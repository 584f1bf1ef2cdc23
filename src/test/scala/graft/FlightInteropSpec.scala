package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway
import graft.flight.FlightServer

/** Foreign-client interop: a stock, unmodified pyarrow.flight client
  * (the reference's own smoke procedure, /root/reference/client/main.py)
  * over real gRPC/TCP against the in-process FlightServer. This is the
  * class of test that catches wire-format bugs (the r3 IPC 8-byte
  * padding bug) that the in-repo FlightClientLite — sharing codec
  * assumptions with the server — cannot. Dev-only dependency, same as
  * tools/diffcheck.py's DuckDB: the spec cancels (does not fail) when
  * python3/pyarrow is absent, so the shipped library stays pure Scala.
  */
class FlightInteropSpec extends AnyFunSuite {
  import TestSpark._

  test("stock pyarrow client: DoGet, GetFlightInfo two-step, read-only reject") {
    val hasPyarrow =
      try new ProcessBuilder("python3", "-c", "import pyarrow.flight")
        .start().waitFor() == 0
      catch { case _: Throwable => false }
    assume(hasPyarrow, "python3/pyarrow not available — interop smoke skipped")
    val gw = Gateway.open(spark, sf)
    val server = FlightServer.start(gw, 0) // ephemeral port
    try {
      val pb = new ProcessBuilder(
        "python3", "tools/flight_smoke.py", server.boundPort.toString)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
      val code = p.waitFor()
      assert(code == 0, s"flight_smoke.py exited $code:\n$out")
      assert(out.contains("FLIGHT SMOKE OK"), out)
    } finally server.stop()
  }
}
