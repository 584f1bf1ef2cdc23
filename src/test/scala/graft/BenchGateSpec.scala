package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's melted-pass detector (Bench.needMorePasses/cleanPass):
  * pure decision logic, spec'd against the measured signatures of real
  * rounds — r5's 83.4 s loadavg-12 artifact and r6's idle 11.25 s runs.
  */
class BenchGateSpec extends AnyFunSuite {
  private val T = 4 // driver-default bench threads

  test("idle agreeing passes take no retries") {
    // r6 idle signature: walls [14.0, 11.25], cpu ~1.6-1.8x wall*threads
    assert(!Bench.needMorePasses(Seq(14.0, 11.25), Seq(98.5, 70.0), 0.3, T))
  }

  test("disagreeing passes retry until the two fastest agree") {
    // one pass absorbed a load spike: 2x disagreement
    assert(Bench.needMorePasses(Seq(24.0, 11.5), Seq(160.0, 70.0), 0.3, T))
    // a clean retry resolves it: the two fastest now agree
    assert(!Bench.needMorePasses(Seq(24.0, 11.5, 12.0), Seq(160.0, 70.0, 72.0), 0.3, T))
  }

  test("CPU-starved pass (throttled host) is suspect and not clean") {
    // cpu well under 0.5 * wall * threads: the JVM never got the machine
    assert(Bench.needMorePasses(Seq(40.0, 41.0), Seq(20.0, 22.0), 0.3, T))
    assert(!Bench.cleanPass(40.0, 20.0, T))
    assert(Bench.cleanPass(11.25, 70.0, T))
    // unreadable CPU (no com.sun MX bean) never condemns a pass
    assert(Bench.cleanPass(11.25, -1.0, T))
  }

  test("hot ambient start buys exactly one insurance pass") {
    // loadavg 7.4 at start (the BENCH_r06 driver artifact): 2 agreeing
    // passes still get a third...
    assert(Bench.needMorePasses(Seq(24.0, 24.1), Seq(261.0, 204.0), 7.4, T))
    // ...but a third agreeing clean pass settles it (no unbounded loop)
    assert(!Bench.needMorePasses(Seq(24.0, 24.1, 23.9), Seq(261.0, 204.0, 200.0), 7.4, T))
  }

  test("idle gate: waits out a hot start, stamps degraded past deadline") {
    // r15: the committed artifact was ambient-4.3 while an idle run of
    // the same code sat in history — the snapshot must now be idle by
    // construction (wait) or say it isn't (stamp).
    // already idle: no wait, accepted
    assert(Bench.awaitIdle(1.5, 60, () => 0.4, sleepMs = 1) == (0.4, "accepted"))
    // hot start that cools: polls until under the gate, accepted
    val cooling = Iterator(4.3, 2.8, 1.2)
    assert(Bench.awaitIdle(1.5, 60, () => cooling.next(), sleepMs = 1)
      == (1.2, "accepted"))
    // persistently hot host: deadline expires, DEGRADED — never a
    // silent idle-looking number
    assert(Bench.awaitIdle(1.5, 0, () => 4.3, sleepMs = 1)._2 == "degraded")
    // unreadable loadavg: proceed immediately, stamped unknown
    assert(Bench.awaitIdle(1.5, 60, () => -1.0, sleepMs = 1)._2 == "unknown")
  }

  test("idle gate: never sleeps past the deadline (r16 ADVICE overshoot)") {
    // a 30 s poll interval with a 1 s deadline must return in ~1 s, not
    // 30: the per-iteration sleep is clamped to the remaining deadline
    val t0 = System.nanoTime()
    val (_, stamp) = Bench.awaitIdle(1.5, 1, () => 9.9, sleepMs = 30000)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(stamp == "degraded")
    assert(elapsed < 5.0, s"overshot the 1 s deadline: ${elapsed}s")
  }
}
