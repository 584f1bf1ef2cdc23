package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Serving-session registry hygiene (VERDICT r8 items 1-2).
  *
  * Round 8 shipped a correctness regression: `f_json_introspect` called
  * `Functions.register` on the SHARED Verify session while a worker
  * thread was planning `f_math`, and the DataFrame-API `factorial`
  * (name-resolved in Spark 4) silently flipped from the BIGINT builtin
  * to the dialect's DECIMAL(38,0) HUGEINT carrier depending on thread
  * timing. The structural close: the dialect registry lives only on
  * ISOLATED child sessions, and serving sessions are FROZEN — a late
  * register throws instead of mutating resolution mid-run.
  */
class RegistryFreezeSpec extends AnyFunSuite {
  import TestSpark._

  test("late dialect registration on a frozen (serving) session is refused") {
    assert(graft.engine.Functions.isFrozen(spark))
    val e = intercept[Exception](graft.engine.Functions.register(spark))
    assert(e.getMessage.contains("frozen"))
  }

  test("builtin resolution on the frozen session is unchanged while " +
      "register runs concurrently on isolated sessions") {
    graft.engine.Tables.register(spark, sf)
    // hammer: threads building dialect sessions (register on children) +
    // threads attempting the forbidden shared-session register, while
    // the main thread plans DataFrame-API factorial queries repeatedly
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        while (!stop.get()) {
          if (i % 2 == 0) {
            // legitimate path: a fresh isolated session per iteration
            val iso = spark.newSession()
            graft.engine.Functions.register(iso)
            val t = iso.sql("SELECT factorial(5) AS f").schema.head.dataType
            if (!t.isInstanceOf[DecimalType]) failures.incrementAndGet()
          } else {
            // forbidden path: must throw, must not mutate
            try { graft.engine.Functions.register(spark); failures.incrementAndGet() }
            catch { case _: Exception => }
          }
        }
      })
    }
    threads.foreach(_.start())
    try {
      (1 to 20).foreach { _ =>
        val df = spark.table("nation")
          .select(factorial(col("n_nationkey") % 6).as("fact"))
        // builtin factorial is BIGINT; the dialect carrier would be
        // DECIMAL(38,0) — resolution must never flip on this session
        assert(df.schema.head.dataType == LongType)
        assert(df.limit(1).collect().nonEmpty)
      }
    } finally {
      stop.set(true)
      threads.foreach(_.join())
    }
    assert(failures.get() == 0)
  }

  test("isolated sessions carry the dialect without touching the parent") {
    val iso = graft.engine.Functions.isolated(spark, sf, "nation")
    // dialect semantics on the child: HUGEINT-domain factorial
    val big = iso.sql("SELECT factorial(25) AS f").collect()(0)
    assert(big.getDecimal(0).toBigInteger.toString ==
      "15511210043330985984000000")
    // parent unchanged: builtin BIGINT factorial overflows to error/NULL
    // territory above 20! — the TYPE is the resolution witness
    val t = spark.sql("SELECT factorial(5) AS f").schema.head.dataType
    assert(t == LongType)
  }

  test("register is idempotent per session (no repeated installs)") {
    val iso = spark.newSession()
    graft.engine.Functions.register(iso)
    graft.engine.Functions.register(iso) // no-op, no throw
    assert(iso.sql("SELECT list_contains(array(1,2), 2) AS c")
      .collect()(0).getBoolean(0))
  }
}
