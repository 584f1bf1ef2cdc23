package graft

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Tag for the trimmed scale gate — minutes, not seconds. Exclude with
  * `testOnly * -- -l graft.Slow` when iterating.
  */
object Slow extends Tag("graft.Slow")

/** Trimmed, always-on edition of the empirical scale evidence
  * (SCALE.md / graft.ScaleBench): generates a deterministic ScaleGen
  * corpus at mult=1 (sf0.1-equivalent row counts — the structure,
  * including the 400-deep near-dup chain, is multiplier-independent)
  * and drives the scale harness end-to-end. The harness itself hard-
  * fails on any invariant break, so this spec IS the gate for:
  *
  *  - dd_components label-path agreement (propagation+doubling vs
  *    forced Kiveris star rounds) on a diameter-400 component;
  *  - tx_decontaminate gate-path agreement (measured broadcast vs
  *    forced two-sided shuffle);
  *  - ANN oracle-equality sweeps: IVF nprobe and PQ rerank walked up
  *    until top-3 equals brute force (must happen pre-exhaustion).
  *
  * The full 10× run is `runMain graft.ScaleGen /tmp/graft_sf1 10` +
  * `runMain graft.ScaleBench /tmp/graft_sf1 SCALE.md`.
  */
class ScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("scale harness end-to-end at mult=1: gen, heavy families, " +
    "path differentials, ANN sweeps", Slow) {
    val dir = "/tmp/graft_scale_spec"
    ScaleGen.generate(spark, dir, 1)
    val rows = ScaleBench.run(spark, dir, queries = Seq(
      "dd_exact", "dd_minhash_lsh", "dd_components",
      "tx_decontaminate", "pipe_compact", "mm_decode", "nn_ivf_topk"))
    // the differential/sweep evidence rows exist (their requires passed)
    for (name <- Seq("cc_paths_equal", "tx_decontaminate_shuffle",
        "ann_ivf_sweep", "ann_pq_sweep")) {
      assert(rows.exists(_.name == name), s"missing evidence row $name")
    }
    // sanity on the measured rows: everything ran and returned data
    val measured = rows.filter(r => r.rows >= 0 && r.wallSec > 0)
    assert(measured.nonEmpty)
    assert(rows.find(_.name == "dd_components").get.rows > 0)
    // restore the shared session's fixture registration for later suites
    graft.engine.Tables.register(spark, sf)
  }
}
