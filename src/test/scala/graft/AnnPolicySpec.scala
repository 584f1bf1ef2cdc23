package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SimilarityOps

/** The recall-targeted probe-width policy (r17 VERDICT wrong-#3):
  * share/floor/cap pins at the measured-tier list counts, so a policy
  * regression shows up as a failed constant, not a silently degraded
  * ladder recall.
  */
class AnnPolicySpec extends AnyFunSuite {

  test("policy at the measured tier list counts (anchored 10% share, " +
    "sub-anchor lift, floor 32)") {
    // 10× tier (141 lists): the floor carries the small tier (lifted
    // share alone = 22, measured 0.8854; the r17 default 12 measured
    // 0.76; floor 32 sits at ~0.93 on the measured frontier)
    assert(SimilarityOps.nprobeForRecall(141) == 32)
    // 100× tier (447): lifted share 15% (plain 10% = 45 measured
    // 0.8594 in the r18 ladder — under target; 68 sits between the
    // measured 45 → 0.8594 and 134 → 0.9844 frontier points)
    assert(SimilarityOps.nprobeForRecall(447) == 68)
    // 1000× tier (1414): the anchor — 10% share, measured 0.9062
    assert(SimilarityOps.nprobeForRecall(1414) == 142)
    // beyond the anchor the share never drops below the measured 10%
    assert(SimilarityOps.nprobeForRecall(4096) == 410)
    // fixture width: policy capped at nlists → exhaustive → exact (the
    // v4 contract; nn_ivf_lookup's declared width stays brute-equal)
    assert(SimilarityOps.nprobeForRecall(16) == 16)
  }

  test("higher targets widen: 30% base above 0.9, exhaustive above 0.98") {
    assert(SimilarityOps.nprobeForRecall(1414, 0.95) == 425)
    assert(SimilarityOps.nprobeForRecall(1414, 0.99) == 1414)
    assert(SimilarityOps.nprobeForRecall(447, 0.95) == 202)
  }

  test("monotone in nlists; never exceeds nlists; floor respected") {
    val widths = Seq(1, 8, 16, 64, 141, 447, 1414, 4096)
      .map(n => n -> SimilarityOps.nprobeForRecall(n))
    widths.foreach { case (n, np) =>
      assert(np <= n, s"nprobe $np exceeds nlists $n")
      assert(np == n || np >= 32, s"sub-floor width $np at nlists=$n")
    }
    widths.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(a <= b, "policy must be monotone in nlists")
    }
  }

  test("invalid arguments fail fast") {
    intercept[IllegalArgumentException] { SimilarityOps.nprobeForRecall(0) }
    intercept[IllegalArgumentException] { SimilarityOps.nprobeForRecall(16, 0.0) }
    intercept[IllegalArgumentException] { SimilarityOps.nprobeForRecall(16, 1.5) }
  }
}
