package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SimilarityOps

/** The recall-targeted probe-width policy (r17 VERDICT wrong-#3):
  * share/floor/cap pins at the measured-tier list counts, so a policy
  * regression shows up as a failed constant, not a silently degraded
  * ladder recall.
  */
class AnnPolicySpec extends AnyFunSuite {

  test("policy at the measured tier list counts (target 0.9 = 10% share, floor 24)") {
    // 10× tier (141 lists): floor lifts the small tier — 8.5% share
    // measured only 0.76 there
    assert(SimilarityOps.nprobeForRecall(141) == 24)
    // 100× tier (447): 10% share (the r17 default, 14, measured 0.578)
    assert(SimilarityOps.nprobeForRecall(447) == 45)
    // 1000× tier (1414): 10% share — the point measured at 0.9115
    assert(SimilarityOps.nprobeForRecall(1414) == 142)
    // fixture width: policy capped at nlists → exhaustive → exact (the
    // v4 contract; nn_ivf_lookup's declared width stays brute-equal)
    assert(SimilarityOps.nprobeForRecall(16) == 16)
  }

  test("higher targets widen: 30% share above 0.9, exhaustive above 0.98") {
    assert(SimilarityOps.nprobeForRecall(1414, 0.95) == 425)
    assert(SimilarityOps.nprobeForRecall(1414, 0.99) == 1414)
    assert(SimilarityOps.nprobeForRecall(447, 0.95) == 135)
  }

  test("monotone in nlists; never exceeds nlists; floor respected") {
    val widths = Seq(1, 8, 16, 64, 141, 447, 1414, 4096)
      .map(n => n -> SimilarityOps.nprobeForRecall(n))
    widths.foreach { case (n, np) =>
      assert(np <= n, s"nprobe $np exceeds nlists $n")
      assert(np == n || np >= 24, s"sub-floor width $np at nlists=$n")
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
