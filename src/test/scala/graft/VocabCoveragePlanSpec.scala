package graft

import graft.plans.PlanLint

/** VERDICT r6 item 1's done-criterion: tx49_vocab_coverage — whose rank +
  * running-sum now ride Blocked.cumulative's two-level blocked form —
  * must plan ZERO unpartitioned WindowExec nodes. The vocabulary frame
  * grows with the corpus (Heaps' law), so this is the invariant that
  * keeps the operator alive at 100 TB.
  */
class VocabCoveragePlanSpec extends SparkSpecBase {
  test("tx49's physical plan carries no unpartitioned WindowExec") {
    val df = SparkEntry.queries("tx49_vocab_coverage")(spark, sf0001)
    val gw = PlanLint.globalWindows(df)
    assert(gw.isEmpty, s"unexpected global windows: $gw")
    assert(df.count() > 0)
  }
}
