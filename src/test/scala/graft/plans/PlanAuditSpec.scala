package graft.plans

import graft.SparkSpec
import graft.tools.PlanAudit

/** The whole-surface plan audit as a GATE, not just a dev tool: every
  * `sbt test` constructs all registered queries at sf0.001 and fails if
  * any executed plan picks up a scale anti-pattern (SortAggregate /
  * CartesianProduct / BroadcastNestedLoopJoin) that is not on the
  * annotated known-benign list in [[graft.tools.PlanAudit]]. PlanSpec
  * locks the load-bearing shapes individually; this catches the NEXT
  * query someone adds without a lock — including a construction failure,
  * which flags rather than silently passing. */
class PlanAuditSpec extends SparkSpec {

  test("whole-surface sweep: zero unexplained scale anti-patterns") {
    val flags = PlanAudit.sweep(spark, "/root/testdata/sf0.001",
      known => info(s"ok(known) $known"))
    assert(flags.isEmpty,
      s"plan audit flagged:\n  ${flags.mkString("\n  ")}")
  }
}
