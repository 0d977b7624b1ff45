package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guard over the WHOLE registry: no query may
  * plan an unconditional CartesianProduct (the broadcast nested-loop
  * cross joins of the ANN family are intentional — tiny broadcast side
  * — and are allowed; a shuffled CartesianProduct of two large sides
  * is never the plan you want at corpus scale). */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("no registry query plans a CartesianProduct") {
    val offenders = Registry.all.flatMap { q =>
      val plan =
        try q.run(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
