package graft

/** Global plan-hygiene gate over the ENTIRE registered surface: no
  * query may plan a CartesianProduct, ever. Every intentional
  * all-pairs-ish construct in the repo goes through
  * `crossJoin(broadcast(tiny))` — which plans as a
  * BroadcastNestedLoopJoin with a provably-small build side — or a
  * binned/banded equi-join. An unhinted cross join sneaking in (e.g. a
  * join condition accidentally reduced to a literal, the round-10
  * trivially-true-predicate class) would plan a CartesianProduct and
  * shuffle-materialize |A|×|B| at scale; this suite makes that a test
  * failure at fixture scale instead of a 100 TB incident.
  *
  * (Runs every query once at sf0.001 — also a smoke test that the whole
  * surface executes end to end inside one session.)
  */
class PlanAuditSpec extends SparkSpec {

  test("no registered query plans a CartesianProduct (entire surface executed)") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, Sf)
      df.collect() // finalize AQE so the audited plan is the executed one
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) offenders += name
    }
    assert(offenders.isEmpty,
      s"queries planning CartesianProduct: ${offenders.mkString(", ")}")
  }
}
