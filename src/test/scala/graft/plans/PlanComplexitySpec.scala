package graft.plans

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

import graft.SparkSpec

/** Fleet-wide plan-SIZE audit (round-7 postmortem): `q_bradley_terry`
  * shipped with an iterative loop that referenced the previous round's
  * DataFrame multiple times without lineage truncation, so its logical
  * plan grew ~4^rounds and Catalyst analysis never finished — one query
  * emptied the round's correctness artifact, timed out the bench, and
  * hung every registry-walking suite. This audit catches that class AT
  * BUILD TIME: every registered query must (a) finish ANALYSIS inside a
  * hard wall-clock box and (b) produce an analyzed plan under a node
  * bound that no legitimate query here approaches (the largest measured
  * plan in the fleet is well under 1,000 nodes; an exponential loop blows
  * past 100,000 before it hangs).
  *
  * Iterative builders (PageRank, ConnectedComponents, the MM loop) stay
  * under the bound precisely because they `localCheckpoint` on cadence —
  * reverting that discipline anywhere fails this suite, not the driver.
  */
class PlanComplexitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val MaxNodes = 5000
  private val BuildBoxSec = 120L

  private def logicalNodeCount(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
    p.collect { case n => n }.size

  test("every registered query analyzes promptly and under the node bound") {
    // daemon pool: a query hung in analysis must fail THIS test with its
    // name, not hang the suite (the round-7 failure mode for sbt test)
    val pool = Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "plan-audit")
      t.setDaemon(true)
      t
    })
    val offenders = graft.queries.Registry.all.flatMap { q =>
      val fut = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = graft.queries.Cached.auditPlan(
          logicalNodeCount(q.build(spark, sfDir).queryExecution.analyzed))
      })
      try {
        val nodes = fut.get(BuildBoxSec, TimeUnit.SECONDS)
        if (nodes > MaxNodes)
          Some(s"${q.name}: analyzed plan has $nodes nodes (> $MaxNodes) — " +
            "likely an iterative loop missing localCheckpoint cadence")
        else None
      } catch {
        case _: TimeoutException =>
          fut.cancel(true)
          Some(s"${q.name}: analysis did not finish in ${BuildBoxSec}s — " +
            "exponential lineage (see round-7 q_bradley_terry postmortem)")
        case e: Throwable =>
          Some(s"${q.name}: build threw ${Option(e.getCause).getOrElse(e)}")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
