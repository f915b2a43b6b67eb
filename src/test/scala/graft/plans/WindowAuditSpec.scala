package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import graft.SparkSpec

/** Fleet-wide window audit: NO query in the registry may plan an
  * unpartitioned WindowExec. An empty partition spec funnels every input
  * row through ONE task — the 100 TB killer WindowExec itself warns about
  * ("No Partition Defined for Window operation"). Bounded-cardinality
  * global windows (bucket offsets, week series, vocab ids) are allowed
  * ONLY via the explicit non-foldable single-partition key
  * (pmod(col, 1)), which this audit sees as a non-empty spec — so a clean
  * driver bench log is an invariant this suite enforces, not a hope.
  *
  * Walks the pre-AQE physical plan of every registered query at sf0.001
  * (plan shapes don't change with scale factor, only with stats-driven
  * join picks, which don't affect window partitioning). */
class WindowAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def offendingWindows(plan: SparkPlan): Seq[String] =
    plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        s"WindowExec(${w.windowExpression.map(_.sql).mkString(", ")})"
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        s"WindowGroupLimitExec(limit=${w.limit})"
    }

  test("no registered query plans an unpartitioned window") {
    val bad = graft.queries.Registry.all.flatMap { q =>
      val plan = q.build(spark, sfDir).queryExecution.sparkPlan
      offendingWindows(plan).map(w => s"${q.name}: $w")
    }
    assert(bad.isEmpty,
      s"unpartitioned windows found (single-task funnels):\n${bad.mkString("\n")}")
  }
}
