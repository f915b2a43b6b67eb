package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsOfJoinExec, AsOfJoinNative}

/** Native as-of join (tier (c): LogicalPlan + SparkStrategy + SparkPlan):
  * differential equivalence against the tier-(a) window composition on
  * dense random-ish data, null/absent-match padding, tie semantics, and
  * the physical shape (AsOfJoinExec + one exchange per side, no union). */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  // deterministic LCG fixture: ~40 users, interleaved clicks/purchases
  private def fixture = {
    val rows = (0 until 4000).map { i =>
      val h = (i.toLong * 1103515245 + 12345) % 4294967296L
      val user = (h % 40).toInt
      val ts = ((h / 40) % 100000).toInt
      val isLeft = (h / 7) % 3 == 0
      (user, ts, i.toLong, (h % 1000) / 10.0, isLeft)
    }
    val df = rows.toDF("user_id", "ts", "id", "value", "is_left")
    (df.filter($"is_left").select($"user_id", $"ts", $"id"),
      df.filter(!$"is_left").select($"user_id", $"ts".as("rts"),
        $"id".as("rid"), $"value".as("rvalue")))
  }

  test("row-identical to the window composition (incl. no-match nulls " +
      "and equal-ts ties)") {
    val (l, r) = fixture
    val native = AsOfJoinNative.asOf(
        l, r, "user_id", "ts", "rts", "rid")
      .select($"user_id", $"ts", $"id", $"rid".as("asof_rid"),
        $"rvalue".as("asof_rvalue"))
    val composed = graft.operators.AsOfJoin.asOf(
        l, r.withColumnRenamed("rts", "cts"), "user_id", "ts", "cts",
        Seq("rid", "rvalue"), "rid")
      .select($"user_id", $"ts", $"id", $"asof_rid", $"asof_rvalue")
    assert(native.count() === l.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("equal timestamps: the right row at exactly leftTs qualifies, " +
      "largest tiebreak wins") {
    val l = Seq((1, 100L, 900L)).toDF("user_id", "ts", "id")
    val r = Seq((1, 100L, 1L, 10.0), (1, 100L, 7L, 20.0), (1, 99L, 3L, 5.0))
      .toDF("user_id", "rts", "rid", "rvalue")
    val out = AsOfJoinNative.asOf(l, r, "user_id", "ts", "rts", "rid")
      .select("id", "rid", "rvalue").as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((900L, 7L, 20.0)))
  }

  test("key with no qualifying right rows pads nulls") {
    val l = Seq((1, 100L, 900L), (2, 50L, 901L)).toDF("user_id", "ts", "id")
    val r = Seq((1, 90L, 5L, 1.0), (2, 60L, 6L, 2.0))
      .toDF("user_id", "rts", "rid", "rvalue")
    val out = AsOfJoinNative.asOf(l, r, "user_id", "ts", "rts", "rid")
      .select($"id", $"rid").collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).sorted
    assert(out.toSeq === Seq((900L, 5L), (901L, -1L)))
  }

  test("physical plan: AsOfJoinExec with co-clustered sorted children, " +
      "no Union/Window/nested-loop") {
    val (l, r) = fixture
    val df = AsOfJoinNative.asOf(l, r, "user_id", "ts", "rts", "rid")
    df.collect() // materialize so AQE finalizes the plan
    // AQE's toString echoes the initial plan too — assert on the final
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window") && !plan.contains("Union") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // one exchange per side, none after the merge (AQE's final string)
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
    assert(" Sort \\[".r.findAllIn(plan).size >= 2, plan)
  }
}
