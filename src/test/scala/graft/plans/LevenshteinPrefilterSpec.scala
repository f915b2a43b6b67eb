package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LevenshteinPrefilter

/** The injected optimizer rule (GraftExtensions / extraOptimizations):
  * `levenshtein(a,b) <= k` filters gain the free length lower bound so the
  * O(len²) DP short-circuits on length-incompatible rows. Data is read
  * from parquet — a literal LocalRelation would be constant-folded and the
  * Filter would never survive to the optimized plan. */
class LevenshteinPrefilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val src: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lev").toString
    Seq(
      ("abc", "abcdefghij"), // length gap 7 — prunable without the DP
      ("abc", "abd"),        // dist 1
      ("hello", "hallo"),    // dist 1
      ("kitten", "sitting")) // dist 3
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    dir
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinPrefilter
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq LevenshteinPrefilter)
  }

  test("injects the length bound; result unchanged") {
    withRule {
      val df = spark.read.parquet(src)
        .filter(expr("levenshtein(a, b) <= 2"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("abs(") && opt.contains("length("),
        s"no length guard injected:\n$opt")
      assert(df.collect().map(_.getString(0)).length === 2)
    }
  }

  test("idempotent: hand-written guard is not duplicated") {
    withRule {
      val df = spark.read.parquet(src).filter(expr(
        "abs(length(a) - length(b)) <= 2 AND levenshtein(a, b) <= 2"))
      val opt = df.queryExecution.optimizedPlan.toString
      val guards = "abs\\(".r.findAllIn(opt).length
      assert(guards === 1, s"guard duplicated ($guards):\n$opt")
      assert(df.count() === 2)
    }
  }

  test("threshold form is NOT rewritten (its -1 sentinel breaks the bound)") {
    // levenshtein(a, b, k) returns -1 when the distance EXCEEDS k, so
    // `levenshtein(a, b, 2) <= 2` keeps all rows — adding the length bound
    // would wrongly drop the length-gap row. The rule must leave it alone.
    withRule {
      val df = spark.read.parquet(src)
        .filter(expr("levenshtein(a, b, 2) <= 2"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("abs("),
        s"threshold form should not be rewritten:\n$opt")
      assert(df.count() === 4)
    }
  }
}
