package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.JaroWinklerPrefilter

/** The injected optimizer rule: `jaro_winkler(a,b) >= t` filters gain the
  * free length-ratio bound min ≥ (5t−4)·max so length-incompatible pairs
  * never run the match kernel. Parquet-backed (a LocalRelation would
  * constant-fold the Filter away). */
class JaroWinklerPrefilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val src: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-jw").toString
    Seq(
      ("ab", "abcdefghijklmnop"), // ratio 2/16 = 0.125 — prunable at t=0.9
      ("MARTHA", "MARHTA"),       // jw 0.9611 — survives t=0.9
      ("DWAYNE", "DUANE"),        // jw 0.84 — fails t=0.9 but passes bound
      ("hello", "hallo"))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    dir
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JaroWinklerPrefilter
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq JaroWinklerPrefilter)
  }

  private def jwFilter(t: Double) = spark.read.parquet(src).filter(
    graft.functions.TextSimilarity.jaroWinkler(col("a"), col("b")) >= lit(t))

  test("injects the length-ratio bound; result unchanged") {
    withRule {
      val df = jwFilter(0.9)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("least(") && opt.contains("length("),
        s"no length-ratio guard injected:\n$opt")
      assert(df.collect().map(_.getString(0)).toSeq == Seq("MARTHA"))
    }
  }

  test("vacuous threshold (t <= 0.8) is left alone") {
    withRule {
      val df = jwFilter(0.5)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("least("), s"vacuous bound injected:\n$opt")
    }
  }

  test("idempotent under a second pass") {
    withRule {
      val once = JaroWinklerPrefilter(jwFilter(0.9).queryExecution.analyzed)
      val twice = JaroWinklerPrefilter(once)
      assert(once.canonicalized == twice.canonicalized)
    }
  }
}
