package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoinNative

/** The deployment story: a session built with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` (here
  * via withExtensions on a fresh session over the shared context) gets the
  * whole graft extension surface — SQL-registered native expressions, the
  * Levenshtein prefilter optimizer rule, and the as-of planner strategy —
  * with no imperative registration calls. */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtensionsSession[T](f: SparkSession => T): T = {
    val base = spark // force TestSpark init so a context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("vec_dot is a SQL function in an extensions-built session") {
    withExtensionsSession { s =>
      val got = s.sql(
        "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(got === 11.0)
    }
  }

  test("jaro_winkler is a SQL function in an extensions-built session") {
    withExtensionsSession { s =>
      val got = s.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw")
        .head().getDouble(0)
      assert(math.abs(got - 0.9611111111) < 1e-9)
    }
  }

  test("Levenshtein prefilter rule fires from the extensions path") {
    withExtensionsSession { s =>
      // non-foldable columns (literals would constant-fold the filter away)
      val df = s.range(5)
        .selectExpr("cast(id AS string) AS a",
          "concat(cast(id AS string), 'abcdefg') AS b")
        .filter(expr("levenshtein(a, b) <= 2"))
      val optimized = df.queryExecution.optimizedPlan.toString
      // the rule prepends the implied length-difference bound
      assert(optimized.contains("length"), optimized)
      assert(df.count() === 0) // |len diff| = 7 > 2: pruned AND correct
    }
  }

  test("as-of strategy plans from the extensions path alone (no " +
      "experimental self-registration needed)") {
    withExtensionsSession { s =>
      import s.implicits._
      val l = Seq((1, 100L, 9L)).toDF("k", "ts", "id")
      val r = Seq((1, 90L, 5L, 1.5)).toDF("k", "rts", "rid", "rv")
      val before = s.experimental.extraStrategies
      // selfRegister = false: ONLY the extensions-injected strategy can
      // plan the node — this is the spark.sql.extensions deployment path
      val out = AsOfJoinNative.asOf(l, r, "k", "ts", "rts", "rid",
          selfRegister = false)
        .select($"id", $"rid", $"rv").as[(Long, Long, Double)].collect()
      assert(out.toSeq === Seq((9L, 5L, 1.5)))
      assert(s.experimental.extraStrategies === before) // session unmutated
    }
  }
}
