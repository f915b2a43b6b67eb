package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native Jaro-Winkler expression: value parity with the
  * DuckDB-pinned reference pairs, interpreted/codegen agreement, and the
  * classic edge cases. Cross-engine parity on real data is certified by
  * the q_entity_resolution_jw oracle gate. */
class JaroWinklerSpec extends SparkSpec {
  import org.apache.spark.sql.graft.JaroWinklerAlgo.jaroWinkler

  private def jw(a: String, b: String): Double =
    jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("reference pairs match DuckDB jaro_winkler_similarity to 1e-10") {
    val expected = Seq(
      ("MARTHA", "MARHTA", 0.9611111111),
      ("DIXON", "DICKSONX", 0.8133333333),
      ("JELLYFISH", "SMELLYFISH", 0.8962962963),
      ("DWAYNE", "DUANE", 0.8400000000),
      ("CRATE", "TRACE", 0.7333333333),
      ("aaaaaaaaaab", "aaaaaaaaaac", 0.9636363636),
      ("abcdefgh", "abcdzzzz", 0.6666666667), // jaro ≤ 0.7 → NO boost
      ("aVeryLongStringWith", "aVeryLongStringXYZW", 0.9368421053)) // prefix cap 4
    expected.foreach { case (a, b, e) =>
      assert(math.abs(jw(a, b) - e) < 1e-9, s"$a ~ $b")
    }
  }

  test("edges: empties are 0, identity is 1, window-0 disjoint order is 0") {
    assert(jw("", "") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "a") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window floor(2/2)-1 = 0: no cross matches
  }

  test("codegen eval agrees with the direct kernel (bit-equal)") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", "x"))
      .toDF("a", "b")
    val viaColumn = df.select(
      graft.functions.TextSimilarity.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    val direct = df.collect().map { r =>
      jw(r.getString(0), r.getString(1))
    }.toSeq
    assert(viaColumn == direct)
    // SQL-registration parity (jaro_winkler via GraftExtensions) is
    // asserted in GraftExtensionsSpec, which builds an extensions session.
  }

  test("null inputs null out (BinaryExpression null-intolerance)") {
    import spark.implicits._
    val df = Seq((Some("abc"), None: Option[String])).toDF("a", "b")
    val out = df.select(
      graft.functions.TextSimilarity.jaroWinkler(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }
}
