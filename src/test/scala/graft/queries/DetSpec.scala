package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Det.dround must implement round-half-away-from-zero on the BINARY double
  * (DuckDB semantics), not Spark round's decimal-repr HALF_UP — the two
  * disagree on repr-boundary values like 0.64055 (binary ≈ 0.6405499…). */
class DetSpec extends SparkSpec {
  import spark.implicits._

  private def d4(xs: Double*): Seq[Double] =
    xs.map(Tuple1(_)).toDF("x").select(Det.dround(col("x"), 4).as("r"))
      .as[Double].collect().toSeq

  test("repr-boundary value rounds by its binary value (0.64055 → 0.6405)") {
    assert(d4(0.64055) == Seq(0.6405)) // Spark round() would give 0.6406
  }

  test("ordinary values, negatives, and exact halves") {
    assert(d4(1.23456, 1.23454, -1.23456, 2.0, 0.0) ==
      Seq(1.2346, 1.2345, -1.2346, 2.0, 0.0))
    // 0.00015·1e4 lands at 1.4999999999999998 in binary → rounds DOWN; what
    // matters is that DuckDB computes the identical product and agrees.
    assert(d4(0.00015) == Seq(0.0001))
  }

  test("dround is idempotent at the same precision") {
    val xs = Seq(0.64055, 1.23456, -9.87654, 123.4567)
    assert(d4(d4(xs: _*): _*) == d4(xs: _*))
  }

  test("oround emits the same arithmetic textually") {
    assert(Det.oround("x", 4).contains("floor((x) * 1e4 + 0.5)"))
    assert(Det.oround("x", 4).contains("ceil((x) * 1e4 - 0.5)"))
  }
}
