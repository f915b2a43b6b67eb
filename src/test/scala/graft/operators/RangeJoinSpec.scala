package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val values = Seq((1L, 5.0), (2L, 49.9), (3L, 50.0), (4L, 150.0), (5L, -3.0))
    .toDF("id", "value")
  private val ranges = Seq(("low", 0.0, 49.9), ("mid", 50.0, 99.9), ("wide", 0.0, 200.0))
    .toDF("band", "lo", "hi")

  test("banded range join matches the naive theta join exactly") {
    val naive = values.join(ranges,
        col("value") >= col("lo") && col("value") <= col("hi"))
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (w <- Seq(10.0, 50.0, 173.0)) { // result independent of bucket width
      val banded = RangeJoin.banded(values, ranges, "value", "lo", "hi", w)
        .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(banded === naive, s"width $w")
    }
    assert(naive === Set((1L, "low"), (1L, "wide"), (2L, "low"), (2L, "wide"),
      (3L, "mid"), (3L, "wide"), (4L, "wide")))
  }

  test("boundary inclusivity and negative values") {
    val out = RangeJoin.banded(values, ranges, "value", "lo", "hi", 25.0)
    assert(out.filter(col("id") === 3 && col("band") === "mid").count() === 1) // lo inclusive
    assert(out.filter(col("id") === 2 && col("band") === "low").count() === 1) // hi inclusive
    assert(out.filter(col("id") === 5).count() === 0) // below every band
  }
}
