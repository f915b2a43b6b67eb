package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GridCum's two-pass bucketed cumsum must equal a naive ordered prefix
  * sum — exactly, for any bucket width, grouped or global, including
  * negative grid values (truncating `div` is monotone, so buckets stay
  * contiguous). */
class GridCumSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[(String, Long, Long)]): Map[(String, Long), Long] =
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zipWithIndex.map { case ((_, v, _), i) =>
        (g, v) -> sorted.take(i + 1).map(_._3).sum
      }
    }

  private val rows = Seq(
    ("a", -9000L, 3L), ("a", -1L, 2L), ("a", 0L, 5L), ("a", 7L, 1L),
    ("a", 4095L, 4L), ("a", 4096L, 9L), ("a", 123456L, 7L),
    ("b", 5L, 11L), ("b", 6L, 13L))

  test("grouped cumsum matches naive prefix sum across bucket widths") {
    val df = rows.toDF("g", "v", "m")
    for (bw <- Seq(1L, 7L, 4096L, 1000000L)) {
      val got = GridCum.cum(df, Seq("g"), "v", Seq("m"), bw)
        .select("g", "v", "cum_m").as[(String, Long, Long)]
        .collect().map { case (g, v, c) => (g, v) -> c }.toMap
      assert(got == naive(rows), s"bucketWidth=$bw")
    }
  }

  test("global (ungrouped) cumsum over two count columns") {
    val df = Seq((1L, 2L, 10L), (5L, 3L, 20L), (4100L, 4L, 30L))
      .toDF("v", "n1", "n2")
    val got = GridCum.cum(df, Nil, "v", Seq("n1", "n2"))
      .select("v", "cum_n1", "cum_n2").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 10L), (5L, 5L, 30L), (4100L, 9L, 60L)))
  }
}
