package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HistQuantiles must agree with Spark's exact `percentile` aggregate
  * (quantile_cont semantics) on every probe, under any partitioning. */
class HistQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val probes = Seq(0.1, 0.25, 0.5, 0.9, 0.99)

  private def reference(vals: Seq[Long], q: Double): Double = {
    val sorted = vals.sorted
    val pos = q * (sorted.size - 1)
    val k = math.floor(pos).toInt
    val frac = pos - k
    if (k + 1 >= sorted.size) sorted(k).toDouble
    else sorted(k) + frac * (sorted(k + 1) - sorted(k))
  }

  test("matches quantile_cont on an LCG value grid, any partitioning") {
    val vals = (1 to 5000).map(i => ((i * 69069L + 12345L) % 100000L))
    for (parts <- Seq(1, 7, 32)) {
      val df = vals.toDF("v").repartition(parts)
      val got = HistQuantiles.quantiles(df, col("v"), probes)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      probes.foreach { q =>
        assert(math.abs(got(q) - reference(vals, q)) < 1e-9,
          s"q=$q parts=$parts: ${got(q)} vs ${reference(vals, q)}")
      }
    }
  }

  test("duplicate-heavy and tiny inputs (order stats straddling bins)") {
    val vals = Seq.fill(100)(7L) ++ Seq.fill(50)(9L) ++ Seq(1L, 2L, 3L)
    val df = vals.toDF("v").repartition(5)
    val got = HistQuantiles.quantiles(df, col("v"), probes)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    probes.foreach { q =>
      assert(math.abs(got(q) - reference(vals, q)) < 1e-9, s"q=$q: ${got(q)}")
    }
    // single-value frame: every quantile is that value
    val one = HistQuantiles.quantiles(Seq(42L).toDF("v"), col("v"), Seq(0.5))
      .collect()
    assert(one.head.getDouble(1) === 42.0)
  }

  test("descale maps the grid back (cents → dollars)") {
    val df = Seq(100L, 200L, 300L).toDF("v")
    val got = HistQuantiles.quantiles(df, col("v"), Seq(0.5), _ / 100.0)
      .collect().head.getDouble(1)
    assert(got === 2.0)
  }

  test("groupedQuantiles (multi-probe) matches the per-group reference on " +
      "every (group, probe), incl. negatives straddling bucket 0") {
    // negative grid values exercise the trunc-div bucket key: bkt(v) must
    // stay monotone in v so (bkt, v) order == v order
    val rows = (0 until 2000).map { i =>
      val h = (i.toLong * 69069 + 12345) % 4294967296L
      (s"g${h % 3}", (h / 3) % 60000L - 30000L)
    } ++ Seq(("solo", -42L))
    val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (parts <- Seq(1, 8, 32)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = HistQuantiles.groupedQuantiles(df, "g", col("v"), probes)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      byGroup.foreach { case (g, vs) =>
        probes.foreach { q =>
          assert(math.abs(got((g, q)) - reference(vs, q)) < 1e-9,
            s"group $g q=$q parts $parts: ${got((g, q))} vs ${reference(vs, q)}")
        }
      }
    }
  }

  test("groupedQuantile matches the per-group reference, incl. " +
      "single-row groups and nulls, any partitioning") {
    val rows = (0 until 3000).map { i =>
      val h = (i.toLong * 69069 + 12345) % 4294967296L
      val g = s"g${h % 7}"
      (g, (h / 7) % 5000L)
    } ++ Seq(("solo", 42L))
    val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (parts <- Seq(1, 8, 32)) {
      val df = rows.toDF("g", "v").repartition(parts)
        .unionByName(Seq(("g0", null.asInstanceOf[java.lang.Long]))
          .toDF("g", "v")) // null grid values are excluded, not ranked
      val got = HistQuantiles.groupedQuantile(df, "g", col("v"), 0.25)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      byGroup.foreach { case (g, vs) =>
        assert(math.abs(got(g) - reference(vs, 0.25)) < 1e-9,
          s"group $g parts $parts: ${got(g)} vs ${reference(vs, 0.25)}")
      }
    }
  }
}
