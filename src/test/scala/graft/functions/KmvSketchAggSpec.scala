package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchFunctions

/** Native KMV aggregate (TypedImperativeAggregate): merge associativity
  * across partitionings, exact-mode fallback, and estimate quality. */
class KmvSketchAggSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pre-hash: the aggregate consumes already-scrambled longs
  private def hashed(n: Int, distinct: Int) =
    (0 until n).map { i =>
      val key = (i % distinct).toLong
      ((key * 69069 + 12345) % 4294967296L * 1664525 + 1013904223) % 4294967296L
    }

  test("identical estimate under 1, 4, and 32 partitions (merge path)") {
    val hs = hashed(20000, 5000)
    def est(parts: Int): Double =
      hs.toDF("h").repartition(parts)
        .agg(SketchFunctions.kmvDistinctEst(col("h"), 64)).head().getDouble(0)
    val e1 = est(1)
    assert(est(4) === e1)
    assert(est(32) === e1)
  }

  test("exact mode: fewer than k distinct hashes → estimate IS the count") {
    val hs = hashed(1000, 40) // 40 distinct < k=64
    val e = hs.toDF("h").repartition(7)
      .agg(SketchFunctions.kmvDistinctEst(col("h"), 64)).head().getDouble(0)
    assert(e === 40.0)
  }

  test("estimate tracks the true distinct count within KMV error bounds") {
    val distinct = 10000
    val e = hashed(30000, distinct).toDF("h").repartition(8)
      .agg(SketchFunctions.kmvDistinctEst(col("h"), 256)).head().getDouble(0)
    // KMV rsd ~ 1/sqrt(k-2) ≈ 6.3% at k=256; allow 4 sigma
    assert(math.abs(e - distinct) / distinct < 0.25, s"estimate $e")
  }

  test("nulls are skipped, not counted") {
    val df = (hashed(100, 10).map(java.lang.Long.valueOf) ++
      Seq.fill(50)(null.asInstanceOf[java.lang.Long])).toDF("h")
    val e = df.agg(SketchFunctions.kmvDistinctEst(col("h"), 64))
      .head().getDouble(0)
    assert(e === 10.0)
  }

  test("rollup: merged per-part partials == direct sketch of the union " +
      "(bit-exact), estimate tracks truth") {
    val a = hashed(8000, 3000)
    val b = hashed(9000, 2500).map(h => (h * 48271) % 4294967296L)
    val k = 128
    // direct estimate over the union
    val direct = (a ++ b).toDF("h").repartition(8)
      .agg(SketchFunctions.kmvDistinctEst(col("h"), k)).head().getDouble(0)
    // rollup: one stored partial per part, merged at query time
    val partials = Seq((0, a), (1, b)).flatMap { case (p, hs) => hs.map((p, _)) }
      .toDF("part", "h").repartition(8)
      .groupBy("part")
      .agg(SketchFunctions.kmvSketchPartial(col("h"), k).as("sk"))
    val merged = partials.agg(SketchFunctions.kmvMergeEst(col("sk"), k))
      .head().getDouble(0)
    assert(merged === direct)
  }

  test("merge rejects partials built with a smaller k (header check)") {
    val hs = hashed(5000, 2000)
    // partial trimmed to k=32 has discarded hashes a k=128 merge needs
    val partials = hs.toDF("h")
      .agg(SketchFunctions.kmvSketchPartial(col("h"), 32).as("sk"))
    val ex = intercept[Exception] {
      partials.agg(SketchFunctions.kmvMergeEst(col("sk"), 128)).head()
    }
    assert(ex.getMessage != null)
    // the compatible direction (k' >= merge k) still works and is exact
    val ok = hs.toDF("h")
      .agg(SketchFunctions.kmvSketchPartial(col("h"), 128).as("sk"))
      .agg(SketchFunctions.kmvMergeEst(col("sk"), 32)).head().getDouble(0)
    val direct = hs.toDF("h")
      .agg(SketchFunctions.kmvDistinctEst(col("h"), 32)).head().getDouble(0)
    assert(ok === direct)
  }

  test("grouped: each group gets its own buffer") {
    val rows = (0 until 4).flatMap { g =>
      hashed(500, 100 * (g + 1)).map(h => (g, h))
    }
    val got = rows.toDF("g", "h").repartition(8).groupBy("g")
      .agg(SketchFunctions.kmvDistinctEst(col("h"), 64).as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (0 until 4).foreach { g =>
      val d = 100.0 * (g + 1)
      assert(math.abs(got(g) - d) / d < 0.5, s"g=$g got ${got(g)} want ~$d")
    }
  }
}
