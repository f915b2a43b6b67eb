package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoinNative

/** Property sweep for the native as-of join: across seeded corpus shapes
  * (key cardinality, left/right balance, duplicate-timestamp density,
  * keys missing from either side), the exec must be row-identical to the
  * tier-(a) window composition. Hand-rolled seeds (deterministic LCG)
  * rather than scalacheck's runner so failures name their seed. */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Long, n: Int, nKeys: Int,
      tsRange: Int): (DataFrame, DataFrame) = {
    var x = seed
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x >>> 16 }
    val rows = (0 until n).map { i =>
      val key = (next() % nKeys).toInt
      // coarse ts grid → dense duplicate timestamps at small tsRange
      val ts = (next() % tsRange).toInt
      val side = next() % 3 == 0
      (key, ts, i.toLong, (next() % 1000) / 8.0, side)
    }
    val df = rows.toDF("k", "ts", "id", "v", "is_left")
    (df.filter($"is_left").select($"k", $"ts", $"id"),
      df.filter(!$"is_left").select($"k", $"ts".as("rts"),
        $"id".as("rid"), $"v".as("rv")))
  }

  private def diffCount(l: DataFrame, r: DataFrame): Long = {
    val native = AsOfJoinNative.asOf(l, r, "k", "ts", "rts", "rid")
      .select($"k", $"ts", $"id", $"rid", $"rv")
    val composed = graft.operators.AsOfJoin.asOf(
        l, r.withColumnRenamed("rts", "cts"), "k", "ts", "cts",
        Seq("rid", "rv"), "rid")
      .select($"k", $"ts", $"id",
        $"asof_rid".as("rid"), $"asof_rv".as("rv"))
    native.exceptAll(composed).count() + composed.exceptAll(native).count()
  }

  test("native ≡ composition across corpus shapes (seeded sweep)") {
    val shapes = Seq(
      // (seed, rows, keys, tsRange) — dense ties, skewed keys, sparse keys
      (1L, 2000, 5, 50), // hot keys, heavy equal-ts ties
      (2L, 2000, 500, 1000000), // near-unique keys, sparse matches
      (3L, 3000, 37, 300), // mid shape
      (4L, 500, 1, 20), // single key, everything collides
      (5L, 1000, 999, 10)) // more keys than rows, dense ts grid
    shapes.foreach { case (seed, n, k, tsr) =>
      val (l, r) = corpus(seed, n, k, tsr)
      assert(diffCount(l, r) === 0, s"shape seed=$seed n=$n keys=$k tsRange=$tsr")
    }
  }

  test("one-sided corpora: empty right pads all nulls; empty left is empty") {
    val (l, r) = corpus(7L, 400, 11, 100)
    val emptyR = r.filter(lit(false))
    val allNull = AsOfJoinNative.asOf(l, emptyR, "k", "ts", "rts", "rid")
    assert(allNull.count() === l.count())
    assert(allNull.filter($"rid".isNotNull).count() === 0)
    val emptyL = l.filter(lit(false))
    assert(AsOfJoinNative.asOf(emptyL, r, "k", "ts", "rts", "rid").count() === 0)
  }

  test("partitioning invariance: 1, 3, and 16 input partitions agree") {
    val (l, r) = corpus(11L, 1500, 23, 400)
    val base = AsOfJoinNative.asOf(l, r, "k", "ts", "rts", "rid")
      .select($"id", $"rid").collect().map(x =>
        (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).sorted.toSeq
    for (p <- Seq(1, 3, 16)) {
      val got = AsOfJoinNative.asOf(l.repartition(p), r.repartition(p),
          "k", "ts", "rts", "rid")
        .select($"id", $"rid").collect().map(x =>
          (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).sorted.toSeq
      assert(got === base, s"parts=$p")
    }
  }
}
