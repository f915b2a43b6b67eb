package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BloomBits, BloomFunctions}

/** Native Bloom filter pair (BloomFilterAgg + BloomMightContain): the
  * no-false-negative contract, the designed FP rate, bitwise-OR merge
  * associativity across partitionings, and the self-describing header. */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val NumBits = 1 << 17 // 16 KiB — m/n ≈ 13 at n=10k
  private val NumHashes = 5

  // deterministic scrambled longs, disjoint ranges for member/non-member
  private def hashed(from: Int, n: Int): Seq[Long] =
    (from until from + n).map { i =>
      var x = i.toLong * 0x9E3779B97F4A7C15L + 0x1234567L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x ^ (x >>> 27)
    }

  private def build(hs: Seq[Long], parts: Int): Array[Byte] =
    hs.toDF("h").repartition(parts)
      .agg(BloomFunctions.bloomBuild(col("h"), NumBits, NumHashes).as("f"))
      .head().getAs[Array[Byte]]("f")

  test("no false negatives, ever: every inserted key probes positive") {
    val members = hashed(0, 10000)
    val f = build(members, 8)
    val misses = members.toDF("h")
      .filter(!BloomFunctions.bloomMightContain(lit(f), col("h")))
      .count()
    assert(misses === 0)
  }

  test("false-positive rate on disjoint keys is within the designed bound") {
    val f = build(hashed(0, 10000), 4)
    val probes = 20000
    val fps = hashed(1000000, probes).toDF("h")
      .filter(BloomFunctions.bloomMightContain(lit(f), col("h")))
      .count()
    // theoretical FP ≈ (1 - e^(-jn/m))^j ≈ 3e-4 at m/n=13, j=5; allow 10×
    assert(fps.toDouble / probes < 0.003, s"$fps false positives / $probes")
  }

  test("merge is bitwise OR: filter(A ∪ B) == filter(A) | filter(B), and " +
      "partitioning never changes the bits") {
    val a = hashed(0, 3000)
    val b = hashed(50000, 3000)
    val whole1 = build(a ++ b, 1)
    val whole32 = build(a ++ b, 32)
    assert(whole1.sameElements(whole32))
    val fa = build(a, 4)
    val fb = build(b, 4)
    val ored = fa.clone()
    var i = 8 // skip the [numBits][numHashes] header
    while (i < ored.length) { ored(i) = (ored(i) | fb(i)).toByte; i += 1 }
    assert(ored.sameElements(whole1))
  }

  test("serialized filter is self-describing: header carries m and j") {
    val f = build(hashed(0, 10), 2)
    assert(BloomBits.readIntLE(f, 0) === NumBits)
    assert(BloomBits.readIntLE(f, 4) === NumHashes)
    assert(f.length === 8 + NumBits / 8)
  }

  test("null inputs are skipped, not inserted") {
    val df = (hashed(0, 100).map(java.lang.Long.valueOf) ++
      Seq.fill(50)(null.asInstanceOf[java.lang.Long])).toDF("h")
    val withNulls = df.agg(
      BloomFunctions.bloomBuild(col("h"), NumBits, NumHashes).as("f"))
      .head().getAs[Array[Byte]]("f")
    assert(withNulls.sameElements(build(hashed(0, 100), 1)))
  }

  test("mistyped probe column fails at analysis, not execution") {
    val err = intercept[Exception] {
      Seq("x").toDF("s")
        .agg(BloomFunctions.bloomBuild(col("s"), NumBits, NumHashes))
        .head()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("grouped: each group builds its own independent filter") {
    val rows = (0 until 4).flatMap { g =>
      hashed(g * 100000, 500).map(h => (g, h))
    }
    val filters = rows.toDF("g", "h").repartition(8).groupBy("g")
      .agg(BloomFunctions.bloomBuild(col("h"), NumBits, NumHashes).as("f"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("f")).toMap
    (0 until 4).foreach { g =>
      val own = hashed(g * 100000, 500)
      assert(own.forall(h => BloomBits.mightContain(filters(g), h)),
        s"group $g misses own keys")
      // keys of OTHER groups mostly probe negative (FP-rate bounded)
      val other = hashed(((g + 1) % 4) * 100000, 500)
      val fps = other.count(h => BloomBits.mightContain(filters(g), h))
      assert(fps < 25, s"group $g: $fps cross-group positives")
    }
  }

  test("interpreted eval agrees with codegen (BloomBits is the single " +
      "probe-schedule source)") {
    val f = build(hashed(0, 1000), 2)
    val hs = hashed(0, 1000) ++ hashed(999000, 1000)
    val viaExpr = hs.toDF("h")
      .withColumn("m", BloomFunctions.bloomMightContain(lit(f), col("h")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    hs.foreach { h =>
      assert(viaExpr(h) === BloomBits.mightContain(f, h))
    }
  }
}
