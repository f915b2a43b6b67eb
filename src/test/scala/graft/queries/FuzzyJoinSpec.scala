package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Blocked Levenshtein similarity join (q_fuzzy_neardup_join): the prune
  * layers must be LOSSLESS — a pair dropped by the length bound or by
  * blocking must truly be out of reach of the reported guarantee. */
class FuzzyJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("length difference never exceeds edit distance (prune soundness)") {
    // |len(a) - len(b)| <= levenshtein(a, b): the filter that runs before
    // the O(len^2) DP can only discard pairs the distance threshold would
    // discard anyway. Checked on 500 seeded random token-string pairs,
    // evaluated in ONE Spark job (not 500 driver round-trips).
    val rnd = new scala.util.Random(42)
    def randStr() = {
      val len = rnd.nextInt(30)
      (0 until len).map(_ => if (rnd.nextInt(5) == 0) ' '
        else ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val pairs = Seq.fill(500)((randStr(), randStr()))
    import spark.implicits._
    val bad = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b")).as("d"),
        abs(length(col("a")) - length(col("b"))).as("lb"))
      .filter(col("lb") > col("d")).count()
    assert(bad === 0, s"$bad pairs violated the length lower bound")
  }

  test("reported pairs respect the distance cap and dedup-first contract") {
    val rows = SparkEntry.queries("q_fuzzy_neardup_join")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "expected near-dup pairs in the synthetic corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("dist") <= 20)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"),
        "pair order contract (doc_a < doc_b)")
      assert(r.getAs[Long]("n_a") >= 1 && r.getAs[Long]("n_b") >= 1)
    }
  }

  test("exact-dedup-first: representatives are distinct-content min ids") {
    // every reported id must be the MIN doc_id of its text group — proving
    // candidate formation ran over collapsed content, not raw rows
    val docs = graft.Tables.documents(spark, sfDir)
    val reps = docs.groupBy("text").agg(min("doc_id").as("rep"))
      .select("rep").collect().map(_.getLong(0)).toSet
    val reported = SparkEntry.queries("q_fuzzy_neardup_join")(spark, sfDir)
      .select(col("doc_a")).union(
        SparkEntry.queries("q_fuzzy_neardup_join")(spark, sfDir)
          .select(col("doc_b")))
      .collect().map(_.getLong(0)).toSet
    assert(reported.subsetOf(reps))
  }
}
