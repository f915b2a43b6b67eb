package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Invariant checks for the round-4 corpus-quality operators
  * (q_quality_filter_rules, q_unigram_logprob) beyond the oracle hash:
  * rule counts are bounded by doc counts, the conjunction is bounded by
  * every conjunct, and the cross-entropy stats are internally consistent. */
class QualityOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def byName(r: Row, c: String): Long =
    r.getLong(r.fieldIndex(c))

  test("quality filter rule counts are bounded and consistent") {
    val rows = Registry.all.find(_.name == "q_quality_filter_rules").get
      .build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ruleCols = Seq("n_p_len", "n_p_wordlen", "n_p_stop", "n_p_rep", "n_p_short")
    rows.foreach { r =>
      val nDocs = byName(r, "n_docs")
      val passes = ruleCols.map(byName(r, _))
      passes.foreach(p => assert(p >= 0 && p <= nDocs))
      val all = byName(r, "n_pass_all")
      assert(all <= passes.min, "conjunction must be ≤ every conjunct")
      assert(all >= 0)
    }
  }

  test("unigram cross-entropy stats are internally consistent") {
    val rows = Registry.all.find(_.name == "q_unigram_logprob").get
      .build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def d(c: String) = r.getDouble(r.fieldIndex(c))
      // NLL of a probability ≤ 1 is ≥ 0; min ≤ avg ≤ max on each language
      assert(d("min_xent") >= 0.0)
      assert(d("min_xent") <= d("avg_xent") + 1e-9)
      assert(d("avg_xent") <= d("max_xent") + 1e-9)
      assert(byName(r, "n_high_xent") <= byName(r, "n_docs"))
    }
  }

  test("unigram cross-entropy beats the uniform-model bound on average") {
    // A unigram LM fitted on the corpus has per-token mean NLL ≤ ln(V)
    // (uniform over the per-language vocabulary is the worst fitted case).
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val vocab = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang").agg(countDistinct("tok").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Registry.all.find(_.name == "q_unigram_logprob").get
      .build(spark, sfDir).collect()
    rows.foreach { r =>
      val lang = r.getString(r.fieldIndex("lang"))
      val avg = r.getDouble(r.fieldIndex("avg_xent"))
      assert(avg <= math.log(vocab(lang).toDouble) + 1e-6,
        s"$lang: fitted unigram xent $avg exceeds uniform bound ln(${vocab(lang)})")
    }
  }
}
