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

  private def dr(x: Double, digits: Int): Double = {
    val p = math.pow(10, digits)
    (if (x >= 0) math.floor(x * p + 0.5) else math.ceil(x * p - 0.5)) / p
  }

  test("q_bigram_logprob: matches a direct in-memory reimplementation") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
      .filter(_._2.length >= 2)
    // model counts over ALL docs (replicas are separate docs — exactly the
    // m-weighted distinct-content counts the engine computes)
    val cBig = docs.flatMap { case (l, t) =>
      t.zip(t.tail).map { case (a, b) => (l, a, b) } }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cCtx = cBig.groupBy { case ((l, a, _), _) => (l, a) }
      .view.mapValues(_.values.sum).toMap
    val cUni = docs.flatMap { case (l, t) => t.map((l, _)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nL = cUni.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def nllI(l: String, a: String, b: String): Long = math.round(-math.log(
      0.7 * (cBig((l, a, b)).toDouble / cCtx((l, a)))
        + 0.3 * (cUni((l, b)).toDouble / nL(l))) * 1e6)
    val perDoc = docs.map { case (l, t) =>
      val nlls = t.zip(t.tail).map { case (a, b) => nllI(l, a, b) }
      val xent = nlls.sum.toDouble / 1e6 / nlls.length
      (l, xent, math.round(xent * 1e6))
    }
    val expect = perDoc.groupBy(_._1).map { case (l, ds) =>
      l -> (ds.length.toLong,
        dr(ds.map(_._3).sum.toDouble / 1e6 / ds.length, 4),
        dr(ds.map(_._2).min, 4), dr(ds.map(_._2).max, 4),
        ds.count(_._2 > 4.0).toLong)
    }
    val got = Registry.all.find(_.name == "q_bigram_logprob").get
      .build(spark, sfDir).collect().map { r =>
      r.getString(r.fieldIndex("lang")) -> (
        r.getLong(r.fieldIndex("n_docs")),
        r.getDouble(r.fieldIndex("avg_xent2")),
        r.getDouble(r.fieldIndex("min_xent2")),
        r.getDouble(r.fieldIndex("max_xent2")),
        r.getLong(r.fieldIndex("n_high_xent2")))
    }.toMap
    assert(got == expect)
  }

  test("q_bigram_logprob: transition-aware model scores at or below the unigram model on average") {
    // Jelinek-Mercer with λ·p_bigram + (1−λ)·p_unigram assigns every
    // observed transition at least (1−λ)·p_unigram, so per-corpus mean
    // xent can exceed unigram xent by at most −ln(1−λ); in practice the
    // bigram term should WIN on a corpus with real structure. Assert the
    // hard bound, not the hope.
    val uni = Registry.all.find(_.name == "q_unigram_logprob").get
      .build(spark, sfDir).collect()
      .map(r => r.getString(r.fieldIndex("lang")) ->
        r.getDouble(r.fieldIndex("avg_xent"))).toMap
    val rows = Registry.all.find(_.name == "q_bigram_logprob").get
      .build(spark, sfDir).collect()
    rows.foreach { r =>
      val l = r.getString(r.fieldIndex("lang"))
      val avg2 = r.getDouble(r.fieldIndex("avg_xent2"))
      assert(avg2 <= uni(l) - math.log(0.3) + 1e-6,
        s"$l: bigram xent $avg2 violates the λ-floor bound vs unigram ${uni(l)}")
    }
  }

  test("q_dup_span_removal: matches a direct in-memory interval-union reimplementation") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
    val W = 8
    // corpus-wide window occurrence counts over ALL docs (per position)
    val occ = docs.flatMap { case (_, t) =>
      t.sliding(W).filter(_.length == W).map(_.mkString(" ")) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val perDoc = docs.map { case (l, t) =>
      val dupStarts = t.sliding(W).filter(_.length == W).zipWithIndex
        .collect { case (w, i) if occ(w.mkString(" ")) >= 2 => i }.toSeq
      // interval union of [i, i+7], merging gaps ≤ 1
      var spans = List.empty[(Int, Int)]
      dupStarts.foreach { s =>
        val e = s + W - 1
        spans match {
          case (s0, e1) :: rest if s <= e1 + 1 =>
            spans = (s0, math.max(e1, e)) :: rest
          case _ => spans = (s, e) :: spans
        }
      }
      (l, t.length.toLong, spans.map { case (a, b) => (b - a + 1).toLong },
        spans.length.toLong)
    }
    val expect = perDoc.groupBy(_._1).map { case (l, ds) =>
      val total = ds.map(_._2).sum
      val covered = ds.flatMap(_._3).sum
      l -> (ds.length.toLong, total, covered, ds.map(_._4).sum,
        (ds.flatMap(_._3) :+ 0L).max, dr(covered.toDouble / total, 4))
    }
    val got = Registry.all.find(_.name == "q_dup_span_removal").get
      .build(spark, sfDir).collect().map { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      r.getString(r.fieldIndex("lang")) -> (
        g("n_docs"), g("total_tokens"), g("covered_tokens"), g("n_spans"),
        g("max_span"), r.getDouble(r.fieldIndex("removal_rate")))
    }.toMap
    assert(got == expect)
  }

  test("q_dup_span_removal: exact replica groups are fully covered") {
    // any text occurring ≥2 times has EVERY window duplicated, so its
    // whole token range is one merged span — coverage of the replica mass
    // is total. Verify on the corpus: removal accounting never exceeds
    // totals and equals totals for the replica-only sublanguage (if any
    // lang is all replicas, its rate is 1).
    import org.apache.spark.sql.functions._
    val rows = Registry.all.find(_.name == "q_dup_span_removal").get
      .build(spark, sfDir).collect()
    rows.foreach { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      assert(g("covered_tokens") <= g("total_tokens"))
      assert(g("n_spans") <= g("covered_tokens"))
    }
    // cross-check the replica lower bound: tokens inside texts with m ≥ 2
    // (and ≥ 8 tokens) are necessarily covered
    val repl = graft.Tables.documents(spark, sfDir)
      .groupBy("text").agg(count(lit(1)).as("m"))
      .filter(col("m") >= 2)
      .select(coalesce(sum(when(size(split(col("text"), " ")) >= 8,
        size(split(col("text"), " ")).cast("long") * col("m"))
        .otherwise(0L)), lit(0L)).as("lb"))
      .collect().head.getLong(0)
    val covered = rows.map(r => r.getLong(r.fieldIndex("covered_tokens"))).sum
    assert(covered >= repl,
      s"covered $covered below replica lower bound $repl")
  }
}
