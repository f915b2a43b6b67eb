package graft.queries

import graft.SparkSpec

/** Pins the round-14 stop-gram guard on q_ngram_jaccard_blocked: the
  * posting self-join's work is Σ_gram df², so ONE boilerplate trigram
  * shared by a whole (lang, block) cell makes that key's pair mass
  * quadratic (the skewed-key class the MinHash family caps with
  * MaxBucket). A planted ubiquitous gram (df = 300 > StopGramCap = 256)
  * must be DROPPED from the overlap join — its C(300,2) = 44,850 pair
  * rows never materialize — and REPORTED in-result; a rare shared gram
  * (df = 2) must still be joined; and an all-short-doc language must
  * emit NULL avg_jaccard (the n_denom = 0 divide guard, r14 advisor).
  */
class NgramStopGramSpec extends SparkSpec {
  import spark.implicits._

  test("ubiquitous gram capped + reported; rare gram kept; n_denom=0 is NULL") {
    val n = 300 // > StopGramCap (256): every doc shares the boilerplate
    val boiler = "b0 b1 b2"
    val en = (0 until n).map { i =>
      val uniq = (0 until 9).map(t => s"u${i}_$t").mkString(" ")
      (i.toLong, s"$boiler $uniq", "en", "test", 0L)
    }
    // rare shared gram under the cap — proves the guard is targeted, not
    // a blanket drop of shared grams
    val fr = Seq(
      (1000L, "r0 r1 r2 x0 x1 x2 x3 x4 x5 x6 x7 x8", "fr", "test", 0L),
      (1001L, "r0 r1 r2 y0 y1 y2 y3 y4 y5 y6 y7 y8", "fr", "test", 0L))
    // every doc under 3 tokens: the only pair is both-empty → n_denom = 0
    val de = Seq(
      (2000L, "a b", "de", "test", 0L),
      (2001L, "c d", "de", "test", 0L))
    // three IDENTICAL texts: the r14b distinct-text collapse must expand
    // the single value back to C(3,2) doc pairs at jaccard 1.0 (the
    // multiplicity arithmetic the doc-level oracle certifies)
    val jp = (0 until 3).map { i =>
      (3000L + i, (0 until 12).map(t => s"j$t").mkString(" "), "jp", "test", 0L)
    }
    val dir = java.nio.file.Files.createTempDirectory("ngramstop").toString
    (en ++ fr ++ de ++ jp).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = Registry.all.find(_.name == "q_ngram_jaccard_blocked").get
      .build(spark, dir).collect()
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap

    val e = byLang("en")
    // all 300 docs are 12 tokens → one (en, block=1) cell, C(300,2) pairs
    assert(e.getAs[Long]("n_pairs") === n.toLong * (n - 1) / 2)
    // the ubiquitous gram was the ONLY shared gram: with it dropped, the
    // overlap join materializes ZERO of the 44,850 quadratic pair rows —
    // the bounded-pair-mass claim, pinned
    assert(e.getAs[Long]("n_overlapping") === 0L)
    assert(e.getAs[Long]("n_stop_grams") === 1L)
    assert(e.getAs[Long]("stop_postings") === n.toLong)
    assert(e.getAs[Double]("avg_jaccard") === 0.0)
    assert(e.getAs[Double]("max_jaccard") === 0.0)

    val f = byLang("fr")
    // df = 2 ≤ cap: the rare gram survives; isect = 1, sz = 10 each →
    // jaccard = 1/(10 + 10 − 1) on the 1e-9 grid, rounded to 4 places
    assert(f.getAs[Long]("n_pairs") === 1L)
    assert(f.getAs[Long]("n_overlapping") === 1L)
    assert(f.getAs[Long]("n_stop_grams") === 0L)
    assert(f.getAs[Long]("stop_postings") === 0L)
    assert(f.getAs[Double]("max_jaccard") === 0.0526)

    val d = byLang("de")
    // both docs under 3 tokens: the pair exists but is both-empty, so the
    // avg denominator is 0 — NULL, never inf/nan, in both engines
    assert(d.getAs[Long]("n_pairs") === 1L)
    assert(d.getAs[Long]("n_overlapping") === 0L)
    assert(d.isNullAt(d.fieldIndex("avg_jaccard")))

    val j = byLang("jp")
    // one distinct text, weight 3 → C(3,2) identical pairs at jaccard 1.0
    // (k = sz = 10 kept grams: 10/(20 − 10) = 1)
    assert(j.getAs[Long]("n_pairs") === 3L)
    assert(j.getAs[Long]("n_overlapping") === 3L)
    assert(j.getAs[Double]("avg_jaccard") === 1.0)
    assert(j.getAs[Double]("max_jaccard") === 1.0)
  }
}
