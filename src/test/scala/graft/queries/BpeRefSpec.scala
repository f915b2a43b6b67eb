package graft.queries

import graft.SparkSpec

/** Pins the SQL-expressible BPE trainer (SelectionQueries.bpeLoopFrom) to
  * an INDEPENDENT reference implementation of Sennrich et al. 2016 on a
  * fixed corpus — the certification the DuckDB oracle cannot provide,
  * because the oracle replays the same string-replace algebra and would
  * agree with a shared flaw (round-13 advisor: the round-12 prefix-only
  * symbol encoding let a merge whose rhs was a proper prefix of a longer
  * symbol corrupt across the boundary in BOTH engines identically).
  *
  * The corpus is engineered to force exactly that case: (t,h) merges
  * first, then (x,t) — at which point the word "xth" is symbolized
  * [x, th], and a boundary-unsafe replace of "x·t" would corrupt it to
  * the non-BPE symbol "xth". The reference operates on symbol LISTS, so
  * it is immune by construction; the spec asserts the full merge table
  * and the final symbolization of every word type agree.
  */
class BpeRefSpec extends SparkSpec {

  /** Reference BPE: word-type counts -> K (lhs, rhs, pair_count) merges +
    * final word -> symbol-list map. Pair counting enumerates every
    * adjacent index (so (a,a) counts twice in [a,a,a]); the merge is a
    * greedy left-to-right non-overlapping scan; argmax ties break on
    * (count DESC, lhsrhs ASC) — the trainer's exact contract. */
  private def refBpe(words: Map[String, Long], k: Int)
      : (Seq[(Int, String, String, Long)], Map[String, List[String]]) = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, c) => w.toList.map(_.toString) -> c }
    val merges = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, Long)]
    for (step <- 1 to k) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case List(a, b) => counts((a, b)) += c
          case _ => ()
        }
      }
      require(counts.nonEmpty, s"corpus exhausted before merge $step")
      val ((lhs, rhs), cnt) = counts.minBy { case ((a, b), c) =>
        (-c, a + SelectionQueries.BpeD + b) // the trainer's pairkey tie-break
      }
      merges += ((step, lhs, rhs, cnt))
      def mergeList(syms: List[String]): List[String] = syms match {
        case a :: b :: rest if a == lhs && b == rhs =>
          (a + b) :: mergeList(rest)
        case a :: rest => a :: mergeList(rest)
        case Nil => Nil
      }
      vocab = vocab.map { case (syms, c) => mergeList(syms) -> c }
    }
    (merges.toList,
      words.keys.map { w =>
        w -> {
          var syms = w.toList.map(_.toString)
          merges.foreach { case (_, lhs, rhs, _) =>
            def m(l: List[String]): List[String] = l match {
              case a :: b :: rest if a == lhs && b == rhs => (a + b) :: m(rest)
              case a :: rest => a :: m(rest)
              case Nil => Nil
            }
            syms = m(syms)
          }
          syms
        }
      }.toMap)
  }

  // corpus forcing: merge1 (t,h)=11, merge2 (x,t)=10 with "xth" already
  // holding the symbol "th" (the adversarial boundary case), merge3 (a,a)
  // (greedy-overlap case: [a,a,a] -> [aa,a]), merges 4-8 chew the
  // "abcdefgh" chain
  private val corpus: Map[String, Long] = Map(
    "th" -> 10L, "xt" -> 9L, "xth" -> 1L, "aaa" -> 2L, "abcdefgh" -> 2L)

  private lazy val docs = {
    import spark.implicits._
    // one doc per word occurrence keeps the trainer's word-count pass
    // identical to the reference's count map
    corpus.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .toDF("text")
  }

  private lazy val (vFinal, mergeFrames) =
    SelectionQueries.bpeLoopFrom(docs)

  test("merge table equals the reference implementation's") {
    val (refMerges, _) = refBpe(corpus, SelectionQueries.BpeTrainK)
    val got = mergeFrames.map { f =>
      val r = f.collect().head
      val Array(lhs, rhs) =
        r.getAs[String]("pairkey").split(SelectionQueries.BpeD)
      (r.getAs[Int]("step"), lhs, rhs, r.getAs[Long]("pair_count"))
    }
    assert(got == refMerges,
      s"trainer merges $got != reference $refMerges")
  }

  test("final symbolization of every word type equals the reference's") {
    val (_, refVocab) = refBpe(corpus, SelectionQueries.BpeTrainK)
    val got = vFinal.collect().map { r =>
      val syms = r.getAs[String]("syms")
      val word = syms.replace(SelectionQueries.BpeD, "")
        .replace(SelectionQueries.BpeE, "")
      val list = syms.split(SelectionQueries.BpeE).toList
        .filter(_.nonEmpty).map(_.stripPrefix(SelectionQueries.BpeD))
      word -> list
    }.toMap
    assert(got == refVocab, s"trainer vocab $got != reference $refVocab")
  }

  test("the adversarial word keeps its symbol boundary (no 'xth' symbol)") {
    val (_, refVocab) = refBpe(corpus, SelectionQueries.BpeTrainK)
    assert(refVocab("xth") == List("x", "th"))
  }
}
