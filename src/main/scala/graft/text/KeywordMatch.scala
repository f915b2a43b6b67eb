package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Keyword matching (reference F1/F2, SURVEY.md §2.8).
  *
  * The reference deliberately mixes TWO match semantics and we preserve
  * both (SURVEY.md §7.3 "substring vs word-boundary is site-specific"):
  *   - word-boundary regex (rubric_scorer.py:154-159, board_analyzer.py:53-55)
  *   - plain substring `in` (evidence_mapper.py:283-299,
  *     talent_concentration.py:67 — "ai" matches "air"!)
  */
object KeywordMatch {

  private def quote(kw: String): String = java.util.regex.Pattern.quote(kw)

  /** Case-insensitive word-boundary match (F1). */
  def wordBoundary(text: Column, keyword: String): Column =
    text.rlike(s"(?i)\\b${quote(keyword)}\\b")

  /** Count of word-boundary occurrences (F1 counting form). */
  def wordBoundaryCount(text: Column, keyword: String): Column =
    regexp_count(lower(text), lit(s"\\b${quote(keyword.toLowerCase)}\\b"))

  /** Case-insensitive substring containment (F2 — the "ai"⊂"air" quirk). */
  def substringMatch(text: Column, keyword: String): Column =
    lower(text).contains(keyword.toLowerCase)

  /** Hit count over a keyword list with word-boundary semantics. */
  def hitCount(text: Column, keywords: Seq[String]): Column =
    keywords.map(kw => when(wordBoundary(text, kw), 1).otherwise(0))
      .reduceOption[Column](_ + _).getOrElse(lit(0))

  /** Hit count with substring semantics (evidence-mapper site behavior). */
  def substringHitCount(text: Column, keywords: Seq[String]): Column =
    keywords.map(kw => when(substringMatch(text, kw), 1).otherwise(0))
      .reduceOption[Column](_ + _).getOrElse(lit(0))
}
