package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text and entity extraction (reference F11/F15: the regex-fallback
  * path of document_parser.py:44-58 / board_analyzer.py:131-162 — we
  * standardize on the reference's OWN fallback semantics, SURVEY.md §2.8). */
object HtmlText {

  /** Strip <script>/<style> blocks, all tags, decode the common entities,
    * collapse whitespace. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noScript, "<[^>]+>", " ")
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Capitalized 2-3 word person-name candidates (board_analyzer.py:139-147
    * pattern), deduped. */
  def extractNames(text: Column): Column =
    array_distinct(regexp_extract_all(text,
      lit("\\b([A-Z][a-z]+(?: [A-Z][a-z]+){1,2})\\b"), lit(1)))

  private val CommitteePatterns = Seq(
    "technology committee", "audit committee", "risk committee",
    "compensation committee", "nominating committee", "ai committee",
    "innovation committee")

  /** Committee mentions present in the text (board_analyzer.py:148-162). */
  def extractCommittees(text: Column): Column = {
    val lower_ = lower(text)
    filter(
      array(CommitteePatterns.map(lit): _*),
      p => lower_.contains(p))
  }
}
