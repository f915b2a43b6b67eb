package graft.text

/** SEC-filing section extraction (reference F13:
  * document_parser.py:9-14,100-135 semantics):
  *   - per section key, find the LAST regex match of its heading (filings
  *     repeat headings in the TOC; the last occurrence is the body);
  *   - slice from the heading to the next section's heading (or EOF);
  *   - cap a section at MaxSectionChars; drop sections under MinSectionChars.
  *
  * Pure deterministic Scala — applied via `Dataset.map`/`flatMap` on the
  * parsed-document Dataset (SURVEY.md §2.11: typed function, not an
  * Expression; the hot path is ingest, not query).
  */
object SectionExtractor {

  val MaxSectionChars = 80000
  val MinSectionChars = 1000

  /** (sectionKey, heading regex) in document order. */
  val SectionPatterns: Seq[(String, String)] = Seq(
    "item_1" -> "(?i)item\\s+1\\s*[\\.:\\-]?\\s*business",
    "item_1a" -> "(?i)item\\s+1a\\s*[\\.:\\-]?\\s*risk\\s+factors",
    "item_7" -> "(?i)item\\s+7\\s*[\\.:\\-]?\\s*management",
    "item_7a" -> "(?i)item\\s+7a\\s*[\\.:\\-]?\\s*quantitative")

  /** Last match offset of each section heading in `text`. */
  private def lastOffsets(text: String): Seq[(String, Int)] =
    SectionPatterns.flatMap { case (key, pat) =>
      val m = pat.r.findAllMatchIn(text).toSeq
      m.lastOption.map(mm => key -> mm.start)
    }

  /** Extract sections as (key, sectionText), document order, with the
    * reference's cap/min-length rules. */
  def extract(text: String): Seq[(String, String)] = {
    val offsets = lastOffsets(text).sortBy(_._2)
    offsets.zipWithIndex.flatMap { case ((key, start), i) =>
      val end = if (i + 1 < offsets.size) offsets(i + 1)._2 else text.length
      val raw = text.substring(start, end)
      val capped = if (raw.length > MaxSectionChars) raw.substring(0, MaxSectionChars) else raw
      if (capped.length < MinSectionChars) None else Some(key -> capped)
    }
  }
}
