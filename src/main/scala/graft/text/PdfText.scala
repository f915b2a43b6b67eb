package graft.text

import java.nio.charset.StandardCharsets

/** F12: PDF → text with the reference's per-page contract
  * (document_parser.py:61-77): extract text page by page, keep non-empty
  * pages, join with "\n", collapse runs of ≥3 newlines to exactly two,
  * trim.
  *
  * This container ships no PDF codec, so `extractPagesStub` is the
  * clearly-marked decode seam — a real implementation would walk the PDF
  * page tree (pdfplumber's role in the reference). The deterministic stub
  * treats the payload as UTF-8 text with form-feed (\f) page breaks, which
  * keeps every surrounding piece (binary payloads, page iteration,
  * join/collapse/trim, pipeline integration) real and testable.
  */
object PdfText {

  /** STUB — replace with a real PDF page-text extractor. */
  def extractPagesStub(payload: Array[Byte]): Seq[String] =
    new String(payload, StandardCharsets.UTF_8).split('\f').toSeq

  /** Per-page extraction → "\n"-join of non-empty pages → collapse → trim
    * (document_parser.py:61-77 exactly, modulo the stubbed extractor). */
  def pdfToText(payload: Array[Byte]): String = {
    val pages = extractPagesStub(payload).filter(_.nonEmpty)
    pages.mkString("\n").replaceAll("\n{3,}", "\n\n").trim
  }
}
