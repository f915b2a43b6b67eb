package graft.text

/** Paragraph-aware chunking with overlap (reference F14:
  * document_parser.py:138-249 semantics):
  *   - split on blank lines (\n\s*\n+);
  *   - greedy-pack paragraphs up to TargetChars (hard cap MaxChars — an
  *     oversized single paragraph is split at MaxChars);
  *   - consecutive chunks overlap by OverlapParagraphs trailing paragraphs;
  *   - chunk_index re-assigned 0..n-1.
  *
  * Pure deterministic Scala, exercised via `Dataset.flatMap` over
  * (docId, section, text) — property: same text → same chunks.
  */
object Chunker {

  val TargetChars = 4500
  val MaxChars = 6500
  val OverlapParagraphs = 2

  final case class Chunk(index: Int, content: String, startPar: Int, endPar: Int)

  private def splitParagraphs(text: String): Vector[String] =
    text.split("\\n\\s*\\n+").toVector.map(_.trim).filter(_.nonEmpty)

  /** Split an oversized paragraph at MaxChars boundaries. */
  private def hardSplit(p: String): Vector[String] =
    if (p.length <= MaxChars) Vector(p)
    else p.grouped(MaxChars).toVector

  def chunk(text: String,
      target: Int = TargetChars, max: Int = MaxChars,
      overlap: Int = OverlapParagraphs): Vector[Chunk] = {
    val paras = splitParagraphs(text).flatMap(hardSplit)
    if (paras.isEmpty) return Vector.empty

    val chunks = Vector.newBuilder[(Int, Int)] // (startPar, endPar) inclusive
    var start = 0
    while (start < paras.length) {
      var end = start
      var len = paras(start).length
      while (end + 1 < paras.length &&
        len + 2 + paras(end + 1).length <= target) {
        end += 1
        len += 2 + paras(end).length
      }
      chunks += ((start, end))
      if (end + 1 >= paras.length) start = paras.length
      else start = math.max(end + 1 - overlap, start + 1) // overlap, but progress
    }
    chunks.result().zipWithIndex.map { case ((s, e), i) =>
      Chunk(i, paras.slice(s, e + 1).mkString("\n\n"), s, e)
    }
  }
}
