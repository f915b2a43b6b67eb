package graft.text

import java.nio.charset.StandardCharsets

/** F12: PDF → text with the reference's per-page contract
  * (document_parser.py:61-77): extract text page by page, keep non-empty
  * pages, join with "\n", collapse runs of ≥3 newlines to exactly two,
  * trim.
  *
  * Round 3: a real, dependency-free extractor for the common case —
  * uncompressed and FlateDecode (java.util.zip.Inflater) content streams,
  * page objects resolved via `/Type /Page` → `/Contents`, literal
  * `(…)` (with escapes/octal/nesting) and hex `<…>` strings shown by
  * Tj / TJ / ' / " operators. This covers machine-generated SEC-style
  * PDFs (pdfplumber's role in the reference). Out of scope, by design:
  * xref/objstm indirection, non-Flate filters, CID/Type0 font decoding,
  * layout analysis — a payload this parser can't see pages in yields
  * whatever streams it CAN decode, and non-PDF payloads fall back to the
  * original deterministic stub (UTF-8 with \f page breaks), so synthetic
  * fixtures keep their contract.
  */
object PdfText {

  def isPdf(payload: Array[Byte]): Boolean =
    payload.length >= 5 && new String(payload, 0, 5, StandardCharsets.ISO_8859_1) == "%PDF-"

  /** STUB path for non-PDF payloads: UTF-8 text with \f page breaks. */
  def extractPagesStub(payload: Array[Byte]): Seq[String] =
    new String(payload, StandardCharsets.UTF_8).split('\f').toSeq

  /** Per-page text: real parse for `%PDF-` payloads, stub otherwise. */
  def extractPages(payload: Array[Byte]): Seq[String] =
    if (isPdf(payload)) extractPdfPages(payload) else extractPagesStub(payload)

  /** Per-page extraction → "\n"-join of non-empty pages → collapse → trim
    * (document_parser.py:61-77 exactly). */
  def pdfToText(payload: Array[Byte]): String = {
    val pages = extractPages(payload).filter(_.nonEmpty)
    pages.mkString("\n").replaceAll("\n{3,}", "\n\n").trim
  }

  // ------------------------------------------------------------------
  // minimal PDF object model: latin-1 gives a 1:1 byte↔char view, so
  // regex/string indices address raw bytes exactly
  private val ObjStartRe = "(\\d+)\\s+\\d+\\s+obj\\b".r
  private val PageRe = "/Type\\s*/Page\\b".r
  private val ContentsRe = "/Contents\\s*\\[?((?:\\s*\\d+\\s+\\d+\\s+R)+)".r
  private val RefRe = "(\\d+)\\s+\\d+\\s+R".r
  private val LengthRe = "/Length\\s+(\\d+)(?!\\s+\\d+\\s+R)".r

  private final case class PdfObj(dict: String, stream: Option[Array[Byte]])

  /** Object scan honoring `/Length`: binary stream data may contain the
    * ASCII substrings "endobj"/"endstream", so when the dict carries a
    * direct /Length the data extent is taken from it and the delimiters
    * are only searched AFTER the data. A non-literal /Length (indirect
    * `N 0 R`) falls back to the endstream scan with a single-EOL trim —
    * documented best-effort. */
  private def parseObjects(payload: Array[Byte]): Seq[(Int, PdfObj)] = {
    val s = new String(payload, StandardCharsets.ISO_8859_1)
    val starts = ObjStartRe.findAllMatchIn(s).toSeq
    starts.flatMap { m =>
      val num = m.group(1).toInt
      val bodyStart = m.end
      val endobjNaive = s.indexOf("endobj", bodyStart)
      val streamIdx = s.indexOf("stream", bodyStart)
      val hasStream = streamIdx >= 0 &&
        (endobjNaive < 0 || streamIdx < endobjNaive)
      if (!hasStream) {
        val end = if (endobjNaive < 0) s.length else endobjNaive
        Some(num -> PdfObj(s.substring(bodyStart, end), None))
      } else {
        val dict = s.substring(bodyStart, streamIdx)
        var ds = streamIdx + "stream".length
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') ds += 1
        val end = LengthRe.findFirstMatchIn(dict).map(_.group(1).toInt) match {
          case Some(len) if ds + len <= s.length => ds + len // exact extent
          case _ =>
            val de0 = s.indexOf("endstream", ds)
            val de = if (de0 < 0) s.length else de0
            // trim ONE EOL (\r\n, \n, or \r) before endstream — it is a
            // delimiter, not data (only safe in this no-/Length fallback)
            if (de > ds && s.charAt(de - 1) == '\n')
              de - (if (de - 1 > ds && s.charAt(de - 2) == '\r') 2 else 1)
            else if (de > ds && s.charAt(de - 1) == '\r') de - 1
            else de
        }
        Some(num -> PdfObj(dict,
          Some(s.substring(ds, end).getBytes(StandardCharsets.ISO_8859_1))))
      }
    }
  }

  /** Tolerant inflate: malformed deflate data (corrupt file, unsupported
    * predictor, mis-delimited stream) yields the bytes decoded so far —
    * never an exception, matching the class contract that undecodable
    * payloads degrade instead of failing the ingest job. */
  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    val out = new java.io.ByteArrayOutputStream()
    try {
      inf.setInput(data)
      val buf = new Array[Byte](8192)
      var stuck = false
      while (!inf.finished() && !stuck) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) stuck = true // truncated
      }
    } catch {
      case _: java.util.zip.DataFormatException => () // malformed: keep prefix
    } finally inf.end()
    out.toByteArray
  }

  private def decodedStream(o: PdfObj): Option[String] = o.stream.map { raw =>
    val bytes = if (o.dict.contains("/FlateDecode")) inflate(raw) else raw
    new String(bytes, StandardCharsets.ISO_8859_1)
  }

  private def extractPdfPages(payload: Array[Byte]): Seq[String] = {
    val objs = parseObjects(payload)
    val byNum = objs.toMap
    // page order = document order of /Type /Page objects (full /Kids
    // traversal is unnecessary for the linear writers this targets)
    val pages = objs.collect {
      case (_, o) if PageRe.findFirstIn(o.dict).isDefined => o
    }
    if (pages.nonEmpty) {
      pages.map { p =>
        val contentNums = ContentsRe.findFirstMatchIn(p.dict).toSeq
          .flatMap(m => RefRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt))
        contentNums.flatMap(n => byNum.get(n).flatMap(decodedStream))
          .map(extractShownText).mkString("\n")
      }
    } else {
      // no page tree visible: best effort — every decodable stream is one
      // "page" of shown text
      objs.flatMap { case (_, o) => decodedStream(o) }.map(extractShownText)
        .filter(_.nonEmpty)
    }
  }

  // ------------------------------------------------------------------
  // content-stream scanner: collect literal/hex strings, emit them when a
  // text-showing operator (Tj, TJ, ', ") consumes them
  private def extractShownText(cs: String): String = {
    val out = new StringBuilder
    val pending = new StringBuilder
    var i = 0

    def readLiteral(start: Int): Int = {
      var depth = 1
      var j = start + 1
      while (j < cs.length && depth > 0) {
        cs.charAt(j) match {
          case '\\' if j + 1 < cs.length =>
            cs.charAt(j + 1) match {
              case 'n' => pending.append('\n'); j += 2
              case 'r' => pending.append('\r'); j += 2
              case 't' => pending.append('\t'); j += 2
              case 'b' => pending.append('\b'); j += 2
              case 'f' => pending.append('\f'); j += 2
              case c @ ('(' | ')' | '\\') => pending.append(c); j += 2
              case d if d >= '0' && d <= '7' =>
                var k = j + 1; var v = 0
                while (k < cs.length && k < j + 4 &&
                    cs.charAt(k) >= '0' && cs.charAt(k) <= '7') {
                  v = v * 8 + (cs.charAt(k) - '0'); k += 1
                }
                pending.append(v.toChar); j = k
              case '\n' => j += 2 // line continuation (LF)
              case '\r' => // line continuation (CR or CRLF) — emits nothing
                j += 2
                if (j < cs.length && cs.charAt(j) == '\n') j += 1
              case other => pending.append(other); j += 2
            }
          case '(' => depth += 1; pending.append('('); j += 1
          case ')' => depth -= 1; if (depth > 0) pending.append(')'); j += 1
          case c => pending.append(c); j += 1
        }
      }
      j
    }

    def readHex(start: Int): Int = {
      val end0 = cs.indexOf('>', start + 1)
      val end = if (end0 < 0) cs.length else end0
      val hex = cs.substring(start + 1, end).filter(c =>
        Character.digit(c, 16) >= 0)
      val padded = if (hex.length % 2 == 1) hex + "0" else hex
      padded.grouped(2).foreach(p =>
        pending.append(Integer.parseInt(p, 16).toChar))
      math.min(end + 1, cs.length)
    }

    while (i < cs.length) {
      val c = cs.charAt(i)
      if (c == '(') i = readLiteral(i)
      else if (c == '<' && i + 1 < cs.length && cs.charAt(i + 1) != '<') i = readHex(i)
      else if (c == '[' || c == ']') i += 1
      else if (c.isLetter || c == '\'' || c == '"') {
        var j = i
        while (j < cs.length && (cs.charAt(j).isLetterOrDigit ||
            cs.charAt(j) == '\'' || cs.charAt(j) == '"' || cs.charAt(j) == '*')) j += 1
        cs.substring(i, j) match {
          case "Tj" | "TJ" | "'" | "\"" =>
            if (pending.nonEmpty) { out.append(pending).append('\n') }
            pending.clear()
          // Any intervening non-show operator DELIBERATELY discards the
          // collected strings: they were its operands, not shown text. In a
          // malformed stream like `(x) /F1 12 Tf Tj` the `(x)` is therefore
          // dropped — acceptable for the documented machine-generated scope.
          case _ => pending.clear()
        }
        i = j
      } else i += 1
    }
    out.toString.stripSuffix("\n")
  }
}
