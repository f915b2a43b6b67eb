package graft.text

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite

/** F12 real-decode seam: build a genuine two-page PDF in memory (page 1's
  * content stream FlateDecode-compressed with java.util.zip.Deflater,
  * page 2 uncompressed), then assert PdfText extracts the shown text
  * page-by-page and applies the reference's join/collapse/trim contract.
  * Non-PDF payloads must still take the deterministic stub path. */
class PdfTextSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Minimal but structurally real PDF: catalog → pages → two page objects
    * with /Contents streams. */
  private def fixturePdf: Array[Byte] = {
    val c1 = ("BT /F1 12 Tf 72 720 Td (Hello \\(SEC\\) filing \\101) Tj " +
      "0 -14 Td [(Item ) (1A. Risk Factors)] TJ ET").getBytes(ISO_8859_1)
    val c1z = deflate(c1)
    val c2 = "BT /F1 12 Tf 72 720 Td <48656C6C6F20776F726C64> Tj (page two) ' ET"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c1z.length} /Filter /FlateDecode >> stream\n")
    out.write(c1z)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${c2.length} >> stream\n")
    w(c2)
    w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  test("real PDF: per-page extraction through Flate and plain streams") {
    val pages = PdfText.extractPages(fixturePdf)
    assert(pages.length === 2)
    assert(pages(0) === "Hello (SEC) filing A\nItem 1A. Risk Factors")
    assert(pages(1) === "Hello world\npage two")
  }

  test("pdfToText applies the join/collapse/trim contract to a real PDF") {
    val txt = PdfText.pdfToText(fixturePdf)
    assert(txt === "Hello (SEC) filing A\nItem 1A. Risk Factors\nHello world\npage two")
  }

  test("strings consumed by non-show operators are not emitted") {
    val cs = "BT (shown) Tj (popped-by-Td) 1 0 Td (also shown) Tj ET"
    val pdf = ("%PDF-1.4\n3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${cs.length} >> stream\n$cs\nendstream endobj\n")
      .getBytes(ISO_8859_1)
    assert(PdfText.extractPages(pdf) === Seq("shown\nalso shown"))
  }

  test("/Length extent protects stream data containing delimiter keywords") {
    // the embedded "endstream endobj" is DATA (covered by /Length); a
    // naive delimiter scan would truncate the stream before (after)
    val cs = "BT (before) Tj  endstream endobj  (after) Tj ET"
    val pdf = ("%PDF-1.4\n3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${cs.length} >> stream\n$cs\nendstream endobj\n")
      .getBytes(ISO_8859_1)
    assert(PdfText.extractPages(pdf) === Seq("before\nafter"))
  }

  test("backslash-CRLF in a literal string is a line continuation") {
    val cs = "BT (li\\\r\nne) Tj (cr\\\ronly) Tj ET"
    val pdf = ("%PDF-1.4\n3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${cs.length} >> stream\n$cs\nendstream endobj\n")
      .getBytes(ISO_8859_1)
    assert(PdfText.extractPages(pdf) === Seq("line\ncronly"))
  }

  test("corrupt FlateDecode data degrades to decoded prefix, no exception") {
    val good = deflate("BT (x) Tj ET".getBytes(ISO_8859_1))
    val corrupt = good.take(good.length - 3) ++ Array[Byte](0x7F, 0x00, 0x01)
    val pdf = ("%PDF-1.4\n3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${corrupt.length} /Filter /FlateDecode >> stream\n")
      .getBytes(ISO_8859_1) ++ corrupt ++ "\nendstream endobj\n".getBytes(ISO_8859_1)
    PdfText.pdfToText(pdf) // must not throw; content is best-effort
  }

  test("non-PDF payloads keep the deterministic stub contract") {
    val payload = "page one\ftwo\f\ffour".getBytes("UTF-8")
    assert(PdfText.extractPages(payload) === Seq("page one", "two", "", "four"))
    assert(PdfText.pdfToText(payload) === "page one\ntwo\nfour")
  }

  test("truncated Flate stream degrades to empty, not an exception") {
    val full = deflate("BT (x) Tj ET".getBytes(ISO_8859_1))
    val cut = full.take(2)
    val pdf = ("%PDF-1.4\n3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Filter /FlateDecode >> stream\n").getBytes(ISO_8859_1) ++
      cut ++ "\nendstream endobj\n".getBytes(ISO_8859_1)
    assert(PdfText.pdfToText(pdf) === "")
  }
}
