package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._
  import IngestPipeline._

  private def filing(entity: Long, seed: String): RawFiling = {
    val para = (i: Int) => s"Paragraph $i $seed " + ("body " * 300)
    val html = s"""<html><head><style>x{}</style></head><body>
      <h1>Item 1. Business</h1>
      <p>${para(1)}</p><p>${para(2)}</p><p>${para(3)}</p>
      <h1>Item 1A. Risk Factors</h1>
      <p>${para(4)}</p><p>${para(5)}</p>
      </body></html>"""
    RawFiling(entity, "10-K", html)
  }

  test("html filings flow to sections") {
    val raw = Seq(filing(1, "alpha")).toDS()
    val sections = extractSections(raw).collect()
    assert(sections.map(_.section).toSet === Set("item_1", "item_1a"))
    assert(sections.forall(!_.text.contains("<")))
  }

  test("pdf filings route through the per-page parser; html stays columnar") {
    // per-page contract (document_parser.py:61-77): non-empty pages joined
    // with \n, runs of >=3 newlines collapsed to two, result trimmed
    val pdfBytes = "  Page one text\n\n\n\nstill page one\fPage two\f\f  "
      .getBytes("UTF-8")
    val htmlBytes = "<html><body><p>plain html</p></body></html>".getBytes("UTF-8")
    val raw = Seq(
      (1L, "10-K", "filing.PDF", pdfBytes),
      (2L, "10-K", "filing.htm", htmlBytes))
      .toDF("entity_id", "filing_type", "file_hint", "content")
    val out = parseFilings(raw).collect()
      .map(r => r.getAs[Long]("entity_id") -> r.getAs[String]("text")).toMap
    assert(out(1L) == "Page one text\n\nstill page one\nPage two")
    assert(out(2L).contains("plain html") && !out(2L).contains("<"))
  }

  test("sections chunk with content-derived ids and bounded sizes") {
    val raw = Seq(filing(1, "alpha")).toDS()
    val chunks = chunkSections(extractSections(raw)).collect()
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.content.length <= graft.text.Chunker.MaxChars))
    assert(chunks.map(_.chunk_id).distinct.length === chunks.length)
    assert(chunks.forall(_.word_count > 0))
  }

  test("ingest is idempotent across runs (cross-run hash gate)") {
    val store = Files.createTempDirectory("graft-ingest").toString + "/chunks"
    val raw = Seq(filing(1, "alpha"), filing(2, "beta")).toDS()
    val first = IngestPipeline.ingest(spark, raw, store)
    val n1 = first.count()
    assert(n1 > 0)
    // re-ingesting the same filings adds nothing
    val second = IngestPipeline.ingest(spark, raw, store)
    assert(second.count() === n1)
    // a new filing adds only its own chunks
    val third = IngestPipeline.ingest(spark, Seq(filing(3, "gamma")).toDS(), store)
    assert(third.count() > n1)
    assert(third.select("content_hash").distinct().count() === third.count())
  }

  test("binaryFile route: real HTML + real PDF bytes walk the full " +
      "DISCOVERED -> PARSED -> CHUNKED -> INDEXED lifecycle with " +
      "monotone per-stage counts (collection.py:183-296)") {
    import org.apache.spark.sql.functions._
    // real PDF bytes: a /Type /Page object with an exact-/Length stream
    def pdfBytes(text: String): Array[Byte] = {
      val st = s"BT ($text) Tj ET"
      (s"%PDF-1.4\n1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n" +
        s"2 0 obj << /Length ${st.length} >> stream\n$st\nendstream endobj\n%%EOF")
        .getBytes("UTF-8")
    }
    val body = "business detail " * 200 // > MinSectionChars after assembly
    val raw = Seq(
      (1L, "10-K", "f1.html",
        (s"<html><body><h1>Item 1. Business</h1><p>$body</p>" +
          s"<h1>Item 1A. Risk Factors</h1><p>$body extra</p></body></html>")
          .getBytes("UTF-8")),
      (2L, "10-K", "f2.pdf",
        pdfBytes(s"Item 1. Business $body and Item 1A. Risk Factors $body more")))
      .toDF("entity_id", "filing_type", "file_hint", "content")
    // DISCOVERED: everything the collector handed over
    val nDiscovered = raw.count()
    // PARSED: decoders produced non-empty text for both routes
    val parsed = IngestPipeline.parseFilings(raw)
    val nParsed = parsed.filter(length(col("text")) > 0).count()
    assert(nParsed === nDiscovered)
    // CHUNKED: sections extracted from BOTH kinds, then chunked
    val sections = IngestPipeline.sectionsOf(parsed)
    val bySrc = sections.groupBy("entity_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySrc(1L) === 2 && bySrc(2L) === 2) // item_1 + item_1a each
    val chunks = IngestPipeline.chunkSections(sections)
    val nChunked = chunks.count()
    assert(nChunked >= sections.count())
    // INDEXED: stored through the cross-run gate; re-run adds nothing
    val store = Files.createTempDirectory("graft-e2e").toString + "/chunks"
    chunks.toDF().write.mode("append").parquet(store)
    val indexed = spark.read.parquet(store).count()
    assert(indexed === nChunked)
  }
}
