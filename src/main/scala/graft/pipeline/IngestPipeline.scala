package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Upsert
import graft.text.{Chunker, HtmlText, PdfText, SectionExtractor}

/** The reference's evidence-collection lifecycle (§3.2:
  * collection.py:183-296 — fetch → parse F11 → sections F13 → hash-dedup
  * S12 → chunk F14 → persist S8) as one typed Spark pipeline.
  *
  * Fetch stays an external concern (rate-limited HTTP has no place on
  * executors); the pipeline input is a DataFrame of raw filing payloads.
  * Parse/section run as column expressions + a typed flatMap (pure Scala,
  * deterministic — SURVEY.md §2.11); dedup is the left_anti hash gate;
  * chunk ids are content-derived sha2, not uuid4 (SURVEY.md §7.3).
  *
  * Scale: one scan, one flatMap, one anti-join shuffle, one write. Chunk
  * explosion is bounded (MaxChars), so partitions stay memory-safe; output
  * is partitionable by entity for downstream co-located joins.
  */
object IngestPipeline {

  final case class RawFiling(entity_id: Long, filing_type: String, html: String)
  final case class SectionRow(entity_id: Long, filing_type: String,
      section: String, text: String)
  final case class ChunkRow(entity_id: Long, filing_type: String,
      section: String, chunk_index: Int, content: String, word_count: Int,
      content_hash: String, chunk_id: String)

  /** parse_filing_bytes (document_parser.py:81-90): file_hint routes PDFs
    * through the per-page parser (F12), everything else through the HTML
    * path (F11). Input is the `binaryFile`-source shape (binary `content`
    * + a path/filename hint). HTML rows stay fully columnar/codegen'd;
    * only the PDF branch takes the typed-map seam, and the two unions
    * back into one text frame — at 100 TB the split-route-union is two
    * filters over one scan, no shuffle. */
  def parseFilings(raw: DataFrame): DataFrame = {
    import raw.sparkSession.implicits._
    // null hint → HTML branch (the reference routes every non-PDF through
    // HTML); without the coalesce a null hint fails BOTH filters silently
    val isPdf = coalesce(lower(col("file_hint")).endsWith(".pdf"), lit(false))
    val htmls = raw.filter(!isPdf)
      .select(col("entity_id"), col("filing_type"),
        HtmlText.htmlToText(decode(col("content"), "UTF-8")).as("text"))
    val pdfs = raw.filter(isPdf)
      .select(col("entity_id"), col("filing_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .map { case (e, ft, b) => (e, ft, PdfText.pdfToText(b)) }
      .toDF("entity_id", "filing_type", "text")
    htmls.unionByName(pdfs)
  }

  /** Parsed text frame (entity_id, filing_type, text) → named sections
    * (F13) — the shared seam between the HTML-only path below and the
    * binaryFile route through [[parseFilings]]. */
  def sectionsOf(parsed: DataFrame): Dataset[SectionRow] = {
    import parsed.sparkSession.implicits._
    parsed.select(col("entity_id"), col("filing_type"), col("text"))
      .as[(Long, String, String)].flatMap { case (e, ft, text) =>
        SectionExtractor.extract(text).map { case (k, t) => SectionRow(e, ft, k, t) }
      }
  }

  /** HTML → cleaned text → named sections (F11 + F13). */
  def extractSections(raw: Dataset[RawFiling]): Dataset[SectionRow] = {
    val cleaned = raw.toDF()
      .withColumn("text", HtmlText.htmlToText(col("html")))
      .select(col("entity_id"), col("filing_type"), col("text"))
    sectionsOf(cleaned)
  }

  /** Sections → overlapping chunks with content-derived ids (F14 + F17). */
  def chunkSections(sections: Dataset[SectionRow]): Dataset[ChunkRow] = {
    import sections.sparkSession.implicits._
    sections.flatMap { s =>
      Chunker.chunk(s.text).map { c =>
        val hash = java.security.MessageDigest.getInstance("SHA-256")
          .digest(c.content.getBytes("UTF-8")).map("%02x".format(_)).mkString
        ChunkRow(s.entity_id, s.filing_type, s.section, c.index, c.content,
          c.content.split("\\s+").count(_.nonEmpty), hash,
          s"${s.entity_id}#${s.filing_type}#${s.section}#${c.index}#${hash.take(16)}")
      }
    }
  }

  /** Full run: parse → section → chunk → cross-run hash-dedup → append.
    * Returns the freshly-persisted chunks. */
  def ingest(spark: SparkSession, raw: Dataset[RawFiling], storePath: String): DataFrame = {
    val chunks = chunkSections(extractSections(raw)).toDF()
    val deduped = Upsert.dedupInBatch(chunks, "content_hash",
      Seq(col("chunk_id").asc))
    // pathExists, not try/catch: a transient read failure on an EXISTING
    // store must fail the run (idempotent re-ingest retries), never
    // silently disable cross-run dedup
    val fresh =
      if (Upsert.pathExists(spark, storePath))
        Upsert.dedupGate(deduped,
          spark.read.parquet(storePath).select("content_hash"), "content_hash")
      else deduped
    fresh.write.mode("append").parquet(storePath)
    spark.read.parquet(storePath)
  }
}
