package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RSS `<item>` extraction without an XML parser (reference F10: regex
  * fallback semantics of job_signals.py:62-78 / patent_signals.py:46-62;
  * item counting via `<item>` regex in compute_signal_scores.py:28-31).
  *
  * Pure column expressions: `regexp_extract_all` explodes items, per-field
  * `regexp_extract` pulls title/link/pubDate — codegen-friendly, no UDTF
  * (SURVEY.md §2.11 verdict).
  */
object RssParse {

  private val ItemPattern = "(?s)<item>(.*?)</item>"

  /** One row per `<item>` block: (itemXml). */
  def explodeItems(df: DataFrame, xmlCol: String): DataFrame =
    df.withColumn("item_xml",
      explode(regexp_extract_all(col(xmlCol), lit(ItemPattern), lit(1))))

  private def field(item: Column, tag: String): Column = {
    val raw = regexp_extract(item, s"(?s)<$tag>(.*?)</$tag>", 1)
    // strip optional CDATA wrapper, then trim
    trim(regexp_replace(raw, "(?s)^\\s*<!\\[CDATA\\[(.*)\\]\\]>\\s*$", "$1"))
  }

  def title(item: Column): Column = field(item, "title")
  def link(item: Column): Column = field(item, "link")
  def pubDate(item: Column): Column = field(item, "pubDate")

  /** RFC822 / ISO / epoch-seconds publication-date heuristics (reference F4:
    * parsedate_to_datetime → fromisoformat fallback, job_signals.py:39-49).
    *
    * Spark ≥3's parser rejects day-of-week (`EEE`) and zone-name (`zzz`)
    * PARSE patterns, so the RFC822 path extracts the datetime core by regex
    * first (named zones are treated as UTC — the session is pinned UTC and
    * RSS feeds overwhelmingly emit GMT). `try_to_timestamp` keeps
    * unparseable rows as null instead of throwing under ANSI mode. */
  def parseDate(raw: Column): Column = {
    val rfc822Core = regexp_extract(raw,
      "^[A-Za-z]{3},\\s*(\\d{1,2} [A-Za-z]{3} \\d{4} \\d{2}:\\d{2}:\\d{2})", 1)
    coalesce(
      try_to_timestamp(nullif(rfc822Core, lit("")), lit("d MMM yyyy HH:mm:ss")),
      try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ssX")),
      try_to_timestamp(raw, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(raw, lit("yyyy-MM-dd")),
      when(raw.rlike("^\\d{9,11}$"), timestamp_seconds(raw.cast("long"))))
  }

  /** Full parse: feed rows → one normalized row per item. */
  def parseFeed(df: DataFrame, xmlCol: String): DataFrame =
    explodeItems(df, xmlCol)
      .withColumn("title", title(col("item_xml")))
      .withColumn("link", link(col("item_xml")))
      .withColumn("published_at", parseDate(pubDate(col("item_xml"))))
      .drop("item_xml")
}
