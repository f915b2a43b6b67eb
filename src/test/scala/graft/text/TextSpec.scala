package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  // ---- KeywordMatch (F1 vs F2 site-specific semantics) --------------------

  test("word-boundary vs substring: the 'ai'⊂'air' quirk is preserved") {
    val df = Seq("clean air act", "ai strategy", "AI-first", "retail")
      .toDF("text")
    val out = df.select(
      KeywordMatch.wordBoundary(col("text"), "ai").as("wb"),
      KeywordMatch.substringMatch(col("text"), "ai").as("ss")).collect()
    assert(out.map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq == Seq(
      (false, true),  // "air" — substring hits, boundary does not
      (true, true),
      (true, true),   // hyphen is a word boundary
      (false, true))) // "retail" contains "ai"
  }

  test("word-boundary count and multi-keyword hit counts") {
    val df = Seq(Tuple1("ml and ai, then ai again; email")).toDF("text")
    val r = df.select(
      KeywordMatch.wordBoundaryCount(col("text"), "ai").as("n"),
      KeywordMatch.hitCount(col("text"), Seq("ml", "ai", "data")).as("hits"),
      KeywordMatch.substringHitCount(col("text"), Seq("mail", "zzz")).as("ss"))
      .collect().head
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 1)
  }

  // ---- RssParse (F10/F4) --------------------------------------------------

  private val feed = """<?xml version="1.0"?><rss><channel>
    <item><title>AI engineer role</title><link>http://x/1</link>
      <pubDate>Mon, 02 Mar 2026 10:30:00 GMT</pubDate></item>
    <item><title><![CDATA[Senior ML & data]]></title><link>http://x/2</link>
      <pubDate>2026-03-04T08:00:00Z</pubDate></item>
    <item><title>no date</title><link>http://x/3</link><pubDate>junk</pubDate></item>
    </channel></rss>"""

  test("RSS feed parses items, titles, CDATA, and date heuristics") {
    val df = Seq(Tuple1(feed)).toDF("xml")
    val items = RssParse.parseFeed(df, "xml")
      .select("title", "link", "published_at").collect()
    assert(items.length === 3)
    assert(items(0).getString(0) === "AI engineer role")
    assert(items(1).getString(0) === "Senior ML & data") // CDATA stripped
    assert(items(0).getTimestamp(2) != null)
    assert(items(1).getTimestamp(2) != null)
    assert(items(2).isNullAt(2)) // unparseable date → null, row kept
  }

  test("epoch-seconds pubDate heuristic") {
    val df = Seq(Tuple1("1767225600")).toDF("raw")
    val ts = df.select(RssParse.parseDate(col("raw")).as("t")).collect().head.getTimestamp(0)
    assert(ts.toInstant.getEpochSecond === 1767225600L)
  }

  // ---- HtmlText (F11/F15) -------------------------------------------------

  test("html→text strips script/style/tags, decodes entities, collapses space") {
    val html = """<html><head><style>p { color: red }</style>
      <script>var x = "<p>";</script></head>
      <body><h1>Board &amp; Governance</h1><p>AI   oversight</p></body></html>"""
    val out = Seq(Tuple1(html)).toDF("h")
      .select(HtmlText.htmlToText(col("h")).as("t")).as[String].collect().head
    assert(out === "Board & Governance AI oversight")
  }

  test("name and committee extraction") {
    val text = "Jane Smith chairs the Technology Committee; John Quincy Public sits on the Audit Committee."
    val r = Seq(Tuple1(text)).toDF("t").select(
      HtmlText.extractNames(col("t")).as("names"),
      HtmlText.extractCommittees(col("t")).as("committees")).collect().head
    val names = r.getSeq[String](0)
    assert(names.contains("Jane Smith"))
    assert(names.contains("John Quincy Public"))
    assert(r.getSeq[String](1).toSet === Set("technology committee", "audit committee"))
  }

  // ---- SectionExtractor (F13) ---------------------------------------------

  test("section extraction: last heading match wins, slices to next section") {
    val filler = "x" * 1200
    val doc = s"""TABLE OF CONTENTS Item 1. Business ... Item 1A. Risk Factors ...
      Item 1. Business\nreal business section $filler
      Item 1A. Risk Factors\nreal risk section $filler
      Item 7. Management's Discussion\nmda section $filler"""
    val sections = SectionExtractor.extract(doc).toMap
    assert(sections.keySet === Set("item_1", "item_1a", "item_7"))
    assert(sections("item_1").contains("real business section"))
    assert(!sections("item_1").contains("TABLE OF CONTENTS"))
    assert(sections("item_1a").contains("real risk section"))
  }

  test("sections under the min length are dropped; oversized are capped") {
    val tiny = "Item 1. Business\nshort"
    assert(SectionExtractor.extract(tiny).isEmpty)
    val big = "Item 1. Business\n" + ("y" * 100000)
    val out = SectionExtractor.extract(big)
    assert(out.head._2.length === SectionExtractor.MaxSectionChars)
  }

  // ---- Chunker (F14) ------------------------------------------------------

  test("chunker: greedy pack to target, 2-paragraph overlap, reindexed") {
    val paras = (1 to 12).map(i => s"paragraph $i " + ("w" * 1400))
    val text = paras.mkString("\n\n")
    val chunks = Chunker.chunk(text)
    assert(chunks.nonEmpty)
    assert(chunks.map(_.index) == chunks.indices.toVector)
    chunks.foreach(c => assert(c.content.length <= Chunker.MaxChars))
    // consecutive chunks share the overlap paragraphs
    chunks.sliding(2).foreach {
      case Vector(a, b) => assert(b.startPar === a.endPar + 1 - Chunker.OverlapParagraphs)
      case _ =>
    }
  }

  test("chunker handles oversized single paragraph via hard split") {
    val text = "z" * 20000
    val chunks = Chunker.chunk(text)
    assert(chunks.map(_.content.length).sum >= 20000 - 10)
    chunks.foreach(c => assert(c.content.length <= Chunker.MaxChars))
  }

  test("chunker is deterministic and nonempty on nonempty text (500 cases)") {
    val rng = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val nParas = rng.nextInt(9)
      val text = Vector.fill(nParas) {
        Vector.fill(1 + rng.nextInt(60))(('a' + rng.nextInt(26)).toChar).mkString
      }.mkString("\n\n")
      val c1 = Chunker.chunk(text)
      val c2 = Chunker.chunk(text)
      assert(c1 == c2)
      assert(text.trim.isEmpty || c1.nonEmpty)
      c1.foreach(c => assert(c.content.length <= Chunker.MaxChars))
    }
  }
}
