package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  // ---- Upsert / dedup gate ------------------------------------------------

  test("lastWins: incoming replaces base on key; latest order wins; ties prefer incoming") {
    val base = Seq(("k1", 1L, "old"), ("k2", 5L, "keep")).toDF("k", "ts", "v")
    val incoming = Seq(("k1", 2L, "new"), ("k2", 5L, "tie-incoming"), ("k3", 1L, "insert"))
      .toDF("k", "ts", "v")
    val out = Upsert.lastWins(base, incoming, Seq("k"), Seq("ts"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq == Seq(("k1", "new"), ("k2", "tie-incoming"), ("k3", "insert")))
  }

  test("dedupGate drops already-seen hashes only") {
    val seen = Seq("h1", "h2").toDF("content_hash")
    val incoming = Seq(("h2", "dup"), ("h3", "fresh")).toDF("content_hash", "v")
    val out = Upsert.dedupGate(incoming, seen, "content_hash")
      .select("v").as[String].collect()
    assert(out.toSeq == Seq("fresh"))
  }

  test("recursive discovery finds review objects at any nesting depth") {
    // 3+ levels of object/array nesting, including array-of-array, mirroring
    // the reference's walk of "anything that looks like a review"
    val payload = """{"data":{"employerReviews":{"reviews":[
        {"reviewId":"r1","overallRating":4,"pros":"good pay"},
        {"id":"r2","rating":"8/10","reviewDate":"2024-01-01"},
        {"note":"not a review"}],
      "meta":{"nested":[{"deep":[{"score":5,"headline":"wow"}]}]}}},
      "other":[[{"ratingValue":3,"cons":"meh"}]]}""".replaceAll("\n\\s*", "")
    val df = Seq(("p1", payload)).toDF("source_id", "payload")
    val out = Normalize.discoverAndNormalizeReviews(df, "payload")
      .select("rating", "title", "pros", "cons").collect()
    val ratings = out.map(_.getAs[Double]("rating")).sorted.toSeq
    // r1 → 4.0; r2 "8/10" → 10-scale halved → 4.0; score 5 → 5.0;
    // ratingValue 3 → 3.0; the no-rating dict and container dicts dropped
    assert(ratings == Seq(3.0, 4.0, 4.0, 5.0))
    assert(out.exists(r => r.getAs[String]("title") == "wow"))
    assert(out.exists(r => r.getAs[String]("cons") == "meh"))
  }

  // ---- Normalize (S6/P6/F16/U2) ------------------------------------------

  test("firstPresent coalesces alias spellings and tolerates missing columns") {
    val df = Seq((null: String, "via-alias"), ("primary", "ignored"))
      .toDF("rating", "overall_rating")
    val out = df.select(Normalize.firstPresent(df, Seq("rating", "overall_rating", "nope"))
      .as("r")).as[String].collect()
    assert(out.toSeq == Seq("via-alias", "primary"))
    // no alias present at all → null column, not an error
    val none = df.select(Normalize.firstPresent(df, Seq("missing")).as("r")).collect()
    assert(none.forall(_.isNullAt(0)))
  }

  test("rating normalization: 10-scale halved, '4/5' parsed, clamped, junk → null") {
    val df = Seq("8", "4/5", "4.5", "11", "junk").toDF("raw")
    val out = df.select(Normalize.normalizeRating(col("raw")).as("r")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(4.0), Some(4.0), Some(4.5), Some(5.0), None))
  }

  test("normalizeReviews: synthetic sha2 id fills gaps; duplicate ids collapse") {
    val df = Seq(
      ("r1", "5", "great", "p", "c"),
      (null, "3", "meh", "p2", "c2"),
      (null, "3", "meh", "p2", "c2"), // same content → same synthetic id → dedup
      ("r1", "5", "great-dup", "p", "c")) // same explicit id → dedup
      .toDF("review_id", "rating", "title", "pros", "cons")
    val out = Normalize.normalizeReviews(df)
    assert(out.count() === 2)
    assert(out.filter(col("review_id") === "r1").count() === 1)
  }

  // ---- AuditLog (S11) -----------------------------------------------------

  test("audit rows wrap stage outputs as JSON and append to parquet") {
    val dir = Files.createTempDirectory("graft-audit").toString
    val stage = Seq((7L, 61.5, "Advanced")).toDF("entity_id", "score", "band")
    val rows = AuditLog.auditRows(stage, "run-1", "composite", "entity_id",
      Seq("score", "band"))
    AuditLog.append(rows, s"$dir/audit")
    AuditLog.append(rows, s"$dir/audit") // append semantics
    val back = spark.read.parquet(s"$dir/audit")
    assert(back.count() === 2)
    val r = back.head()
    assert(r.getAs[String]("step_name") === "composite")
    assert(r.getAs[String]("output_json").contains("\"band\":\"Advanced\""))
  }
}
