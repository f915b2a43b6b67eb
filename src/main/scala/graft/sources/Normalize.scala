package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tolerant normalization of messy semi-structured payloads (reference S6/P6:
  * glassdoor_collector.py — `_first_present` alias-coalescing :507-512,
  * rating normalization :524-558, synthetic review ids :610-613).
  *
  * The reference scrapes "anything that looks like a review" from arbitrary
  * JSON shapes; the Spark-first equivalent is permissive-mode JSON read +
  * a `coalesce` over the alias columns — one projection, no UDFs.
  */
object Normalize {

  /** `coalesce` over alias spellings, first-present-wins (the `_first_present`
    * pattern). Missing columns are tolerated (treated as null). */
  def firstPresent(df: DataFrame, aliases: Seq[String]): Column = {
    val present = aliases.filter(df.columns.contains)
    if (present.isEmpty) lit(null).cast("string")
    else coalesce(present.map(c => col(c).cast("string")): _*)
  }

  /** Rating normalization (F16, glassdoor_collector.py:524-558):
    *   - "4/5" or "4 of 5" style strings → leading number;
    *   - 10-scale values (5 < r ≤ 10) → halve;
    *   - clamp to ≤ 5; non-numeric → null. */
  def normalizeRating(raw: Column): Column = {
    val numStr = regexp_extract(raw.cast("string"), "^\\s*(\\d+(?:\\.\\d+)?)", 1)
    val num = when(numStr === "", lit(null)).otherwise(numStr.cast("double"))
    val rescaled = when(num > 5.0 && num <= 10.0, num / 2.0).otherwise(num)
    // Spark `least` skips nulls — keep non-numeric input null rather than 5.0
    when(rescaled.isNull, lit(null).cast("double"))
      .otherwise(least(lit(5.0), rescaled))
  }

  /** Deterministic synthetic id when the payload has none: sha2 over the
    * identifying fields (glassdoor_collector.py:610-613; SURVEY.md F17 —
    * content-derived ids instead of uuid4 for testability). */
  def syntheticId(cols: Column*): Column =
    sha2(concat_ws("§", cols.map(c => coalesce(c.cast("string"), lit(""))): _*), 256)

  /** Recursive review discovery (S6 parity — glassdoor_collector.py:426-522
    * `_iter_dicts` + `_looks_like_review`): the reference walks ARBITRARY
    * nested JSON and normalizes every dict that looks like a review.
    *
    * Spark-first shape: an iterative bounded-depth frontier walk, all
    * column expressions. Each level probes the node both ways —
    * `from_json(node, map<string,string>)` (non-null iff object; nested
    * values come back as raw JSON text) and `from_json(node,
    * array<string>)` (non-null iff array) — collects object nodes as
    * candidates, and explodes children that still look like containers.
    * No UDFs, no recursion in the plan beyond `maxDepth` stacked
    * explodes; rows fan out only as wide as the payload's actual nesting
    * (explode of an empty child array terminates the branch). At 100 TB
    * the walk stays inside codegen and shuffles nothing.
    *
    * Returns one row per discovered OBJECT, as `_obj: map<string,string>`
    * plus the caller's columns. */
  def discoverObjects(df: DataFrame, jsonCol: String, maxDepth: Int = 8): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StringType}
    val keep = df.columns.filterNot(_ == jsonCol).map(col).toSeq
    var frontier = df.withColumn("_node", col(jsonCol).cast("string"))
    var levels = Vector.empty[DataFrame]
    var probedLevels = Vector.empty[DataFrame]
    for (_ <- 0 until maxDepth) {
      // persist each probed level: level d's lineage embeds levels 0..d-1,
      // so without caching the final union re-parses level 0's JSON
      // maxDepth times (O(depth²) parses instead of O(depth))
      val probed = frontier
        .withColumn("_obj", from_json(col("_node"), MapType(StringType, StringType)))
        .withColumn("_arr", from_json(col("_node"), ArrayType(StringType)))
        .persist()
      probedLevels :+= probed
      levels :+= probed.filter(col("_obj").isNotNull)
        .select(keep :+ col("_obj"): _*)
      frontier = probed
        .select(keep :+ explode(
          when(col("_obj").isNotNull, map_values(col("_obj")))
            .otherwise(coalesce(col("_arr"), array()))).as("_node"): _*)
        .filter(trim(col("_node")).startsWith("{") ||
          trim(col("_node")).startsWith("["))
    }
    // Materialize the union eagerly (localCheckpoint — on a cluster with a
    // checkpoint dir, checkpoint() is the fault-tolerant variant), then
    // release the per-level caches: without this, repeated pipeline use
    // accumulates up to maxDepth cached frames in executor storage.
    val out = levels.reduce(_ unionByName _).localCheckpoint()
    probedLevels.foreach(_.unpersist(false))
    out
  }

  /** Discover + filter + normalize: keep objects with a parseable rating
    * and (any text field OR a date) — `_looks_like_review` — then apply
    * the alias/rating/synthetic-id normalization. */
  def discoverAndNormalizeReviews(df: DataFrame, jsonCol: String,
      maxDepth: Int = 8): DataFrame = {
    val objs = discoverObjects(df, jsonCol, maxDepth)
    def fp(keys: Seq[String]): Column =
      coalesce(keys.map(k => element_at(col("_obj"), k)) :+ lit(null).cast("string"): _*)
    val rating = normalizeRating(
      fp(Seq("rating", "overallRating", "overall_rating", "ratingValue", "score")))
    val title = fp(Seq("title", "reviewTitle", "headline", "summary"))
    val pros = fp(Seq("pros", "prosText", "advantages"))
    val cons = fp(Seq("cons", "consText", "disadvantages"))
    val advice = fp(Seq("adviceToManagement", "advice_to_management"))
    val date = fp(Seq("reviewDate", "review_date", "date", "createdAt", "created_at"))
    val idRaw = fp(Seq("reviewId", "review_id", "id", "uuid", "reviewUUID"))
    val hasText = Seq(title, pros, cons, advice)
      .map(c => trim(coalesce(c, lit(""))) =!= "").reduce(_ || _)
    objs
      .withColumn("rating", rating)
      .withColumn("title", title)
      .withColumn("pros", pros)
      .withColumn("cons", cons)
      .withColumn("advice_to_management", advice)
      .withColumn("review_date", date)
      .filter(col("rating").isNotNull && (hasText || col("review_date").isNotNull))
      .withColumn("review_id", coalesce(idRaw, syntheticId(title, pros, cons)))
      .dropDuplicates("review_id")
      .drop("_obj")
  }

  /** Normalize a messy review frame: alias-coalesced fields + rating +
    * synthetic id + dedup (U2 semantics). */
  def normalizeReviews(df: DataFrame): DataFrame = {
    val idRaw = firstPresent(df, Seq("review_id", "reviewId", "id"))
    val rating = normalizeRating(firstPresent(df, Seq("rating", "overall_rating", "overallRating", "stars")))
    val title = firstPresent(df, Seq("title", "summary", "headline"))
    val pros = firstPresent(df, Seq("pros", "positives"))
    val cons = firstPresent(df, Seq("cons", "negatives"))
    df.withColumn("review_id",
        coalesce(idRaw, Normalize.syntheticId(title, pros, cons)))
      .withColumn("rating", rating)
      .withColumn("title", title)
      .withColumn("pros", pros)
      .withColumn("cons", cons)
      .dropDuplicates("review_id")
  }
}

/** Audit-log sink (reference S11: run_scoring_engine.py:168-188 — one JSON
  * payload row per (run, entity, step)). */
object AuditLog {

  /** Wrap a stage output into audit rows: entity key + step name +
    * `to_json(struct(payload cols))`. Append-only parquet sink. */
  def auditRows(df: DataFrame, runId: String, step: String,
      entityCol: String, payloadCols: Seq[String]): DataFrame =
    df.select(
      lit(runId).as("scoring_run_id"),
      col(entityCol).cast("string").as("entity_id"),
      lit(step).as("step_name"),
      to_json(struct(payloadCols.map(col): _*)).as("output_json"),
      current_timestamp().as("logged_at"))

  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)
}
