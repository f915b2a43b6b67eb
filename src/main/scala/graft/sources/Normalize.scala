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
