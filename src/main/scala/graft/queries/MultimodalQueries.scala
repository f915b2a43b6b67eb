package graft.queries

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Det.{dround, oround}

/** Multimodal-column plumbing (builder brief): treat media as opaque
  * `binary` payloads with typed metadata; decode/feature-extract runs as a
  * partition-local stage with a clearly-marked deterministic STUB where a
  * real image/audio codec would sit (no media libs in this container).
  *
  * The Spark-side plumbing is real: binary column, metadata schema, batch
  * shape (mapPartitions over a typed Dataset), partitioning by modality.
  * At 100 TB payloads live in parquet binary columns partitioned by
  * (modality, date); the decode stage is the only non-codegen hop and is
  * isolated so everything before/after stays columnar.
  */
object MultimodalQueries extends QueryModule {

  // -- binary payload statistics: sizes, hashes, chunk counts (pure column
  //    expressions over an encode()-derived binary column)
  private val payloadStats = QueryDef(
    "q_binary_payload_stats",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("payload", encode(col("text"), "utf-8"))
        .withColumn("modality",
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")))
      d.groupBy("modality")
        .agg(count(lit(1)).as("n_items"),
          sum(octet_length(col("payload"))).as("total_bytes"),
          countDistinct(sha2(col("payload"), 256)).as("n_distinct_payloads"),
          sum(expr("(octet_length(payload) + 255) div 256")).as("n_chunks"),
          min(octet_length(col("payload"))).as("min_bytes"),
          max(octet_length(col("payload"))).as("max_bytes"))
        .orderBy("modality")
    },
    Some("""
      WITH d AS (SELECT doc_id, text,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   encode(text) AS payload
                 FROM documents)
      SELECT modality, count(*) AS n_items,
             CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
             count(DISTINCT sha256(text)) AS n_distinct_payloads,
             CAST(sum((octet_length(payload) + 255) // 256) AS BIGINT) AS n_chunks,
             min(octet_length(payload)) AS min_bytes,
             max(octet_length(payload)) AS max_bytes
      FROM d GROUP BY modality ORDER BY modality"""))

  // -- frame sampling + feature extraction as column expressions: sample
  //    every 64th byte ("frame"), feature = mean sampled byte value. The
  //    byte-level access is real; a codec would replace `ascii(substr(...))`.
  private val frameFeatures = QueryDef(
    "q_multimodal_frame_features",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("modality",
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")))
        .withColumn("frames", expr(
          "transform(sequence(1, n_chars, 64), p -> ascii(substring(text, p, 1)))"))
      d.select(col("doc_id"), col("modality"), col("n_chars"),
          size(col("frames")).as("n_frames"),
          dround(expr(
            "aggregate(frames, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / size(frames)"), 4)
            .as("mean_frame_value"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH d AS (SELECT doc_id, n_chars,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   list_transform(generate_series(1, n_chars, 64),
                     p -> ord(substr(text, CAST(p AS INT), 1))) AS frames
                 FROM documents)
      SELECT doc_id, modality, n_chars,
             len(frames) AS n_frames,
             ${oround("CAST(list_sum(frames) AS DOUBLE) / len(frames)", 4)} AS mean_frame_value
      FROM d ORDER BY doc_id"""))

  /** Typed row for the partition-local decode stage. */
  final case class MediaItem(doc_id: Long, modality: String, payload: Array[Byte])
  final case class MediaFeature(doc_id: Long, modality: String, n_bytes: Int,
      n_frames: Int, feature: Double)

  /** STUB decoder — a real implementation would invoke an image/audio codec
    * here; this deterministic fake keeps the batch shape and schema real.
    * Samples every 64th byte and averages (matches q_multimodal_frame_features
    * for ASCII payloads). */
  private def decodeStub(item: MediaItem): MediaFeature = {
    val sampled = item.payload.indices.collect {
      case i if i % 64 == 0 => item.payload(i) & 0xff
    }
    MediaFeature(item.doc_id, item.modality, item.payload.length, sampled.length,
      if (sampled.isEmpty) 0.0 else sampled.map(_.toDouble).sum / sampled.length)
  }

  // -- the mapPartitions pipeline variant: binary → typed Dataset →
  //    partition-local decode (stub) → columnar result. The stub decoder is
  //    deterministic (every-64th-byte mean), and the corpus is ASCII (byte i
  //    == char i+1), so the oracle reproduces it in SQL — the one
  //    engine-side-code stage in the suite still gets a full hash check.
  private val decodePipeline = QueryDef(
    "q_multimodal_decode_stub",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.documents(s, dir)
        .withColumn("modality",
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")))
        .select(col("doc_id"), col("modality"), encode(col("text"), "utf-8").as("payload"))
        .repartition(col("modality"))
        .as[MediaItem]
      items.mapPartitions(_.map(decodeStub))(Encoders.product[MediaFeature])
        .toDF()
        .select(col("doc_id"), col("modality"), col("n_bytes"), col("n_frames"),
          dround(col("feature"), 4).as("feature"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH d AS (SELECT doc_id, text,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   octet_length(encode(text)) AS n_bytes
                 FROM documents),
        f AS (SELECT doc_id, modality, n_bytes,
                list_transform(generate_series(1, n_bytes, 64),
                  p -> ord(substr(text, CAST(p AS INT), 1))) AS frames
              FROM d)
      SELECT doc_id, modality, n_bytes, len(frames) AS n_frames,
             ${oround("CAST(list_sum(frames) AS DOUBLE) / len(frames)", 4)} AS feature
      FROM f ORDER BY doc_id"""),
    bench = false)

  override def queries: Seq[QueryDef] = Seq(payloadStats, frameFeatures, decodePipeline)
}
