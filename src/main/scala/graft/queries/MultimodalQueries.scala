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

  /** Typed rows for the REAL decode stage. */
  final case class MediaText(doc_id: Long, modality: String, text: String)
  final case class MediaDecoded(doc_id: Long, modality: String, n_bytes: Long,
      n_units: Long, f1: Double, f2: Double)

  private val ImgW = 15 // 45-byte rows → 3 pad bytes: exercises row padding
  private val ImgH = 15
  private val NSamples = 256
  private val SampleRate = 8000

  /** REAL decode path: build a genuine BMP (even doc_id) or WAV (odd) from
    * the document's bytes, then run the real pure-JVM decoder
    * ([[graft.multimodal.MediaCodecs]]: header parse, bottom-up rows, row
    * padding, RIFF chunk walk) and extract features from the DECODED
    * structures. Replaces the stub as the flagship multimodal query —
    * the payload bytes derive deterministically from the corpus (byte k =
    * char k mod length; the corpus is ASCII), so the DuckDB oracle can
    * replay the features the decoder must reproduce: the hash gate fails
    * if the codec mangles a single channel byte, row order, padding skip,
    * or sample sign.
    *
    * Features: image → f1 = mean RED channel, f2 = mean BLUE channel
    * (order-invariant over pixels, so bottom-up storage cancels — but
    * CHANNEL mapping must be exact); audio → f1 = RMS amplitude (exact
    * integer sum of squares; sqrt is correctly-rounded IEEE in both
    * engines), f2 = peak |sample|.
    */
  private def decodeReal(item: MediaText): MediaDecoded = {
    import graft.multimodal.MediaCodecs
    val tb = item.text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def cyc(k: Int): Int = tb(k % tb.length) & 0xff
    if (item.modality == "image") {
      val data = Array.tabulate[Byte](ImgW * ImgH * 3)(k => cyc(k).toByte)
      val payload = MediaCodecs.encodeBmp(ImgW, ImgH, data)
      val img = MediaCodecs.decodeBmp(payload)
      var sumR = 0L
      var sumB = 0L
      img.pixels.foreach(_.foreach { case (b, _, r) => sumR += r; sumB += b })
      val n = img.width.toLong * img.height
      MediaDecoded(item.doc_id, item.modality, payload.length.toLong, n,
        sumR.toDouble / n, sumB.toDouble / n)
    } else {
      val samples = Array.tabulate[Short](NSamples)(k => ((cyc(k) - 128) * 256).toShort)
      val payload = MediaCodecs.encodeWav(SampleRate, samples)
      val wav = MediaCodecs.decodeWav(payload)
      var sumSq = 0L
      var peak = 0L
      wav.samples.foreach { s =>
        sumSq += s.toLong * s; if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
      }
      MediaDecoded(item.doc_id, item.modality, payload.length.toLong,
        wav.samples.length.toLong,
        math.sqrt(sumSq.toDouble / wav.samples.length), peak.toDouble)
    }
  }

  private val decodeReal_ = QueryDef(
    "q_multimodal_decode_real",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.documents(s, dir)
        .withColumn("modality",
          when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")))
        .select(col("doc_id"), col("modality"), col("text"))
        .as[MediaText]
      items.mapPartitions(_.map(decodeReal))(Encoders.product[MediaDecoded])
        .toDF()
        .select(col("doc_id"), col("modality"), col("n_bytes"), col("n_units"),
          dround(col("f1"), 4).as("f1"), dround(col("f2"), 4).as("f2"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH img AS (
        SELECT doc_id,
               list_transform(generate_series(2, ${ImgW * ImgH * 3 - 1}, 3),
                 i -> ord(substr(text, CAST((i % n_chars) + 1 AS INT), 1))) AS rb,
               list_transform(generate_series(0, ${ImgW * ImgH * 3 - 1}, 3),
                 i -> ord(substr(text, CAST((i % n_chars) + 1 AS INT), 1))) AS bb
        FROM documents WHERE doc_id % 2 = 0),
      imgf AS (
        SELECT doc_id, 'image' AS modality,
               CAST(${54 + (ImgW * 3 + (4 - (ImgW * 3) % 4) % 4) * ImgH} AS BIGINT) AS n_bytes,
               CAST(${ImgW * ImgH} AS BIGINT) AS n_units,
               CAST(list_sum(rb) AS DOUBLE) / ${ImgW * ImgH} AS f1,
               CAST(list_sum(bb) AS DOUBLE) / ${ImgW * ImgH} AS f2
        FROM img),
      aud AS (
        SELECT doc_id,
               list_transform(generate_series(0, ${NSamples - 1}),
                 k -> (ord(substr(text, CAST((k % n_chars) + 1 AS INT), 1)) - 128) * 256) AS s
        FROM documents WHERE doc_id % 2 = 1),
      audf AS (
        SELECT doc_id, 'audio' AS modality,
               CAST(${44 + NSamples * 2} AS BIGINT) AS n_bytes,
               CAST($NSamples AS BIGINT) AS n_units,
               sqrt(CAST(list_sum(list_transform(s, x -> CAST(x AS BIGINT) * x))
                    AS DOUBLE) / $NSamples) AS f1,
               CAST(list_max(list_transform(s, x -> abs(x))) AS DOUBLE) AS f2
        FROM aud),
      u AS (SELECT * FROM imgf UNION ALL SELECT * FROM audf)
      SELECT doc_id, modality, n_bytes, n_units,
             ${oround("f1", 4)} AS f1, ${oround("f2", 4)} AS f2
      FROM u ORDER BY doc_id"""))

  /** Typed row for the resize stage: one row per pooled cell. */
  final case class PooledCell(doc_id: Long, cell: Long, pooled: Double)

  private val PoolF = 5 // 15×15 → 3×3 mean-pool, 5×5 blocks

  /** REAL image resize: decode the BMP (the same real decoder as
    * q_multimodal_decode_real), then mean-pool the 15×15 pixel grid to
    * 3×3 — the downsample step of a training-data image pipeline
    * (decode → resize → feature), on genuine decoded pixels. Pooled value
    * = mean of (b+g+r) over the 5×5 block (exact integer sum ÷ 75, so
    * both engines agree bit-for-bit). Unlike the order-invariant means in
    * the decode query, pooling is POSITION-SENSITIVE: a decoder that
    * flips row order or mislays padding moves bytes between blocks and
    * the hash gate fails. */
  private def resizeReal(item: MediaText): Iterator[PooledCell] = {
    import graft.multimodal.MediaCodecs
    val tb = item.text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def cyc(k: Int): Int = tb(k % tb.length) & 0xff
    val data = Array.tabulate[Byte](ImgW * ImgH * 3)(k => cyc(k).toByte)
    val img = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(ImgW, ImgH, data))
    val cells = ImgW / PoolF
    Iterator.tabulate(cells * cells) { c =>
      val cy = c / cells
      val cx = c % cells
      var sum = 0L
      var dy = 0
      while (dy < PoolF) {
        var dx = 0
        while (dx < PoolF) {
          val (b, g, r) = img.pixels(cy * PoolF + dy)(cx * PoolF + dx)
          sum += b + g + r
          dx += 1
        }
        dy += 1
      }
      PooledCell(item.doc_id, c.toLong, sum.toDouble / (PoolF * PoolF * 3))
    }
  }

  private val resizeReal_ = QueryDef(
    "q_multimodal_resize",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.documents(s, dir)
        .filter(col("doc_id") % 2 === 0) // the image half of the corpus
        .select(col("doc_id"), lit("image").as("modality"), col("text"))
        .as[MediaText]
      items.mapPartitions(_.flatMap(resizeReal))(Encoders.product[PooledCell])
        .toDF()
        .select(col("doc_id"), col("cell"),
          dround(col("pooled"), 4).as("pooled"))
        .orderBy("doc_id", "cell")
    },
    // replay: cell c covers pixels (5·(c÷3)+dy, 5·(c mod 3)+dx); pixel
    // (y,x) channel ch is payload byte ((y·15+x)·3+ch) = text byte cyclic.
    // j enumerates (dy, dx, ch) as j = (dy·5+dx)·3+ch.
    Some(s"""
      WITH cells AS (SELECT unnest(generate_series(0, 8)) AS cell),
        px AS (
          SELECT d.doc_id, c.cell,
                 list_transform(generate_series(0, ${PoolF * PoolF * 3 - 1}),
                   j -> ord(substr(d.text, CAST((
                     (((c.cell // 3) * $PoolF + (j // ${PoolF * 3})) * $ImgW
                       + (c.cell % 3) * $PoolF + ((j % ${PoolF * 3}) // 3)) * 3
                     + j % 3) % d.n_chars + 1 AS INT), 1))) AS bs
          FROM documents d CROSS JOIN cells c
          WHERE d.doc_id % 2 = 0)
      SELECT doc_id, CAST(cell AS BIGINT) AS cell,
             ${oround(s"CAST(list_sum(bs) AS DOUBLE) / ${PoolF * PoolF * 3}", 4)}
               AS pooled
      FROM px ORDER BY doc_id, cell"""))

  /** One row per audio doc: sign-change count over the REAL decoded
    * sample stream. */
  final case class ZcrRow(doc_id: Long, n_samples: Long, n_crossings: Long)

  /** Zero-crossing rate over genuinely decoded WAV samples — the
    * position-SENSITIVE audio twin of the resize query: RMS/peak are
    * order-invariant, but a crossing count depends on consecutive-sample
    * ADJACENCY, so a decoder that drops/reorders/sign-flips any sample
    * moves the count and fails the hash gate. A crossing is a strict
    * sign change (product < 0, integer compare — zeros never count,
    * identically in both engines). */
  private def zcrReal(item: MediaText): ZcrRow = {
    import graft.multimodal.MediaCodecs
    val tb = item.text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def cyc(k: Int): Int = tb(k % tb.length) & 0xff
    val samples = Array.tabulate[Short](NSamples)(k => ((cyc(k) - 128) * 256).toShort)
    val wav = MediaCodecs.decodeWav(MediaCodecs.encodeWav(SampleRate, samples))
    var crossings = 0L
    var i = 1
    while (i < wav.samples.length) {
      if (wav.samples(i - 1).toLong * wav.samples(i) < 0) crossings += 1
      i += 1
    }
    ZcrRow(item.doc_id, wav.samples.length.toLong, crossings)
  }

  private val zcrAudio = QueryDef(
    "q_zcr_audio",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.documents(s, dir)
        .filter(col("doc_id") % 2 === 1) // the audio half of the corpus
        .select(col("doc_id"), lit("audio").as("modality"), col("text"))
        .as[MediaText]
      items.mapPartitions(_.map(zcrReal))(Encoders.product[ZcrRow])
        .toDF()
        .select(col("doc_id"), col("n_samples"), col("n_crossings"),
          dround(col("n_crossings").cast("double") / (col("n_samples") - 1), 6)
            .as("zcr"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH aud AS (
        SELECT doc_id,
               list_transform(generate_series(0, ${NSamples - 1}),
                 k -> (ord(substr(text, CAST((k % n_chars) + 1 AS INT), 1)) - 128) * 256) AS s
        FROM documents WHERE doc_id % 2 = 1),
      cr AS (
        SELECT doc_id, CAST($NSamples AS BIGINT) AS n_samples,
               CAST(list_sum(list_transform(generate_series(2, $NSamples),
                 k -> CASE WHEN CAST(s[CAST(k AS INT) - 1] AS BIGINT)
                                * s[CAST(k AS INT)] < 0
                           THEN 1 ELSE 0 END)) AS BIGINT) AS n_crossings
        FROM aud)
      SELECT doc_id, n_samples, n_crossings,
             ${oround(s"CAST(n_crossings AS DOUBLE) / ($NSamples - 1)", 6)} AS zcr
      FROM cr ORDER BY doc_id"""))

  override def queries: Seq[QueryDef] =
    Seq(payloadStats, frameFeatures, decodePipeline, decodeReal_, resizeReal_,
      zcrAudio)
}
