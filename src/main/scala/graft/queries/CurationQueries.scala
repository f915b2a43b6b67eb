package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Det.{dround, oround}

/** Corpus-curation operators a large-scale training-data pipeline runs after
  * filtering/dedup and before tokenization: per-source retention caps,
  * stratified down-sampling to a target language mix, and token-budget shard
  * packing. Companions to TextQueries' quality/mixture family (builder
  * brief; the reference's own pipeline caps evidence per collector the same
  * way, e.g. the per-query result caps in
  * pe-org-air-platform/app/pipelines/external_signals.py).
  *
  * Scale design notes are per-operator below; the common theme is that every
  * window is PARTITIONED (by source, lang, or (lang, bucket)) — the one
  * inherently sequential step, the cross-document running token total, is
  * computed with the same bucketed two-pass prefix sum ScorePipeline uses
  * for percentiles, so no 100 TB column ever funnels through one task.
  */
object CurationQueries extends QueryModule {

  /** Keep the top-`Cap` docs per source by token count (tie: doc_id). */
  private val Cap = 15

  // -- per-source retention caps: rank docs within each source by length,
  //    report kept/dropped mass. The window is partitioned by source, so at
  //    100 TB it is embarrassingly parallel across sources; the rank is
  //    consumed as a conditional aggregate (kept vs dropped), not a filter,
  //    because the DROPPED mass is part of the report.
  private val sourceCaps = QueryDef(
    "q_source_caps",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("toks", size(split(col("text"), " ")).cast("long"))
      val win = Window.partitionBy("source")
        .orderBy(col("toks").desc, col("doc_id").asc)
      d.withColumn("rn", row_number().over(win))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rn") <= Cap, 1L).otherwise(0L)).as("n_kept"),
          sum("toks").as("tokens_total"),
          sum(when(col("rn") <= Cap, col("toks")).otherwise(0L))
            .as("tokens_kept"))
        .withColumn("token_keep_pct",
          dround(col("tokens_kept").cast("double")
            / col("tokens_total") * 100, 2))
        .orderBy("source")
    },
    Some(s"""
      WITH d AS (SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
                 FROM documents),
        r AS (SELECT *, row_number() OVER (PARTITION BY source
                ORDER BY toks DESC, doc_id ASC) AS rn FROM d),
        agg AS (SELECT source, count(*) AS n_docs,
                  CAST(sum(CASE WHEN rn <= $Cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                  CAST(sum(toks) AS BIGINT) AS tokens_total,
                  CAST(sum(CASE WHEN rn <= $Cap THEN toks ELSE 0 END) AS BIGINT)
                    AS tokens_kept
                FROM r GROUP BY source)
      SELECT source, n_docs, n_kept, tokens_total, tokens_kept,
             ${oround("CAST(tokens_kept AS DOUBLE) / tokens_total * 100", 2)}
               AS token_keep_pct
      FROM agg ORDER BY source"""))

  // -- stratified Bernoulli down-sample to a target language mix: each doc
  //    draws a deterministic LCG uniform from its id (reproducible under any
  //    partitioning) and survives iff u < rate(lang). TWO scramble rounds,
  //    not one: after a single round, consecutive small ids map to
  //    uniforms ≈ id·69069/2^32 — tiny and ordered, so a threshold test
  //    keeps everything (a rank key tolerates that; a Bernoulli draw does
  //    not). The second multiply wraps mod 2^32 and mixes. Pure scan +
  //    aggregate: zero windows, zero shuffles beyond the final 5-row
  //    rollup — the cheapest possible shape at 100 TB. Complements
  //    q_mixture_rates (PLANS the rates) and q_weighted_sample (global
  //    quality-weighted top-k).
  private val stratifiedSample = QueryDef(
    "q_stratified_sample",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("toks", size(split(col("text"), " ")).cast("long"))
        // en dominates the corpus → cut to a quarter; the rest pass at 60%
        .withColumn("rate",
          when(col("lang") === "en", lit(0.25)).otherwise(lit(0.60)))
        .withColumn("u",
          ((((((col("doc_id") % lit(4294967296L)) * lit(69069L) + lit(12345L))
            % lit(4294967296L)) * lit(1664525L) + lit(1013904223L))
            % lit(4294967296L)).cast("double") + lit(0.5)) / lit(4294967296.0))
        .withColumn("kept", (col("u") < col("rate")).cast("long"))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum("kept").as("n_kept"),
          sum(col("kept") * col("toks")).as("tokens_kept"),
          dround(min(col("rate")), 2).as("target_rate"))
        .withColumn("eff_rate",
          dround(col("n_kept").cast("double") / col("n_total"), 4))
        .orderBy("lang")
    },
    Some(s"""
      WITH d AS (SELECT lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
                   CASE WHEN lang = 'en' THEN CAST(0.25 AS DOUBLE)
                        ELSE CAST(0.60 AS DOUBLE) END AS rate,
                   ((((doc_id % 4294967296) * 69069 + 12345) % 4294967296
                      * 1664525 + 1013904223) % 4294967296 + 0.5)
                     / 4294967296 AS u
                 FROM documents),
        k AS (SELECT lang, toks, rate,
                CASE WHEN u < rate THEN 1 ELSE 0 END AS kept
              FROM d)
      SELECT lang, count(*) AS n_total,
             CAST(sum(kept) AS BIGINT) AS n_kept,
             CAST(sum(kept * toks) AS BIGINT) AS tokens_kept,
             ${oround("min(rate)", 2)} AS target_rate,
             ${oround("CAST(sum(kept) AS DOUBLE) / count(*)", 4)} AS eff_rate
      FROM k GROUP BY lang ORDER BY lang"""))

  /** Shard token budget for [[tokenShards]]. */
  private val Budget = 2000L

  // -- token-budget shard packing: assign docs (in (lang, doc_id) order) to
  //    training shards of ~Budget tokens by their cumulative-token START
  //    offset. The running total is the textbook scale trap — a naive
  //    `sum() OVER (PARTITION BY lang ORDER BY doc_id)` serializes each
  //    language through one task. Instead: bucketed two-pass prefix sum
  //    (ScorePipeline's percentile pattern): (1) an intra-bucket running sum
  //    partitioned by (lang, bucket) — parallel; (2) per-bucket totals,
  //    whose own running sum is a window over ONLY n_buckets rows — tiny;
  //    (3) global offset = bucket offset + intra-bucket cumsum. PlanSpec
  //    asserts no unpartitioned window touches the document frame.
  private val tokenShards = QueryDef(
    "q_token_shards",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("toks", size(split(col("text"), " ")).cast("long"))
        .withColumn("bucket", expr("doc_id div 100"))
      val wIntra = Window.partitionBy("lang", "bucket").orderBy("doc_id")
      val intra = d.withColumn("cum_in", sum("toks").over(wIntra))
      val wOff = Window.partitionBy("lang").orderBy("bucket")
      val off = d.groupBy("lang", "bucket").agg(sum("toks").as("bt"))
        .withColumn("off", sum("bt").over(wOff) - col("bt"))
        .select("lang", "bucket", "off")
      intra.join(off, Seq("lang", "bucket"))
        .withColumn("shard", expr(s"(cum_in + off - toks) div $Budget"))
        .groupBy("lang", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("shard_tokens"))
        .orderBy("lang", "shard")
    },
    Some(s"""
      WITH d AS (SELECT doc_id, lang, doc_id // 100 AS bucket,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
                 FROM documents),
        intra AS (SELECT *, CAST(sum(toks) OVER (PARTITION BY lang, bucket
                    ORDER BY doc_id) AS BIGINT) AS cum_in FROM d),
        bt AS (SELECT lang, bucket, CAST(sum(toks) AS BIGINT) AS bt
               FROM d GROUP BY lang, bucket),
        os AS (SELECT lang, bucket,
                 CAST(sum(bt) OVER (PARTITION BY lang ORDER BY bucket)
                   AS BIGINT) - bt AS off
               FROM bt)
      SELECT i.lang, (i.cum_in + o.off - i.toks) // $Budget AS shard,
             count(*) AS n_docs, CAST(sum(i.toks) AS BIGINT) AS shard_tokens
      FROM intra i JOIN os o ON i.lang = o.lang AND i.bucket = o.bucket
      GROUP BY i.lang, shard ORDER BY i.lang, shard"""))

  /** Morton key geometry shared by the Spark query and the oracle twin:
    * 8 bits per dimension, 2 dimensions → 16-bit key; the top 4 key bits
    * (2 per dim) name one cell of a 4×4 grid. */
  private val ZBits = 8

  // -- Z-order layout audit (graft.operators.ZOrder): scale customer key
  //    and order date into [0, 256), interleave their bits into a Morton
  //    key, and report each top-level quadrant's row count and per-dim
  //    bounding box. The CLAIM a z-ordered layout makes at 100 TB is that
  //    any contiguous key range bounds EVERY interleaved dimension — so
  //    parquet min/max stats prune multi-dim range queries on files sorted
  //    by this one key. The oracle certifies the bit math cross-engine;
  //    the bounding boxes in the output (each dim confined to a 64-wide
  //    band per quadrant) are the pruning guarantee made visible.
  //    ZOrderSpec asserts the file-level version on a real layout() write.
  private val zorderQuadrants = QueryDef(
    "q_zorder_quadrants",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
      val ext = o.agg(max("o_custkey").as("maxc"),
        min("od").as("mind"), max("od").as("maxd"))
      val scaled = o.crossJoin(broadcast(ext))
        .withColumn("cb", expr("o_custkey * 256 DIV (maxc + 1)"))
        .withColumn("db", expr(
          "CAST(datediff(od, mind) AS BIGINT) * 256" +
            " DIV (CAST(datediff(maxd, mind) AS BIGINT) + 1)"))
      scaled
        .withColumn("zkey", graft.operators.ZOrder.mortonKey(
          Seq(col("cb"), col("db")), ZBits))
        .withColumn("quadrant", expr("zkey DIV 4096"))
        .groupBy("quadrant")
        .agg(count(lit(1)).as("n"),
          min("cb").as("min_cb"), max("cb").as("max_cb"),
          min("db").as("min_db"), max("db").as("max_db"))
        .orderBy("quadrant")
    },
    Some {
      val morton = (0 until ZBits).map { i =>
        s"(((cb >> $i) & 1) << ${2 * i}) | (((db >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" | ")
      s"""
      WITH ext AS (SELECT max(o_custkey) AS maxc,
                     min(CAST(o_orderdate AS DATE)) AS mind,
                     max(CAST(o_orderdate AS DATE)) AS maxd
                   FROM orders),
        s AS (SELECT o_custkey * 256 // (maxc + 1) AS cb,
                (date_diff('day', mind, CAST(o_orderdate AS DATE)) * 256)
                  // (date_diff('day', mind, maxd) + 1) AS db
              FROM orders, ext),
        k AS (SELECT cb, db, $morton AS zkey FROM s)
      SELECT zkey // 4096 AS quadrant, count(*) AS n,
             min(cb) AS min_cb, max(cb) AS max_cb,
             min(db) AS min_db, max(db) AS max_db
      FROM k GROUP BY 1 ORDER BY 1"""
    })

  // -- per-language adaptive quality gate (the CCNet shape, Wenzek et al.
  //    2019: bucket each language's corpus by a per-language score
  //    quantile instead of one global threshold). The cutoff is the
  //    per-lang p25 computed by HistQuantiles.groupedQuantile — histogram
  //    windows PARTITIONED BY lang, shuffle traffic = distinct (lang,
  //    value) pairs — then broadcast back for the keep/drop count. Here
  //    the gate scores on n_chars (an exact integer, so cutoff
  //    interpolation a + 0.25·(b−a) is bit-identical cross-engine);
  //    production plugs in the per-doc LM score (q_unigram_logprob) with
  //    grid quantization, same plan shape.
  private val langQualityGate = QueryDef(
    "q_lang_quality_gate",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars"))
      val cuts = graft.operators.HistQuantiles
        .groupedQuantile(d, "lang", col("n_chars"), 0.25)
        .withColumnRenamed("value", "cut")
      d.join(broadcast(cuts), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          dround(min(col("cut")), 4).as("p25_cut"),
          sum(when(col("n_chars").cast("double") >= col("cut"), 1L)
            .otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    },
    Some(s"""
      WITH cuts AS (SELECT lang, quantile_cont(n_chars, 0.25) AS cut
                    FROM documents GROUP BY lang)
      SELECT d.lang, count(*) AS n_docs,
             ${oround("min(c.cut)", 4)} AS p25_cut,
             CAST(sum(CASE WHEN d.n_chars >= c.cut THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM documents d JOIN cuts c ON d.lang = c.lang
      GROUP BY d.lang ORDER BY d.lang"""))

  // -- curation funnel: the per-stage attrition audit every corpus build
  //    publishes (Dolma / CCNet / RefinedWeb report exactly this table) —
  //    ingested → language routing → quality rules → exact dedup, each
  //    stage applied to the previous stage's survivors, with absolute and
  //    cumulative-percent attrition. Rules are engine-cheap on purpose
  //    (the heavy per-rule machinery is certified by its own queries:
  //    q_lang_quality_gate, q_doc_quality, q_exact_dedup); THIS query
  //    certifies the sequential composition and its accounting.
  //
  //    Scale: one scan computes all flags; the only shuffle is the dedup
  //    window keyed by content hash (partitioned, no funnel); the stage
  //    table is built from ONE scalar aggregate row — no lag() window.
  private val curationFunnel = QueryDef(
    "q_curation_funnel",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .withColumn("char_mass", length(col("text")) - (col("n_toks") - 1))
        .withColumn("lang_ok", col("lang") =!= "zh")
        .withColumn("qual_ok", col("lang_ok") && col("n_toks") >= 10 &&
          col("char_mass") <= col("n_toks") * 12)
      val wDup = Window.partitionBy(sha2(col("text"), 256))
        .orderBy(col("doc_id").asc)
      val deduped = d.filter(col("qual_ok"))
        .withColumn("rn", row_number().over(wDup))
      val n3 = deduped.agg(sum(when(col("rn") === 1, 1L).otherwise(0L))
        .cast("long").as("n3"))
      val counts = d.agg(
          count(lit(1)).as("n0"),
          sum(when(col("lang_ok"), 1L).otherwise(0L)).cast("long").as("n1"),
          sum(when(col("qual_ok"), 1L).otherwise(0L)).cast("long").as("n2"))
        .crossJoin(n3)
      counts.select(expr(
          """stack(4,
               '0_ingested', n0, CAST(0 AS BIGINT),
               '1_lang_route', n1, n0 - n1,
               '2_quality_rules', n2, n1 - n2,
               '3_exact_dedup', n3, n2 - n3) AS (stage, n_docs, n_dropped)"""),
          col("n0"))
        .withColumn("pct_of_ingested",
          dround(col("n_docs").cast("double") / col("n0") * 100, 2))
        .drop("n0")
        .orderBy("stage")
    },
    Some(s"""
      WITH f AS (SELECT doc_id, lang, text,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                   CAST(length(text) - (len(string_split(text, ' ')) - 1)
                     AS BIGINT) AS char_mass
                 FROM documents),
        flags AS (SELECT *,
                    (lang <> 'zh') AS lang_ok,
                    (lang <> 'zh' AND n_toks >= 10 AND char_mass <= n_toks * 12)
                      AS qual_ok
                  FROM f),
        ded AS (SELECT *, row_number() OVER (PARTITION BY sha256(text)
                  ORDER BY doc_id ASC) AS rn
                FROM flags WHERE qual_ok),
        c AS (SELECT
                (SELECT count(*) FROM flags) AS n0,
                (SELECT CAST(count(*) AS BIGINT) FROM flags WHERE lang_ok) AS n1,
                (SELECT CAST(count(*) AS BIGINT) FROM flags WHERE qual_ok) AS n2,
                (SELECT CAST(count(*) AS BIGINT) FROM ded WHERE rn = 1) AS n3),
        st AS (
          SELECT '0_ingested' AS stage, n0 AS n_docs, CAST(0 AS BIGINT) AS n_dropped, n0 FROM c
          UNION ALL SELECT '1_lang_route', n1, n0 - n1, n0 FROM c
          UNION ALL SELECT '2_quality_rules', n2, n1 - n2, n0 FROM c
          UNION ALL SELECT '3_exact_dedup', n3, n2 - n3, n0 FROM c)
      SELECT stage, n_docs, n_dropped,
             ${oround("CAST(n_docs AS DOUBLE) / n0 * 100", 2)} AS pct_of_ingested
      FROM st ORDER BY stage"""))

  // -- deterministic stratified train/val/test split (80/10/10): the
  //    assignment every training pipeline must make REPRODUCIBLY — a
  //    doc's split is a pure function of its id (two-step integer LCG →
  //    uniform), so re-running the pipeline, adding machines, or
  //    re-partitioning the corpus can never move a document between
  //    splits (the leakage class that silently contaminates eval sets
  //    when splits are assigned by rand()). The census certifies both
  //    the assignment arithmetic and the per-language balance.
  //
  //    Scale: the split column is a codegen'd projection — zero shuffles
  //    before the (lang, split) rollup; at 100 TB the same expression is
  //    the partition key the corpus is written under.
  private val datasetSplit = QueryDef(
    "q_dataset_split",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("u",
          ((((((col("doc_id") % lit(4294967296L)) * lit(69069L) + lit(1L))
            % lit(4294967296L)) * lit(22695477L) + lit(1L))
            % lit(4294967296L)).cast("double") + lit(0.5)) / lit(4294967296.0))
        .withColumn("split",
          when(col("u") < 0.8, lit("train"))
            .when(col("u") < 0.9, lit("val"))
            .otherwise(lit("test")))
      val byLang = d.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      d.groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))
        .join(byLang, "lang")
        .select(col("lang"), col("split"), col("n_docs"),
          dround(col("n_docs").cast("double") / col("n_lang"), 4).as("share"))
        .orderBy("lang", "split")
    },
    Some(s"""
      WITH d AS (SELECT lang,
                   ((((doc_id % 4294967296) * 69069 + 1) % 4294967296
                      * 22695477 + 1) % 4294967296 + 0.5)
                     / 4294967296 AS u
                 FROM documents),
        sp AS (SELECT lang,
                 CASE WHEN u < 0.8 THEN 'train'
                      WHEN u < 0.9 THEN 'val'
                      ELSE 'test' END AS split
               FROM d),
        byl AS (SELECT lang, count(*) AS n_lang FROM sp GROUP BY lang)
      SELECT sp.lang, split, count(*) AS n_docs,
             ${oround("CAST(count(*) AS DOUBLE) / any_value(n_lang)", 4)}
               AS share
      FROM sp JOIN byl ON sp.lang = byl.lang
      GROUP BY sp.lang, split ORDER BY sp.lang, split"""))

  // -- Differentially-private release of per-nation customer counts:
  //    Laplace mechanism with ε=1 (count sensitivity 1 → scale b=1), the
  //    governance primitive for publishing corpus statistics without
  //    exposing individuals. Noise is the inverse-CDF transform of the
  //    shared LCG uniform seeded by the nation key — deterministic in
  //    BOTH engines (the q_weighted_sample discipline), so the "random"
  //    release is certifiable; swap the seed column for a fresh nonce per
  //    release in production. Counts are one map-side-combinable
  //    aggregate; the noise is a scalar expression per group row.
  private val dpNoisyCounts = QueryDef(
    "q_dp_noisy_counts",
    (s, dir) => {
      val u = "(((((n_nationkey % 4294967296) * 69069 + 12345)" +
        " % 4294967296) * 1664525 + 1013904223) % 4294967296" +
        " + 0.5) / 4294967296.0"
      val counts = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_nationkey", "n_name").agg(count(lit(1)).as("n"))
      counts
        .withColumn("uc", expr(u) - 0.5)
        .withColumn("noise", -signum(col("uc"))
          * log(lit(1.0) - lit(2.0) * abs(col("uc"))))
        .select(col("n_name"), lit(1.0).as("epsilon"),
          dround(col("n") + col("noise"), 4).as("noisy_n"))
        .orderBy("n_name")
    },
    Some {
      val u = "(((((n_nationkey % 4294967296) * 69069 + 12345)" +
        " % 4294967296) * 1664525 + 1013904223) % 4294967296" +
        " + 0.5) / 4294967296.0"
      s"""
      WITH counts AS (SELECT n_nationkey, n_name,
                        CAST(count(*) AS BIGINT) AS n
                      FROM customer JOIN nation ON c_nationkey = n_nationkey
                      GROUP BY 1, 2),
        noise AS (SELECT n_name, n, ($u) - 0.5 AS uc FROM counts)
      SELECT n_name, CAST(1.0 AS DOUBLE) AS epsilon,
             ${oround("n + (-sign(uc) * ln(1.0 - 2.0 * abs(uc)))", 4)}
               AS noisy_n
      FROM noise ORDER BY n_name"""
    })

  // -- T5-style span-corruption statistics: tokens group into
  //    consecutive length-3 spans, and a span masks when its seeded LCG
  //    uniform (keyed by doc_id and span index — replayable in both
  //    engines, swap in a training-run nonce in production) falls under
  //    the 15% noise density. Reports the realized mask rate, sentinel
  //    (span) counts, and corrupted-token totals per language — the
  //    preflight a pretraining pipeline runs before committing a masking
  //    config to a 100 TB corpus. Pure per-row expressions; one grouped
  //    aggregate.
  private val spanCorruption = QueryDef(
    "q_span_corruption",
    (s, dir) => {
      val u = "((((((doc_id * 131 + sp) % 4294967296) * 69069 + 12345)" +
        " % 4294967296) * 1664525 + 1013904223) % 4294967296" +
        " + 0.5) / 4294967296.0"
      val d = Tables.documents(s, dir)
        .withColumn("n_toks",
          size(expr("filter(split(text, ' '), t -> length(t) > 0)")))
        .filter(col("n_toks") >= 3)
        .withColumn("n_spans", expr("n_toks div 3"))
        .withColumn("masked_spans", expr(
          s"""aggregate(sequence(0, n_spans - 1), CAST(0 AS BIGINT),
                (acc, sp) -> acc + (CASE WHEN ($u) < 0.15 THEN 1 ELSE 0 END))"""))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_toks").cast("long").as("total_tokens"),
          sum("masked_spans").as("total_sentinels"),
          (sum("masked_spans") * 3L).as("masked_tokens"),
          dround((sum("masked_spans") * 3L).cast("double")
            / sum("n_toks"), 4).as("mask_rate"))
        .orderBy("lang")
    },
    Some {
      val u = "((((((doc_id * 131 + sp) % 4294967296) * 69069 + 12345)" +
        " % 4294967296) * 1664525 + 1013904223) % 4294967296" +
        " + 0.5) / 4294967296.0"
      s"""
      WITH d AS (SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '),
                     t -> length(t) > 0)) AS n_toks
                 FROM documents),
        d2 AS (SELECT doc_id, lang, n_toks, n_toks // 3 AS n_spans
               FROM d WHERE n_toks >= 3),
        m AS (SELECT lang, n_toks,
                CAST(list_sum(list_transform(
                  generate_series(0, n_spans - 1),
                  sp -> CASE WHEN ($u) < 0.15 THEN 1 ELSE 0 END))
                  AS BIGINT) AS masked_spans
              FROM d2)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS total_tokens,
             CAST(sum(masked_spans) AS BIGINT) AS total_sentinels,
             CAST(sum(masked_spans) * 3 AS BIGINT) AS masked_tokens,
             ${oround(
               "CAST(sum(masked_spans) * 3 AS DOUBLE) / CAST(sum(n_toks) AS BIGINT)",
               4)} AS mask_rate
      FROM m GROUP BY lang ORDER BY lang"""
    })

  override def queries: Seq[QueryDef] =
    Seq(sourceCaps, stratifiedSample, tokenShards, zorderQuadrants,
      langQualityGate, curationFunnel, datasetSplit, dpNoisyCounts,
      spanCorruption)
}
