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

  /** Doc budget the e2e temperature mix apportions (Hamilton, exact). */
  private val E2eDocBudget = 1000L
  /** Stop-bucket cap for the e2e near-dup LSH stage (same rationale as
    * DedupQueries.MaxBucket: a band bucket shared by more docs carries no
    * near-dup signal and its pair mass is quadratic in bucket size). */
  private val E2eMaxBucket = 256

  /** Two-round LCG uniform scaled to 32 bits, as an integer (no float):
    * the same generator q_stratified_sample / q_dataset_split use. */
  private def lcg32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (((c % lit(4294967296L)) * lit(69069L) + lit(12345L)) % lit(4294967296L)
      * lit(1664525L) + lit(1013904223L)) % lit(4294967296L)

  // -- the COMPOSED curation DAG a training-data team actually runs, end to
  //    end in one plan: ingest → language gate → quality rules → exact
  //    dedup → MinHash-LSH near-dup removal → temperature-mixed sampling
  //    (exact Hamilton doc quotas on sqrt-token-mass weights, deterministic
  //    LCG Bernoulli at rate quota/n) → token-budget shard packing. Every
  //    stage is individually certified by its own query
  //    (q_curation_funnel, q_exact_dedup, q_minhash_lsh_neardup,
  //    q_temperature_mix, q_stratified_sample, q_token_shards); THIS query
  //    certifies the composition — per-language attrition through all
  //    seven stages plus the final shard census, in one oracle.
  //
  //    Scale: the near-dup stage runs on EXACT-DEDUP SURVIVORS ONLY (the
  //    round-3 lesson: raw-corpus LSH candidate mass grows as Σ n_b² over
  //    duplicate groups) with the stop-bucket cap bounding candidate mass;
  //    the sampling stage is a pure projection after a broadcast join of
  //    the 5-row quota table (the Bernoulli test is exact-integer:
  //    (2·lcg+1)·n < quota·2^33 — no float compare to diverge
  //    cross-engine); shard offsets use the bucketed two-pass prefix sum
  //    (no per-lang single-task window over the doc frame). All output
  //    columns are BIGINTs — nothing float-sensitive in the hash gate.
  private val curationE2e = QueryDef(
    "q_curation_e2e",
    (s, dir) => {
      val d0 = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .withColumn("char_mass",
          (length(col("text")) - (col("n_toks") - 1)).cast("long"))
        .withColumn("lang_ok", col("lang") =!= "zh")
        .withColumn("qual_ok", col("lang_ok") && col("n_toks") >= 10 &&
          col("char_mass") <= col("n_toks") * 12)
      // exact dedup as a map-side-combinable min-struct aggregate (r15):
      // doc_id is unique, so min(struct(doc_id, lang, n_toks)) over a text
      // group IS the rn=1 row of the former row_number window ordered by
      // doc_id asc — same survivor set, but the replica-heavy corpus
      // collapses in the partial aggregate BEFORE the exchange, where the
      // window shuffled and sorted every duplicate row (guide §2.3).
      val exact = d0.filter(col("qual_ok"))
        .groupBy(col("text"))
        .agg(min(struct(col("doc_id"), col("lang"), col("n_toks"))).as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.lang").as("lang"),
          col("m.n_toks").as("n_toks"), col("text"))
        .withColumn("toks", split(col("text"), " "))
        .withColumn("shingles", expr(
          """CASE WHEN size(toks) >= 2
                THEN array_distinct(transform(sequence(0, size(toks) - 2),
                                    i -> concat_ws(' ', slice(toks, i + 1, 2))))
                ELSE array() END"""))
        .select(col("doc_id"), col("lang"), col("n_toks"), col("shingles"))
      Cached.withPinned(exact) { case Seq(exact) =>
        // near-dup LSH: 4 bands × 1 row, band hashes are disjoint 64-bit
        // substrings of ONE sha2 per shingle (q_minhash_lsh_neardup shape).
        // r15: the four min(substring(sha2)) aggregates are array_min over
        // per-row transforms of one hash array — the same values (min over
        // the same string set) with ZERO exchange, where the former
        // explode→groupBy shuffled a 64-char hex string per shingle (the
        // r15 GC profile billed a 107 s collection storm to that stage).
        // Docs with an empty shingle set produced no exploded rows, so the
        // size() filter reproduces their absence exactly.
        val bands = exact.filter(size(col("shingles")) > 0)
          .withColumn("hs", expr("transform(shingles, x -> sha2(x, 256))"))
          .select(col("doc_id"), posexplode(array((0 until 4).map(b =>
            array_min(expr(
              s"transform(hs, h -> substring(h, ${1 + 16 * b}, 16))"))): _*))
            .as(Seq("band", "mh")))
        val okBuckets = bands.groupBy("band", "mh")
          .agg(count(lit(1)).as("bc")).filter(col("bc") <= E2eMaxBucket)
          .select(col("band"), col("mh"))
        val kept = bands.join(okBuckets, Seq("band", "mh"))
        val cand = kept.as("a").join(kept.as("b"),
            col("a.band") === col("b.band") && col("a.mh") === col("b.mh") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
          // r15: candidate pairs are byte-light (2 longs) but the jaccard
          // below is compute-dense (~100 string equality probes per pair —
          // 8.8e5 pairs at sf0.1), and the shingle sides broadcast, so the
          // whole verify pipeline runs at the DISTINCT's post-AQE
          // partition count — coalesced to ceil(6 MB / minPartitionSize)
          // = 6 tasks (a 7.8 s straggler stage in the r15 profile). An
          // explicit-N repartition is AQE-non-coalescable and pins the
          // verify stage at the session's (scale-adaptive) parallelism.
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("id_a"), col("id_b"))
        // r15 verify rewrite, same values: (1) |A∩B| via the native
        // sorted-merge count over per-doc sort_array'd sets — equal to
        // size(array_intersect) on distinct sets, without the per-pair
        // hash-set build (8.8e5 pairs × ~51-element sets measured 5-7 s
        // with array_intersect+array_union at sf0.1); (2) |A∪B| =
        // |A|+|B|−|A∩B| — the identity the oracle's jac CTE already uses —
        // so the same doubles divide.
        // sorted_intersect_count's contract (sorted + duplicate-free):
        // distinctness holds by construction — `shingles` is
        // array_distinct'd where it is built above (and list_distinct'd
        // in the oracle's dsh CTE), spec-pinned by SortedIntersectSpec's
        // call-site proof + duplicate counter-example (r16, verdict #2).
        val sets = exact.select(col("doc_id"),
          sort_array(col("shingles")).as("shingles"))
        val drops = cand
          .join(sets.withColumnRenamed("doc_id", "id_a")
            .withColumnRenamed("shingles", "sa"), "id_a")
          .join(sets.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("shingles", "sb"), "id_b")
          .withColumn("inter",
            graft.functions.TextSimilarity.sortedIntersectCount(
              col("sa"), col("sb")))
          .withColumn("jaccard", col("inter").cast("double")
            / (size(col("sa")) + size(col("sb")) - col("inter")))
          .filter(col("jaccard") >= 0.2)
          .select(col("id_b").as("doc_id")).distinct()
        val surv0 = exact.select("doc_id", "lang", "n_toks")
          .join(drops, Seq("doc_id"), "left_anti")

        // The census below fans out into ~6 consumers whose lineages all
        // contain the LSH candidate join; without pinning the (tiny)
        // survivor set, Spark re-executes that join once per consumer —
        // measured 128 s vs ~6 s at sf0.1. Nested withPinned pins surv
        // (and further down sampled) once AND truncates the consumers'
        // plans at the pin (r15 — the un-truncated census plan reached
        // 3,905 Exchange nodes of duplicated lineage and ~20 s of pure
        // driver plan work); in audit mode the wrapper is transparent so
        // the full plan stays visible to the plan audits.
        Cached.withPinned(surv0) { case Seq(surv) =>
          curationCensus(d0, exact, surv) }
      }
    },
    curationE2eOracle)

  /** Post-near-dup half of [[curationE2e]]: temperature mix, sampling,
    * shard packing, and the per-language census. `surv` is pinned by the
    * caller. */
  private def curationCensus(
      d0: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame,
      surv: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        // temperature mix: exact Hamilton apportionment of E2eDocBudget
        // docs over w_l = floor(toks_l^0.5 · 1e6) (q_temperature_mix shape)
        val byLang = surv.groupBy("lang")
          .agg(count(lit(1)).as("n_neardup"),
            sum("n_toks").cast("long").as("toks_neardup"))
          .withColumn("w_u",
            floor(pow(col("toks_neardup").cast("double"), lit(0.5)) * lit(1e6))
              .cast("long"))
        val tot = byLang.agg(sum("w_u").cast("long").as("tot_w"))
        val alloc = byLang.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"($E2eDocBudget * w_u) div nullif(tot_w, 0)"))
          .withColumn("rem", expr(s"($E2eDocBudget * w_u) % nullif(tot_w, 0)"))
        val short = alloc.agg((lit(E2eDocBudget) - sum("base")).cast("long").as("short"))
        // constant-key partition (5-row frame) — keeps the window audit's
        // "no unpartitioned window" invariant without a real repartition
        val wRem = Window.partitionBy(pmod(length(col("lang")), lit(1)))
          .orderBy(col("rem").desc, col("lang").asc)
        val quota = alloc.crossJoin(broadcast(short))
          .withColumn("rr", row_number().over(wRem))
          .withColumn("quota", (col("base")
            + when(col("rr") <= col("short"), 1L).otherwise(0L)).cast("long"))
          .select("lang", "n_neardup", "quota")
        // Bernoulli at rate quota/n, exact-integer form: u < q/n with
        // u = (lcg + 0.5)/2^32  ⇔  (2·lcg+1)·n < q·2^33. Fits a long up to
        // n ≈ 2^30; beyond that (true 100 TB) the test moves to per-lang
        // rational thresholds — same broadcast-join + projection plan.
        val sampled0 = surv.join(broadcast(quota), "lang")
          .withColumn("keep",
            (lit(2L) * lcg32(col("doc_id")) + lit(1L)) * col("n_neardup")
              < col("quota") * lit(8589934592L))
          .filter(col("keep"))
          .select("doc_id", "lang", "n_toks")
        // sampled feeds 4 consumers (stats + both shard passes + census) —
        // pin it like surv above
        Cached.withPinned(sampled0) { case Seq(sampled) =>
          curationShardCensus(d0, exact, quota, sampled)
        }
  }

  /** Shard packing + final census over the pinned sampled set. */
  private def curationShardCensus(
      d0: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame,
      quota: org.apache.spark.sql.DataFrame,
      sampled: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val sampStats = sampled.groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"),
            sum("n_toks").cast("long").as("tok_sampled"))

        // shard packing: bucketed two-pass prefix sum (q_token_shards shape)
        val withB = sampled.withColumn("bucket", expr("doc_id div 100"))
        val wIntra = Window.partitionBy("lang", "bucket").orderBy("doc_id")
        val intra = withB.withColumn("cum_in", sum("n_toks").over(wIntra))
        val wOff = Window.partitionBy("lang").orderBy("bucket")
        val off = withB.groupBy("lang", "bucket").agg(sum("n_toks").as("bt"))
          .withColumn("off", sum("bt").over(wOff) - col("bt"))
          .select("lang", "bucket", "off")
        val shards = intra.join(off, Seq("lang", "bucket"))
          .withColumn("shard", expr(s"(cum_in + off - n_toks) div $Budget"))
          .groupBy("lang").agg((max("shard") + 1L).cast("long").as("n_shards"))

        // final per-language census across all seven stages. r15: n_ingest
        // and n_quality come out of ONE d0 scan (conditional sum ≡ the
        // former count-over-filter + left join + fill-0, since every
        // quality lang is an ingest lang) — one fewer documents scan and
        // one fewer broadcast join.
        val ingest = d0.groupBy("lang").agg(count(lit(1)).as("n_ingest"),
          sum(when(col("qual_ok"), 1L).otherwise(0L)).as("n_quality"))
        val exactC = exact.groupBy("lang").agg(count(lit(1)).as("n_exact"))
        ingest
          .join(broadcast(exactC), Seq("lang"), "left")
          .join(broadcast(quota), Seq("lang"), "left")
          .join(broadcast(sampStats), Seq("lang"), "left")
          .join(broadcast(shards), Seq("lang"), "left")
          .na.fill(0L, Seq("n_quality", "n_exact", "n_neardup", "quota",
            "n_sampled", "tok_sampled", "n_shards"))
          .select(col("lang"), col("n_ingest"), col("n_quality"),
            col("n_exact"), col("n_neardup"), col("quota"),
            col("n_sampled"), col("tok_sampled"), col("n_shards"))
          .orderBy("lang")
  }

  // lazy: referenced by curationE2e above (object init is declaration-order)
  private lazy val curationE2eOracle = Some(s"""
      WITH d0 AS (SELECT doc_id, lang, text,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                    CAST(length(text) - (len(string_split(text, ' ')) - 1)
                      AS BIGINT) AS char_mass
                  FROM documents),
        f AS (SELECT *,
                (lang <> 'zh' AND n_toks >= 10 AND char_mass <= n_toks * 12)
                  AS qual_ok
              FROM d0),
        ex AS (SELECT doc_id, lang, text, n_toks FROM
                 (SELECT *, row_number() OVER (PARTITION BY sha256(text)
                    ORDER BY doc_id ASC) AS rn
                  FROM f WHERE qual_ok) WHERE rn = 1),
        dsh AS (SELECT doc_id, lang, n_toks,
                  list_distinct(list_transform(
                    generate_series(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+1], ' '))) AS shingles
                FROM (SELECT doc_id, lang, n_toks,
                        string_split(text, ' ') AS toks FROM ex)),
        sh AS (SELECT doc_id, sha256(unnest(shingles)) AS h FROM dsh),
        bands AS (SELECT doc_id, band,
                    min(substr(h, 1 + 16 * band, 16)) AS mh
                  FROM (SELECT doc_id, h, unnest([0, 1, 2, 3]) AS band FROM sh)
                  GROUP BY doc_id, band),
        ok AS (SELECT band, mh FROM bands GROUP BY band, mh
               HAVING count(*) <= $E2eMaxBucket),
        kept AS (SELECT bands.* FROM bands JOIN ok USING (band, mh)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM kept a JOIN kept b
                   ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
        jac AS (SELECT id_a, id_b,
                  CAST(len(list_filter(da.shingles,
                        x -> list_contains(db.shingles, x))) AS DOUBLE)
                    / (len(da.shingles) + len(db.shingles)
                       - len(list_filter(da.shingles,
                           x -> list_contains(db.shingles, x)))) AS jaccard
                FROM cand JOIN dsh da ON cand.id_a = da.doc_id
                          JOIN dsh db ON cand.id_b = db.doc_id),
        drops AS (SELECT DISTINCT id_b AS doc_id FROM jac WHERE jaccard >= 0.2),
        surv AS (SELECT doc_id, lang, n_toks FROM dsh
                 WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
        byl AS (SELECT lang, count(*) AS n_neardup,
                  CAST(sum(n_toks) AS BIGINT) AS toks_neardup
                FROM surv GROUP BY lang),
        w AS (SELECT *, CAST(floor(pow(CAST(toks_neardup AS DOUBLE), 0.5) * 1e6)
                AS BIGINT) AS w_u FROM byl),
        tot AS (SELECT CAST(sum(w_u) AS BIGINT) AS tot_w FROM w),
        alloc AS (SELECT w.*, tot_w,
                    ($E2eDocBudget * w_u) // nullif(tot_w, 0) AS base,
                    ($E2eDocBudget * w_u) % nullif(tot_w, 0) AS rem
                  FROM w CROSS JOIN tot),
        shrt AS (SELECT CAST($E2eDocBudget - sum(base) AS BIGINT) AS short
                 FROM alloc),
        quota AS (SELECT alloc.*, short,
                    CAST(base + (CASE WHEN row_number()
                        OVER (ORDER BY rem DESC, lang ASC) <= short
                      THEN 1 ELSE 0 END) AS BIGINT) AS quota
                  FROM alloc CROSS JOIN shrt),
        samp AS (SELECT s.lang, s.doc_id, s.n_toks
                 FROM surv s JOIN quota q ON s.lang = q.lang
                 WHERE (2 * ((((s.doc_id % 4294967296) * 69069 + 12345)
                          % 4294967296 * 1664525 + 1013904223) % 4294967296)
                        + 1) * q.n_neardup
                       < q.quota * 8589934592),
        sst AS (SELECT lang, count(*) AS n_sampled,
                  CAST(sum(n_toks) AS BIGINT) AS tok_sampled
                FROM samp GROUP BY lang),
        shd AS (SELECT lang, CAST(max((cum - n_toks) // $Budget) + 1 AS BIGINT)
                  AS n_shards
                FROM (SELECT lang, n_toks,
                        CAST(sum(n_toks) OVER (PARTITION BY lang
                          ORDER BY doc_id) AS BIGINT) AS cum FROM samp)
                GROUP BY lang),
        ing AS (SELECT lang, count(*) AS n_ingest FROM d0 GROUP BY lang),
        qct AS (SELECT lang, count(*) AS n_quality FROM f WHERE qual_ok
                GROUP BY lang),
        ect AS (SELECT lang, count(*) AS n_exact FROM ex GROUP BY lang)
      SELECT i.lang, i.n_ingest,
             CAST(coalesce(q.n_quality, 0) AS BIGINT) AS n_quality,
             CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
             CAST(coalesce(b.n_neardup, 0) AS BIGINT) AS n_neardup,
             CAST(coalesce(qu.quota, 0) AS BIGINT) AS quota,
             CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
             CAST(coalesce(s.tok_sampled, 0) AS BIGINT) AS tok_sampled,
             CAST(coalesce(h.n_shards, 0) AS BIGINT) AS n_shards
      FROM ing i
        LEFT JOIN qct q ON i.lang = q.lang
        LEFT JOIN ect e ON i.lang = e.lang
        LEFT JOIN byl b ON i.lang = b.lang
        LEFT JOIN quota qu ON i.lang = qu.lang
        LEFT JOIN sst s ON i.lang = s.lang
        LEFT JOIN shd h ON i.lang = h.lang
      ORDER BY i.lang""")

  override def queries: Seq[QueryDef] =
    Seq(sourceCaps, stratifiedSample, tokenShards, zorderQuadrants,
      langQualityGate, curationFunnel, datasetSplit, dpNoisyCounts,
      spanCorruption, curationE2e)
}
