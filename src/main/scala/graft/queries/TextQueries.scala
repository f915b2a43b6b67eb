package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Det.{dround, oround}

/** Text-analysis operators for a large-scale training-data pipeline (builder
  * brief: token counting, quality scoring, language-ID, fingerprinting) over
  * the `documents` table. Everything is built from codegen-friendly column
  * expressions (split/transform/filter/sha2) — no UDFs — so at 100 TB the
  * whole stage stays inside WholeStageCodegen with the parquet scan pruned
  * to (doc_id, text, lang).
  */
object TextQueries extends QueryModule {

  private val StopWords = Seq("the", "a", "of", "and", "in")
  private val stopList = StopWords.map(w => s"'$w'").mkString(", ")

  // -- token counting (whitespace tokenizer) + corpus stats per language
  private val tokenStats = QueryDef(
    "q_token_stats",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          dround(avg("n_tokens"), 4).as("avg_tokens"),
          dround(avg("n_chars"), 4).as("avg_chars"),
          min("n_tokens").as("min_tokens"),
          max("n_tokens").as("max_tokens"))
        .orderBy("lang")
    },
    Some(s"""
      WITH t AS (SELECT lang, n_chars,
                        len(string_split(text, ' ')) AS n_tokens
                 FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             ${oround("avg(n_tokens)", 4)} AS avg_tokens,
             ${oround("avg(n_chars)", 4)} AS avg_chars,
             min(n_tokens) AS min_tokens,
             max(n_tokens) AS max_tokens
      FROM t GROUP BY lang ORDER BY lang"""))

  /** documents + a `quality` column (lexical-diversity / stopword / length
    * blend) — shared by q_doc_quality and the weighted sampler. */
  private def qualityFrame(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isInCollection(StopWords))))
      .withColumn("quality",
        least(lit(1.0), greatest(lit(0.0),
          lit(0.4) * (col("n_distinct").cast("double") / col("n_tokens"))
            + lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens"))
            + lit(0.3) * least(lit(1.0), col("n_tokens").cast("double") / lit(50.0)))))

  /** Oracle twin of `qualityFrame`: (doc_id, lang, quality). */
  private val qualityCte: String = s"""
    qd AS (SELECT doc_id, lang,
             least(1.0, greatest(0.0,
               0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
               + 0.3 * (1.0 - CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE) / len(toks))
               + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0))) AS quality
           FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents))"""

  // -- quality scoring: lexical-diversity / stopword / length blend
  private val docQuality = QueryDef(
    "q_doc_quality",
    (s, dir) => {
      val d = qualityFrame(s, dir)
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          dround(avg("quality"), 4).as("avg_quality"),
          dround(min("quality"), 4).as("min_quality"),
          dround(max("quality"), 4).as("max_quality"),
          sum(when(col("quality") > 0.6, 1).otherwise(0)).as("n_high_quality"))
        .orderBy("lang")
    },
    Some(s"""
      WITH $qualityCte,
        q AS (SELECT lang, quality FROM qd)
      SELECT lang, count(*) AS n_docs,
             ${oround("avg(quality)", 4)} AS avg_quality,
             ${oround("min(quality)", 4)} AS min_quality,
             ${oround("max(quality)", 4)} AS max_quality,
             CAST(sum(CASE WHEN quality > 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality
      FROM q GROUP BY lang ORDER BY lang"""))

  // -- language-ID: corpus-trained top-20 token profile per language, then
  //    classify each doc by max profile overlap → confusion matrix.
  //    Two-pass shape: the "train" side is a tiny broadcast (5 langs × 20
  //    tokens); the classify side is one scan + broadcast cross join.
  //
  //    Round-4 scale shape: (a) both passes run once per DISTINCT (text,
  //    lang) weighted by the replication count m — token frequencies and
  //    the confusion matrix are invariant (count over replicas = Σ m), and
  //    a dup-heavy corpus pays the explode only once per content; (b) the
  //    per-doc argmax is a broadcast-array fold (array_max over the 5
  //    profile structs, index as DESCENDING tie-break so the ASC-sorted
  //    first language wins equal overlaps — row_number semantics), not a
  //    Window: the old plan shuffled every doc's token array twice.
  private val langId = QueryDef(
    "q_lang_id_confusion",
    (s, dir) => {
      val keyed = Tables.documents(s, dir)
        .groupBy(sha2(col("text"), 256).as("ckey"), col("lang"))
        .agg(min("text").as("text"), count(lit(1)).as("m"))
      // one scan+hash feeds the train and classify sides
      Cached.withPinned(keyed) { case Seq(keyed) => // r15: pin + plan-truncate
        val tok = keyed.select(col("lang"), col("m"),
          explode(split(col("text"), " ")).as("tok"))
        val freq = tok.groupBy("lang", "tok").agg(sum("m").as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("n").desc, col("tok").asc)
        val prof = freq.withColumn("rn", row_number().over(w)).filter(col("rn") <= 20)
          .groupBy(col("lang").as("plang"))
          .agg(collect_set("tok").as("ptoks"))
        // ONE row holding all profiles, languages sorted ASC (sort_array on
        // struct orders by the first field)
        val profArr = prof
          .agg(sort_array(collect_list(struct(col("plang"), col("ptoks"))))
            .as("profiles"))
        val docs = keyed.select(col("lang"), col("m"),
          array_distinct(split(col("text"), " ")).as("dtoks"))
        val scored = docs.crossJoin(broadcast(profArr))
          .withColumn("best", expr(
            """array_max(transform(profiles, (pr, i) ->
                 struct(size(array_intersect(dtoks, pr.ptoks)) AS ov,
                        -i AS ni, pr.plang AS pl)))"""))
        scored.groupBy(col("lang"), col("best.pl").as("predicted"))
          .agg(sum("m").as("n"))
          .orderBy("lang", "predicted")
      }
    },
    Some("""
      WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        freq AS (SELECT lang, tok, count(*) AS n FROM tok GROUP BY 1, 2),
        prof AS (SELECT lang AS plang, list(tok) AS ptoks
                 FROM (SELECT lang, tok, row_number() OVER (PARTITION BY lang
                              ORDER BY n DESC, tok ASC) AS rn
                       FROM freq)
                 WHERE rn <= 20 GROUP BY 1),
        docs AS (SELECT doc_id, lang,
                        list_distinct(string_split(text, ' ')) AS dtoks
                 FROM documents),
        scored AS (SELECT doc_id, lang, plang,
                          len(list_filter(dtoks, x -> list_contains(ptoks, x))) AS overlap
                   FROM docs CROSS JOIN prof),
        pred AS (SELECT doc_id, lang, plang AS predicted
                 FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                              ORDER BY overlap DESC, plang ASC) AS rn
                       FROM scored)
                 WHERE rn = 1)
      SELECT lang, predicted, count(*) AS n
      FROM pred GROUP BY 1, 2 ORDER BY lang, predicted"""))

  // -- document fingerprinting: min-hash over 3-token shingles (the k=1
  //    MinHash signature — content-defined fingerprint, stable under token
  //    order preservation)
  private val fingerprint = QueryDef(
    "q_doc_fingerprint",
    (s, dir) => {
      // Fingerprints are a pure function of text, so compute ONCE per
      // DISTINCT content and re-attach by content key — on a dup-heavy
      // corpus (sf1: every doc has 9 replicas) this cuts the shingle-hash
      // work by the duplication factor (measured 7.6 s → ~1 s at sf1).
      // Inside the per-content job: explode → codegen'd sha2 → min with
      // map-side partial aggregation — the shuffle carries one 64-char
      // min per content, not the shingles. (A lambda `transform(…,
      // s -> sha2(s))` would leave sha2 in the interpreted HOF path.)
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          sha2(col("text"), 256).as("ckey"), col("text"))
      // No cache wrapper here, deliberately: the two consumers prune to
      // disjoint column sets (the doc side never reads `text`), so the
      // cost of persisting + materializing the whole frame exceeds the
      // second pruned scan it saves (measured: wrapped 6.0 s vs direct
      // 3.3 s warm at sf0.1; an explicit repartition before the explode
      // was also tried and measured WORSE — the shingle phase is not
      // partition-starved, the wrapper was the overhead).
      val base = keyed.select("doc_id", "lang", "ckey")
      val distinctTexts = keyed
        .select("ckey", "text").dropDuplicates("ckey")
        .withColumn("toks", split(col("text"), " "))
        // size guard: sequence(0, -1) would be a DESCENDING array; <3-token
        // docs must yield no shingles (the oracle's generate_series is
        // empty there). Direct toks[i] indexing, not slice(): no per-
        // shingle array allocation inside the interpreted lambda.
        .withColumn("shingles", expr(
          """CASE WHEN size(toks) >= 3
                  THEN transform(sequence(0, size(toks) - 3),
                                 i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))
                  ELSE array() END"""))
      val fpPerContent = distinctTexts
        .select(col("ckey"),
          size(array_distinct(col("shingles"))).cast("long").as("n_shingles"),
          explode(col("shingles")).as("shingle"))
        .withColumn("h", sha2(col("shingle"), 256))
        .groupBy("ckey", "n_shingles")
        .agg(min("h").as("fingerprint"))
      base.join(fpPerContent, "ckey")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("fingerprint").as("n_distinct_fp"),
          min("fingerprint").as("min_fp"),
          dround(avg("n_shingles"), 4).as("avg_shingles"))
        .orderBy("lang")
    },
    Some(s"""
      WITH base AS (SELECT doc_id, lang, sha256(text) AS ckey FROM documents),
        d0 AS (SELECT sha256(text) AS ckey, min(text) AS text
               FROM documents GROUP BY 1),
        sh AS (SELECT ckey,
                  unnest(list_transform(generate_series(1, len(toks) - 2),
                         i -> array_to_string(toks[i:i+2], ' '))) AS shingle
               FROM (SELECT ckey, string_split(text, ' ') AS toks FROM d0)),
        fp0 AS (SELECT ckey, min(sha256(shingle)) AS fingerprint,
                       count(DISTINCT shingle) AS n_shingles
                FROM sh GROUP BY ckey),
        fp AS (SELECT b.doc_id, b.lang, f.fingerprint, f.n_shingles
               FROM base b JOIN fp0 f USING (ckey))
      SELECT lang, count(*) AS n_docs,
             count(DISTINCT fingerprint) AS n_distinct_fp,
             min(fingerprint) AS min_fp,
             ${oround("avg(n_shingles)", 4)} AS avg_shingles
      FROM fp GROUP BY lang ORDER BY lang"""))

  // -- F1/F2: keyword matching with BOTH reference semantics (word-boundary
  //    regex vs substring `in` — the "ai"⊂"air" quirk preserved per site)
  private val Keywords = Seq("data", "ai", "spark", "stream")
  private val keywordHits = QueryDef(
    "q_keyword_hits",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val aggCols = Keywords.flatMap { kw =>
        Seq(
          sum(when(graft.text.KeywordMatch.wordBoundary(col("text"), kw), 1)
            .otherwise(0)).as(s"wb_$kw"),
          sum(when(graft.text.KeywordMatch.substringMatch(col("text"), kw), 1)
            .otherwise(0)).as(s"ss_$kw"))
      }
      d.groupBy("lang").agg(aggCols.head, aggCols.tail: _*).orderBy("lang")
    },
    Some {
      val cols = Keywords.flatMap { kw =>
        Seq(
          s"CAST(sum(CASE WHEN regexp_matches(text, '(?i)\\b$kw\\b') THEN 1 ELSE 0 END) AS BIGINT) AS wb_$kw",
          s"CAST(sum(CASE WHEN contains(lower(text), '$kw') THEN 1 ELSE 0 END) AS BIGINT) AS ss_$kw")
      }.mkString(",\n             ")
      s"""
      SELECT lang,
             $cols
      FROM documents GROUP BY lang ORDER BY lang"""
    })

  // -- BPE-ish token counting: whitespace tokens vs a subword-style regex
  //    tokenizer (alpha runs, digit runs, single punctuation — the GPT-2
  //    pre-tokenizer shape) plus a 4-char-chunk proxy for subword count
  private val tokenCountsBpe = QueryDef(
    "q_token_counts_bpe",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("ws_tokens", size(split(col("text"), " ")))
        .withColumn("re_tokens",
          size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))
        .withColumn("subword_est",
          expr("aggregate(split(text, ' '), 0L, (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG))"))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("ws_tokens").as("total_ws_tokens"),
          sum("re_tokens").as("total_re_tokens"),
          sum("subword_est").as("total_subword_est"),
          dround(avg(col("subword_est").cast("double") / col("ws_tokens")), 4)
            .as("avg_subwords_per_token"))
        .orderBy("lang")
    },
    Some(s"""
      WITH d AS (SELECT lang,
                   len(string_split(text, ' ')) AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS re_tokens,
                   list_sum(list_transform(string_split(text, ' '),
                     t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS subword_est
                 FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
             CAST(sum(re_tokens) AS BIGINT) AS total_re_tokens,
             CAST(sum(subword_est) AS BIGINT) AS total_subword_est,
             ${oround("avg(CAST(subword_est AS DOUBLE) / ws_tokens)", 4)} AS avg_subwords_per_token
      FROM d GROUP BY lang ORDER BY lang"""))

  // -- TF-IDF keyword extraction: top-5 terms per language by corpus
  //    tf-idf. Because idf is constant per (lang, term), Σ_docs tf·idf =
  //    idf·Σtf — so the whole score is ONE multiplication over exact
  //    integer aggregates (no float summation → partition-order
  //    independent). Stopwords self-filter: df = N ⇒ ln(N/df) = 0.
  //    Shape at 100 TB: two token-level groupBys (map-side combined) + a
  //    broadcast of per-lang doc counts + a per-lang ranked window
  //    (WindowGroupLimit, partition-parallel).
  private val tfidfTop = QueryDef(
    "q_tfidf_top_terms",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val perLang = d.groupBy("lang").agg(count(lit(1)).as("n_docs_lang"))
      val tf = d.select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("tf"))
      val stats = tf.groupBy("lang", "tok")
        .agg(sum("tf").cast("long").as("total_tf"), count(lit(1)).as("df"))
        .join(broadcast(perLang), "lang")
        .withColumn("score",
          col("total_tf") * log(col("n_docs_lang").cast("double") / col("df")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("score").desc, col("tok").asc)
      stats.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
        .select(col("lang"), col("rnk"), col("tok"), col("total_tf"), col("df"),
          dround(col("score"), 4).as("tfidf"))
        .orderBy("lang", "rnk")
    },
    Some(s"""
      WITH tf AS (SELECT doc_id, lang, tok, count(*) AS tf
                  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  GROUP BY 1, 2, 3),
        pl AS (SELECT lang, count(*) AS n_docs_lang FROM documents GROUP BY lang),
        st AS (SELECT lang, tok, CAST(sum(tf) AS BIGINT) AS total_tf,
                      count(*) AS df
               FROM tf GROUP BY 1, 2),
        sc AS (SELECT st.lang, tok, total_tf, df,
                 total_tf * ln(CAST(n_docs_lang AS DOUBLE) / df) AS score
               FROM st JOIN pl ON st.lang = pl.lang),
        rk AS (SELECT *, row_number() OVER (PARTITION BY lang
                 ORDER BY score DESC, tok ASC) AS rnk
               FROM sc)
      SELECT lang, rnk, tok, total_tf, df, ${oround("score", 4)} AS tfidf
      FROM rk WHERE rnk <= 5 ORDER BY lang, rnk"""))

  // -- deterministic quality-weighted corpus sampling (training-mix
  //    construction): Efraimidis–Spirakis A-Res — each doc draws key
  //    ln(u)/w (u uniform, w = quality); top-k keys per stratum IS a
  //    weighted sample without replacement. u comes from a Knuth
  //    multiplicative hash of doc_id: pure integer arithmetic, so BOTH
  //    engines (and every partitioning) draw identical samples — no rand(),
  //    no seed-plumbing, reproducible forever. One scan + a per-lang top-k
  //    window (WindowGroupLimit); at 100 TB this is how you cut a 1%
  //    quality-weighted training mix without a global sort.
  private val weightedSample = QueryDef(
    "q_weighted_sample",
    (s, dir) => {
      val q = qualityFrame(s, dir).select(col("doc_id"), col("lang"), col("quality"))
        .withColumn("w", greatest(lit(0.05), col("quality")))
        // 32-bit LCG on a pre-masked id: the product tops out at ~2^48, so
        // no Long overflow under ANSI mode for ANY doc_id (a raw Knuth
        // multiply would throw past doc_id ≈ 3.5e9 — exactly the 100 TB ids)
        .withColumn("u",
          (((((col("doc_id") % lit(4294967296L)) * lit(69069L) + lit(1L))
            % lit(4294967296L)).cast("double") + lit(0.5)) / lit(4294967296.0)))
        .withColumn("skey", log(col("u")) / col("w"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("skey").desc, col("doc_id").asc)
      q.withColumn("rnk", row_number().over(win)).filter(col("rnk") <= 3)
        .select(col("lang"), col("rnk"), col("doc_id"),
          dround(col("quality"), 4).as("quality"))
        .orderBy("lang", "rnk")
    },
    Some(s"""
      WITH $qualityCte,
        keyed AS (SELECT doc_id, lang, quality,
                    ln((((doc_id % 4294967296) * 69069 + 1) % 4294967296 + 0.5)
                       / 4294967296)
                      / greatest(0.05, quality) AS skey
                  FROM qd),
        rk AS (SELECT *, row_number() OVER (PARTITION BY lang
                 ORDER BY skey DESC, doc_id ASC) AS rnk
               FROM keyed)
      SELECT lang, rnk, doc_id, ${oround("quality", 4)} AS quality
      FROM rk WHERE rnk <= 3 ORDER BY lang, rnk"""))

  // -- within-document repetition scoring (the Gopher-style "fraction of
  //    duplicate n-grams" quality gate): rep_ratio = 1 − distinct/total
  //    over 3-grams. Highly repetitive docs are the classic low-quality
  //    class a training-data pipeline filters before tokenization. One
  //    scan, all array expressions inside codegen — no shuffle until the
  //    per-lang rollup.
  private val docRepetition = QueryDef(
    "q_doc_repetition",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("grams", expr(
          """CASE WHEN size(toks) >= 3
                  THEN transform(sequence(0, size(toks) - 3),
                                 i -> concat_ws(' ', slice(toks, i + 1, 3)))
                  ELSE array() END"""))
        .withColumn("n_grams", size(col("grams")))
        .withColumn("rep_ratio",
          when(col("n_grams") > 0,
            lit(1.0) - size(array_distinct(col("grams"))).cast("double")
              / col("n_grams"))
            .otherwise(lit(0.0)))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          dround(avg("rep_ratio"), 4).as("avg_rep_ratio"),
          dround(max("rep_ratio"), 4).as("max_rep_ratio"),
          sum(when(col("rep_ratio") > 0.2, 1L).otherwise(0L)).as("n_repetitive"))
        .orderBy("lang")
    },
    Some(s"""
      WITH g AS (SELECT doc_id, lang,
                   list_transform(generate_series(1, len(toks) - 2),
                     i -> array_to_string(toks[i:i+2], ' ')) AS grams
                 FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
                       FROM documents)),
        r AS (SELECT lang,
                CASE WHEN len(grams) > 0
                     THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                     ELSE CAST(0.0 AS DOUBLE) END AS rep_ratio
              FROM g)
      SELECT lang, count(*) AS n_docs,
             ${oround("avg(rep_ratio)", 4)} AS avg_rep_ratio,
             ${oround("max(rep_ratio)", 4)} AS max_rep_ratio,
             CAST(sum(CASE WHEN rep_ratio > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
      FROM r GROUP BY lang ORDER BY lang"""))

  // -- corpus mixture planner (training-mix construction, pairs with the
  //    weighted sampler): per-language token counts → actual corpus share →
  //    per-stratum sampling rate to hit a target mix (uniform here; any
  //    literal map works). rate = min(1, target/actual) is the standard
  //    downsample-only mix: over-represented strata get cut, under-
  //    represented ones pass whole. One scan + a broadcast of the 1-row
  //    total — the query a 100 TB pretraining run executes before cutting
  //    its mix.
  private val mixtureRates = QueryDef(
    "q_mixture_rates",
    (s, dir) => {
      val target = 0.2 // uniform over the 5 langs
      val perLang = Tables.documents(s, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .groupBy("lang").agg(sum("n_tokens").as("lang_tokens"))
      val total = perLang.agg(sum("lang_tokens").as("total_tokens"))
      perLang.crossJoin(broadcast(total))
        .withColumn("actual_share",
          col("lang_tokens").cast("double") / col("total_tokens"))
        .withColumn("sampling_rate",
          least(lit(1.0), lit(target) / col("actual_share")))
        .select(col("lang"), col("lang_tokens"),
          dround(col("actual_share"), 4).as("actual_share"),
          dround(col("sampling_rate"), 4).as("sampling_rate"),
          dround(col("lang_tokens") * col("sampling_rate"), 4)
            .as("expected_tokens"))
        .orderBy("lang")
    },
    Some(s"""
      WITH pl AS (SELECT lang,
                    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS lang_tokens
                  FROM documents GROUP BY lang),
        t AS (SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens FROM pl),
        m AS (SELECT lang, lang_tokens,
                CAST(lang_tokens AS DOUBLE) / total_tokens AS actual_share,
                least(1.0, 0.2 / (CAST(lang_tokens AS DOUBLE) / total_tokens)) AS sampling_rate
              FROM pl, t)
      SELECT lang, lang_tokens,
             ${oround("actual_share", 4)} AS actual_share,
             ${oround("sampling_rate", 4)} AS sampling_rate,
             ${oround("lang_tokens * sampling_rate", 4)} AS expected_tokens
      FROM m ORDER BY lang"""))

  // -- Gopher-style multi-rule quality gate (Rae et al. 2021 §A1.1 shape):
  //    five independent structural rules per document, reported as per-lang
  //    pass counts. All rules are single-division doubles or integer
  //    comparisons — bit-identical in both engines, no rounding seams —
  //    and the whole gate is one scan + one map-side-combined groupBy (the
  //    100 TB shape: a corpus sweep with zero joins/shuffled payloads).
  //    Rules: token-count range, mean-word-length range (derived exactly
  //    from n_chars: total token chars = n_chars − (n_tokens − 1)),
  //    ≥2 distinct stopwords, lexical-diversity floor, 1-char-token cap.
  private val qualityFilterRules = QueryDef(
    "q_quality_filter_rules",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("mtl",
          (col("n_chars") - (col("n_tokens") - lit(1))).cast("double")
            / col("n_tokens"))
        .withColumn("dr",
          size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
        .withColumn("n_stop",
          size(array_intersect(col("toks"),
            array(StopWords.map(lit): _*))))
        .withColumn("ocf",
          size(filter(col("toks"), t => length(t) === 1)).cast("double")
            / col("n_tokens"))
        .withColumn("p_len", col("n_tokens").between(20, 500))
        .withColumn("p_wordlen", col("mtl") >= 3.0 && col("mtl") <= 7.0)
        .withColumn("p_stop", col("n_stop") >= 2)
        .withColumn("p_rep", col("dr") >= 0.3)
        .withColumn("p_short", col("ocf") <= 0.1)
      def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L)).as(s"n_$c")
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          cnt("p_len"), cnt("p_wordlen"), cnt("p_stop"), cnt("p_rep"),
          cnt("p_short"),
          sum(when(col("p_len") && col("p_wordlen") && col("p_stop")
            && col("p_rep") && col("p_short"), 1L).otherwise(0L))
            .as("n_pass_all"))
        .orderBy("lang")
    },
    Some(s"""
      WITH t AS (SELECT lang, len(toks) AS n_tokens,
                   CAST(n_chars - (len(toks) - 1) AS DOUBLE) / len(toks) AS mtl,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dr,
                   len(list_filter(list_distinct(toks),
                       x -> x IN ($stopList))) AS n_stop,
                   CAST(len(list_filter(toks, x -> len(x) = 1)) AS DOUBLE)
                     / len(toks) AS ocf
                 FROM (SELECT lang, n_chars, string_split(text, ' ') AS toks
                       FROM documents)),
        f AS (SELECT lang,
                (n_tokens BETWEEN 20 AND 500) AS p_len,
                (mtl >= 3.0 AND mtl <= 7.0) AS p_wordlen,
                (n_stop >= 2) AS p_stop,
                (dr >= 0.3) AS p_rep,
                (ocf <= 0.1) AS p_short
              FROM t)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN p_len THEN 1 ELSE 0 END) AS BIGINT) AS n_p_len,
             CAST(sum(CASE WHEN p_wordlen THEN 1 ELSE 0 END) AS BIGINT) AS n_p_wordlen,
             CAST(sum(CASE WHEN p_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_p_stop,
             CAST(sum(CASE WHEN p_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_p_rep,
             CAST(sum(CASE WHEN p_short THEN 1 ELSE 0 END) AS BIGINT) AS n_p_short,
             CAST(sum(CASE WHEN p_len AND p_wordlen AND p_stop AND p_rep
                           AND p_short THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
      FROM f GROUP BY lang ORDER BY lang"""))

  // -- CCNet-style unigram-LM cross-entropy (Wenzek et al. 2019 shape):
  //    train a per-language unigram model on the corpus itself, score each
  //    document by its mean token negative-log-likelihood, report per-lang
  //    distribution stats. High-xent docs are the gibberish/outlier tail a
  //    training pipeline drops.
  //
  //    Scale + determinism shape: the LM is a (lang, token) table that
  //    GROWS with the corpus — shuffle-joined to the scoring scan (AQE
  //    broadcasts only when it measures small); training and scoring run
  //    once per DISTINCT content weighted by replication m; and the NLL is
  //    quantized to an integer 1e-6 grid BEFORE the per-doc sum, so the
  //    doc score is an exact integer sum — order-independent under any
  //    partitioning and bit-identical in the DuckDB twin (ln() itself
  //    agrees to the last ulp far from the 5e-7 grid boundaries).
  private val unigramLogprob = QueryDef(
    "q_unigram_logprob",
    (s, dir) => {
      val keyed = Tables.documents(s, dir)
        .groupBy(sha2(col("text"), 256).as("ckey"), col("lang"))
        .agg(min("text").as("text"), count(lit(1)).as("m"))
      Cached.withPinned(keyed) { case Seq(keyed) => // r15: pin + plan-truncate
        val tok = keyed.select(col("ckey"), col("lang"), col("m"),
          explode(split(col("text"), " ")).as("tok"))
        val freq = tok.groupBy("lang", "tok").agg(sum("m").as("n"))
        val tot = freq.groupBy("lang").agg(sum("n").as("nl"))
        val lm = freq.join(tot, "lang")
          .withColumn("nll_i",
            round(-log(col("n").cast("double") / col("nl")) * 1e6).cast("long"))
          .select("lang", "tok", "nll_i")
        // NO broadcast hint on the LM side: the vocabulary grows with the
        // corpus (Heaps' law), so a forced broadcast is a driver/executor
        // OOM at 100×. Plain shuffle equi-join on (lang, tok); AQE demotes
        // to broadcast at runtime only when the built side is actually
        // small (round-5 verdict #2).
        val perDoc = tok.join(lm, Seq("lang", "tok"))
          .groupBy("ckey", "lang", "m")
          .agg(sum("nll_i").as("nll_sum"), count(lit(1)).as("n_tokens"))
          .withColumn("xent",
            col("nll_sum").cast("double") / lit(1e6) / col("n_tokens").cast("double"))
          // 1e-6-grid integer image of xent: the corpus mean is then an exact
          // integer sum (order-independent), not a double accumulation
          .withColumn("xent_i", round(col("xent") * 1e6).cast("long"))
        perDoc.groupBy("lang")
          .agg(sum("m").as("n_docs"),
            dround(sum(col("xent_i") * col("m")).cast("double") / lit(1e6)
              / sum(col("m")).cast("double"), 4).as("avg_xent"),
            dround(min("xent"), 4).as("min_xent"),
            dround(max("xent"), 4).as("max_xent"),
            sum(when(col("xent") > 4.0, col("m")).otherwise(0L)).as("n_high_xent"))
          .orderBy("lang")
      }
    },
    Some(s"""
      WITH keyed AS (SELECT sha256(text) AS ckey, lang, min(text) AS text,
                            count(*) AS m
                     FROM documents GROUP BY 1, 2),
        tok AS (SELECT ckey, lang, m, unnest(string_split(text, ' ')) AS tok
                FROM keyed),
        freq AS (SELECT lang, tok, CAST(sum(m) AS BIGINT) AS n
                 FROM tok GROUP BY 1, 2),
        tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM freq GROUP BY 1),
        lm AS (SELECT freq.lang, tok,
                 CAST(round(-ln(CAST(n AS DOUBLE) / nl) * 1e6) AS BIGINT) AS nll_i
               FROM freq JOIN tot ON freq.lang = tot.lang),
        perdoc AS (SELECT ckey, t.lang, m,
                     CAST(sum(nll_i) AS BIGINT) AS nll_sum,
                     count(*) AS n_tokens
                   FROM tok t JOIN lm ON t.lang = lm.lang AND t.tok = lm.tok
                   GROUP BY 1, 2, 3),
        px AS (SELECT lang, m,
                 CAST(nll_sum AS DOUBLE) / 1e6 / n_tokens AS xent,
                 CAST(round(CAST(nll_sum AS DOUBLE) / 1e6 / n_tokens * 1e6)
                      AS BIGINT) AS xent_i
               FROM perdoc)
      SELECT lang, CAST(sum(m) AS BIGINT) AS n_docs,
             ${oround("CAST(sum(xent_i * m) AS DOUBLE) / 1e6 / sum(m)", 4)} AS avg_xent,
             ${oround("min(xent)", 4)} AS min_xent,
             ${oround("max(xent)", 4)} AS max_xent,
             CAST(sum(CASE WHEN xent > 4.0 THEN m ELSE 0 END) AS BIGINT) AS n_high_xent
      FROM px GROUP BY lang ORDER BY lang"""))

  /** PII patterns — restricted to the syntax Java regex and RE2 (DuckDB)
    * interpret identically: character classes, bounded repetition, \b, \d. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  // -- PII redaction: scrub emails/phones before a corpus ships to training.
  //    The synthetic docs carry no organic PII, so each doc is first salted
  //    with a DETERMINISTIC email + phone derived from doc_id (both engines
  //    build the identical string) — the redactor then has real work whose
  //    output is hash-checked: match counts and the sha256 of the redacted
  //    text. Pure per-row string transforms: no shuffle at all before the
  //    final 5-row rollup — the cheapest possible 100 TB shape, and the scan
  //    prunes to (doc_id, lang, text).
  private val piiRedaction = QueryDef(
    "q_pii_redaction",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("salted", concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@example.com or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" ext "),
          lit("call 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .withColumn("n_emails", regexp_count(col("salted"), lit(EmailRe)))
        .withColumn("n_phones", regexp_count(col("salted"), lit(PhoneRe)))
        .withColumn("redacted",
          regexp_replace(regexp_replace(col("salted"), EmailRe, "[EMAIL]"),
            PhoneRe, "[PHONE]"))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_emails").as("emails_redacted"),
          sum("n_phones").as("phones_redacted"),
          // order-insensitive corpus checksum: per-doc sha256 XOR-folded to
          // 8 hex bytes via bit_xor (both engines fold the same per-row
          // digests, any partitioning)
          lower(hex(bit_xor(conv(substring(sha2(col("redacted"), 256), 1, 8),
            16, 10).cast("long")))).as("redacted_xor"))
        .orderBy("lang")
    },
    Some(s"""
      WITH d AS (SELECT lang,
                   text || ' contact u' || doc_id || '@example.com or 555-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ext ' ||
                     'call 555-' ||
                     lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS salted
                 FROM documents),
        r AS (SELECT lang,
                len(regexp_extract_all(salted, '$EmailRe')) AS n_emails,
                len(regexp_extract_all(salted, '$PhoneRe')) AS n_phones,
                regexp_replace(regexp_replace(salted, '$EmailRe', '[EMAIL]', 'g'),
                  '$PhoneRe', '[PHONE]', 'g') AS redacted
              FROM d)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_emails) AS BIGINT) AS emails_redacted,
             CAST(sum(n_phones) AS BIGINT) AS phones_redacted,
             lower(hex(bit_xor(CAST(('0x' || substring(sha256(redacted), 1, 8))
               AS BIGINT)))) AS redacted_xor
      FROM r GROUP BY lang ORDER BY lang"""))

  /** Vocabulary size for q_vocab_encode — small enough to broadcast
    * trivially; a production tokenizer vocab (32-128k) broadcasts just as
    * well (a few MB). */
  private val VocabSize = 256

  // -- vocabulary build + corpus encode (the tokenizer-fitting step of an
  //    LLM data pipeline): rank tokens by corpus frequency, assign ids to
  //    the top-V, encode every token against the broadcast vocab, and
  //    report per-source coverage. Scale shape: the vocab is a TakeOrdered
  //    top-V off the token histogram (map-side combined); the id-assigning
  //    row_number window runs over V rows, never the corpus; the encode is
  //    a broadcast LEFT join (null = OOV). Coverage is a ratio of exact
  //    long sums — no per-doc doubles averaged, so no summation-order ulp.
  private val vocabEncode = QueryDef(
    "q_vocab_encode",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      // constant partition key: the window runs over ≤VocabSize rows (the
      // limit above); explicit spec keeps the bounded window out of
      // WindowExec's no-partition warning (pmod(n,1) ≡ 0, non-foldable)
      val idWin = org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(col("n"), lit(1)))
        .orderBy(col("n").desc, col("tok").asc)
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc).limit(VocabSize)
        .withColumn("token_id", row_number().over(idWin) - 1)
        .select("tok", "token_id")
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("token_id").isNotNull, 1L).otherwise(0L))
            .as("n_covered"),
          countDistinct("token_id").as("n_used_ids"))
        .select(col("source"), col("n_tokens"), col("n_covered"),
          dround(col("n_covered") / col("n_tokens"), 4).as("coverage"),
          col("n_used_ids"))
        .orderBy("source")
    },
    Some(s"""
      WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
        t AS (SELECT source, tok FROM toks WHERE length(tok) > 0),
        vocab AS (SELECT tok,
                    row_number() OVER (ORDER BY n DESC, tok ASC) - 1
                      AS token_id
                  FROM (SELECT tok, count(*) AS n FROM t GROUP BY tok)
                  ORDER BY n DESC, tok ASC LIMIT $VocabSize),
        enc AS (SELECT t.source, v.token_id
                FROM t LEFT JOIN vocab v ON t.tok = v.tok)
      SELECT source, count(*) AS n_tokens,
             CAST(sum(CASE WHEN token_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_covered,
             ${oround(
               "CAST(sum(CASE WHEN token_id IS NOT NULL THEN 1 ELSE 0 END)" +
                 " AS DOUBLE) / count(*)", 4)} AS coverage,
             count(DISTINCT token_id) AS n_used_ids
      FROM enc GROUP BY source ORDER BY source"""))

  // -- Interpolated BIGRAM-LM cross-entropy (the Jelinek-Mercer smoothed
  //    step up from q_unigram_logprob — the KenLM-class quality signal of
  //    CCNet/Wenzek et al. 2019): per language, train bigram + unigram
  //    models on the corpus itself and score each doc by its mean
  //    negative-log-likelihood over bigram positions under
  //      p(w2|w1) = λ·c(w1 w2)/c(w1·) + (1−λ)·c(w2)/N     (λ = 0.7).
  //    The unigram back-off floors unseen-pair mass, so every observed
  //    bigram scores finite; gibberish with improbable TRANSITIONS (which
  //    a unigram model cannot see) lands in the high-xent tail.
  //
  //    Scale + determinism shape (inherits every q_unigram_logprob
  //    lesson): train + score once per DISTINCT content weighted by
  //    replication m; the LM is a (lang, w1, w2) table that grows with
  //    the corpus — plain shuffle equi-join, NO broadcast hint (Heaps'
  //    law: a forced broadcast is an OOM at 100×, the round-5 verdict
  //    class); per-position NLL is quantized to an integer 1e-6 grid
  //    BEFORE the per-doc sum so every aggregate downstream is an exact
  //    integer sum — order-independent under any partitioning and
  //    bit-identical in the DuckDB twin.
  private val Lambda = 0.7
  private val bigramLogprob = QueryDef(
    "q_bigram_logprob",
    (s, dir) => {
      val keyed = Tables.documents(s, dir)
        .groupBy(sha2(col("text"), 256).as("ckey"), col("lang"))
        .agg(min("text").as("text"), count(lit(1)).as("m"))
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select("ckey", "lang", "m", "toks")
      Cached.withPinned(keyed) { case Seq(keyed) => // r15: pin + plan-truncate
        // bigram positions (w1, w2) per distinct content
        val big = keyed.select(col("ckey"), col("lang"), col("m"),
          explode(expr(
            """transform(sequence(0, size(toks) - 2),
                         i -> struct(element_at(toks, i + 1) AS w1,
                                     element_at(toks, i + 2) AS w2))"""))
            .as("bg"))
          .select(col("ckey"), col("lang"), col("m"),
            col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        // model counts — all replica-weighted exact longs
        val cBig = big.groupBy("lang", "w1", "w2").agg(sum("m").as("c_b"))
        val cCtx = cBig.groupBy("lang", "w1").agg(sum("c_b").as("c_ctx"))
        val uni = keyed.select(col("lang"), col("m"),
            explode(col("toks")).as("w2"))
          .groupBy("lang", "w2").agg(sum("m").as("c_u"))
        val tot = uni.groupBy("lang").agg(sum("c_u").as("n_l"))
        val lm = cBig.join(cCtx, Seq("lang", "w1"))
          .join(uni, Seq("lang", "w2"))
          .join(tot, Seq("lang"))
          .withColumn("nll_i", round(-log(
            lit(Lambda) * (col("c_b").cast("double") / col("c_ctx"))
              + lit(1 - Lambda) * (col("c_u").cast("double") / col("n_l")))
            * 1e6).cast("long"))
          .select("lang", "w1", "w2", "nll_i")
        val perDoc = big.join(lm, Seq("lang", "w1", "w2"))
          .groupBy("ckey", "lang", "m")
          .agg(sum("nll_i").as("nll_sum"), count(lit(1)).as("n_bigrams"))
          .withColumn("xent", col("nll_sum").cast("double") / lit(1e6)
            / col("n_bigrams").cast("double"))
          .withColumn("xent_i", round(col("xent") * 1e6).cast("long"))
        perDoc.groupBy("lang")
          .agg(sum("m").as("n_docs"),
            dround(sum(col("xent_i") * col("m")).cast("double") / lit(1e6)
              / sum(col("m")).cast("double"), 4).as("avg_xent2"),
            dround(min("xent"), 4).as("min_xent2"),
            dround(max("xent"), 4).as("max_xent2"),
            sum(when(col("xent") > 4.0, col("m")).otherwise(0L))
              .as("n_high_xent2"))
          .orderBy("lang")
      }
    },
    Some(s"""
      WITH keyed AS MATERIALIZED (
             SELECT ckey, lang, m, string_split(text, ' ') AS toks
             FROM (SELECT sha256(text) AS ckey, lang, min(text) AS text,
                          count(*) AS m
                   FROM documents GROUP BY 1, 2)
             WHERE len(string_split(text, ' ')) >= 2),
        big AS MATERIALIZED (
             SELECT ckey, lang, m, toks[i] AS w1, toks[i + 1] AS w2
             FROM (SELECT ckey, lang, m, toks,
                     unnest(generate_series(1, len(toks) - 1)) AS i
                   FROM keyed)),
        cbig AS MATERIALIZED (
             SELECT lang, w1, w2, CAST(sum(m) AS BIGINT) AS c_b
             FROM big GROUP BY 1, 2, 3),
        cctx AS (SELECT lang, w1, CAST(sum(c_b) AS BIGINT) AS c_ctx
                 FROM cbig GROUP BY 1, 2),
        uni AS MATERIALIZED (
             SELECT lang, w2, CAST(sum(m) AS BIGINT) AS c_u
             FROM (SELECT lang, m, unnest(toks) AS w2 FROM keyed)
             GROUP BY 1, 2),
        tot AS (SELECT lang, CAST(sum(c_u) AS BIGINT) AS n_l
                FROM uni GROUP BY 1),
        lm AS MATERIALIZED (
             SELECT cbig.lang, cbig.w1, cbig.w2,
                    CAST(round(-ln($Lambda * (CAST(c_b AS DOUBLE) / c_ctx)
                      + ${1 - Lambda} * (CAST(c_u AS DOUBLE) / n_l)) * 1e6)
                      AS BIGINT) AS nll_i
             FROM cbig
             JOIN cctx ON cbig.lang = cctx.lang AND cbig.w1 = cctx.w1
             JOIN uni ON cbig.lang = uni.lang AND cbig.w2 = uni.w2
             JOIN tot ON cbig.lang = tot.lang),
        perdoc AS (SELECT ckey, b.lang, m,
                     CAST(sum(nll_i) AS BIGINT) AS nll_sum,
                     count(*) AS n_bigrams
                   FROM big b JOIN lm ON b.lang = lm.lang
                     AND b.w1 = lm.w1 AND b.w2 = lm.w2
                   GROUP BY 1, 2, 3),
        px AS (SELECT lang, m,
                 CAST(nll_sum AS DOUBLE) / 1e6 / n_bigrams AS xent,
                 CAST(round(CAST(nll_sum AS DOUBLE) / 1e6 / n_bigrams * 1e6)
                      AS BIGINT) AS xent_i
               FROM perdoc)
      SELECT lang, CAST(sum(m) AS BIGINT) AS n_docs,
             ${oround("CAST(sum(xent_i * m) AS DOUBLE) / 1e6 / sum(m)", 4)}
               AS avg_xent2,
             ${oround("min(xent)", 4)} AS min_xent2,
             ${oround("max(xent)", 4)} AS max_xent2,
             CAST(sum(CASE WHEN xent > 4.0 THEN m ELSE 0 END) AS BIGINT)
               AS n_high_xent2
      FROM px GROUP BY lang ORDER BY lang"""))

  // -- Kneser-Ney smoothed bigram LM (the KenLM default — Kneser & Ney
  //    1995, absolute discounting with a CONTINUATION back-off): where
  //    Jelinek-Mercer (q_bigram_logprob) backs off to raw unigram
  //    frequency, KN backs off to how many distinct CONTEXTS a word
  //    completes — "francisco" is frequent but only ever follows "san",
  //    so its continuation mass is tiny. The standard LM for perplexity-
  //    based corpus filtering (CCNet trains exactly this class).
  //      p_KN(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
  //                  + D·N1+(w1·)/c(w1·) · N1+(·w2)/|bigram types|
  //    with D = 0.75. Every distinct scored bigram has c ≥ 1, so all
  //    probabilities are finite without any extra floor.
  //
  //    Scale + determinism shape (inherits the q_bigram_logprob lessons):
  //    train + score once per DISTINCT content weighted by replication m;
  //    all four model tables derive from ONE grouped bigram-count table
  //    (cbig) — the occurrence counts are replica-weighted longs, the
  //    N1+ tables are TYPE counts (count(*) over cbig rows), so nothing
  //    re-touches the corpus; the LM join is a plain shuffle equi-join,
  //    NO broadcast hint (vocabulary grows with the corpus — Heaps' law);
  //    per-position NLL is quantized to the 1e-6 integer grid BEFORE the
  //    per-doc sum, so every downstream aggregate is an exact integer sum,
  //    order-independent under any partitioning.
  private val KnD = 0.75
  private val knBigramLogprob = QueryDef(
    "q_kn_bigram_logprob",
    (s, dir) => {
      val keyed = Tables.documents(s, dir)
        .groupBy(sha2(col("text"), 256).as("ckey"), col("lang"))
        .agg(min("text").as("text"), count(lit(1)).as("m"))
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select("ckey", "lang", "m", "toks")
      Cached.withPinned(keyed) { case Seq(keyed) => // r15: pin + plan-truncate
        val big = keyed.select(col("ckey"), col("lang"), col("m"),
          explode(expr(
            """transform(sequence(0, size(toks) - 2),
                         i -> struct(element_at(toks, i + 1) AS w1,
                                     element_at(toks, i + 2) AS w2))"""))
            .as("bg"))
          .select(col("ckey"), col("lang"), col("m"),
            col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        // one grouped pass; every model statistic below reads cbig only
        val cBig = big.groupBy("lang", "w1", "w2").agg(sum("m").as("c_b"))
        val ctx = cBig.groupBy("lang", "w1")
          .agg(sum("c_b").as("c_ctx"), count(lit(1)).as("n1p_fwd"))
        val cont = cBig.groupBy("lang", "w2").agg(count(lit(1)).as("n1p_bwd"))
        val types = cBig.groupBy("lang").agg(count(lit(1)).as("n_types"))
        val lm = cBig.join(ctx, Seq("lang", "w1"))
          .join(cont, Seq("lang", "w2"))
          .join(types, Seq("lang"))
          .withColumn("p_kn",
            (greatest(col("c_b").cast("double") - lit(KnD), lit(0.0))
              + lit(KnD) * col("n1p_fwd")
                * (col("n1p_bwd").cast("double") / col("n_types")))
              / col("c_ctx"))
          .withColumn("nll_i", round(-log(col("p_kn")) * 1e6).cast("long"))
          .select("lang", "w1", "w2", "nll_i")
        val perDoc = big.join(lm, Seq("lang", "w1", "w2"))
          .groupBy("ckey", "lang", "m")
          .agg(sum("nll_i").as("nll_sum"), count(lit(1)).as("n_bigrams"))
          .withColumn("xent", col("nll_sum").cast("double") / lit(1e6)
            / col("n_bigrams").cast("double"))
          .withColumn("xent_i", round(col("xent") * 1e6).cast("long"))
        perDoc.groupBy("lang")
          .agg(sum("m").as("n_docs"),
            dround(sum(col("xent_i") * col("m")).cast("double") / lit(1e6)
              / sum(col("m")).cast("double"), 4).as("avg_kn_xent"),
            dround(min("xent"), 4).as("min_kn_xent"),
            dround(max("xent"), 4).as("max_kn_xent"),
            sum(when(col("xent") > 4.0, col("m")).otherwise(0L))
              .as("n_high_kn_xent"))
          .orderBy("lang")
      }
    },
    Some(s"""
      WITH keyed AS MATERIALIZED (
             SELECT ckey, lang, m, string_split(text, ' ') AS toks
             FROM (SELECT sha256(text) AS ckey, lang, min(text) AS text,
                          count(*) AS m
                   FROM documents GROUP BY 1, 2)
             WHERE len(string_split(text, ' ')) >= 2),
        big AS MATERIALIZED (
             SELECT ckey, lang, m, toks[i] AS w1, toks[i + 1] AS w2
             FROM (SELECT ckey, lang, m, toks,
                     unnest(generate_series(1, len(toks) - 1)) AS i
                   FROM keyed)),
        cbig AS MATERIALIZED (
             SELECT lang, w1, w2, CAST(sum(m) AS BIGINT) AS c_b
             FROM big GROUP BY 1, 2, 3),
        ctx AS (SELECT lang, w1, CAST(sum(c_b) AS BIGINT) AS c_ctx,
                       count(*) AS n1p_fwd
                FROM cbig GROUP BY 1, 2),
        cont AS (SELECT lang, w2, count(*) AS n1p_bwd FROM cbig GROUP BY 1, 2),
        types AS (SELECT lang, count(*) AS n_types FROM cbig GROUP BY 1),
        lm AS MATERIALIZED (
             SELECT cbig.lang, cbig.w1, cbig.w2,
                    CAST(round(-ln((greatest(CAST(c_b AS DOUBLE) - $KnD, 0.0)
                        + $KnD * n1p_fwd * (CAST(n1p_bwd AS DOUBLE) / n_types))
                      / c_ctx) * 1e6) AS BIGINT) AS nll_i
             FROM cbig
             JOIN ctx ON cbig.lang = ctx.lang AND cbig.w1 = ctx.w1
             JOIN cont ON cbig.lang = cont.lang AND cbig.w2 = cont.w2
             JOIN types ON cbig.lang = types.lang),
        perdoc AS (SELECT ckey, b.lang, m,
                     CAST(sum(nll_i) AS BIGINT) AS nll_sum,
                     count(*) AS n_bigrams
                   FROM big b JOIN lm ON b.lang = lm.lang
                     AND b.w1 = lm.w1 AND b.w2 = lm.w2
                   GROUP BY 1, 2, 3),
        px AS (SELECT lang, m,
                 CAST(nll_sum AS DOUBLE) / 1e6 / n_bigrams AS xent,
                 CAST(round(CAST(nll_sum AS DOUBLE) / 1e6 / n_bigrams * 1e6)
                      AS BIGINT) AS xent_i
               FROM perdoc)
      SELECT lang, CAST(sum(m) AS BIGINT) AS n_docs,
             ${oround("CAST(sum(xent_i * m) AS DOUBLE) / 1e6 / sum(m)", 4)}
               AS avg_kn_xent,
             ${oround("min(xent)", 4)} AS min_kn_xent,
             ${oround("max(xent)", 4)} AS max_kn_xent,
             CAST(sum(CASE WHEN xent > 4.0 THEN m ELSE 0 END) AS BIGINT)
               AS n_high_kn_xent
      FROM px GROUP BY lang ORDER BY lang"""))

  // -- Shannon token entropy per language — the lexical-diversity floor a
  //    mixing planner reads next to raw token counts (a low-entropy slice
  //    is boilerplate-heavy no matter its size; entropy-aware sampling is
  //    the standard counter). Reported with the type count and the
  //    normalized H/ln(V) efficiency so slices of different vocabulary
  //    size compare.
  //
  //    Scale + determinism: one explode + one (lang, token) hash agg
  //    (map-side combined — the vocabulary table, not the corpus, crosses
  //    the wire); each type's contribution −p·ln p is quantized ONCE to a
  //    1e-9 integer grid and the per-lang entropy is an exact BIGINT sum,
  //    order-independent under any partitioning.
  private val tokenEntropy = QueryDef(
    "q_token_entropy",
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      val tot = tok.groupBy("lang")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"))
      tok.join(tot, "lang")
        .withColumn("e_i", round(
          -(col("c").cast("double") / col("n_tokens"))
            * log(col("c").cast("double") / col("n_tokens")) * 1e9)
          .cast("long"))
        .groupBy("lang")
        .agg(first("n_tokens").as("n_tokens"),
          first("n_types").as("n_types"),
          dround(sum("e_i").cast("double") / lit(1e9), 6).as("entropy"),
          dround((sum("e_i").cast("double") / lit(1e9))
            / log(first("n_types").cast("double")), 6).as("efficiency"))
        .orderBy("lang")
    },
    Some(s"""
      WITH tok AS (SELECT lang, tok, count(*) AS c
                   FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                         FROM documents)
                   WHERE length(tok) > 0
                   GROUP BY 1, 2),
        tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
                  count(*) AS n_types
                FROM tok GROUP BY 1),
        e AS (SELECT tok.lang, n_tokens, n_types,
                CAST(round(-(CAST(c AS DOUBLE) / n_tokens)
                  * ln(CAST(c AS DOUBLE) / n_tokens) * 1e9) AS BIGINT) AS e_i
              FROM tok JOIN tot ON tok.lang = tot.lang)
      SELECT lang, any_value(n_tokens) AS n_tokens,
             any_value(n_types) AS n_types,
             ${oround("CAST(sum(e_i) AS DOUBLE) / 1e9", 6)} AS entropy,
             ${oround(
               "(CAST(sum(e_i) AS DOUBLE) / 1e9) / ln(CAST(any_value(n_types) AS DOUBLE))",
               6)} AS efficiency
      FROM e GROUP BY lang ORDER BY lang"""))

  // -- Zipf rank-frequency slope over the top-200 token histogram: fit
  //    ln(freq) = a + slope·ln(rank) by OLS and report the slope (natural
  //    text sits near −1; a flat slope flags synthetic/templated text —
  //    corpus forensics next to q_doc_repetition). ALL OLS moments are
  //    exact BIGINT sums of 1e-6-grid quantized ln values (products
  //    bounded ≤ ~1e18 — checked against Long range), so the fit is
  //    bit-identical across engines; the only float ops are the two final
  //    divisions. The rank window runs over the 200-row top-K, never the
  //    vocabulary (TakeOrdered + the bounded-window pmod trick).
  private val ZipfTopK = 200
  private val zipfSlope = QueryDef(
    "q_zipf_slope",
    (s, dir) => {
      val top = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc).limit(ZipfTopK)
      val idWin = org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(col("c"), lit(1)))
        .orderBy(col("c").desc, col("tok").asc)
      val xy = top.withColumn("rank", row_number().over(idWin))
        .withColumn("x", round(log(col("rank").cast("double")) * 1e6).cast("long"))
        .withColumn("y", round(log(col("c").cast("double")) * 1e6).cast("long"))
      xy.agg(count(lit(1)).as("n"),
          sum(col("x") * col("y")).as("sxy"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n"),
          dround((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
            .as("zipf_slope"),
          dround((col("sy").cast("double") / col("n")
            - ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              * (col("sx").cast("double") / col("n"))) / lit(1e6), 6)
            .as("intercept_ln"))
    },
    Some(s"""
      WITH top AS (SELECT tok, count(*) AS c
                   FROM (SELECT unnest(string_split(text, ' ')) AS tok
                         FROM documents)
                   WHERE length(tok) > 0
                   GROUP BY tok ORDER BY c DESC, tok ASC LIMIT $ZipfTopK),
        xy AS (SELECT CAST(round(ln(CAST(row_number() OVER
                        (ORDER BY c DESC, tok ASC) AS DOUBLE)) * 1e6) AS BIGINT)
                        AS x,
                      CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
               FROM top),
        m AS (SELECT count(*) AS n, CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM xy)
      SELECT n,
             ${oround(
               "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)",
               6)} AS zipf_slope,
             ${oround(
               "(CAST(sy AS DOUBLE) / n - (CAST(n * sxy - sx * sy AS DOUBLE)"
                 + " / CAST(n * sxx - sx * sx AS DOUBLE))"
                 + " * (CAST(sx AS DOUBLE) / n)) / 1e6",
               6)} AS intercept_ln
      FROM m"""))

  // -- adjacent-token mutual information: MI = H(W2) − H(W2|W1) over
  //    bigram positions — how much one token tells you about the next.
  //    Natural prose has high adjacent MI (collocations, syntax);
  //    shuffled/templated text collapses toward 0 — the
  //    information-theoretic completion of the forensics suite
  //    (q_token_entropy measures diversity, q_zipf_slope the frequency
  //    law, this the SEQUENTIAL structure the other two can't see).
  //
  //    Scale + determinism (the LM-family discipline): counts accumulate
  //    once per DISTINCT content weighted by replication m; both
  //    entropies are exact BIGINT sums of 1e-9-grid contributions off the
  //    same grouped bigram-count table; the marginals derive from cbig,
  //    never re-touching the corpus.
  private val bigramMi = QueryDef(
    "q_bigram_mi",
    (s, dir) => {
      val keyed = Tables.documents(s, dir)
        .groupBy(sha2(col("text"), 256).as("ckey"), col("lang"))
        .agg(min("text").as("text"), count(lit(1)).as("m"))
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
      val big = keyed.select(col("lang"), col("m"),
        explode(expr(
          """transform(sequence(0, size(toks) - 2),
                       i -> struct(element_at(toks, i + 1) AS w1,
                                   element_at(toks, i + 2) AS w2))"""))
          .as("bg"))
        .select(col("lang"), col("m"),
          col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val cBig = big.groupBy("lang", "w1", "w2").agg(sum("m").as("c_b"))
      Cached.withPinned(cBig) { case Seq(cBig) => // r15: pin + plan-truncate
        val ctx = cBig.groupBy("lang", "w1").agg(sum("c_b").as("c_ctx"))
        val mrg = cBig.groupBy("lang", "w2").agg(sum("c_b").as("c_w2"))
        val tot = cBig.groupBy("lang").agg(sum("c_b").as("n_l"))
        val hW2 = mrg.join(tot, "lang")
          .withColumn("e_i", round(
            -(col("c_w2").cast("double") / col("n_l"))
              * log(col("c_w2").cast("double") / col("n_l")) * 1e9).cast("long"))
          .groupBy("lang")
          .agg(first("n_l").as("n_bigrams"),
            sum("e_i").as("h2_i"))
        val hCond = cBig.join(ctx, Seq("lang", "w1")).join(tot, "lang")
          .withColumn("e_i", round(
            -(col("c_b").cast("double") / col("n_l"))
              * log(col("c_b").cast("double") / col("c_ctx")) * 1e9).cast("long"))
          .groupBy("lang").agg(sum("e_i").as("hc_i"))
        hW2.join(hCond, "lang")
          .select(col("lang"), col("n_bigrams"),
            dround(col("h2_i").cast("double") / lit(1e9), 6).as("h_w2"),
            dround(col("hc_i").cast("double") / lit(1e9), 6).as("h_cond"),
            dround((col("h2_i") - col("hc_i")).cast("double") / lit(1e9), 6)
              .as("mutual_info"))
          .orderBy("lang")
      }
    },
    Some(s"""
      WITH keyed AS (SELECT lang, m, string_split(text, ' ') AS toks
                     FROM (SELECT lang, min(text) AS text, count(*) AS m
                           FROM documents GROUP BY sha256(text), lang)
                     WHERE len(string_split(text, ' ')) >= 2),
        big AS (SELECT lang, m, toks[i] AS w1, toks[i + 1] AS w2
                FROM (SELECT lang, m, toks,
                        unnest(generate_series(1, len(toks) - 1)) AS i
                      FROM keyed)),
        cbig AS MATERIALIZED (
                SELECT lang, w1, w2, CAST(sum(m) AS BIGINT) AS c_b
                FROM big GROUP BY 1, 2, 3),
        ctx AS (SELECT lang, w1, CAST(sum(c_b) AS BIGINT) AS c_ctx
                FROM cbig GROUP BY 1, 2),
        mrg AS (SELECT lang, w2, CAST(sum(c_b) AS BIGINT) AS c_w2
                FROM cbig GROUP BY 1, 2),
        tot AS (SELECT lang, CAST(sum(c_b) AS BIGINT) AS n_l
                FROM cbig GROUP BY 1),
        h2 AS (SELECT mrg.lang, any_value(n_l) AS n_bigrams,
                 CAST(sum(CAST(round(-(CAST(c_w2 AS DOUBLE) / n_l)
                   * ln(CAST(c_w2 AS DOUBLE) / n_l) * 1e9) AS BIGINT))
                   AS BIGINT) AS h2_i
               FROM mrg JOIN tot ON mrg.lang = tot.lang
               GROUP BY mrg.lang),
        hc AS (SELECT cbig.lang,
                 CAST(sum(CAST(round(-(CAST(c_b AS DOUBLE) / n_l)
                   * ln(CAST(c_b AS DOUBLE) / c_ctx) * 1e9) AS BIGINT))
                   AS BIGINT) AS hc_i
               FROM cbig
               JOIN ctx ON cbig.lang = ctx.lang AND cbig.w1 = ctx.w1
               JOIN tot ON cbig.lang = tot.lang
               GROUP BY cbig.lang)
      SELECT h2.lang, n_bigrams,
             ${oround("CAST(h2_i AS DOUBLE) / 1e9", 6)} AS h_w2,
             ${oround("CAST(hc_i AS DOUBLE) / 1e9", 6)} AS h_cond,
             ${oround("CAST(h2_i - hc_i AS DOUBLE) / 1e9", 6)} AS mutual_info
      FROM h2 JOIN hc ON h2.lang = hc.lang
      ORDER BY h2.lang"""))

  // -- cross-source vocabulary overlap (Jaccard over distinct token
  //    sets): which sources are lexical near-clones of each other — the
  //    governance signal a mixing planner reads before treating sources
  //    as independent (two mirrors of the same crawl look like "diverse"
  //    sources until their vocabularies show J ≈ 1). Top-10 pairs.
  //
  //    Scale: the corpus collapses to the distinct (source, token) table
  //    first (one map-side-combined agg); pairs generate PER TOKEN from
  //    the sources sharing it (≤ S sources → ≤ S² rows per token, S
  //    fixed), an equi-join on the token key — never a source×source×
  //    vocabulary product; |A∪B| recovers as |A|+|B|−|A∩B| from exact
  //    longs, so no union materializes.
  private val vocabOverlap = QueryDef(
    "q_source_vocab_overlap",
    (s, dir) => {
      val st = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .distinct()
      Cached.withPinned(st) { case Seq(st) => // r15: pin + plan-truncate
        val sz = st.groupBy("source").agg(count(lit(1)).as("v"))
        val inter = st.as("a").join(st.as("b"),
            col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sz.select(col("source").as("src_a"), col("v").as("v_a")), "src_a")
          .join(sz.select(col("source").as("src_b"), col("v").as("v_b")), "src_b")
          .withColumn("jaccard", col("inter").cast("double")
            / (col("v_a") + col("v_b") - col("inter")).cast("double"))
          .orderBy(col("jaccard").desc, col("src_a").asc, col("src_b").asc)
          .limit(10)
          .select(col("src_a"), col("src_b"), col("inter"), col("v_a"),
            col("v_b"), dround(col("jaccard"), 6).as("jaccard"))
      }
    },
    Some(s"""
      WITH st AS MATERIALIZED (
              SELECT DISTINCT source, tok
              FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              WHERE length(tok) > 0),
        sz AS (SELECT source, count(*) AS v FROM st GROUP BY source),
        inter AS (SELECT a.source AS src_a, b.source AS src_b,
                    count(*) AS inter
                  FROM st a JOIN st b
                    ON a.tok = b.tok AND a.source < b.source
                  GROUP BY 1, 2)
      SELECT src_a, src_b, inter, sa.v AS v_a, sb.v AS v_b,
             ${oround(
               "CAST(inter AS DOUBLE) / CAST(sa.v + sb.v - inter AS DOUBLE)",
               6)} AS jaccard
      FROM inter
      JOIN sz sa ON inter.src_a = sa.source
      JOIN sz sb ON inter.src_b = sb.source
      ORDER BY CAST(inter AS DOUBLE) / CAST(sa.v + sb.v - inter AS DOUBLE) DESC,
               src_a ASC, src_b ASC
      LIMIT 10"""))

  // -- TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
  //    the token co-occurrence graph (adjacent-token edges, symmetrized,
  //    deduplicated), composed from the SAME integer-grid PageRank
  //    operator as q_pagerank_suppliers — the classic "compose existing
  //    ops" tier. Node ids come from a frequency-ranked vocabulary
  //    (TakeOrdered(V) then row_number over the V survivors — the audited
  //    bounded-global-window pattern), so the graph is VOCAB-bounded: a
  //    100 TB corpus still produces a ≤V-node rank problem after the
  //    linear tally pass.
  private val TrV = 30
  private val TrIters = 3
  private val textrankKeywords = QueryDef(
    "q_textrank_keywords",
    (s, dir) => {
      val keyed = Tables.documents(s, dir)
        .groupBy(sha2(col("text"), 256).as("ckey"))
        .agg(min("text").as("text"), count(lit(1)).as("m"))
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
      Cached.withPinned(keyed) { case Seq(keyed) => // r15: pin + plan-truncate
        val freq = keyed.select(col("m"), explode(col("toks")).as("tok"))
          .groupBy("tok").agg(sum("m").as("f"))
        val wV = org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("f"), lit(1))).orderBy(col("f").desc, col("tok").asc)
        val vocab = freq.orderBy(col("f").desc, col("tok").asc).limit(TrV)
          .withColumn("id", row_number().over(wV)).select("tok", "id")
        val big = keyed.select(col("m"),
          explode(expr(
            """transform(sequence(0, size(toks) - 2),
                         i -> struct(element_at(toks, i + 1) AS w1,
                                     element_at(toks, i + 2) AS w2))"""))
            .as("bg"))
          .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          .filter(col("w1") =!= col("w2"))
        val ids = big
          .join(broadcast(vocab).withColumnRenamed("tok", "w1")
            .withColumnRenamed("id", "id1"), "w1")
          .join(broadcast(vocab).withColumnRenamed("tok", "w2")
            .withColumnRenamed("id", "id2"), "w2")
          .select(col("id1").cast("long").as("a"), col("id2").cast("long").as("b"))
          .distinct()
        // r15: one-pass symmetrization — the union form duplicated the
        // ids subtree (pair window + two vocab joins + distinct) twice.
        val edges = ids.select(explode(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .distinct()
        val ranks = graft.operators.PageRank.ranks(edges, TrIters,
          symmetricEdges = true) // explode-symmetrized above
        ranks.join(broadcast(vocab), col("node") === col("id"))
          .select(col("tok").as("keyword"), dround(col("r") / 1e9, 6).as("rank"))
          .orderBy(col("rank").desc, col("keyword").asc)
          .limit(20)
      }
    },
    Some {
      val rounds = (1 to TrIters).map { i =>
        s"""c$i AS MATERIALIZED (SELECT e.dst AS node,
                 CAST(sum(r.r // o.outdeg) AS BIGINT) AS sc
               FROM edges e
               JOIN outd o ON e.src = o.src
               JOIN r${i - 1} r ON r.node = e.src
               GROUP BY e.dst),
        r$i AS MATERIALIZED (SELECT n.node,
                 150000000 + (coalesce(c.sc, CAST(0 AS BIGINT)) * 85) // 100
                   AS r
               FROM nodes n LEFT JOIN c$i c ON n.node = c.node)"""
      }.mkString(",\n        ")
      s"""
      WITH keyed AS MATERIALIZED (
                SELECT min(text) AS text, count(*) AS m
                FROM documents GROUP BY sha256(text)),
        toks AS MATERIALIZED (
                SELECT m, string_split(text, ' ') AS toks FROM keyed
                WHERE len(string_split(text, ' ')) >= 2),
        freq AS (SELECT tok, CAST(sum(m) AS BIGINT) AS f
                 FROM (SELECT m, unnest(toks) AS tok FROM toks) GROUP BY tok),
        vocab AS MATERIALIZED (
                SELECT tok, id FROM
                  (SELECT tok, row_number() OVER (ORDER BY f DESC, tok ASC)
                     AS id FROM freq)
                WHERE id <= $TrV),
        big AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
                FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1))
                        AS i
                      FROM toks)
                WHERE toks[i] <> toks[i + 1]),
        ids AS (SELECT DISTINCT v1.id AS a, v2.id AS b
                FROM big JOIN vocab v1 ON big.w1 = v1.tok
                         JOIN vocab v2 ON big.w2 = v2.tok),
        edges AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM (
                  SELECT a AS src, b AS dst FROM ids
                  UNION ALL SELECT b AS src, a AS dst FROM ids)),
        outd AS MATERIALIZED (SELECT src, count(*) AS outdeg
                FROM edges GROUP BY src),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
        r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        $rounds
      SELECT v.tok AS keyword, ${oround("r / 1e9", 6)} AS rank
      FROM r$TrIters JOIN vocab v ON node = v.id
      ORDER BY rank DESC, keyword ASC
      LIMIT 20"""
    })

  // -- Multinomial Naive Bayes language classifier, trained ON the corpus
  //    (even doc_ids) and evaluated on the held-out half (odd doc_ids):
  //    Laplace-smoothed per-(lang, token) log-likelihoods + log priors,
  //    argmax per document, reported as a confusion matrix. The trained
  //    sibling of q_lang_id_confusion's profile heuristic and
  //    q_quality_classifier's hashed linear model.
  //
  //    Determinism: each per-token log term is snapped to the 1e-9
  //    integer grid BEFORE summation (the bigram-MI discipline), so
  //    per-document scores are exact LONG sums — partition order cannot
  //    move the argmax. Scale shape: model build is two grouped counts;
  //    scoring is one equi-join of test tokens × the broadcast lang list
  //    against the (lang, token) table, linear in corpus tokens.
  private val nbLangClassify = QueryDef(
    "q_nb_lang_classify",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
      Cached.withPinned(docs) { case Seq(docs) => // r15: pin + plan-truncate
        val train = docs.filter(col("doc_id") % 2 === 0)
        val test = docs.filter(col("doc_id") % 2 === 1)
        val lt = train.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        val langTot = lt.groupBy("lang").agg(sum("c").as("tl"))
        val vocabN = lt.agg(countDistinct("tok").as("v"))
        val docsPerLang = train.groupBy("lang", "doc_id").agg(count(lit(1)))
          .groupBy("lang").agg(count(lit(1)).as("dl"))
        val langs = langTot.join(docsPerLang, "lang")
          .crossJoin(broadcast(vocabN))
          .crossJoin(broadcast(docsPerLang.agg(sum("dl").as("dtot"))))
          .select(col("lang").as("clang"),
            expr("CAST(round(ln(CAST(dl AS DOUBLE) / dtot) * 1e9) AS BIGINT)")
              .as("prior_i"),
            (col("tl") + col("v")).as("denom"))
        val tt = test.groupBy(col("doc_id"), col("lang").as("true_lang"),
          col("tok")).agg(count(lit(1)).as("tc"))
        val scored = tt.crossJoin(broadcast(langs))
          .join(lt.withColumnRenamed("lang", "clang"), Seq("clang", "tok"),
            "left")
          .withColumn("term_i", col("tc")
            * expr("CAST(round(ln(CAST(coalesce(c, 0) + 1 AS DOUBLE) / denom) * 1e9) AS BIGINT)"))
        val perDoc = scored
          .groupBy("doc_id", "true_lang", "clang")
          .agg((first("prior_i") + sum("term_i")).as("score_i"))
        val wPick = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("score_i").desc, col("clang").asc)
        perDoc.withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .groupBy(col("true_lang"), col("clang").as("predicted"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("true_lang", "predicted")
      }
    },
    Some("""
      WITH docs AS MATERIALIZED (
                SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
                FROM documents),
        train AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
        test AS (SELECT * FROM docs WHERE doc_id % 2 = 1),
        lt AS MATERIALIZED (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
              FROM train GROUP BY 1, 2),
        langtot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tl
                    FROM lt GROUP BY 1),
        vocabn AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM lt),
        dpl AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS dl
                FROM train GROUP BY 1),
        dtot AS (SELECT CAST(sum(dl) AS BIGINT) AS dtot FROM dpl),
        langs AS (SELECT langtot.lang AS clang,
                    CAST(round(ln(CAST(dl AS DOUBLE) / dtot.dtot) * 1e9)
                      AS BIGINT) AS prior_i,
                    tl + v AS denom
                  FROM langtot JOIN dpl ON langtot.lang = dpl.lang
                  CROSS JOIN vocabn CROSS JOIN dtot),
        tt AS (SELECT doc_id, lang AS true_lang, tok,
                 CAST(count(*) AS BIGINT) AS tc
               FROM test GROUP BY 1, 2, 3),
        scored AS (SELECT tt.doc_id, tt.true_lang, langs.clang,
                     langs.prior_i,
                     tt.tc * CAST(round(ln(CAST(coalesce(lt.c, 0) + 1
                       AS DOUBLE) / langs.denom) * 1e9) AS BIGINT) AS term_i
                   FROM tt CROSS JOIN langs
                   LEFT JOIN lt ON lt.lang = langs.clang
                               AND lt.tok = tt.tok),
        perdoc AS (SELECT doc_id, true_lang, clang,
                     any_value(prior_i) + CAST(sum(term_i) AS BIGINT)
                       AS score_i
                   FROM scored GROUP BY 1, 2, 3),
        pick AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY score_i DESC, clang ASC) AS rn
                 FROM perdoc)
      SELECT true_lang, clang AS predicted,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM pick WHERE rn = 1
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // -- Good–Turing count-of-counts [Good 1953]: N_r = number of trigram
  //    types observed exactly r times, and the smoothed count
  //    r* = (r+1)·N_{r+1}/N_r — the frequency-of-frequencies table every
  //    smoothing LM (and the unseen-mass estimate N_1/N) starts from.
  //    TRIGRAMS, not unigrams: the fixture vocabulary is 31 words (every
  //    unigram appears hundreds of times — no tail), while its ~16.5k
  //    trigram types are singleton-dominated, which is the regime GT
  //    smoothing exists for. Vocab-shaped by construction: the
  //    corpus-sized trigram stream collapses to per-type counts
  //    (map-side combinable), those collapse to the count-of-counts
  //    histogram (≤ distinct frequencies rows), and N_{r+1} attaches via
  //    a self-join on r+1 — no window, so nothing unpartitioned ever
  //    sorts (WindowAuditSpec). r* is an exact integer ratio evaluated
  //    once in double, identically cross-engine.
  private val goodTuring = QueryDef(
    "q_good_turing",
    (s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(split(col("text"), " ").as("toks"))
        .select(explode(expr(
          """CASE WHEN size(toks) >= 3
                  THEN transform(sequence(0, size(toks) - 3),
                                 i -> concat_ws(' ', slice(toks, i + 1, 3)))
                  ELSE array() END""")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("r"))
      val nr = tf.groupBy("r").agg(count(lit(1)).as("n_r"))
      nr.as("a")
        .join(nr.as("b"), col("a.r") + 1 === col("b.r"), "left")
        .select(col("a.r").as("r"), col("a.n_r").as("n_r"),
          dround((col("a.r") + 1).cast("double")
            * coalesce(col("b.n_r"), lit(0L)).cast("double")
            / col("a.n_r").cast("double"), 6).as("r_star"))
        .filter(col("r") <= 10)
        .orderBy("r")
    },
    Some(s"""
      WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
        tf AS (SELECT g, CAST(count(*) AS BIGINT) AS r
               FROM (SELECT unnest(list_transform(
                        generate_series(1, len(ts) - 2),
                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
                     FROM toks)
               GROUP BY g),
        nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tf GROUP BY r)
      SELECT a.r, a.n_r,
             ${oround("""CAST(a.r + 1 AS DOUBLE)
               * CAST(coalesce(b.n_r, 0) AS DOUBLE)
               / CAST(a.n_r AS DOUBLE)""", 6)} AS r_star
      FROM nr a LEFT JOIN nr b ON a.r + 1 = b.r
      WHERE a.r <= 10 ORDER BY a.r"""))

  // -- Jensen–Shannon divergence [Lin 1991] between per-language unigram
  //    LMs — the symmetric, bounded (≤1 bit) corpus-drift metric a
  //    mixture pipeline tracks between sources (PSI's info-theoretic
  //    sibling; q_psi_drift buckets a score column, this compares whole
  //    token distributions). Distributions are exact-integer counts
  //    normalized once in double; each term's JS contribution is floored
  //    to the 1e-8 grid and summed as BIGINT, so the per-pair total is
  //    order-independent (the q_bm25_topk/q_kn_bigram_logprob ln-grid
  //    discipline — ln() on identical doubles, never engine-specific
  //    log2()). The (lang-pair × vocab) grid is dimension-sized: langs
  //    and the vocabulary histogram are both tiny next to the corpus,
  //    and the one corpus-sized stage is the map-side-combinable
  //    (lang, term) count.
  private val jsDivergence = QueryDef(
    "q_js_divergence",
    (s, dir) => {
      val c = Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("lang", "term").agg(count(lit(1)).as("c"))
      val n = c.groupBy("lang").agg(sum("c").as("n"))
      val pairsL = n.as("la").join(n.as("lb"), col("la.lang") < col("lb.lang"))
        .select(col("la.lang").as("lang_a"), col("la.n").as("na"),
          col("lb.lang").as("lang_b"), col("lb.n").as("nb"))
      val terms = c.select("term").distinct()
      broadcast(pairsL).crossJoin(terms)
        .join(c.select(col("lang").as("lang_a"), col("term"),
          col("c").as("ca")), Seq("lang_a", "term"), "left")
        .join(c.select(col("lang").as("lang_b"), col("term"),
          col("c").as("cb")), Seq("lang_b", "term"), "left")
        .withColumn("p",
          coalesce(col("ca"), lit(0L)).cast("double") / col("na").cast("double"))
        .withColumn("q",
          coalesce(col("cb"), lit(0L)).cast("double") / col("nb").cast("double"))
        .withColumn("contrib_u", floor(lit(1e8) *
          (when(col("p") > 0, col("p") *
             (log(col("p") * 2 / (col("p") + col("q"))) / log(lit(2.0))))
            .otherwise(lit(0.0)) * 0.5 +
           when(col("q") > 0, col("q") *
             (log(col("q") * 2 / (col("p") + col("q"))) / log(lit(2.0))))
            .otherwise(lit(0.0)) * 0.5)).cast("long"))
        .groupBy("lang_a", "lang_b")
        .agg(count(when(coalesce(col("ca"), lit(0L)) > 0 &&
            coalesce(col("cb"), lit(0L)) > 0, 1)).as("shared_terms"),
          sum("contrib_u").as("jsd_u"))
        .select(col("lang_a"), col("lang_b"), col("shared_terms"),
          dround(col("jsd_u").cast("double") / 1e8, 6).as("jsd_bits"))
        .orderBy("lang_a", "lang_b")
    },
    Some(s"""
      WITH c AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c
                 FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
                       FROM documents)
                 WHERE len(term) > 0 GROUP BY 1, 2),
        n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        pairs AS (SELECT la.lang AS lang_a, la.n AS na,
                         lb.lang AS lang_b, lb.n AS nb
                  FROM n la JOIN n lb ON la.lang < lb.lang),
        terms AS (SELECT DISTINCT term FROM c),
        g AS (SELECT p.lang_a, p.lang_b,
                coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb,
                CAST(coalesce(ca.c, 0) AS DOUBLE) / CAST(p.na AS DOUBLE) AS pp,
                CAST(coalesce(cb.c, 0) AS DOUBLE) / CAST(p.nb AS DOUBLE) AS qq
              FROM pairs p CROSS JOIN terms t
              LEFT JOIN c ca ON ca.lang = p.lang_a AND ca.term = t.term
              LEFT JOIN c cb ON cb.lang = p.lang_b AND cb.term = t.term)
      SELECT lang_a, lang_b,
             CAST(count(CASE WHEN ca > 0 AND cb > 0 THEN 1 END) AS BIGINT)
               AS shared_terms,
             ${oround("""CAST(sum(CAST(floor(1e8 * (
               CASE WHEN pp > 0
                 THEN pp * (ln(pp * 2 / (pp + qq)) / ln(2.0)) ELSE 0.0
               END * 0.5 +
               CASE WHEN qq > 0
                 THEN qq * (ln(qq * 2 / (pp + qq)) / ln(2.0)) ELSE 0.0
               END * 0.5)) AS BIGINT)) AS BIGINT)
               / 1e8""", 6)} AS jsd_bits
      FROM g GROUP BY 1, 2 ORDER BY 1, 2"""))

  override def queries: Seq[QueryDef] =
    Seq(tokenStats, docQuality, langId, fingerprint, keywordHits, tokenCountsBpe,
      tfidfTop, weightedSample, docRepetition, mixtureRates, qualityFilterRules,
      unigramLogprob, piiRedaction, vocabEncode, bigramLogprob, knBigramLogprob,
      tokenEntropy, zipfSlope, bigramMi, vocabOverlap, textrankKeywords,
      nbLangClassify, goodTuring, jsDivergence)
}
