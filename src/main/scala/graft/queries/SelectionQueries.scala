package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Det.{dround, oround}

/** Training-data SELECTION operators — the "which documents go into the
  * corpus" layer of an LLM data pipeline, complementing the dedup/quality
  * modules:
  *
  *   - DSIR-style importance weighting (Xie et al. 2023, arXiv:2302.03169):
  *     rank raw documents by how target-like their n-gram distribution is.
  *   - Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009):
  *     fuse a lexical BM25 ranking with a dense embedding-cosine ranking.
  *   - The BPE merge step (Sennrich et al. 2016): the adjacent-pair
  *     frequency count at the heart of tokenizer training.
  *   - Perplexity-bucketed stratification (CCNet-style, Wenzek et al. 2020):
  *     bucket documents by unigram cross-entropy for quality-stratified
  *     sampling.
  *
  * Reference anchor: the scoring engine selects and routes evidence by
  * keyword relevance and quality (pe-org-air-platform/app/scoring_engine/
  * evidence_mapper.py); these are the corpus-scale generalizations of that
  * selection step, expressed as pure relational algebra.
  *
  * Determinism doctrine (shared with RetrievalQueries.q_bm25_topk): every
  * per-term float (log-probability, log-ratio, BM25 contribution) is
  * quantized ONCE to a 1e-6 integer grid, and all downstream accumulation
  * is BIGINT arithmetic — order-independent, bit-identical across engines
  * and partitionings. RRF needs no floats at all: floor(1e6/(k+rank)) is
  * exact integer arithmetic end to end.
  */
object SelectionQueries extends QueryModule {

  // ---------------------------------------------------------------------
  // DSIR importance weighting: w(doc) = Σ_tokens log p_target(t)/p_raw(t),
  // target = the English slice, raw = the full corpus, add-1 smoothing over
  // the raw vocabulary.
  //
  // Scale: both LMs are vocabulary-sized aggregates (map-side combined
  // before their shuffle); the per-term log-ratio is quantized once on the
  // vocabulary table, and the per-doc weight is Σ tf·w_u over the (doc,
  // term) tf table — one explode, two hash aggs, one equi-join on term
  // that AQE broadcasts while the vocab is small and shuffles when it
  // isn't (no forced broadcast: vocabulary grows with the corpus — the
  // round-5 q_unigram_logprob lesson). Top-N selection is a
  // TakeOrderedAndProject, never a full sort.
  private val DsirTopN = 20

  private val dsir = QueryDef(
    "q_dsir_importance",
    (s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "lang", "term").agg(count(lit(1)).as("tf"))
      val raw = tf.groupBy("term").agg(sum("tf").as("cnt_r"))
      val tgt = tf.filter(col("lang") === "en")
        .groupBy("term").agg(sum("tf").as("cnt_t"))
      val totals = raw.agg(sum("cnt_r").cast("double").as("tot_r"),
        count(lit(1)).cast("double").as("vocab"))
        .crossJoin(tf.filter(col("lang") === "en")
          .agg(sum("tf").cast("double").as("tot_t")))
      // Per-TERM quantized log-ratio: ln evaluated once per vocab entry,
      // then frozen to the 1e-6 grid before any per-doc accumulation.
      val w = raw.join(tgt, Seq("term"), "left")
        .crossJoin(broadcast(totals))
        .withColumn("lr",
          log((coalesce(col("cnt_t"), lit(0L)) + lit(1.0)) / (col("tot_t") + col("vocab"))) -
          log((col("cnt_r") + lit(1.0)) / (col("tot_r") + col("vocab"))))
        .select(col("term"), floor(col("lr") * lit(1e6)).cast("long").as("w_u"))
      val scored = tf.join(w, "term")
        .groupBy("doc_id", "lang")
        .agg(sum(col("tf") * col("w_u")).cast("long").as("wt_u"),
          sum("tf").cast("long").as("n_toks"))
      // Top-N first (TakeOrderedAndProject — per-partition heaps, never a
      // global sort), THEN rank the ≤N survivors under the declared
      // bounded single-partition window (see WindowAuditSpec).
      val top = scored.orderBy(col("wt_u").desc, col("doc_id").asc).limit(DsirTopN)
      val rk = Window.partitionBy(pmod(col("doc_id"), lit(1)))
        .orderBy(col("wt_u").desc, col("doc_id").asc)
      top.withColumn("rank", row_number().over(rk))
        .select(col("rank"), col("doc_id"), col("lang"), col("n_toks"),
          (col("wt_u").cast("double") / lit(1e6)).as("dsir_weight"))
        .orderBy("rank")
    },
    Some(s"""
      WITH tf AS (SELECT doc_id, lang, term, count(*) AS tf
                  FROM (SELECT doc_id, lang,
                          unnest(string_split(text, ' ')) AS term
                        FROM documents)
                  GROUP BY 1, 2, 3),
        raw AS (SELECT term, sum(tf) AS cnt_r FROM tf GROUP BY term),
        tgt AS (SELECT term, sum(tf) AS cnt_t FROM tf WHERE lang = 'en'
                GROUP BY term),
        tot AS (SELECT (SELECT CAST(sum(cnt_r) AS DOUBLE) FROM raw) AS tot_r,
                       (SELECT CAST(count(*) AS DOUBLE) FROM raw) AS vocab,
                       (SELECT CAST(sum(tf) AS DOUBLE) FROM tf
                        WHERE lang = 'en') AS tot_t),
        w AS (SELECT raw.term,
                CAST(floor((ln((coalesce(tgt.cnt_t, 0) + 1.0) / (tot.tot_t + tot.vocab))
                          - ln((raw.cnt_r + 1.0) / (tot.tot_r + tot.vocab))) * 1e6)
                  AS BIGINT) AS w_u
              FROM raw LEFT JOIN tgt ON raw.term = tgt.term CROSS JOIN tot),
        scored AS (SELECT tf.doc_id, tf.lang,
                     CAST(sum(tf.tf * w.w_u) AS BIGINT) AS wt_u,
                     CAST(sum(tf.tf) AS BIGINT) AS n_toks
                   FROM tf JOIN w ON tf.term = w.term
                   GROUP BY 1, 2),
        rk AS (SELECT *, row_number() OVER (ORDER BY wt_u DESC, doc_id ASC)
                 AS rank FROM scored)
      SELECT rank, doc_id, lang, n_toks,
             CAST(wt_u AS DOUBLE) / 1e6 AS dsir_weight
      FROM rk WHERE rank <= $DsirTopN ORDER BY rank"""))

  // ---------------------------------------------------------------------
  // Hybrid retrieval with reciprocal-rank fusion: for each query, rank the
  // corpus lexically (BM25 over the query's terms) and densely (cosine of
  // the document embedding to the query vector), then fuse with
  // RRF(d) = Σ_retrievers 1/(k + rank_r(d)), k = 60.
  //
  // Scale: the lexical side is the BM25 shape (posting-stats aggregates +
  // broadcast query terms — candidates only, never the corpus, reach the
  // scoring reducer). The dense side here is the exact brute-force scan
  // (correctness baseline); at 100 TB you swap in the IVF/LSH candidate
  // generation (q_ann_ivf / q_ann_lsh_bucketed) and the fusion is
  // unchanged — RRF only consumes (query, doc, rank) tuples. Fusion
  // itself is integer arithmetic on two rank columns: floor(1e6/(60+r))
  // summed as BIGINT, no floats anywhere.
  private val RrfK = 60
  private val RrfTopK = 10
  private val hybridQueries: Seq[(Int, String)] = Seq(
    1 -> "spark", 1 -> "shuffle",
    2 -> "window", 2 -> "stream",
    3 -> "hash", 3 -> "join")
  private val K1 = 1.2
  private val B = 0.75

  private val hybrid = QueryDef(
    "q_hybrid_rrf",
    (s, dir) => {
      import graft.functions.VectorFunctions.{cosine, vecNorm}
      import s.implicits._
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("dl", size(col("toks")))
      val stats = d.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val qs = hybridQueries.toDF("query_id", "term")
      // posting-filtered tf — see q_bm25_topk: the query-term semi-filter
      // precedes the aggregate, so the shuffle is match-mass-, not
      // vocabulary-, sized
      val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .join(broadcast(qs.select("term").distinct()), "term")
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val lex = tf
        .join(broadcast(qs), "term")
        .join(broadcast(dfreq), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("contrib", log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
        .withColumn("contrib_u", floor(col("contrib") * lit(1e6)).cast("long"))
        .groupBy("query_id", "doc_id").agg(sum("contrib_u").as("bm25_u"))
        .withColumn("lex_rank", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("bm25_u").desc, col("doc_id").asc)))
        .select(col("query_id"), col("doc_id"), col("lex_rank"))
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", vecNorm(col("vecd")))
      val qv = e.filter(col("vec_id").isin(hybridQueries.map(_._1).distinct: _*))
        .select(col("vec_id").as("query_id"), col("vecd").as("qv"), col("nrm").as("qn"))
      val dense = e.select(col("vec_id").as("doc_id"), col("vecd"), col("nrm"))
        .crossJoin(broadcast(qv))
        .withColumn("cos", cosine(col("vecd"), col("qv"), col("nrm"), col("qn")))
        .withColumn("dense_rank", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("doc_id").asc)))
        .select(col("query_id"), col("doc_id"), col("dense_rank"))
      val fused = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf_u",
          coalesce(floor(lit(1e6) / (lit(RrfK) + col("lex_rank"))).cast("long"), lit(0L)) +
          coalesce(floor(lit(1e6) / (lit(RrfK) + col("dense_rank"))).cast("long"), lit(0L)))
      fused.withColumn("rank", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("rrf_u").desc, col("doc_id").asc)))
        .filter(col("rank") <= RrfTopK)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("lex_rank"), col("dense_rank"),
          (col("rrf_u").cast("double") / lit(1e6)).as("rrf"))
        .orderBy("query_id", "rank")
    },
    Some {
      val qvals = hybridQueries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      val qids = hybridQueries.map(_._1).distinct.mkString(", ")
      s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        dl AS (SELECT doc_id, len(toks) AS dl FROM d),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM (SELECT doc_id, unnest(toks) AS term FROM d) GROUP BY 1, 2),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        qs AS (SELECT * FROM (VALUES $qvals) AS t(query_id, term)),
        lexs AS (SELECT qs.query_id, tf.doc_id,
                   CAST(sum(CAST(floor(
                     ln(1.0 + (st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                     * (tf.tf * ${K1 + 1.0})
                     / (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / st.avgdl))
                     * 1e6) AS BIGINT)) AS BIGINT) AS bm25_u
                 FROM tf JOIN qs ON tf.term = qs.term
                 JOIN dfq ON tf.term = dfq.term
                 JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
                 GROUP BY 1, 2),
        lex AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY bm25_u DESC, doc_id ASC) AS lex_rank
                FROM lexs),
        e AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
              FROM embeddings),
        qv AS (SELECT vec_id AS query_id, vecd AS qv, nrm AS qn FROM e
               WHERE vec_id IN ($qids)),
        dense AS (SELECT query_id, doc_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, doc_id ASC) AS dense_rank
                  FROM (SELECT qv.query_id, e.vec_id AS doc_id,
                          list_sum(list_transform(list_zip(e.vecd, qv.qv),
                            x -> x[1] * x[2])) / (e.nrm * qv.qn) AS cos
                        FROM e CROSS JOIN qv)),
        fused AS (SELECT coalesce(lex.query_id, dense.query_id) AS query_id,
                    coalesce(lex.doc_id, dense.doc_id) AS doc_id,
                    lex.lex_rank, dense.dense_rank,
                    coalesce(CAST(floor(1e6 / ($RrfK + lex.lex_rank)) AS BIGINT), 0)
                    + coalesce(CAST(floor(1e6 / ($RrfK + dense.dense_rank)) AS BIGINT), 0)
                      AS rrf_u
                  FROM lex FULL OUTER JOIN dense
                    ON lex.query_id = dense.query_id AND lex.doc_id = dense.doc_id),
        rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf_u DESC, doc_id ASC) AS rank FROM fused)
      SELECT query_id, rank, doc_id, lex_rank, dense_rank,
             CAST(rrf_u AS DOUBLE) / 1e6 AS rrf
      FROM rk WHERE rank <= $RrfTopK ORDER BY query_id, rank"""
    })

  // ---------------------------------------------------------------------
  // BPE merge step: the adjacent-pair frequency count that tokenizer
  // training iterates (count all adjacent symbol pairs, merge the most
  // frequent, repeat). One iteration, word-level symbols, global top-20.
  //
  // Scale: pair generation is a linear per-doc transform (array HOF, no
  // join); the count is a hash agg keyed by the pair string with full
  // map-side combine, and the top-20 is TakeOrderedAndProject — the
  // classic word-count shape, embarrassingly parallel at any corpus size.
  private val BpeTopK = 20

  private val bpeMerge = QueryDef(
    "q_bpe_merge_step",
    (s, dir) => {
      val pairs = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i + 1]))"
        )).as("pair"))
      val counted = pairs.groupBy("pair")
        .agg(count(lit(1)).as("pair_count"))
      // TakeOrdered top-K, then rank the ≤K survivors (bounded window,
      // declared in WindowAuditSpec) — the pair vocabulary scales with
      // the corpus, so a global rank over it would be a one-task funnel.
      val top = counted.orderBy(col("pair_count").desc, col("pair").asc).limit(BpeTopK)
      top.withColumn("rank", row_number().over(
          Window.partitionBy(pmod(length(col("pair")), lit(1)))
            .orderBy(col("pair_count").desc, col("pair").asc)))
        .select(col("rank"), col("pair"), col("pair_count"))
        .orderBy("rank")
    },
    Some(s"""
      WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents
                 WHERE len(string_split(text, ' ')) >= 2),
        p AS (SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS pair FROM d),
        c AS (SELECT pair, count(*) AS pair_count FROM p GROUP BY pair),
        rk AS (SELECT *, row_number() OVER (ORDER BY pair_count DESC, pair ASC)
                 AS rank FROM c)
      SELECT rank, pair, pair_count FROM rk
      WHERE rank <= $BpeTopK ORDER BY rank"""))

  // ---------------------------------------------------------------------
  // Iterated BPE trainer (Sennrich et al. 2016, the full merge loop):
  // q_bpe_merge_step proves ONE adjacent-pair count; a real tokenizer fit
  // iterates K merges with re-pairing — count pairs over the current
  // symbolization, merge the argmax pair everywhere, repeat. This runs
  // K=8 character-level merges over the word-frequency table and returns
  // the learned merge table (step, lhs, rhs, merged, pair_count).
  //
  // Scale: BPE training NEVER touches the corpus after the first pass —
  // it operates on word TYPES weighted by corpus frequency, so every
  // iteration is vocabulary-bounded (the corpus-sized work is exactly one
  // word-count agg with full map-side combine). Each round references the
  // previous vocab frame twice (pair count + merge), so the frame is
  // localCheckpoint'd per round — the q_bradley_terry lineage discipline:
  // plans stay constant-size instead of growing 4^K. The argmax pair
  // joins back as a 1-row broadcast (never a driver-side collect).
  //
  // Determinism: symbols are encoded as U+0001…U+0002 WRAPPED spans
  // ("low" → "␁l␂␁o␂␁w␂") so the merge is a plain left-to-right literal
  // `replace` of "␁a␂␁b␂" with "␁ab␂". Wrapping makes BOTH symbol
  // boundaries unforgeable: the round-12 prefix-only form ("␁l␁o␁w",
  // match "␁a␁b") could merge ACROSS a boundary when rhs was a proper
  // prefix of a longer symbol — after (t,h)→th, a later argmax (x,t)
  // matched inside "␁x␁th" and produced the non-BPE symbol "xth" in both
  // engines identically, the flaw class the oracle can't see (round-13
  // advisor; BpeRefSpec now pins the loop to an independent reference
  // implementation). The end marker also keeps consecutive matches
  // non-overlapping with greedy semantics ("␁a␂␁a␂␁a␂" merges to
  // "␁aa␂␁a␂") because each match consumes exactly its own span. Pair
  // counts are BIGINT sums; argmax ties break on (count DESC, pairkey
  // ASC) — byte-identical string comparison in Spark and DuckDB.
  private[queries] val BpeTrainK = 8
  // Round 14 (verdict #6): the TRAINER runs at merge depth 64 — K=8
  // proves the loop but not the lineage/plan behavior at depth (the
  // Bradley-Terry lesson: plan growth is the failure mode; the per-round
  // localCheckpoint keeps the plan constant-size, so cost is LINEAR in K
  // — the curve is in BASELINE.md round-14). The encoders keep K=8: their
  // plan depth is the trained-vocab equi-join, not the loop, and their
  // oracle CTE chains stay cheap.
  private[queries] val BpeTrainKDeep = 64
  // symbol wrappers: U+0001/U+0002 cannot appear in whitespace-split
  // tokens, so a boundary inside a merged symbol is unforgeable
  private[queries] val BpeD = "\u0001"
  private[queries] val BpeE = "\u0002"

  /** Word-type frequency table of `docs`, each word symbolized to wrapped
    * single characters — the BPE trainer's only corpus-sized pass. */
  private def bpeWords(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr(
        s"concat_ws('', transform(sequence(1, length(word)), " +
          s"i -> concat('$BpeD', substring(word, i, 1), '$BpeE')))"))
      .select(col("syms"), col("cnt"))

  /** The K-merge training loop, shared by q_bpe_train_k (which reports
    * the merge table), q_bpe_encode (which consumes the final vocab
    * state) and q_bpe_encode_holdout (which trains on a doc split).
    * Returns (final symbolized vocab (syms, cnt), per-step 1-row
    * argmax frames (pairkey, pair_count, step)). */
  private[queries] def bpeLoopFrom(docs: org.apache.spark.sql.DataFrame,
      nMerges: Int = BpeTrainK)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    var v = bpeWords(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.sql.DataFrame]
    for (k <- 1 to nMerges) {
      val pc = v
        .withColumn("sa", expr(
          s"filter(split(replace(syms, '$BpeD', ''), '$BpeE'), x -> x <> '')"))
        .filter(size(col("sa")) >= 2)
        .select(col("cnt"), explode(expr(
          s"transform(sequence(0, size(sa) - 2), " +
            s"i -> concat(sa[i], '$BpeD', sa[i + 1]))")).as("pairkey"))
        .groupBy("pairkey").agg(sum("cnt").as("pair_count"))
      val best = pc.orderBy(col("pair_count").desc, col("pairkey").asc)
        .limit(1).localCheckpoint(true)
      merges += best.withColumn("step", lit(k))
      // pairkey "a␁b" → match "␁a␂␁b␂", replacement "␁ab␂": both
      // boundaries of both symbols are asserted, so a match can neither
      // start nor end inside a longer symbol
      v = v.crossJoin(broadcast(best.select(col("pairkey"))))
        .withColumn("syms", expr(
          s"replace(syms, concat('$BpeD', replace(pairkey, '$BpeD', '$BpeE$BpeD'), '$BpeE'), " +
            s"concat('$BpeD', replace(pairkey, '$BpeD', ''), '$BpeE'))"))
        .select("syms", "cnt")
        .localCheckpoint(true)
    }
    // r15 (advisor): exhaustion must be LOUD, not silent. If any round's
    // argmax frame came up empty (merge candidates ran dry before step
    // nMerges), the crossJoin above emptied v PERMANENTLY and both
    // engines would emit a silently-truncated merge table that still
    // hash-matches. One cheap limit-1 probe of the final (checkpointed)
    // vocab converts that class to an immediate failure; v is never
    // legitimately empty (merges rewrite rows, never delete them).
    require(!v.isEmpty,
      s"BPE trainer: merge candidates exhausted before step $nMerges " +
        "(or empty training corpus) — the vocab frame is empty and the " +
        "merge table would be silently truncated")
    (v, merges.toList)
  }

  private def bpeLoop(s: org.apache.spark.sql.SparkSession, dir: String,
      nMerges: Int = BpeTrainK)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) =
    bpeLoopFrom(Tables.documents(s, dir), nMerges)

  /** The unrolled K-iteration CTE chain (v0 … v$K, b1 … b$K) the BPE
    * oracles share — the chr(1)/chr(2) wrapped-span twin of bpeLoopFrom.
    * Every vN/bN is MATERIALIZED: each is referenced twice (pair count +
    * merge), the multiply-referenced-CTE blowup class PlanComplexitySpec
    * documents. `docsWhere` filters the training corpus (the holdout
    * variant trains on a doc split). */
  private def bpeCte(docsWhere: String = "",
      nMerges: Int = BpeTrainK): String = {
    val iters = (1 to nMerges).map { n =>
      s"""
        p$n AS (SELECT pairkey, CAST(sum(cnt) AS BIGINT) AS pair_count FROM (
                  SELECT cnt, unnest(list_transform(
                    generate_series(1, len(sa) - 1),
                    i -> sa[i] || chr(1) || sa[i + 1])) AS pairkey
                  FROM (SELECT cnt, list_filter(
                          string_split(replace(syms, chr(1), ''), chr(2)),
                          x -> x <> '') AS sa
                        FROM v${n - 1})
                  WHERE len(sa) >= 2)
                GROUP BY 1),
        b$n AS MATERIALIZED (SELECT pairkey, pair_count FROM p$n
                ORDER BY pair_count DESC, pairkey ASC LIMIT 1),
        v$n AS MATERIALIZED (
          SELECT replace(v.syms,
                   chr(1) || replace(b.pairkey, chr(1), chr(2) || chr(1)) || chr(2),
                   chr(1) || replace(b.pairkey, chr(1), '') || chr(2)) AS syms,
                 v.cnt
          FROM v${n - 1} v, b$n b)"""
    }.mkString(",")
    s"""v0 AS MATERIALIZED (
        SELECT list_aggregate(list_transform(generate_series(1, len(word)),
                 i -> chr(1) || word[i] || chr(2)), 'string_agg', '') AS syms,
               CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents$docsWhere)
        WHERE len(word) > 0
        GROUP BY word),$iters"""
  }

  private val bpeTrain = QueryDef(
    "q_bpe_train_k",
    (s, dir) => {
      val (_, merges) = bpeLoop(s, dir, BpeTrainKDeep)
      merges.reduce(_ unionAll _)
        .withColumn("parts", split(col("pairkey"), BpeD))
        .select(col("step"), col("parts")(0).as("lhs"), col("parts")(1).as("rhs"),
          concat(col("parts")(0), col("parts")(1)).as("merged"),
          col("pair_count"))
        .orderBy("step")
    },
    Some {
      val steps = (1 to BpeTrainKDeep).map { n =>
        s"""SELECT $n AS step, string_split(pairkey, chr(1))[1] AS lhs,
                   string_split(pairkey, chr(1))[2] AS rhs,
                   replace(pairkey, chr(1), '') AS merged, pair_count
            FROM b$n"""
      }.mkString(" UNION ALL ")
      s"""
      WITH ${bpeCte(nMerges = BpeTrainKDeep)}
      SELECT * FROM ($steps) ORDER BY step"""
    })

  // ---------------------------------------------------------------------
  // BPE corpus encode: the other half of the tokenizer lifecycle — apply
  // the K learned merges to every document and report per-language token
  // statistics (whitespace tokens vs BPE symbols vs characters). The
  // final trainer state IS the encoder: the vocab frame after K merges
  // maps each word type to its symbolization, so n_syms per word is
  // derivable without re-running any merge, and the corpus-side work is
  // ONE explode + an equi-join on the word key (AQE broadcasts the dict
  // while it is small and shuffles when vocabulary grows with the corpus
  // — the DSIR no-forced-broadcast lesson).
  private val bpeEncode = QueryDef(
    "q_bpe_encode",
    (s, dir) => {
      val (vFinal, _) = bpeLoop(s, dir)
      val wdict = vFinal.select(
        expr(s"replace(replace(syms, '$BpeD', ''), '$BpeE', '')").as("word"),
        (size(split(col("syms"), BpeD)) - 1).cast("long").as("n_syms"))
      val words = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      words.join(wdict, "word")
        .groupBy("lang")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("ws_tokens"),
          sum("n_syms").as("bpe_tokens"),
          sum(length(col("word")).cast("long")).as("n_chars"))
        .withColumn("tokens_per_word",
          dround(col("bpe_tokens").cast("double") / col("ws_tokens"), 4))
        .withColumn("chars_per_token",
          dround(col("n_chars").cast("double") / col("bpe_tokens"), 4))
        .orderBy("lang")
    },
    Some(s"""
      WITH ${bpeCte()},
        wdict AS (SELECT replace(replace(syms, chr(1), ''), chr(2), '') AS word,
                         CAST(len(string_split(syms, chr(1))) - 1 AS BIGINT)
                           AS n_syms
                  FROM v$BpeTrainK),
        w AS (SELECT doc_id, lang, word FROM (
                SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                FROM documents)
              WHERE len(word) > 0)
      SELECT w.lang, CAST(count(DISTINCT w.doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS ws_tokens,
             CAST(sum(wdict.n_syms) AS BIGINT) AS bpe_tokens,
             CAST(sum(len(w.word)) AS BIGINT) AS n_chars,
             ${oround(
               "CAST(sum(wdict.n_syms) AS DOUBLE) / count(*)", 4)}
               AS tokens_per_word,
             ${oround(
               "CAST(sum(len(w.word)) AS DOUBLE) / sum(wdict.n_syms)", 4)}
               AS chars_per_token
      FROM w JOIN wdict ON w.word = wdict.word
      GROUP BY w.lang ORDER BY w.lang"""))

  // ---------------------------------------------------------------------
  // Held-out BPE encode (round-13 verdict #5 — the tokenizer-APPLY case):
  // train the K merges on a deterministic 80% doc split, encode the
  // complement, and report per-language OOV mass. The plain q_bpe_encode
  // inner-joins the training vocab — total on the training corpus by
  // construction, but the moment the encoder meets unseen data an
  // out-of-vocabulary word type silently vanishes. Here the dictionary
  // join is LEFT with a character-count fallback (an unseen word encodes
  // to its characters — the base-vocabulary floor every real BPE
  // tokenizer keeps), and oov_words / oov_frac make the dropped-mass
  // question part of the certified result.
  //
  // Scale: identical to q_bpe_encode — the trainer is vocabulary-bounded
  // after one word-count pass over the (80%) corpus; the apply side is
  // one explode + an equi-join on the word key; the OOV fallback is a
  // row-local coalesce, no extra pass.
  private val bpeEncodeHoldout = QueryDef(
    "q_bpe_encode_holdout",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val (vFinal, _) = bpeLoopFrom(docs.filter(pmod(col("doc_id"), lit(5)) < 4))
      val wdict = vFinal.select(
        expr(s"replace(replace(syms, '$BpeD', ''), '$BpeE', '')").as("word"),
        (size(split(col("syms"), BpeD)) - 1).cast("long").as("n_syms"))
      val words = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      words.join(wdict, Seq("word"), "left")
        .withColumn("oov", col("n_syms").isNull)
        .withColumn("n_syms_eff",
          coalesce(col("n_syms"), length(col("word")).cast("long")))
        .groupBy("lang")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("ws_tokens"),
          sum("n_syms_eff").as("bpe_tokens"),
          sum(when(col("oov"), 1L).otherwise(0L)).as("oov_words"))
        .withColumn("oov_frac",
          dround(col("oov_words").cast("double") / col("ws_tokens"), 4))
        .withColumn("tokens_per_word",
          dround(col("bpe_tokens").cast("double") / col("ws_tokens"), 4))
        .orderBy("lang")
    },
    Some(s"""
      WITH ${bpeCte(" WHERE doc_id % 5 < 4")},
        wdict AS (SELECT replace(replace(syms, chr(1), ''), chr(2), '') AS word,
                         CAST(len(string_split(syms, chr(1))) - 1 AS BIGINT)
                           AS n_syms
                  FROM v$BpeTrainK),
        w AS (SELECT doc_id, lang, word FROM (
                SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                FROM documents WHERE doc_id % 5 = 4)
              WHERE len(word) > 0)
      SELECT w.lang, CAST(count(DISTINCT w.doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS ws_tokens,
             CAST(sum(coalesce(wdict.n_syms, len(w.word))) AS BIGINT)
               AS bpe_tokens,
             CAST(sum(CASE WHEN wdict.n_syms IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS oov_words,
             ${oround(
               "CAST(sum(CASE WHEN wdict.n_syms IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)",
               4)} AS oov_frac,
             ${oround(
               "CAST(sum(coalesce(wdict.n_syms, len(w.word))) AS DOUBLE) / count(*)",
               4)} AS tokens_per_word
      FROM w LEFT JOIN wdict ON w.word = wdict.word
      GROUP BY w.lang ORDER BY w.lang"""))

  // ---------------------------------------------------------------------
  // Perplexity-bucketed stratification: score every document by unigram
  // cross-entropy under the corpus LM (add-1 smoothed), split into
  // quartile strata at the exact 25/50/75 cross-entropy cut points, and
  // report per-bucket population stats — the CCNet recipe for
  // head/middle/tail quality strata.
  //
  // Scale: the LM is a vocabulary-sized agg; per-doc NLL is Σ tf·nll_u
  // over the (doc, term) table (BIGINT accumulation of per-term quantized
  // values — same doctrine as DSIR), and the per-doc mean is frozen to
  // the integer grid `nll_sum_u div n_toks`, so the quartile cuts come
  // from HistQuantiles' bucketed two-pass exact quantile — shuffle
  // traffic is DISTINCT grid values, never documents, and no window ever
  // sees a corpus-sized frame (vs ntile(4), which is a one-task global
  // sort of every document). Bucket assignment is then three broadcast
  // scalar comparisons.
  private val ppxBuckets = QueryDef(
    "q_perplexity_buckets",
    (s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val lm = tf.groupBy("term").agg(sum("tf").as("cnt"))
      val tot = lm.agg(sum("cnt").cast("double").as("n_tokens"),
        count(lit(1)).cast("double").as("vocab"))
      val nll = lm.crossJoin(broadcast(tot))
        .select(col("term"), floor(
          -log((col("cnt") + lit(1.0)) / (col("n_tokens") + col("vocab"))) * lit(1e6)
        ).cast("long").as("nll_u"))
      val perDoc = tf.join(nll, "term")
        .groupBy("doc_id")
        .agg(sum(col("tf") * col("nll_u")).cast("long").as("nll_sum_u"),
          sum("tf").cast("long").as("n_toks"))
        .withColumn("avg_nll_u", expr("nll_sum_u div n_toks"))
      val cuts = graft.operators.HistQuantiles
        .quantiles(perDoc, col("avg_nll_u"), Seq(0.25, 0.5, 0.75))
        .agg(max(when(col("q") === 0.25, col("value"))).as("q25"),
          max(when(col("q") === 0.5, col("value"))).as("q50"),
          max(when(col("q") === 0.75, col("value"))).as("q75"))
      perDoc.crossJoin(broadcast(cuts))
        .withColumn("bucket", lit(1)
          + when(col("avg_nll_u") > col("q25"), 1).otherwise(0)
          + when(col("avg_nll_u") > col("q50"), 1).otherwise(0)
          + when(col("avg_nll_u") > col("q75"), 1).otherwise(0))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("nll_sum_u").cast("long").as("nll_sum_u"),
          sum("n_toks").cast("long").as("n_toks"),
          min("avg_nll_u").cast("long").as("min_nll_u"),
          max("avg_nll_u").cast("long").as("max_nll_u"))
        .withColumn("mean_nll",
          col("nll_sum_u").cast("double") / (col("n_toks") * lit(1e6)).cast("double"))
        .select(col("bucket"), col("n_docs"), col("n_toks"),
          col("mean_nll"),
          (col("min_nll_u").cast("double") / lit(1e6)).as("min_nll"),
          (col("max_nll_u").cast("double") / lit(1e6)).as("max_nll"))
        .orderBy("bucket")
    },
    Some("""
      WITH tf AS (SELECT doc_id, term, count(*) AS tf
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                        FROM documents)
                  GROUP BY 1, 2),
        lm AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_tokens,
                       CAST(count(*) AS DOUBLE) AS vocab FROM lm),
        nll AS (SELECT term, CAST(floor(
                  -ln((cnt + 1.0) / (tot.n_tokens + tot.vocab)) * 1e6) AS BIGINT)
                  AS nll_u
                FROM lm CROSS JOIN tot),
        perdoc AS (SELECT tf.doc_id,
                     CAST(sum(tf.tf * nll.nll_u) AS BIGINT) AS nll_sum_u,
                     CAST(sum(tf.tf) AS BIGINT) AS n_toks,
                     CAST(sum(tf.tf * nll.nll_u) AS BIGINT)
                       // CAST(sum(tf.tf) AS BIGINT) AS avg_nll_u
                   FROM tf JOIN nll ON tf.term = nll.term
                   GROUP BY 1),
        cuts AS (SELECT quantile_cont(avg_nll_u, 0.25) AS q25,
                        quantile_cont(avg_nll_u, 0.50) AS q50,
                        quantile_cont(avg_nll_u, 0.75) AS q75
                 FROM perdoc),
        bk AS (SELECT perdoc.*,
                 1 + (CASE WHEN avg_nll_u > q25 THEN 1 ELSE 0 END)
                   + (CASE WHEN avg_nll_u > q50 THEN 1 ELSE 0 END)
                   + (CASE WHEN avg_nll_u > q75 THEN 1 ELSE 0 END) AS bucket
               FROM perdoc CROSS JOIN cuts)
      SELECT bucket, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_toks,
             CAST(sum(nll_sum_u) AS DOUBLE)
               / CAST(sum(n_toks) * 1e6 AS DOUBLE) AS mean_nll,
             CAST(min(avg_nll_u) AS DOUBLE) / 1e6 AS min_nll,
             CAST(max(avg_nll_u) AS DOUBLE) / 1e6 AS max_nll
      FROM bk GROUP BY bucket ORDER BY bucket"""))

  // ---------------------------------------------------------------------
  // Content-defined chunking + chunk-level dedup (the CDC recipe behind
  // storage/dedup systems à la LBFS/Venti, applied to token streams):
  // a token is a chunk BOUNDARY when a content hash of the token value
  // hits a modulus class, so chunk boundaries depend only on local
  // content — an insertion reshapes chunks near the edit, not the whole
  // document, which is what makes chunk-hash dedup robust to shifts
  // (fixed-width windows lose alignment after one inserted token).
  //
  // The per-token fingerprint here is a deliberately simple
  // (length, first-char, last-char) polynomial BOTH engines evaluate
  // bit-identically (the oracle cannot replay xxhash64; Rabin
  // fingerprints would drop in unchanged at deployment — the chunking
  // algebra is what this query certifies). Chunk identity is
  // (position-weighted BIGINT fingerprint, length): exact integer
  // arithmetic, order-independent across partitionings.
  //
  // Scale: one explode; every window PARTITIONS BY doc_id (running
  // boundary count) or (doc_id, chunk) (position-in-chunk); the dedup is
  // a hash agg on the chunk fingerprint with map-side combine. Linear
  // end to end — the whole point vs pairwise passage comparison.
  private val BoundaryMod = 17

  private val cdcChunks = QueryDef(
    "q_cdc_chunk_dedup",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
        .filter(length(col("term")) > 0)
        .withColumn("h", (length(col("term")) * lit(31) + ascii(col("term"))) * lit(31)
          + ascii(reverse(col("term"))))
        .withColumn("b", when(pmod(col("h"), lit(BoundaryMod)) === 0, 1L).otherwise(0L))
      val wChunk = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inChunk = toks.withColumn("chunk", sum("b").over(wChunk))
        .withColumn("pic", row_number().over(
          Window.partitionBy("doc_id", "chunk").orderBy("pos")))
      val chunks = inChunk.groupBy("doc_id", "chunk")
        .agg(sum(col("h") * col("pic")).cast("long").as("fp"),
          count(lit(1)).as("chunk_len"))
      val dedup = chunks.groupBy("fp", "chunk_len")
        .agg(count(lit(1)).as("copies"))
      dedup.agg(
          sum("copies").cast("long").as("n_chunks"),
          sum(col("copies") * col("chunk_len")).cast("long").as("n_tokens"),
          count(lit(1)).as("n_distinct_chunks"),
          sum(when(col("copies") > 1, col("copies") - 1).otherwise(0L))
            .cast("long").as("dup_chunks"),
          sum(when(col("copies") > 1, (col("copies") - 1) * col("chunk_len"))
            .otherwise(0L)).cast("long").as("dup_token_mass"))
        .withColumn("avg_chunk_len",
          col("n_tokens").cast("double") / col("n_chunks").cast("double"))
        .select(col("n_chunks"), col("n_tokens"), col("avg_chunk_len"),
          col("n_distinct_chunks"), col("dup_chunks"), col("dup_token_mass"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, u.x.pos AS pos, u.x.term AS term
        FROM (SELECT doc_id,
                unnest(list_transform(string_split(text, ' '),
                  (t, i) -> {'term': t, 'pos': i})) AS x
              FROM documents) u
        WHERE length(u.x.term) > 0),
        h AS (SELECT doc_id, pos,
                (length(term) * 31 + ascii(term)) * 31 + ascii(reverse(term)) AS h
              FROM toks),
        marked AS (SELECT *, CASE WHEN h % $BoundaryMod = 0 THEN 1 ELSE 0 END AS b
                   FROM h),
        inchunk AS (SELECT doc_id, pos, h,
                      sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS chunk
                    FROM marked),
        pic AS (SELECT *, row_number() OVER (PARTITION BY doc_id, chunk
                  ORDER BY pos) AS pic FROM inchunk),
        chunks AS (SELECT doc_id, chunk,
                     CAST(sum(h * pic) AS BIGINT) AS fp,
                     count(*) AS chunk_len
                   FROM pic GROUP BY 1, 2),
        dedup AS (SELECT fp, chunk_len, count(*) AS copies
                  FROM chunks GROUP BY 1, 2)
      SELECT CAST(sum(copies) AS BIGINT) AS n_chunks,
             CAST(sum(copies * chunk_len) AS BIGINT) AS n_tokens,
             CAST(sum(copies * chunk_len) AS DOUBLE)
               / CAST(sum(copies) AS DOUBLE) AS avg_chunk_len,
             count(*) AS n_distinct_chunks,
             CAST(sum(CASE WHEN copies > 1 THEN copies - 1 ELSE 0 END) AS BIGINT)
               AS dup_chunks,
             CAST(sum(CASE WHEN copies > 1 THEN (copies - 1) * chunk_len
               ELSE 0 END) AS BIGINT) AS dup_token_mass
      FROM dedup"""))

  // ---------------------------------------------------------------------
  // Temperature-scaled language mixing (the multilingual-LM sampling
  // recipe: sample language l with probability ∝ n_l^α, α < 1 upweights
  // tail languages — XLM-R uses α = 0.3): compute per-language corpus
  // mass, temperature weights, and an EXACT largest-remainder allocation
  // of a fixed sample budget (Hamilton apportionment — the allocation
  // sums to the budget by construction, no float drift).
  //
  // Determinism: n_l^α is quantized once per language to the 1e-6 grid;
  // shares and allocations are then pure BIGINT arithmetic
  // (floor(B·w_u/Σw_u) + largest-remainder top-up), bit-identical across
  // engines. The only windows run over ≤ #languages aggregate rows
  // (declared bounded in WindowAuditSpec).
  private val Alpha = 0.3
  private val MixBudget = 1000L

  private val tempMix = QueryDef(
    "q_temperature_mix",
    (s, dir) => {
      val byLang = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).as("n_toks"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").cast("long").as("n_toks"))
        .withColumn("w_u", floor(pow(col("n_toks").cast("double"), lit(Alpha)) * lit(1e6))
          .cast("long"))
      val tot = byLang.agg(sum("w_u").cast("long").as("tot_w"))
      val alloc = byLang.crossJoin(broadcast(tot))
        .withColumn("base", expr(s"($MixBudget * w_u) div tot_w"))
        .withColumn("rem", expr(s"($MixBudget * w_u) % tot_w"))
      val short = alloc.agg((lit(MixBudget) - sum("base")).cast("long").as("short"))
      val wRem = Window.partitionBy(pmod(length(col("lang")), lit(1)))
        .orderBy(col("rem").desc, col("lang").asc)
      alloc.crossJoin(broadcast(short))
        .withColumn("rr", row_number().over(wRem))
        .withColumn("alloc", (col("base")
          + when(col("rr") <= col("short"), 1L).otherwise(0L)).cast("long"))
        .withColumn("share", col("w_u").cast("double") / col("tot_w").cast("double"))
        .select(col("lang"), col("n_docs"), col("n_toks"),
          Det.dround(col("share"), 6).as("share"), col("alloc"))
        .orderBy("lang")
    },
    Some(s"""
      WITH byl AS (SELECT lang, count(*) AS n_docs,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_toks
                   FROM documents GROUP BY lang),
        w AS (SELECT *, CAST(floor(pow(CAST(n_toks AS DOUBLE), $Alpha) * 1e6)
                AS BIGINT) AS w_u FROM byl),
        tot AS (SELECT CAST(sum(w_u) AS BIGINT) AS tot_w FROM w),
        alloc AS (SELECT w.*, tot.tot_w,
                    ($MixBudget * w_u) // tot_w AS base,
                    ($MixBudget * w_u) % tot_w AS rem
                  FROM w CROSS JOIN tot),
        sh AS (SELECT CAST($MixBudget - sum(base) AS BIGINT) AS short FROM alloc),
        rr AS (SELECT alloc.*, sh.short,
                 row_number() OVER (ORDER BY rem DESC, lang ASC) AS rr
               FROM alloc CROSS JOIN sh)
      SELECT lang, n_docs, n_toks,
             ${oround("CAST(w_u AS DOUBLE) / CAST(tot_w AS DOUBLE)", 6)} AS share,
             CAST(base + (CASE WHEN rr <= short THEN 1 ELSE 0 END) AS BIGINT)
               AS alloc
      FROM rr ORDER BY lang"""))

  // ---------------------------------------------------------------------
  // Hashed linear quality classifier — fastText-architecture inference
  // (Joulin et al. 2016), the model class behind the LLaMA/CCNet
  // "Wikipedia-reference" filter and the RefinedWeb quality gate: each
  // token hashes into a fixed bucket space (the hashing trick, 2^16
  // buckets here), the document score is the mean of its tokens' bucket
  // weights, and the gate keeps score > 0.
  //
  // The weight table here is a deterministic function of the bucket id
  // (w = h mod 1001 − 500, an integer in [−500, 500] at 1e-3 scale) — a
  // stand-in for trained weights with the exact production dataflow: at
  // 100 TB a trained table is a broadcast float array indexed by the same
  // bucket id, and NOTHING else changes. The whole inference is a single
  // projection — token split, hash, weight lookup, and the margin fold all
  // run inside WholeStageCodegen with ZERO shuffles before the per-lang
  // rollup; this embarrassing parallelism is exactly why classifier
  // filtering is the cheapest corpus gate at scale.
  //
  // Determinism: the margin is an exact BIGINT sum folded in array order
  // (no float accumulation anywhere); the bucket id decodes the first 4
  // hex chars of sha256(token) with the same textual arithmetic in both
  // engines, so the gate is bit-identical across engines/partitionings.
  private val hexDecode4: String => String = h =>
    (1 to 4).map(i =>
      s"(instr('0123456789abcdef', substring($h, $i, 1)) - 1)"
        + s" * ${1 << (4 * (4 - i))}")
      .mkString(" + ")
  private val oHexDecode4: String => String = h =>
    (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1)"
        + s" * ${1 << (4 * (4 - i))}")
      .mkString(" + ")

  private val qualityClassifier = QueryDef(
    "q_quality_classifier",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("ws", expr(
          s"""transform(
                transform(filter(split(text, ' '), t -> length(t) > 0),
                          t -> substring(sha2(t, 256), 1, 4)),
                h -> cast(pmod(${hexDecode4("h")}, 1001) as bigint) - 500)"""))
        .withColumn("n_toks", size(col("ws")))
        .filter(col("n_toks") >= 1)
        .withColumn("margin", expr(
          "aggregate(ws, cast(0 as bigint), (a, x) -> a + x)"))
        // score = margin / (1000·n); quantized to the 1e-6 grid as an
        // exact integer so the per-lang average is an integer sum
        .withColumn("score_i",
          round(col("margin") * lit(1000.0) / col("n_toks")).cast("long"))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("margin") > 0, 1L).otherwise(0L)).as("n_keep"),
          dround(sum(when(col("margin") > 0, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 4).as("keep_rate"),
          dround(sum("score_i").cast("double") / lit(1e6)
            / count(lit(1)), 6).as("avg_score"),
          dround(min(col("score_i").cast("double") / lit(1e6)), 6)
            .as("min_score"),
          dround(max(col("score_i").cast("double") / lit(1e6)), 6)
            .as("max_score"))
        .orderBy("lang")
    },
    Some(s"""
      WITH ws AS (SELECT lang,
                    list_transform(
                      list_transform(
                        list_filter(string_split(text, ' '),
                                    t -> length(t) > 0),
                        t -> substr(sha256(t), 1, 4)),
                      h -> (${oHexDecode4("h")}) % 1001 - 500) AS ws
                  FROM documents),
        d AS (SELECT lang, len(ws) AS n_toks,
                CAST(list_sum(ws) AS BIGINT) AS margin
              FROM ws WHERE len(ws) >= 1),
        sc AS (SELECT lang, margin,
                 CAST(round(margin * 1000.0 / n_toks) AS BIGINT) AS score_i
               FROM d)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_keep,
             ${oround(
               "CAST(sum(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS DOUBLE)"
                 + " / count(*)", 4)} AS keep_rate,
             ${oround("CAST(sum(score_i) AS DOUBLE) / 1e6 / count(*)", 6)}
               AS avg_score,
             ${oround("min(CAST(score_i AS DOUBLE) / 1e6)", 6)} AS min_score,
             ${oround("max(CAST(score_i AS DOUBLE) / 1e6)", 6)} AS max_score
      FROM sc GROUP BY lang ORDER BY lang"""))

  // -- K-fold target encoding with leakage protection: encode event_type
  //    by the mean value computed from the OTHER four folds (fold =
  //    event_id % 5), the standard out-of-fold trick that keeps a row's
  //    own target out of its feature. enc(type, fold) =
  //    (sum_type − sum_fold) / (cnt_type − cnt_fold) — two grouped exact
  //    cents aggregates and a broadcast join, no per-row recompute.
  private val targetEncoding = QueryDef(
    "q_target_encoding",
    (s, dir) => {
      val ev = graft.Tables.events(s, dir)
        .select(col("event_type"), (col("event_id") % 5).as("fold"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      val perFold = ev.groupBy("event_type", "fold")
        .agg(count(lit(1)).as("cf"), sum("v").as("sf"))
      val perType = perFold.groupBy(col("event_type").as("tt"))
        .agg(sum("cf").as("ct"), sum("sf").as("st"))
      perFold.join(broadcast(perType), col("event_type") === col("tt"))
        .select(col("event_type"), col("fold"), col("cf").as("n_fold"),
          dround((col("st") - col("sf")).cast("double")
            / (col("ct") - col("cf")) / 100.0, 4).as("encoding"))
        .orderBy("event_type", "fold")
    },
    Some(s"""
      WITH ev AS (SELECT event_type, event_id % 5 AS fold,
                    CAST(round(value * 100) AS BIGINT) AS v
                  FROM events),
        pf AS (SELECT event_type, fold, CAST(count(*) AS BIGINT) AS cf,
                 CAST(sum(v) AS BIGINT) AS sf
               FROM ev GROUP BY 1, 2),
        pt AS (SELECT event_type AS tt, CAST(sum(cf) AS BIGINT) AS ct,
                 CAST(sum(sf) AS BIGINT) AS st
               FROM pf GROUP BY 1)
      SELECT event_type, fold, cf AS n_fold,
             ${oround(
               "CAST(st - sf AS DOUBLE) / (ct - cf) / 100.0", 4)} AS encoding
      FROM pf JOIN pt ON pf.event_type = pt.tt
      ORDER BY event_type, fold"""))

  /** Shared frame for the classifier-eval trio: the hashed-linear
    * quality score on its exact 1e-6 integer grid (same construction as
    * q_quality_classifier) paired with an independent ground-truth label
    * (long document: n_chars ≥ 200). */
  private def scoredDocs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)
      .withColumn("ws", expr(
        s"""transform(
              transform(filter(split(text, ' '), t -> length(t) > 0),
                        t -> substring(sha2(t, 256), 1, 4)),
              h -> cast(pmod(${hexDecode4("h")}, 1001) as bigint) - 500)"""))
      .withColumn("n_toks", size(col("ws")))
      .filter(col("n_toks") >= 1)
      .withColumn("margin", expr(
        "aggregate(ws, cast(0 as bigint), (a, x) -> a + x)"))
      .withColumn("score_i",
        round(col("margin") * lit(1000.0) / col("n_toks")).cast("long"))
      .withColumn("label", when(col("n_chars") >= 200, 1L).otherwise(0L))
      .select("score_i", "label")

  private def scoredDocsSql =
    s"""ws AS (SELECT n_chars,
             list_transform(
               list_transform(
                 list_filter(string_split(text, ' '), t -> length(t) > 0),
                 t -> substr(sha256(t), 1, 4)),
               h -> (${oHexDecode4("h")}) % 1001 - 500) AS ws
           FROM documents),
      sc AS (SELECT
               CAST(round(CAST(list_sum(ws) AS BIGINT) * 1000.0 / len(ws))
                 AS BIGINT) AS score_i,
               CASE WHEN n_chars >= 200 THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS label
             FROM ws WHERE len(ws) >= 1)"""

  // -- ROC AUC of the quality classifier against the long-document
  //    label, by the exact rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2) /
  //    (n⁺·n⁻) with midranks for ties — the Mann-Whitney machinery
  //    (GridCum two-pass on the score grid) reused as a model-eval
  //    operator. All rank arithmetic stays in longs (2·midrank is
  //    integral); one double division at the end.
  private val rocAuc = QueryDef(
    "q_roc_auc",
    (s, dir) => {
      import graft.operators.GridCum
      val h = scoredDocs(s, dir)
        .groupBy(col("score_i").as("v"))
        .agg(sum("label").as("n1"),
          sum(lit(1L) - col("label")).as("n2"))
      Cached.withPinned(h) { case Seq(h) => // r15: pin + plan-truncate
        val cum = GridCum.cum(h, Nil, "v", Seq("n1", "n2"),
            bucketWidth = 65536L)
          .withColumn("t", col("n1") + col("n2"))
          .withColumn("below", col("cum_n1") + col("cum_n2") - col("t"))
        cum.agg(
          sum(col("n1") * (col("below") * 2L + col("t") + 1L)).as("r2x"),
          sum("n1").as("n_pos"), sum("n2").as("n_neg"))
          .select(
            dround((col("r2x").cast("double") / 2.0
              - col("n_pos").cast("double") * (col("n_pos") + 1L) / 2.0)
              / (col("n_pos").cast("double") * col("n_neg")), 6).as("auc"),
            col("n_pos"), col("n_neg"))
      }
    },
    Some(s"""
      WITH $scoredDocsSql,
        h AS (SELECT score_i AS v,
                CAST(sum(label) AS BIGINT) AS n1,
                CAST(sum(1 - label) AS BIGINT) AS n2
              FROM sc GROUP BY 1),
        c AS (SELECT v, n1, n2, n1 + n2 AS t,
                CAST(sum(n1 + n2) OVER (ORDER BY v) AS BIGINT)
                  - (n1 + n2) AS below
              FROM h),
        a AS (SELECT CAST(sum(n1 * (below * 2 + t + 1)) AS BIGINT) AS r2x,
                CAST(sum(n1) AS BIGINT) AS n_pos,
                CAST(sum(n2) AS BIGINT) AS n_neg
              FROM c)
      SELECT ${oround(
        """(CAST(r2x AS DOUBLE) / 2.0
           - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0)
           / (CAST(n_pos AS DOUBLE) * n_neg)""", 6)} AS auc,
             n_pos, n_neg
      FROM a"""))

  // -- Calibration (reliability) bins: fixed-width score bins vs the
  //    observed positive rate — does a higher classifier score actually
  //    mean a higher long-doc probability? Floor-division binning (floor,
  //    not DIV: scores go negative and Spark DIV truncates toward zero
  //    while DuckDB // floors); per-bin means from exact integer sums.
  private val calibrationBins = QueryDef(
    "q_calibration_bins",
    (s, dir) =>
      scoredDocs(s, dir)
        .groupBy(expr("CAST(floor(score_i / 100000.0) AS BIGINT)").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          dround(sum("score_i").cast("double") / count(lit(1)) / 1e6, 6)
            .as("mean_score"),
          dround(sum("label").cast("double") / count(lit(1)), 4)
            .as("pos_rate"))
        .orderBy("bin"),
    Some(s"""
      WITH $scoredDocsSql
      SELECT CAST(floor(score_i / 100000.0) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_docs,
             ${oround(
               "CAST(CAST(sum(score_i) AS BIGINT) AS DOUBLE) / count(*) / 1e6",
               6)} AS mean_score,
             ${oround("CAST(sum(label) AS DOUBLE) / count(*)", 4)} AS pos_rate
      FROM sc GROUP BY 1 ORDER BY bin"""))

  // -- Precision / recall / F1 threshold sweep over five operating
  //    points: the decision-layer companion to q_roc_auc (which is
  //    threshold-free). One conditional-count pass per threshold via a
  //    5-row broadcast fan; zero-denominator cells surface as NULL (both
  //    engines) rather than a fake 0.
  private val thresholdSweep = QueryDef(
    "q_threshold_sweep",
    (s, dir) => {
      import s.implicits._
      val thr = Seq(-100000L, -50000L, 0L, 50000L, 100000L).toDF("thr")
      scoredDocs(s, dir).crossJoin(broadcast(thr))
        .groupBy("thr")
        .agg(sum(when(col("score_i") > col("thr") && col("label") === 1L, 1L)
          .otherwise(0L)).as("tp"),
          sum(when(col("score_i") > col("thr") && col("label") === 0L, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("score_i") <= col("thr") && col("label") === 1L, 1L)
            .otherwise(0L)).as("fn"))
        .withColumn("precision",
          dround(expr("CAST(tp AS DOUBLE) / nullif(tp + fp, 0)"), 4))
        .withColumn("recall",
          dround(expr("CAST(tp AS DOUBLE) / nullif(tp + fn, 0)"), 4))
        .withColumn("f1",
          dround(expr("2.0 * tp / nullif(tp * 2 + fp + fn, 0)"), 4))
        .select(dround(col("thr") / 1e6, 2).as("threshold"),
          col("tp"), col("fp"), col("fn"), col("precision"), col("recall"),
          col("f1"))
        .orderBy("threshold")
    },
    Some(s"""
      WITH $scoredDocsSql,
        t AS (SELECT unnest([-100000, -50000, 0, 50000, 100000]) AS thr),
        agg AS (SELECT thr,
                  CAST(sum(CASE WHEN score_i > thr AND label = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                  CAST(sum(CASE WHEN score_i > thr AND label = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                  CAST(sum(CASE WHEN score_i <= thr AND label = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS fn
                FROM sc CROSS JOIN t GROUP BY thr)
      SELECT ${oround("thr / 1e6", 2)} AS threshold, tp, fp, fn,
             ${oround("CAST(tp AS DOUBLE) / nullif(tp + fp, 0)", 4)}
               AS precision,
             ${oround("CAST(tp AS DOUBLE) / nullif(tp + fn, 0)", 4)}
               AS recall,
             ${oround("2.0 * tp / nullif(tp * 2 + fp + fn, 0)", 4)} AS f1
      FROM agg ORDER BY threshold"""))

  // -- Decile lift / cumulative-gains chart for the quality classifier:
  //    rank the population by score DESCENDING, split into positional
  //    deciles, and report each decile's positive rate against the base
  //    rate (lift) plus the cumulative share of all positives captured
  //    (gains). Positions come from GridCum on the score grid; tie
  //    groups straddling a decile boundary allocate members by integer
  //    overlap and positives by the expected fraction p·c/m snapped to
  //    the 1e-9 grid (ties are interchangeable, so the expectation IS the
  //    exact allocation under any ordering both engines could pick). The
  //    10-row decile cumsum runs under the audited pmod window.
  private val decileLift = QueryDef(
    "q_decile_lift",
    (s, dir) => {
      import s.implicits._
      import graft.operators.GridCum
      val h = scoredDocs(s, dir)
        .groupBy(col("score_i").as("v"))
        .agg(count(lit(1)).as("m"), sum("label").as("p"))
      Cached.withPinned(h) { case Seq(h) => // r15: pin + plan-truncate
        val tot = h.agg(sum("m").as("n"), sum("p").as("np"))
        val cum = GridCum.cum(h, Nil, "v", Seq("m"), bucketWidth = 65536L)
        val deciles = (0 until 10).toDF("k")
        val alloc = cum.crossJoin(broadcast(tot)).crossJoin(broadcast(deciles))
          // positions FROM THE TOP: rows with higher scores sit above
          .withColumn("above", col("n") - col("cum_m"))
          .withColumn("lo", expr("(k * n) div 10"))
          .withColumn("hi", expr("((k + 1) * n) div 10"))
          .withColumn("c", greatest(lit(0L),
            least(col("hi"), col("above") + col("m"))
              - greatest(col("lo"), col("above"))))
          .filter(col("c") > 0L)
          .withColumn("pos_i", expr(
            "CAST(round(p * c * 1e9 / m) AS BIGINT)"))
        val perDec = alloc.groupBy("k")
          .agg(sum("c").as("n_docs"), sum("pos_i").as("pos_sum_i"),
            first("n").as("n"), first("np").as("np"))
        val wCum = org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("k"), lit(1))).orderBy("k")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        perDec
          .withColumn("cum_pos_i", sum("pos_sum_i").over(wCum))
          .select(col("k").as("decile"), col("n_docs"),
            dround(col("pos_sum_i").cast("double") / 1e9, 2).as("positives"),
            dround((col("pos_sum_i").cast("double") / 1e9 / col("n_docs"))
              / (col("np").cast("double") / col("n")), 4).as("lift"),
            dround(col("cum_pos_i").cast("double") / 1e9 / col("np"), 4)
              .as("cum_gain"))
          .orderBy("decile")
      }
    },
    Some(s"""
      WITH $scoredDocsSql,
        h AS (SELECT score_i AS v, CAST(count(*) AS BIGINT) AS m,
                CAST(sum(label) AS BIGINT) AS p
              FROM sc GROUP BY 1),
        tot AS (SELECT CAST(sum(m) AS BIGINT) AS n,
                       CAST(sum(p) AS BIGINT) AS np FROM h),
        c AS (SELECT v, m, p,
                CAST(sum(m) OVER (ORDER BY v) AS BIGINT) AS cum_m
              FROM h),
        alloc AS (SELECT d.k, tot.n, tot.np, c.m, c.p,
                    greatest(0, least(((d.k + 1) * tot.n) // 10,
                        (tot.n - c.cum_m) + c.m)
                      - greatest((d.k * tot.n) // 10, tot.n - c.cum_m))
                      AS cc
                  FROM c, tot,
                    (SELECT unnest(generate_series(0, 9)) AS k) d),
        a2 AS (SELECT k, n, np, cc,
                 CAST(round(p * cc * 1e9 / m) AS BIGINT) AS pos_i
               FROM alloc WHERE cc > 0),
        perdec AS (SELECT k, CAST(sum(cc) AS BIGINT) AS n_docs,
                     CAST(sum(pos_i) AS BIGINT) AS pos_sum_i,
                     any_value(n) AS n, any_value(np) AS np
                   FROM a2 GROUP BY k),
        fin AS (SELECT *, CAST(sum(pos_sum_i) OVER (ORDER BY k) AS BIGINT)
                  AS cum_pos_i
                FROM perdec)
      SELECT k AS decile, n_docs,
             ${oround("CAST(pos_sum_i AS DOUBLE) / 1e9", 2)} AS positives,
             ${oround(
               "(CAST(pos_sum_i AS DOUBLE) / 1e9 / n_docs) / (CAST(np AS DOUBLE) / n)",
               4)} AS lift,
             ${oround("CAST(cum_pos_i AS DOUBLE) / 1e9 / np", 4)}
               AS cum_gain
      FROM fin ORDER BY decile"""))

  def queries: Seq[QueryDef] =
    Seq(dsir, hybrid, bpeMerge, bpeTrain, bpeEncode, bpeEncodeHoldout,
      ppxBuckets, cdcChunks, tempMix,
      qualityClassifier, targetEncoding, rocAuc, calibrationBins,
      thresholdSweep, decileLift)
}
