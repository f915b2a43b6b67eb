package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Det.{dround, oround}

/** Retrieval + corpus-governance operators for the training-data pipeline:
  * BM25 ranked retrieval over an inverted-index shape, a referential-
  * integrity audit (expectations-style data-quality gate), and a
  * SemDeDup-style semantic dedup pass over the embedding table.
  *
  * Reference anchor: the scoring engine retrieves evidence chunks by
  * keyword relevance before scoring (pe-org-air-platform/app/scoring_engine/
  * evidence_mapper.py keyword routing); BM25 is the standard public ranking
  * function for that retrieval step, expressed here as pure relational
  * algebra so Catalyst keeps every stage pushed-down and partial-aggregated.
  */
object RetrievalQueries extends QueryModule {

  // ---------------------------------------------------------------------
  // BM25 top-k retrieval.
  //
  // Shape: tokenize → per-(doc,term) tf + per-doc length (one explode +
  // two partial aggs) → per-term document frequency (the "inverted index"
  // posting stats) → equi-join the TINY query-term table (broadcast) on
  // term → per-(query,doc) score → per-query top-k window.
  //
  // Scale: the corpus-side work is one linear explode and hash aggs keyed
  // by (doc_id, term) / term — full map-side combine, no pairwise blowup.
  // The query set broadcasts; the only shuffle of scored rows is keyed by
  // (query_id, doc_id) into a WindowGroupLimit top-k, so the reducer sees
  // candidate postings only, never the corpus. At 100 TB the posting
  // stats (term → df) are a write-once side table; the per-term idf join
  // stays an equi-join on the posting key.
  //
  // Determinism: the BM25 score is a SUM of per-term float contributions
  // and float addition is not associative, so each contribution is
  // quantized to an exact 1e-6 integer grid (floor) and summed as BIGINT —
  // order-independent and bit-identical across engines and partitionings.
  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 10

  private val bm25Queries: Seq[(Int, String)] = Seq(
    1 -> "spark", 1 -> "join",
    2 -> "stream", 2 -> "window", 2 -> "batch",
    3 -> "filter", 3 -> "scan")

  private val bm25 = QueryDef(
    "q_bm25_topk",
    (s, dir) => {
      import s.implicits._
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("dl", size(col("toks")))
      val stats = d.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val qs = bm25Queries.toDF("query_id", "term")
      val qterms = qs.select("term").distinct()
      // Posting-filtered tf (round 11): the broadcast query-term semi-
      // filter runs BEFORE the tf aggregate, so the shuffle carries only
      // posting rows for the handful of query terms — never the corpus
      // vocabulary. The previous shape aggregated EVERY token into a
      // vocab-sized tf/df pair of shuffles (169+125 MB at sf10) whose
      // rows were then inner-joined down to the same posting set; at
      // 100 TB that shuffle scales with the corpus, this one with the
      // match mass. df over the filtered tf is identical (the old df was
      // inner-joined to qterms anyway) and stays a mergeable broadcast.
      val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .join(broadcast(qterms), "term")
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(qs), "term")
        .join(broadcast(df_), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("contrib", col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
        .withColumn("contrib_u", floor(col("contrib") * lit(1e6)).cast("long"))
        .groupBy("query_id", "doc_id")
        .agg(sum("contrib_u").as("score_u"), count(lit(1)).as("n_terms_hit"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_u").desc, col("doc_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= TopK)
        .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms_hit"),
          (col("score_u").cast("double") / lit(1e6)).as("bm25"))
        .orderBy("query_id", "rank")
    },
    Some {
      val qvals = bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        dl AS (SELECT doc_id, len(toks) AS dl FROM d),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM (SELECT doc_id, unnest(toks) AS term FROM d)
               GROUP BY 1, 2),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        qs AS (SELECT * FROM (VALUES $qvals) AS t(query_id, term)),
        scored AS (
          SELECT qs.query_id, tf.doc_id,
            CAST(sum(CAST(floor(
              ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf * ${K1 + 1.0})
              / (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / st.avgdl))
              * 1e6) AS BIGINT)) AS BIGINT) AS score_u,
            count(*) AS n_terms_hit
          FROM tf
          JOIN qs ON tf.term = qs.term
          JOIN df ON tf.term = df.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN st
          GROUP BY 1, 2),
        rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score_u DESC, doc_id ASC) AS rank
               FROM scored)
      SELECT query_id, rank, doc_id, n_terms_hit,
             CAST(score_u AS DOUBLE) / 1e6 AS bm25
      FROM rk WHERE rank <= $TopK ORDER BY query_id, rank"""
    })

  // ---------------------------------------------------------------------
  // Referential-integrity audit (expectations-style data-quality gate):
  // for every foreign-key edge of the star schema, report child rows,
  // distinct child keys, and orphan keys (keys with no parent).
  //
  // Scale: orphan detection anti-joins the DISTINCT child keys (already
  // reduced by a map-side-combinable agg) against the parent key set —
  // never the raw fact rows — and AQE broadcasts the parent side for the
  // dimension edges. Exact distinct on the key column is the audit's
  // point (an approx count can't certify zero orphans); the distinct agg
  // is keyed by the FK itself so it partial-aggregates before the shuffle.
  private case class FkEdge(rel: String, child: String, key: String,
      parent: String, pkey: String)

  private val fkEdges = Seq(
    FkEdge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    FkEdge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    FkEdge("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    FkEdge("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    FkEdge("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    FkEdge("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    FkEdge("nation->region", "nation", "n_regionkey", "region", "r_regionkey"))

  private val fkIntegrity = QueryDef(
    "q_fk_integrity",
    (s, dir) => {
      val frames = fkEdges.map { e =>
        val child = Tables.load(s, dir, e.child)
        val parent = Tables.load(s, dir, e.parent).select(col(e.pkey))
        val keys = child.groupBy(col(e.key)).agg(count(lit(1)).as("n_rows"))
        val orphans = keys.join(parent, keys(e.key) === parent(e.pkey), "left_anti")
        val tot = keys.agg(sum("n_rows").cast("long").as("child_rows"),
          count(lit(1)).as("distinct_keys"))
        val orph = orphans.agg(coalesce(count(lit(1)), lit(0L)).as("orphan_keys"),
          coalesce(sum("n_rows"), lit(0L)).cast("long").as("orphan_rows"))
        tot.crossJoin(orph).select(lit(e.rel).as("rel"), col("child_rows"),
          col("distinct_keys"), col("orphan_keys"), col("orphan_rows"))
      }
      frames.reduce(_ unionByName _).orderBy("rel")
    },
    Some {
      val selects = fkEdges.map { e =>
        s"""SELECT '${e.rel}' AS rel,
             CAST((SELECT count(*) FROM ${e.child}) AS BIGINT) AS child_rows,
             CAST((SELECT count(DISTINCT ${e.key}) FROM ${e.child}) AS BIGINT)
               AS distinct_keys,
             CAST((SELECT count(*) FROM
                (SELECT DISTINCT ${e.key} FROM ${e.child}) c
                WHERE NOT EXISTS (SELECT 1 FROM ${e.parent} p
                                  WHERE p.${e.pkey} = c.${e.key})) AS BIGINT)
               AS orphan_keys,
             CAST((SELECT count(*) FROM ${e.child} c
                WHERE NOT EXISTS (SELECT 1 FROM ${e.parent} p
                                  WHERE p.${e.pkey} = c.${e.key})) AS BIGINT)
               AS orphan_rows"""
      }.mkString("\n      UNION ALL\n      ")
      s"$selects\n      ORDER BY rel"
    })

  // ---------------------------------------------------------------------
  // SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
  // cluster the embedding space, then WITHIN each cluster drop members
  // whose cosine to the cluster representative exceeds a threshold —
  // semantic near-duplicates collapse to one exemplar without any
  // pairwise O(n²) comparison.
  //
  // Deterministic transcription for the oracle: centroids are the first K
  // corpus vectors (same seeding as q_kmeans_refine/q_ann_ivf), the
  // representative is the min-vec_id member of each cluster, and every
  // cosine runs as the same index-ordered dot product in both engines.
  //
  // Scale: one broadcast-assign pass over the corpus (centroids are K
  // rows), reps are K rows re-joined by broadcast, so the corpus is
  // scanned twice and shuffled once (the per-cluster counts) — linear in
  // corpus size, which is the entire point vs pairwise semantic dedup.
  // On real (clustered) embeddings the threshold tightens toward ~0.9;
  // the synthetic corpus is isotropic noise, so THRESH sits low enough to
  // exercise both branches of the keep rule.
  private val K = 8
  private val Thresh = 0.10

  private val semDedup = QueryDef(
    "q_semdedup",
    (s, dir) => {
      import graft.functions.VectorFunctions.{cosine, vecNorm}
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", vecNorm(col("vecd")))
        .select(col("vec_id"), col("vecd"), col("nrm"))
      val cents = e.filter(col("vec_id") < K)
        .select(col("vec_id").as("cent_id"), col("vecd").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cent_id").asc)
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("sim", cosine(col("vecd"), col("cv"), col("nrm"), col("cn")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("cent_id").as("cell"), col("vecd"), col("nrm"))
      val reps = assigned.groupBy("cell").agg(min("vec_id").as("rep_id"))
        .join(e.select(col("vec_id").as("rep_id"), col("vecd").as("rv"),
          col("nrm").as("rn2")), "rep_id")
      val judged = assigned.join(broadcast(reps), "cell")
        .withColumn("cos_rep", cosine(col("vecd"), col("rv"), col("nrm"), col("rn2")))
        .withColumn("kept", (col("vec_id") === col("rep_id")) ||
          (col("cos_rep") <= lit(Thresh)))
      judged.groupBy("cell")
        .agg(min("rep_id").cast("long").as("rep_id"),
          count(lit(1)).as("n_members"),
          sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_kept"),
          sum(when(!col("kept"), 1L).otherwise(0L)).cast("long").as("n_dropped"),
          dround(avg("cos_rep"), 4).as("mean_cos_rep"))
        .orderBy("cell")
    },
    Some(s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        c AS (SELECT vec_id AS cent_id, vecd AS cv, nrm AS cn FROM e
              WHERE vec_id < $K),
        -- assignment window over SLIM rows (vec_id, cent_id, sim) only —
        -- r14 (verdict #4): carrying the 64-double lists through the
        -- corpus × K window sort was the sf10 memory blow-up; the vectors
        -- join back AFTER the argmax by vec_id (linear)
        a0 AS (SELECT vec_id, cent_id AS cell
               FROM (SELECT s.vec_id, s.cent_id,
                       row_number() OVER (PARTITION BY s.vec_id ORDER BY
                         s.sim DESC, s.cent_id ASC) AS rn
                     FROM (SELECT e.vec_id, c.cent_id,
                             list_sum(list_transform(list_zip(e.vecd, c.cv),
                               x -> x[1] * x[2])) / (e.nrm * c.cn) AS sim
                           FROM e CROSS JOIN c) s)
               WHERE rn = 1),
        a AS (SELECT a0.vec_id, a0.cell, e.vecd, e.nrm
              FROM a0 JOIN e ON a0.vec_id = e.vec_id),
        reps AS (SELECT cell, min(vec_id) AS rep_id FROM a GROUP BY cell),
        rv AS (SELECT reps.cell, reps.rep_id, e.vecd AS rv, e.nrm AS rn2
               FROM reps JOIN e ON e.vec_id = reps.rep_id),
        judged AS (SELECT a.cell, a.vec_id, rv.rep_id,
                     list_sum(list_transform(list_zip(a.vecd, rv.rv),
                       x -> x[1] * x[2])) / (a.nrm * rv.rn2) AS cos_rep,
                     (a.vec_id = rv.rep_id OR
                      list_sum(list_transform(list_zip(a.vecd, rv.rv),
                        x -> x[1] * x[2])) / (a.nrm * rv.rn2) <= $Thresh) AS kept
                   FROM a JOIN rv ON a.cell = rv.cell)
      SELECT cell, CAST(min(rep_id) AS BIGINT) AS rep_id,
             count(*) AS n_members,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             ${oround("avg(cos_rep)", 4)} AS mean_cos_rep
      FROM judged GROUP BY cell ORDER BY cell"""))

  // ---------------------------------------------------------------------
  // Incremental posting-stats maintenance — the inverted-index refresh
  // behind BM25 at scale: per-term document frequency and total term
  // frequency are MERGEABLE state (pure sums over disjoint doc batches),
  // so each index refresh aggregates only the new batch (map-side
  // combined) and full-outer-merges O(|vocab|) state rows — the index is
  // never rebuilt from the raw corpus. Same invariant discipline as
  // q_incremental_agg: the oracle computes the DIRECT aggregation over
  // all documents, so the hash gate proves folded state ≡ full rebuild.
  private val incrementalPostings = QueryDef(
    "q_incremental_postings",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .groupBy("term").agg(count(lit(1)).as("doc_freq"),
            sum("tf").as("tf_total"))
      def mergeState(state: org.apache.spark.sql.DataFrame,
          batch: org.apache.spark.sql.DataFrame) =
        state.as("s").join(batch.as("b"), Seq("term"), "full_outer")
          .select(col("term"),
            (coalesce(col("s.doc_freq"), lit(0L))
              + coalesce(col("b.doc_freq"), lit(0L))).as("doc_freq"),
            (coalesce(col("s.tf_total"), lit(0L))
              + coalesce(col("b.tf_total"), lit(0L))).as("tf_total"))
      val state = (0 until 3)
        .map(i => partial(docs.filter(col("doc_id") % 3 === i)))
        .reduce(mergeState)
      state.select(col("term"), col("doc_freq").cast("long").as("doc_freq"),
          col("tf_total").cast("long").as("tf_total"))
        .orderBy("term")
    },
    Some("""
      WITH tf AS (SELECT doc_id, term, count(*) AS tf
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                        FROM documents)
                  GROUP BY 1, 2)
      SELECT term, count(*) AS doc_freq,
             CAST(sum(tf) AS BIGINT) AS tf_total
      FROM tf GROUP BY term ORDER BY term"""))

  // ---------------------------------------------------------------------
  // MMR-diversified rerank (Carbonell & Goldstein 1998, Maximal Marginal
  // Relevance) — the standard second stage after a top-k retrieval: from
  // each query's candidate list, greedily select K results maximizing
  //   λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)      (λ = 0.7),
  // so near-duplicate candidates can't crowd the result page. Completes
  // the retrieval stack: BM25 (lexical) → RRF (fusion) → MMR (diversity).
  //
  // Scale shape: candidate lists are top-C per query (C = 12 here) — the
  // greedy stage touches C rows and C² pairwise sims PER QUERY, all keyed
  // by q_id, so every one of the K rounds is an equi-join/window
  // partitioned on q_id: per-query work is constant, queries parallelize
  // across the cluster, and no stage ever sees the corpus (only the
  // candidate generator does, and that is the already-certified ANN
  // family). K is a fixed constant → the unrolled loop is a static plan.
  //
  // Determinism: greedy argmax over floats is exactly where a last-ulp
  // disagreement would cascade into a different selection SET, so both
  // relevance and pairwise sims are quantized to the 1e-6 integer grid
  // FIRST and the MMR objective is evaluated in pure integer arithmetic
  // (score10 = 7·rel_i − 3·sim_i — λ scaled by 10); ties break on vec_id.
  private val MmrNQ = 6
  private val MmrCands = 12
  private val MmrK = 4

  private val mmrRerank = QueryDef(
    "q_mmr_rerank",
    (s, dir) => {
      import graft.functions.VectorFunctions.{cosine, vecNorm}
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", vecNorm(col("vecd")))
        .select(col("vec_id"), col("vecd"), col("nrm"))
      val q = e.filter(col("vec_id") < MmrNQ)
        .select(col("vec_id").as("q_id"), col("vecd").as("qv"),
          col("nrm").as("qn"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("rel_i",
          round(cosine(col("qv"), col("vecd"), col("qn"), col("nrm")) * 1e6)
            .cast("long"))
      val wRel = Window.partitionBy("q_id")
        .orderBy(col("rel_i").desc, col("vec_id").asc)
      // ONE cached corpus pass builds the candidate lists; everything
      // after it (pairwise sims, the K greedy rounds) re-derives from the
      // cache — without this the corpus scan+window ran three times
      // (candSlim, pair's two self-join sides)
      val cand = scored.withColumn("rn", row_number().over(wRel))
        .filter(col("rn") <= MmrCands)
        .select("q_id", "vec_id", "rel_i", "vecd", "nrm")
      Cached.withPinned(cand) { case Seq(cand) => // r15: pin + plan-truncate
        val candSlim = cand.select("q_id", "vec_id", "rel_i")
        val pa = cand.select(col("q_id"), col("vec_id").as("a"),
          col("vecd").as("av"), col("nrm").as("an"))
        val pb = cand.select(col("q_id"), col("vec_id").as("b"),
          col("vecd").as("bv"), col("nrm").as("bn"))
        val pair = pa.join(pb, Seq("q_id")).filter(col("a") =!= col("b"))
          .withColumn("sim_i",
            round(cosine(col("av"), col("bv"), col("an"), col("bn")) * 1e6)
              .cast("long"))
          .select("q_id", "a", "b", "sim_i")
        val wPick = Window.partitionBy("q_id")
          .orderBy(col("score10").desc, col("vec_id").asc)
        // per-round lineage truncation (the PageRank/CC discipline): sel
        // feeds THREE consumers each round (anti-join, b-side join, the
        // union), so an un-truncated chain re-inlines round k−1's plan
        // 3× into round k — exponential plan growth was the entire cost
        // of the first cut of this query (measured ~10 s on a 72-row
        // problem). The checkpointed frame is ≤ NQ·K rows.
        def snap(df: org.apache.spark.sql.DataFrame) =
          df.localCheckpoint(true)
        var sel = snap(candSlim
          .withColumn("score10", col("rel_i") * 7L)
          .withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
          .withColumn("sel_rank", lit(1)).drop("rn"))
        for (k <- 2 to MmrK) {
          val rem = candSlim.join(sel.select("q_id", "vec_id"),
            Seq("q_id", "vec_id"), "left_anti")
          val ms = rem
            .join(pair.withColumnRenamed("a", "vec_id"), Seq("q_id", "vec_id"))
            .join(sel.select(col("q_id"), col("vec_id").as("b")), Seq("q_id", "b"))
            .groupBy("q_id", "vec_id", "rel_i").agg(max("sim_i").as("ms"))
          val pick = ms
            .withColumn("score10", col("rel_i") * 7L - col("ms") * 3L)
            .withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
            .withColumn("sel_rank", lit(k))
            .select(sel.columns.map(col): _*)
          sel = snap(sel.unionByName(pick))
        }
        sel.select(col("q_id"), col("sel_rank"),
          col("vec_id").as("selected_id"),
          dround(col("rel_i").cast("double") / 1e6, 4).as("relevance"),
          dround(col("score10").cast("double") / 1e7, 4).as("mmr_score"))
          .orderBy("q_id", "sel_rank")
      }
    },
    Some {
      val steps = (2 to MmrK).map { k =>
        s"""m$k AS (SELECT c.q_id, c.vec_id, c.rel_i, max(p.sim_i) AS ms
               FROM cand c
               JOIN pair p ON p.q_id = c.q_id AND p.a = c.vec_id
               JOIN all${k - 1} s ON s.q_id = p.q_id AND s.vec_id = p.b
               WHERE NOT EXISTS (SELECT 1 FROM all${k - 1} x
                                 WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
               GROUP BY 1, 2, 3),
        sel$k AS (SELECT q_id, vec_id, rel_i, score10, $k AS sel_rank
               FROM (SELECT q_id, vec_id, rel_i,
                       CAST(7 * rel_i - 3 * ms AS BIGINT) AS score10,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY 7 * rel_i - 3 * ms DESC, vec_id ASC) AS rn
                     FROM m$k) WHERE rn = 1),
        all$k AS MATERIALIZED (SELECT * FROM all${k - 1}
               UNION ALL SELECT * FROM sel$k)"""
      }.mkString(",\n        ")
      s"""
      WITH e AS MATERIALIZED (
             SELECT vec_id,
                    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                    sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
             FROM embeddings),
        q AS (SELECT vec_id AS q_id, vecd AS qv, nrm AS qn FROM e
              WHERE vec_id < $MmrNQ),
        scored AS (SELECT q.q_id, e.vec_id,
                     CAST(round(list_sum(list_transform(list_zip(q.qv, e.vecd),
                       x -> x[1] * x[2])) / (q.qn * e.nrm) * 1e6) AS BIGINT)
                       AS rel_i
                   FROM e JOIN q ON e.vec_id <> q.q_id),
        cand AS MATERIALIZED (
               SELECT s.q_id, s.vec_id, s.rel_i, e.vecd, e.nrm
               FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                       ORDER BY rel_i DESC, vec_id ASC) AS rn
                     FROM scored) s
               JOIN e ON e.vec_id = s.vec_id
               WHERE s.rn <= $MmrCands),
        pair AS MATERIALIZED (
               SELECT a.q_id, a.vec_id AS a, b.vec_id AS b,
                      CAST(round(list_sum(list_transform(
                        list_zip(a.vecd, b.vecd), x -> x[1] * x[2]))
                        / (a.nrm * b.nrm) * 1e6) AS BIGINT) AS sim_i
               FROM cand a JOIN cand b
                 ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
        sel1 AS (SELECT q_id, vec_id, rel_i,
                   CAST(7 * rel_i AS BIGINT) AS score10, 1 AS sel_rank
                 FROM (SELECT q_id, vec_id, rel_i,
                         row_number() OVER (PARTITION BY q_id
                           ORDER BY rel_i DESC, vec_id ASC) AS rn
                       FROM cand) WHERE rn = 1),
        all1 AS MATERIALIZED (SELECT * FROM sel1),
        $steps
      SELECT q_id, sel_rank, vec_id AS selected_id,
             ${oround("CAST(rel_i AS DOUBLE) / 1e6", 4)} AS relevance,
             ${oround("CAST(score10 AS DOUBLE) / 1e7", 4)} AS mmr_score
      FROM all$MmrK ORDER BY q_id, sel_rank"""
    })

  // ---------------------------------------------------------------------
  // Exact-phrase search over POSITIONAL postings — the adjacency query a
  // term-level inverted index cannot answer (BM25 above is bag-of-words;
  // "hash join" ≠ "join hash"). Classic positional-index evaluation
  // [Manning et al., IR ch. 2], relationalized: a posting is
  // (doc_id, term, pos); a phrase of length L matches at start p iff all
  // L (term, offset) pairs hit at pos = p + offset — so ONE broadcast
  // equi-join of postings against the tiny (phrase, term, offset) table,
  // then a count-distinct-offsets == L group filter on
  // (phrase, doc, pos − offset). No joins per phrase position, no
  // self-join of the postings table.
  //
  // Scale: corpus-side work is one posexplode (linear) and hash aggs keyed
  // by (phrase, doc, start) with full map-side combine; the phrase table
  // broadcasts. At 100 TB postings are the stored index, partitioned by
  // term — the probe prunes to the phrase's terms before any shuffle.
  private val phrases: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("table", "scan"),
    2 -> Seq("hash", "join"),
    3 -> Seq("window", "agg", "sort"))

  private val phraseSearch = QueryDef(
    "q_phrase_search",
    (s, dir) => {
      import s.implicits._
      val post = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      val phr = phrases
        .flatMap { case (id, ts) => ts.zipWithIndex.map { case (t, o) => (id, t, o, ts.size) } }
        .toDF("phrase_id", "term", "off", "plen")
      val starts = post.join(broadcast(phr), "term")
        .groupBy(col("phrase_id"), col("doc_id"),
          (col("pos") - col("off")).as("start"), col("plen"))
        .agg(countDistinct("off").as("n_off"))
        .filter(col("n_off") === col("plen"))
      starts.groupBy("phrase_id")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_matches"),
          min("doc_id").as("first_doc"))
        .orderBy("phrase_id")
    },
    Some {
      val phraseRows = phrases
        .flatMap { case (id, ts) =>
          ts.zipWithIndex.map { case (t, o) => s"($id, '$t', $o, ${ts.size})" } }
        .mkString(", ")
      s"""
      WITH post AS (SELECT doc_id, i - 1 AS pos, toks[i] AS term
                    FROM (SELECT doc_id, toks,
                            unnest(generate_series(1, len(toks))) AS i
                          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                                FROM documents))),
        phr(phrase_id, term, off, plen) AS (VALUES $phraseRows),
        starts AS (SELECT phrase_id, doc_id, pos - off AS start, plen,
                     count(DISTINCT off) AS n_off
                   FROM post JOIN phr USING (term)
                   GROUP BY 1, 2, 3, 4)
      SELECT phrase_id, count(DISTINCT doc_id) AS n_docs,
             count(*) AS n_matches,
             min(doc_id) AS first_doc
      FROM starts WHERE n_off = plen
      GROUP BY phrase_id ORDER BY phrase_id"""
    })

  // -- NDCG@10 ranking evaluation of the BM25 ranker against graded
  //    relevance (rel(q,d) = total query-term frequency in d): the
  //    standard offline eval every retrieval pipeline runs. BM25
  //    positions come from the same 1e-6 integer-grid scores as
  //    q_bm25_topk (deterministic ordering); DCG uses linear gains
  //    rel/log2(pos+1); NDCG = DCG/IDCG with the ideal ordering ranked by
  //    (rel desc, doc asc). Both rankings are per-query windows over
  //    candidate sets — never a global sort.
  private val ndcgEval = QueryDef(
    "q_ndcg_bm25",
    (s, dir) => {
      import s.implicits._
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("dl", size(col("toks")))
      val stats = d.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val qs = bm25Queries.toDF("query_id", "term")
      val qterms = qs.select("term").distinct()
      // posting-filtered tf — see q_bm25_topk: the query-term semi-filter
      // precedes the aggregate, so the shuffle is match-mass-, not
      // vocabulary-, sized
      val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .join(broadcast(qterms), "term")
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val perDoc = tf
        .join(broadcast(qs), "term")
        .join(broadcast(df_), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("contrib", col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
        .withColumn("contrib_u", floor(col("contrib") * lit(1e6)).cast("long"))
        .groupBy("query_id", "doc_id")
        .agg(sum("contrib_u").as("score_u"), sum("tf").as("rel"))
      val wRank = Window.partitionBy("query_id")
        .orderBy(col("score_u").desc, col("doc_id").asc)
      val wIdeal = Window.partitionBy("query_id")
        .orderBy(col("rel").desc, col("doc_id").asc)
      val gains = perDoc
        .withColumn("rk", row_number().over(wRank))
        .withColumn("ik", row_number().over(wIdeal))
        .withColumn("dcg_t", when(col("rk") <= TopK,
          col("rel").cast("double") / log2(col("rk") + 1)).otherwise(0.0))
        .withColumn("idcg_t", when(col("ik") <= TopK,
          col("rel").cast("double") / log2(col("ik") + 1)).otherwise(0.0))
      gains.groupBy("query_id")
        .agg(count(lit(1)).as("n_candidates"),
          dround(sum("dcg_t") / sum("idcg_t"), 6).as("ndcg10"))
        .orderBy("query_id")
    },
    Some {
      val qvals = bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        dl AS (SELECT doc_id, len(toks) AS dl FROM d),
        tf AS (SELECT t.doc_id, dl.dl, term, CAST(count(*) AS BIGINT) AS tf
               FROM (SELECT doc_id, unnest(toks) AS term FROM d) t
               JOIN dl ON t.doc_id = dl.doc_id
               GROUP BY 1, 2, 3),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
               FROM dl),
        df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
               GROUP BY term),
        qs AS (SELECT * FROM (VALUES $qvals) AS t(query_id, term)),
        perdoc AS (
          SELECT qs.query_id, tf.doc_id,
            CAST(sum(CAST(floor(
              ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf * ${K1 + 1.0})
              / (tf.tf + $K1 * (${1.0 - B} + $B * tf.dl / st.avgdl))
              * 1e6) AS BIGINT)) AS BIGINT) AS score_u,
            CAST(sum(tf.tf) AS BIGINT) AS rel
          FROM tf
          JOIN qs ON tf.term = qs.term
          JOIN df ON tf.term = df.term
          CROSS JOIN st
          GROUP BY 1, 2),
        ranked AS (SELECT *,
            row_number() OVER (PARTITION BY query_id
              ORDER BY score_u DESC, doc_id ASC) AS rk,
            row_number() OVER (PARTITION BY query_id
              ORDER BY rel DESC, doc_id ASC) AS ik
          FROM perdoc),
        gains AS (SELECT query_id,
            CASE WHEN rk <= $TopK
              THEN CAST(rel AS DOUBLE) / log2(rk + 1) ELSE 0.0 END AS dcg_t,
            CASE WHEN ik <= $TopK
              THEN CAST(rel AS DOUBLE) / log2(ik + 1) ELSE 0.0 END AS idcg_t
          FROM ranked)
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates,
             ${oround("sum(dcg_t) / sum(idcg_t)", 6)} AS ndcg10
      FROM gains GROUP BY query_id ORDER BY query_id"""
    })

  // -- MRR + recall@10 against BINARY conjunctive relevance (a doc is
  //    relevant iff it contains EVERY term of the query) — the other half
  //    of the offline-eval pair next to q_ndcg_bm25's graded relevance.
  //    Relevance is decided from the same per-(query, doc) candidate
  //    aggregate the ranker already builds (distinct matched terms =
  //    query arity), so truth costs no extra corpus scan; relevant docs
  //    are by construction a subset of the ranked candidates, making
  //    MRR well-defined without a corpus-wide membership probe. All
  //    metrics reduce per query over candidate rows only; the single
  //    1/rank division is the only float, dround-pinned.
  private val mrrEval = QueryDef(
    "q_mrr_recall",
    (s, dir) => {
      import s.implicits._
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("dl", size(col("toks")))
      val stats = d.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val qs = bm25Queries.toDF("query_id", "term")
      val qarity = qs.groupBy("query_id")
        .agg(countDistinct("term").as("q_arity"))
      val qterms = qs.select("term").distinct()
      // posting-filtered tf — see q_bm25_topk: the query-term semi-filter
      // precedes the aggregate, so the shuffle is match-mass-, not
      // vocabulary-, sized
      val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .join(broadcast(qterms), "term")
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val perDoc = tf
        .join(broadcast(qs), "term")
        .join(broadcast(df_), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("contrib", col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
        .withColumn("contrib_u", floor(col("contrib") * lit(1e6)).cast("long"))
        .groupBy("query_id", "doc_id")
        .agg(sum("contrib_u").as("score_u"),
          countDistinct("term").as("n_terms_hit"))
        .join(broadcast(qarity), "query_id")
        .withColumn("is_rel", (col("n_terms_hit") === col("q_arity")).cast("long"))
      val wRank = Window.partitionBy("query_id")
        .orderBy(col("score_u").desc, col("doc_id").asc)
      perDoc.withColumn("rk", row_number().over(wRank))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_candidates"),
          sum("is_rel").as("n_relevant"),
          min(when(col("is_rel") === 1L, col("rk"))).as("first_rel_rank"),
          sum(when(col("is_rel") === 1L && col("rk") <= TopK, 1L)
            .otherwise(0L)).as("rel_in_top10"))
        .select(col("query_id"), col("n_candidates"), col("n_relevant"),
          col("first_rel_rank"),
          dround(lit(1.0) / col("first_rel_rank"), 6).as("mrr"),
          col("rel_in_top10"),
          dround(col("rel_in_top10").cast("double") /
            nullif(col("n_relevant"), lit(0L)), 6).as("recall10"))
        .orderBy("query_id")
    },
    Some {
      val qvals = bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        dl AS (SELECT doc_id, len(toks) AS dl FROM d),
        tf AS (SELECT t.doc_id, dl.dl, term, CAST(count(*) AS BIGINT) AS tf
               FROM (SELECT doc_id, unnest(toks) AS term FROM d) t
               JOIN dl ON t.doc_id = dl.doc_id
               GROUP BY 1, 2, 3),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
               FROM dl),
        df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
               GROUP BY term),
        qs AS (SELECT * FROM (VALUES $qvals) AS t(query_id, term)),
        qa AS (SELECT query_id, count(DISTINCT term) AS q_arity FROM qs
               GROUP BY 1),
        perdoc AS (
          SELECT qs.query_id, tf.doc_id,
            CAST(sum(CAST(floor(
              ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf * ${K1 + 1.0})
              / (tf.tf + $K1 * (${1.0 - B} + $B * tf.dl / st.avgdl))
              * 1e6) AS BIGINT)) AS BIGINT) AS score_u,
            count(DISTINCT tf.term) AS n_terms_hit
          FROM tf
          JOIN qs ON tf.term = qs.term
          JOIN df ON tf.term = df.term
          CROSS JOIN st
          GROUP BY 1, 2),
        flagged AS (
          SELECT p.*, CASE WHEN p.n_terms_hit = qa.q_arity
                           THEN 1 ELSE 0 END AS is_rel
          FROM perdoc p JOIN qa USING (query_id)),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY score_u DESC, doc_id ASC) AS rk
                   FROM flagged),
        agg AS (
          SELECT query_id,
            CAST(count(*) AS BIGINT) AS n_candidates,
            CAST(sum(is_rel) AS BIGINT) AS n_relevant,
            CAST(min(CASE WHEN is_rel = 1 THEN rk END) AS BIGINT)
              AS first_rel_rank,
            CAST(sum(CASE WHEN is_rel = 1 AND rk <= $TopK THEN 1 ELSE 0 END)
              AS BIGINT) AS rel_in_top10
          FROM ranked GROUP BY query_id)
      SELECT query_id, n_candidates, n_relevant, first_rel_rank,
             ${oround("1.0 / first_rel_rank", 6)} AS mrr,
             rel_in_top10,
             ${oround("CAST(rel_in_top10 AS DOUBLE) / nullif(n_relevant, 0)", 6)}
               AS recall10
      FROM agg ORDER BY query_id"""
    })

  def queries: Seq[QueryDef] = Seq(bm25, fkIntegrity, semDedup,
    incrementalPostings, mmrRerank, phraseSearch, ndcgEval, mrrEval)
}
