package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Det.{dround, oround}

/** Similarity search over the embedding column (builder brief): brute-force
  * cosine top-k as the exact baseline, and a sign-LSH bucketed variant as
  * the scale path.
  *
  * Scale design: the query set is tiny → `broadcast()` it against the corpus
  * scan (no shuffle of the big side). The LSH variant replaces the full scan
  * with an equi-join on the bucket key — at 100 TB the corpus is written
  * bucketed/partitioned by that key so candidate lookup is partition-pruned.
  * Dot products run as codegen'd `aggregate(zip_with(...))` in index order,
  * which the DuckDB oracle reproduces bit-for-bit.
  */
object EmbeddingQueries extends QueryModule {

  private val NQueries = 8

  // -- exact brute-force cosine top-5 per query vector
  private val bruteForceTopK = QueryDef(
    "q_ann_bruteforce_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", graft.functions.VectorFunctions.vecNorm(col("vecd")))
        .select(col("vec_id"), col("label"), col("vecd"), col("nrm"))
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("vecd").as("qv"), col("nrm").as("qn"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("cosine", graft.functions.VectorFunctions.cosine(
          col("qv"), col("vecd"), col("qn"), col("nrm")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          col("label").as("neighbor_label"), dround(col("cosine"), 4).as("cosine"))
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        q AS (SELECT vec_id AS q_id, vecd AS qv, nrm AS qn FROM e
              WHERE vec_id < $NQueries),
        scored AS (SELECT q.q_id, e.vec_id, e.label,
                     list_sum(list_transform(list_zip(q.qv, e.vecd),
                       x -> x[1] * x[2])) / (q.qn * e.nrm) AS cosine
                   FROM e JOIN q ON e.vec_id <> q.q_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                     ORDER BY cosine DESC, vec_id ASC) AS rank
                   FROM scored)
      SELECT q_id, rank, vec_id AS neighbor_id, label AS neighbor_label,
             ${oround("cosine", 4)} AS cosine
      FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""))

  /** sign-LSH bucket: 4 axis-aligned hyperplanes (dims 0..3) → 16 buckets.
    * Shared with DedupQueries' near-dup blocking. */
  private[queries] val bucketSpark = (0 until 4).map(i =>
    when(element_at(col("embedding"), i + 1) > 0f, lit(1 << i)).otherwise(lit(0)))
    .reduce(_ + _)
  private[queries] val bucketSql = (0 until 4).map(i =>
    s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)").mkString(" + ")

  // -- LSH-bucketed ANN: candidates restricted to the query's bucket
  private val lshTopK = QueryDef(
    "q_ann_lsh_bucketed",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .withColumn("bucket", bucketSpark)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", graft.functions.VectorFunctions.vecNorm(col("vecd")))
        .select(col("vec_id"), col("bucket"), col("vecd"), col("nrm"))
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"),
          col("vecd").as("qv"), col("nrm").as("qn"))
      val scored = e.join(broadcast(q),
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .withColumn("cosine", graft.functions.VectorFunctions.cosine(
          col("qv"), col("vecd"), col("qn"), col("nrm")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q_id"), col("q_bucket").as("bucket"), col("rank"),
          col("vec_id").as("neighbor_id"), dround(col("cosine"), 4).as("cosine"))
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, $bucketSql AS bucket,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        q AS (SELECT vec_id AS q_id, bucket AS q_bucket, vecd AS qv, nrm AS qn
              FROM e WHERE vec_id < $NQueries),
        scored AS (SELECT q.q_id, q.q_bucket, e.vec_id,
                     list_sum(list_transform(list_zip(q.qv, e.vecd),
                       x -> x[1] * x[2])) / (q.qn * e.nrm) AS cosine
                   FROM e JOIN q ON e.bucket = q.q_bucket AND e.vec_id <> q.q_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                     ORDER BY cosine DESC, vec_id ASC) AS rank
                   FROM scored)
      SELECT q_id, q_bucket AS bucket, rank, vec_id AS neighbor_id,
             ${oround("cosine", 4)} AS cosine
      FROM ranked WHERE rank <= 3 ORDER BY q_id, rank"""))

  // -- per-label vector statistics incl. centroid norm (columnar re-agg over
  //    posexploded dims — the shape a 100 TB feature-store rollup takes)
  private val normStats = QueryDef(
    "q_embedding_label_stats",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", graft.functions.VectorFunctions.vecNorm(col("vecd")))
      val norms = e.groupBy("label")
        .agg(count(lit(1)).as("n_vectors"),
          dround(avg("nrm"), 4).as("avg_norm"),
          dround(min("nrm"), 4).as("min_norm"),
          dround(max("nrm"), 4).as("max_norm"))
      val centroid = e.select(col("label"), posexplode(col("vecd")).as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(avg("x").as("m"))
        .groupBy("label")
        .agg(dround(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"))
      norms.join(centroid, "label").orderBy("label")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        norms AS (SELECT label, count(*) AS n_vectors,
                    ${oround("avg(nrm)", 4)} AS avg_norm,
                    ${oround("min(nrm)", 4)} AS min_norm,
                    ${oround("max(nrm)", 4)} AS max_norm
                  FROM e GROUP BY label),
        dims AS (SELECT label, i.i AS pos, avg(vecd[i.i + 1]) AS m
                 FROM e, (SELECT unnest(generate_series(0, 63)) AS i) i
                 GROUP BY label, i.i),
        cent AS (SELECT label,
                   ${oround("sqrt(sum(m * m))", 4)} AS centroid_norm
                 FROM dims GROUP BY label)
      SELECT norms.label, n_vectors, avg_norm, min_norm, max_norm, centroid_norm
      FROM norms JOIN cent ON norms.label = cent.label
      ORDER BY norms.label"""))

  // -- centroid drift between two corpus snapshots (proxied by vec_id
  //    parity — a deterministic 50/50 split both engines replay): per
  //    label, the cosine between the two halves' centroids plus both
  //    norms — the embedding-distribution drift monitor a training
  //    pipeline runs when a new data batch lands (cosine ≈ 1 means the
  //    label's region is stable; a drop flags upstream distribution
  //    shift). Same columnar posexplode re-agg shape as
  //    q_embedding_label_stats: state is (labels × 2 × 64) cells
  //    regardless of corpus size, two map-side-combinable aggregations,
  //    no window, no join bigger than the cell table.
  private val centroidDrift = QueryDef(
    "q_centroid_drift",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .withColumn("half", (col("vec_id") % 2).cast("int"))
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      val dims = e.select(col("label"), col("half"),
          posexplode(col("vecd")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg(when(col("half") === 0, col("x"))).as("ma"),
          avg(when(col("half") === 1, col("x"))).as("mb"))
      val counts = e.groupBy("label")
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_b"))
      dims.groupBy("label")
        .agg(sum(col("ma") * col("mb")).as("dot"),
          sum(col("ma") * col("ma")).as("na2"),
          sum(col("mb") * col("mb")).as("nb2"))
        .join(broadcast(counts), "label")
        .select(col("label"), col("n_a"), col("n_b"),
          dround(sqrt(col("na2")), 4).as("norm_a"),
          dround(sqrt(col("nb2")), 4).as("norm_b"),
          dround(col("dot") / (sqrt(col("na2")) * sqrt(col("nb2"))), 4)
            .as("cosine_drift"))
        .orderBy("label")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, CAST(vec_id % 2 AS INT) AS half,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd
                 FROM embeddings),
        dims AS (SELECT label, i.i AS pos,
                   avg(CASE WHEN half = 0 THEN vecd[i.i + 1] END) AS ma,
                   avg(CASE WHEN half = 1 THEN vecd[i.i + 1] END) AS mb
                 FROM e, (SELECT unnest(generate_series(0, 63)) AS i) i
                 GROUP BY label, i.i),
        agg AS (SELECT label, sum(ma * mb) AS dot, sum(ma * ma) AS na2,
                  sum(mb * mb) AS nb2
                FROM dims GROUP BY label),
        counts AS (SELECT label,
                     CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_a,
                     CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_b
                   FROM e GROUP BY label)
      SELECT agg.label, n_a, n_b,
             ${oround("sqrt(na2)", 4)} AS norm_a,
             ${oround("sqrt(nb2)", 4)} AS norm_b,
             ${oround("dot / (sqrt(na2) * sqrt(nb2))", 4)} AS cosine_drift
      FROM agg JOIN counts ON agg.label = counts.label
      ORDER BY agg.label"""))

  // -- IVF-style ANN: deterministic coarse quantizer (centroids = the first
  //    NCells corpus vectors), assign every vector to its nearest centroid
  //    (the inverted-file cell), then search only the query's cell. At
  //    100 TB the corpus is written partitioned by cell id → a query probes
  //    one partition instead of the full scan (the IVF promise).
  private val NCells = 8
  private val ivfTopK = QueryDef(
    "q_ann_ivf",
    (s, dir) => {
      import graft.functions.VectorFunctions.{cosine, vecDot, vecNorm}
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", vecNorm(col("vecd")))
        .select(col("vec_id"), col("vecd"), col("nrm"))
      val cents = e.filter(col("vec_id") < NCells)
        .select(col("vec_id").as("cent_id"), col("vecd").as("cv"), col("nrm").as("cn"))
      // assign: nearest centroid by cosine (ties → lowest centroid id)
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("sim", cosine(col("vecd"), col("cv"), col("nrm"), col("cn")))
      val wAssign = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("sim").desc, col("cent_id").asc)
      val cells = assigned.withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cent_id").as("cell"), col("vecd"), col("nrm"))
      val q = cells.filter(col("vec_id") < NCells)
        .select(col("vec_id").as("q_id"), col("cell").as("q_cell"),
          col("vecd").as("qv"), col("nrm").as("qn"))
      val scored = cells.join(broadcast(q),
          col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
        .withColumn("cosine", cosine(col("qv"), col("vecd"), col("qn"), col("nrm")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q_id"), col("q_cell").as("cell"), col("rank"),
          col("vec_id").as("neighbor_id"), dround(col("cosine"), 4).as("cosine"))
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        cents AS (SELECT vec_id AS cent_id, vecd AS cv, nrm AS cn FROM e
                  WHERE vec_id < $NCells),
        assigned AS (SELECT e.vec_id, cents.cent_id,
                       list_sum(list_transform(list_zip(e.vecd, cents.cv),
                         x -> x[1] * x[2])) / (e.nrm * cents.cn) AS sim
                     FROM e CROSS JOIN cents),
        cells AS (SELECT a.vec_id, a.cent_id AS cell
                  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY sim DESC, cent_id ASC) AS rn
                        FROM assigned) a
                  WHERE rn = 1),
        ec AS (SELECT e.vec_id, cells.cell, e.vecd, e.nrm
               FROM e JOIN cells ON e.vec_id = cells.vec_id),
        q AS (SELECT vec_id AS q_id, cell AS q_cell, vecd AS qv, nrm AS qn
              FROM ec WHERE vec_id < $NCells),
        scored AS (SELECT q.q_id, q.q_cell, ec.vec_id,
                     list_sum(list_transform(list_zip(q.qv, ec.vecd),
                       x -> x[1] * x[2])) / (q.qn * ec.nrm) AS cosine
                   FROM ec JOIN q ON ec.cell = q.q_cell AND ec.vec_id <> q.q_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                     ORDER BY cosine DESC, vec_id ASC) AS rank
                   FROM scored)
      SELECT q_id, q_cell AS cell, rank, vec_id AS neighbor_id,
             ${oround("cosine", 4)} AS cosine
      FROM ranked WHERE rank <= 3 ORDER BY q_id, rank"""))

  // -- one Lloyd iteration refining the IVF coarse quantizer: assign to the
  //    seed centroids, recompute each cell's centroid as the element-wise
  //    mean (posexplode → per-(cell, dim) avg → deterministic array
  //    reassembly), reassign, report cell populations + mean intra-cell
  //    similarity. Further iterations repeat the same two shuffles with
  //    lineage truncation (see ConnectedComponents) — one iteration keeps
  //    the oracle SQL-expressible, certifying assign + recompute +
  //    reassign end to end.
  private val kmeansRefine = QueryDef(
    "q_kmeans_refine",
    (s, dir) => {
      import graft.functions.VectorFunctions.{cosine, vecNorm}
      // r15: withCached → withPinned — these ANN DAGs re-reference the
      // normalized embedding frame many times (audit plans: 120-378
      // Exchange nodes of duplicated lineage); the pin truncates every
      // consumer plan to a leaf (same mechanism as q_curation_e2e,
      // results byte-identical). The lambda shadows the raw name so the
      // body is unchanged.
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", vecNorm(col("vecd")))
        .select(col("vec_id"), col("vecd"), col("nrm"))
      Cached.withPinned(e) { case Seq(e) =>
        def nearest(vs: org.apache.spark.sql.DataFrame,
            cents: org.apache.spark.sql.DataFrame) = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("vec_id").orderBy(col("sim").desc, col("cent_id").asc)
          vs.crossJoin(broadcast(cents))
            .withColumn("sim", cosine(col("vecd"), col("cv"), col("nrm"), col("cn")))
            .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .select(col("vec_id"), col("cent_id").as("cell"), col("sim"),
              col("vecd"), col("nrm"))
        }
        val cents0 = e.filter(col("vec_id") < NCells)
          .select(col("vec_id").as("cent_id"), col("vecd").as("cv"), col("nrm").as("cn"))
        val cells0 = nearest(e, cents0)
        // per-(cell, dim) mean on the 1e-9 integer grid (r14 advisor): a
        // plain double avg is last-ulp nondeterministic across partial-agg
        // orders and the centroid bits gate the discrete reassignment —
        // long sums are exact and order-free in both engines
        val cents1 = cells0
          .select(col("cell"), posexplode(col("vecd")).as(Seq("pos", "x")))
          .withColumn("xu", round(col("x") * lit(1e9)).cast("long"))
          .groupBy("cell", "pos")
          .agg((sum("xu").cast("double") / lit(1e9) / count(lit(1))).as("m"))
          .groupBy("cell")
          .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
            .as("cv"))
          .select(col("cell").as("cent_id"), col("cv"), vecNorm(col("cv")).as("cn"))
        nearest(e, cents1)
          .groupBy("cell")
          .agg(count(lit(1)).as("n_vectors"), dround(avg("sim"), 4).as("mean_sim"))
          .orderBy("cell")
      }
    },
    Some(s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        c0 AS (SELECT vec_id AS cent_id, vecd AS cv, nrm AS cn FROM e
               WHERE vec_id < $NCells),
        a0 AS (SELECT vec_id, cent_id AS cell, vecd
               FROM (SELECT e.vec_id, c0.cent_id, e.vecd,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                         list_sum(list_transform(list_zip(e.vecd, c0.cv),
                           x -> x[1] * x[2])) / (e.nrm * c0.cn) DESC,
                         c0.cent_id ASC) AS rn
                     FROM e CROSS JOIN c0)
               WHERE rn = 1),
        dims AS (SELECT cell, i.i AS pos,
                   CAST(sum(CAST(round(vecd[i.i + 1] * 1e9) AS BIGINT))
                     AS DOUBLE) / 1e9 / count(*) AS m
                 FROM a0, (SELECT unnest(generate_series(0, 63)) AS i) i
                 GROUP BY cell, i.i),
        c1 AS (SELECT cell AS cent_id, list(m ORDER BY pos) AS cv,
                 sqrt(list_sum(list_transform(list(m ORDER BY pos), x -> x * x))) AS cn
               FROM dims GROUP BY cell),
        a1 AS (SELECT vec_id, cent_id AS cell, sim
               FROM (SELECT e.vec_id, c1.cent_id,
                       list_sum(list_transform(list_zip(e.vecd, c1.cv),
                         x -> x[1] * x[2])) / (e.nrm * c1.cn) AS sim,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                         list_sum(list_transform(list_zip(e.vecd, c1.cv),
                           x -> x[1] * x[2])) / (e.nrm * c1.cn) DESC,
                         c1.cent_id ASC) AS rn
                     FROM e CROSS JOIN c1)
               WHERE rn = 1)
      SELECT cell, count(*) AS n_vectors, ${oround("avg(sim)", 4)} AS mean_sim
      FROM a1 GROUP BY cell ORDER BY cell"""),
    bench = false) // two broadcast-assign passes — correctness query

  // ---------------------------------------------------------------------
  // Real (de-toyed) sign-LSH index: NBits SEEDED random hyperplanes →
  // 2^NBits buckets, plus 1-bit-flip MULTI-PROBE for recall. The hyperplane
  // matrix is generated by a pure-integer LCG from a literal seed at class
  // init and embedded as the SAME double literals in the Spark plan and the
  // DuckDB oracle (shortest-repr round-trip), so bucket assignment —
  // including sign decisions arbitrarily close to the boundary — is
  // bit-identical in both engines. Recall@3 against the exact brute-force
  // top-3 is computed INSIDE the query, so the index's quality is itself
  // oracle-certified output, not a claim.
  //
  // Scale shape: corpus bucket is a codegen'd column (write-time partition
  // key at 100 TB); each query probes NBits+1 of 2^NBits buckets →
  // candidates ≈ (NBits+1)/2^NBits of the corpus per query, equi-joined on
  // the bucket key (partition-pruned lookup, no corpus shuffle).
  //
  // Recall calibration: the synthetic embeddings are ISOTROPIC NOISE (mean
  // same-label cosine ≈ 0.0007 — no cluster structure), so any LSH's
  // recall floor is its candidate mass; measured recall@3 here averages
  // ~0.11 at 3.5% candidate mass — a ~3× sign-agreement lift, which is the
  // honest ceiling on this data. On real clustered embeddings the same
  // index concentrates neighbors into the probed buckets; NBits (bucket
  // count) and the probe radius are the recall/cost knobs.
  private val NBits = 8
  private val VDim = 64
  private[queries] val hyperplanes: Array[Array[Double]] = {
    var x = 0x5DEECE66DL // literal seed — shared by construction
    def next(): Double = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 11).toDouble / 9007199254740992.0) * 2.0 - 1.0 // [-1, 1)
    }
    Array.fill(NBits, VDim)(next())
  }

  private def hDotSpark(i: Int): org.apache.spark.sql.Column =
    (0 until VDim).map(j => col("vecd")(j) * lit(hyperplanes(i)(j))).reduce(_ + _)
  private def hDotSql(i: Int): String =
    (0 until VDim).map(j => s"${hyperplanes(i)(j)}*vecd[${j + 1}]").mkString(" + ")

  private def mpBucketSpark: org.apache.spark.sql.Column =
    (0 until NBits).map(i => when(hDotSpark(i) > 0.0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  private val lshMultiprobe = QueryDef(
    "q_ann_lsh_multiprobe",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", graft.functions.VectorFunctions.vecNorm(col("vecd")))
        .withColumn("bucket", mpBucketSpark)
        .select(col("vec_id"), col("bucket"), col("vecd"), col("nrm"))
      val qBase = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"),
          col("vecd").as("qv"), col("nrm").as("qn"))
      // probe set: exact bucket + every 1-bit flip (arithmetic XOR:
      // b ^ m = b + m - 2*(b & m) — identical integer expr in both engines)
      val probes = array(lit(-1) +: (0 until NBits).map(i => lit(1 << i)): _*)
      val q = qBase.withColumn("_m", explode(probes))
        .withColumn("probe_bucket",
          when(col("_m") < 0, col("q_bucket"))
            .otherwise(col("q_bucket") + col("_m")
              - lit(2) * col("q_bucket").bitwiseAND(col("_m"))))
        .select(col("q_id"), col("probe_bucket"), col("qv"), col("qn"))
      val cand = e.join(broadcast(q),
          col("bucket") === col("probe_bucket") && col("vec_id") =!= col("q_id"))
        .withColumn("cosine", graft.functions.VectorFunctions.cosine(
          col("qv"), col("vecd"), col("qn"), col("nrm")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
      val mp3 = cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          col("cosine"))
      // exact top-3 (brute force) — the recall baseline, same tie-break
      val ex = e.join(broadcast(qBase), col("vec_id") =!= col("q_id"))
        .withColumn("cosine", graft.functions.VectorFunctions.cosine(
          col("qv"), col("vecd"), col("qn"), col("nrm")))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
      val rec = mp3.select("q_id", "neighbor_id")
        .join(ex, Seq("q_id", "neighbor_id"))
        .groupBy("q_id").agg(count(lit(1)).as("hits"))
      mp3.join(broadcast(rec), Seq("q_id"), "left")
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          dround(col("cosine"), 4).as("cosine"),
          dround(coalesce(col("hits"), lit(0L)).cast("double") / lit(3.0), 4)
            .as("recall_at3"))
        .orderBy("q_id", "rank")
    },
    Some {
      val bucketExpr = (0 until NBits).map(i =>
        s"(CASE WHEN (${hDotSql(i)}) > 0 THEN ${1 << i} ELSE 0 END)")
        .mkString("\n                   + ")
      s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        eb AS (SELECT vec_id, nrm, vecd,
                 $bucketExpr AS bucket
               FROM e),
        qb AS (SELECT vec_id AS q_id, bucket AS q_bucket, vecd AS qv, nrm AS qn
               FROM eb WHERE vec_id < $NQueries),
        q AS (SELECT q_id, qv, qn,
                CASE WHEN m < 0 THEN q_bucket
                     ELSE q_bucket + m - 2 * (q_bucket & m) END AS probe_bucket
              FROM qb, (SELECT unnest([-1${(0 until NBits).map(i => s", ${1 << i}").mkString}]) AS m)),
        cand AS (SELECT q.q_id, eb.vec_id,
                   list_sum(list_transform(list_zip(q.qv, eb.vecd),
                     x -> x[1] * x[2])) / (q.qn * eb.nrm) AS cosine
                 FROM eb JOIN q ON eb.bucket = q.probe_bucket
                               AND eb.vec_id <> q.q_id),
        mp3 AS (SELECT q_id, rank, vec_id AS neighbor_id, cosine
                FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                        ORDER BY cosine DESC, vec_id ASC) AS rank
                      FROM cand)
                WHERE rank <= 3),
        exact AS (SELECT q_id, vec_id AS neighbor_id
                  FROM (SELECT qb.q_id, eb.vec_id,
                          row_number() OVER (PARTITION BY qb.q_id
                            ORDER BY list_sum(list_transform(
                              list_zip(qb.qv, eb.vecd), x -> x[1] * x[2]))
                              / (qb.qn * eb.nrm) DESC, eb.vec_id ASC) AS rank
                        FROM eb JOIN qb ON eb.vec_id <> qb.q_id)
                  WHERE rank <= 3),
        rec AS (SELECT mp3.q_id, count(*) AS hits
                FROM mp3 JOIN exact ON mp3.q_id = exact.q_id
                                   AND mp3.neighbor_id = exact.neighbor_id
                GROUP BY mp3.q_id)
      SELECT mp3.q_id, rank, neighbor_id,
             ${oround("cosine", 4)} AS cosine,
             ${oround("coalesce(hits, 0) / 3.0", 4)} AS recall_at3
      FROM mp3 LEFT JOIN rec ON mp3.q_id = rec.q_id
      ORDER BY mp3.q_id, rank"""
    })

  // ---------------------------------------------------------------------
  // SQ8 scalar quantization + asymmetric distance computation (ADC) — the
  // FAISS `SQ8` index class (Jégou et al. 2011 use the same asymmetric
  // trick for PQ): train per-dimension [min, max] ranges over the corpus,
  // store each coordinate as an 8-bit code, and score queries EXACTLY
  // (asymmetric: full-precision query against dequantized corpus). The
  // memory path to RAM-resident vector search at 100 TB — 4× smaller than
  // float32, and the recall cost is measured INSIDE the query (recall@3 +
  // true cosine of every returned neighbor vs the exact ranking), so the
  // quantizer's quality is oracle-certified output, not a claim.
  //
  // Scale shape: training is ONE map-side-combined min/max aggregate
  // (dim-sized result); encode + dequantize is a single codegen projection
  // against the broadcast 1-row range frame — zero shuffles over the
  // corpus; the scan side of the search then reads 64 B/vector instead of
  // 256 B. Determinism: quantize/dequantize is a fixed IEEE expression
  // chain evaluated in index order in both engines — bit-identical codes,
  // bit-identical ADC scores.
  private val sq8Adc = QueryDef(
    "q_sq8_adc",
    (s, dir) => {
      import graft.functions.VectorFunctions.{cosine, vecNorm}
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", vecNorm(col("vecd")))
        .select(col("vec_id"), col("vecd"), col("nrm"))
      val dims = e.select(posexplode(col("vecd")).as(Seq("pos", "x")))
        .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      val st = dims.groupBy()
        .agg(expr("transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)")
          .as("mnv"),
          expr("transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)")
            .as("mxv"))
      val ec = e.crossJoin(broadcast(st))
        .withColumn("xhatv", expr(
          s"""transform(sequence(0, ${VDim - 1}), i ->
                CASE WHEN element_at(mxv, i + 1) > element_at(mnv, i + 1)
                     THEN element_at(mnv, i + 1)
                          + (least(255.0,
                               floor((element_at(vecd, i + 1) - element_at(mnv, i + 1))
                                 / (element_at(mxv, i + 1) - element_at(mnv, i + 1))
                                 * 256.0)) + 0.5)
                            * (element_at(mxv, i + 1) - element_at(mnv, i + 1)) / 256.0
                     ELSE element_at(mnv, i + 1) END)"""))
        .withColumn("xnrm", vecNorm(col("xhatv")))
        .select(col("vec_id"), col("vecd"), col("nrm"), col("xhatv"), col("xnrm"))
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("vecd").as("qv"), col("nrm").as("qn"))
      val scored = ec.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("adc_cosine", cosine(col("qv"), col("xhatv"), col("qn"), col("xnrm")))
        .withColumn("true_cosine", cosine(col("qv"), col("vecd"), col("qn"), col("nrm")))
        .select("q_id", "vec_id", "adc_cosine", "true_cosine")
      val wAdc = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("adc_cosine").desc, col("vec_id").asc)
      val wTrue = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("true_cosine").desc, col("vec_id").asc)
      val adc3 = scored.withColumn("rank", row_number().over(wAdc))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          col("adc_cosine"), col("true_cosine"))
      val ex3 = scored.withColumn("rank", row_number().over(wTrue))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
      val rec = adc3.select("q_id", "neighbor_id")
        .join(ex3, Seq("q_id", "neighbor_id"))
        .groupBy("q_id").agg(count(lit(1)).as("hits"))
      adc3.join(broadcast(rec), Seq("q_id"), "left")
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          dround(col("adc_cosine"), 4).as("adc_cosine"),
          dround(col("true_cosine"), 4).as("true_cosine"),
          dround(coalesce(col("hits"), lit(0L)).cast("double") / lit(3.0), 4)
            .as("recall_at3"))
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        dims AS (SELECT i.i AS pos, min(vecd[i.i + 1]) AS mn, max(vecd[i.i + 1]) AS mx
                 FROM e, (SELECT unnest(generate_series(0, ${VDim - 1})) AS i) i
                 GROUP BY i.i),
        st AS (SELECT list(mn ORDER BY pos) AS mnv, list(mx ORDER BY pos) AS mxv
               FROM dims),
        ec AS (SELECT vec_id, vecd, nrm,
                 list_transform(generate_series(0, ${VDim - 1}), i ->
                   CASE WHEN mxv[i + 1] > mnv[i + 1]
                        THEN mnv[i + 1]
                             + (least(255.0,
                                  floor((vecd[i + 1] - mnv[i + 1])
                                    / (mxv[i + 1] - mnv[i + 1]) * 256.0)) + 0.5)
                               * (mxv[i + 1] - mnv[i + 1]) / 256.0
                        ELSE mnv[i + 1] END) AS xhatv
               FROM e CROSS JOIN st),
        ecn AS (SELECT *, sqrt(list_sum(list_transform(xhatv, x -> x * x))) AS xnrm
                FROM ec),
        q AS (SELECT vec_id AS q_id, vecd AS qv, nrm AS qn FROM e
              WHERE vec_id < $NQueries),
        scored AS (SELECT q.q_id, ecn.vec_id,
                     list_sum(list_transform(list_zip(q.qv, ecn.xhatv),
                       x -> x[1] * x[2])) / (q.qn * ecn.xnrm) AS adc_cosine,
                     list_sum(list_transform(list_zip(q.qv, ecn.vecd),
                       x -> x[1] * x[2])) / (q.qn * ecn.nrm) AS true_cosine
                   FROM ecn JOIN q ON ecn.vec_id <> q.q_id),
        adc3 AS (SELECT q_id, rank, vec_id AS neighbor_id, adc_cosine, true_cosine
                 FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                         ORDER BY adc_cosine DESC, vec_id ASC) AS rank
                       FROM scored)
                 WHERE rank <= 3),
        ex3 AS (SELECT q_id, vec_id AS neighbor_id
                FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                        ORDER BY true_cosine DESC, vec_id ASC) AS rank
                      FROM scored)
                WHERE rank <= 3),
        rec AS (SELECT adc3.q_id, count(*) AS hits
                FROM adc3 JOIN ex3 ON adc3.q_id = ex3.q_id
                                  AND adc3.neighbor_id = ex3.neighbor_id
                GROUP BY adc3.q_id)
      SELECT adc3.q_id, rank, neighbor_id,
             ${oround("adc_cosine", 4)} AS adc_cosine,
             ${oround("true_cosine", 4)} AS true_cosine,
             ${oround("coalesce(hits, 0) / 3.0", 4)} AS recall_at3
      FROM adc3 LEFT JOIN rec ON adc3.q_id = rec.q_id
      ORDER BY adc3.q_id, rank"""))

  // -- Johnson–Lindenstrauss random-sign projection 64→8 dims with a
  //    per-pair distortion audit: the dimensionality-reduction primitive
  //    for cheap first-pass ANN at 100 TB (project once, search in 8
  //    floats, re-rank survivors in the original space). The sign matrix
  //    is the shared LCG evaluated at (i·K+j) — a pure expression both
  //    engines replay bit-identically, no materialized matrix, no
  //    broadcast. Audit output: original vs projected cosine for the
  //    first 20 disjoint vector pairs. All per-vector work is one
  //    embarrassingly parallel projection scan.
  private val JlK = 8
  private val JlD = 64
  private val jlProjection = QueryDef(
    "q_jl_projection",
    (s, dir) => {
      val sign = (k: String) =>
        s"(CASE WHEN (((($k) * 69069 + 12345) % 4294967296) * 1664525" +
          s" + 1013904223) % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
      val e = Tables.embeddings(s, dir)
        .filter(col("vec_id") < 40)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("proj", expr(
          s"""transform(sequence(0, ${JlK - 1}), j ->
                aggregate(sequence(0, ${JlD - 1}), CAST(0.0 AS DOUBLE),
                  (acc, i) -> acc + ${sign(s"i * $JlK + j")}
                    * CAST(element_at(embedding, i + 1) AS DOUBLE)))"""))
        .withColumn("nrm", graft.functions.VectorFunctions.vecNorm(col("vecd")))
        .withColumn("pnrm", graft.functions.VectorFunctions.vecNorm(col("proj")))
        .select(col("vec_id"), col("vecd"), col("proj"), col("nrm"), col("pnrm"))
      val a = e.filter(col("vec_id") % 2 === 0)
        .select((col("vec_id") / 2).cast("long").as("pair_id"),
          col("vecd").as("va"), col("proj").as("pa"),
          col("nrm").as("na"), col("pnrm").as("pna"))
      val b = e.filter(col("vec_id") % 2 === 1)
        .select(((col("vec_id") - 1) / 2).cast("long").as("pair_id"),
          col("vecd").as("vb"), col("proj").as("pb"),
          col("nrm").as("nb"), col("pnrm").as("pnb"))
      a.join(b, "pair_id")
        .withColumn("cos_orig", graft.functions.VectorFunctions.cosine(
          col("va"), col("vb"), col("na"), col("nb")))
        .withColumn("cos_proj", graft.functions.VectorFunctions.cosine(
          col("pa"), col("pb"), col("pna"), col("pnb")))
        .select(col("pair_id"),
          dround(col("cos_orig"), 4).as("cos_orig"),
          dround(col("cos_proj"), 4).as("cos_proj"),
          dround(abs(col("cos_orig") - col("cos_proj")), 4).as("abs_err"))
        .orderBy("pair_id")
    },
    Some {
      val sign = (k: String) =>
        s"(CASE WHEN (((($k) * 69069 + 12345) % 4294967296) * 1664525" +
          s" + 1013904223) % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
      s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   list_transform(generate_series(0, ${JlK - 1}), j ->
                     list_sum(list_transform(generate_series(0, ${JlD - 1}),
                       i -> ${sign(s"i * $JlK + j")}
                         * CAST(embedding[i + 1] AS DOUBLE)))) AS proj
                 FROM embeddings WHERE vec_id < 40),
        n AS (SELECT vec_id, vecd, proj,
                sqrt(list_sum(list_transform(vecd, x -> x * x))) AS nrm,
                sqrt(list_sum(list_transform(proj, x -> x * x))) AS pnrm
              FROM e),
        a AS (SELECT vec_id // 2 AS pair_id, vecd AS va, proj AS pa,
                     nrm AS na, pnrm AS pna
              FROM n WHERE vec_id % 2 = 0),
        b AS (SELECT (vec_id - 1) // 2 AS pair_id, vecd AS vb, proj AS pb,
                     nrm AS nb, pnrm AS pnb
              FROM n WHERE vec_id % 2 = 1),
        j AS (SELECT a.pair_id,
                list_sum(list_transform(list_zip(va, vb), x -> x[1] * x[2]))
                  / (na * nb) AS cos_orig,
                list_sum(list_transform(list_zip(pa, pb), x -> x[1] * x[2]))
                  / (pna * pnb) AS cos_proj
              FROM a JOIN b ON a.pair_id = b.pair_id)
      SELECT pair_id, ${oround("cos_orig", 4)} AS cos_orig,
             ${oround("cos_proj", 4)} AS cos_proj,
             ${oround("abs(cos_orig - cos_proj)", 4)} AS abs_err
      FROM j ORDER BY pair_id"""
    })

  // -- kNN label classification over the LSH-bucketed candidate set:
  //    every vector is classified by the majority label of its k=5
  //    nearest same-bucket neighbors (cosine), reported as per-label
  //    accuracy — the standard embedding-quality probe ("do labels
  //    cluster?") and the eval twin of q_ann_lsh_bucketed. The candidate
  //    join is bucket-equi (the scale path: candidates per point are
  //    bucket-bounded, never corpus-bounded); votes break ties by
  //    (count desc, label asc) so the argmax is deterministic in both
  //    engines.
  //
  //    The code width is DATA-DERIVED (round 9): the all-points kNN-join
  //    is quadratic WITHIN buckets, so any fixed bit count is a scale
  //    cliff — 6 bits measured 2.6 s at sf1 but 274 s at sf10 (the 10×
  //    corpus made every bucket 10× denser = 100× the candidate mass).
  //    nbits is the smallest b ≥ 6 with n ≤ 300·2^b (cap 20; the 64-dim
  //    vectors have 64 sign bits available, and past ~300M vectors the
  //    next lever is true random hyperplanes, q_ann_lsh_bucketed style),
  //    so per-bucket occupancy — and with it cost-per-vector — stays
  //    ~constant at every corpus size. The count enters the plan as a
  //    1-row broadcast crossJoin (never a driver-side .count()), and the
  //    ladder is exact integer compares both engines replay
  //    bit-identically. At sf0.01/sf0.1 the ladder yields 6 — identical
  //    buckets (and hashes) to the fixed-width rounds.
  private val KnnTargetOcc = 300L
  private val KnnMaxBits = 20
  private[queries] def knnBitsSpark(n: org.apache.spark.sql.Column) =
    (6 until KnnMaxBits).foldRight(lit(KnnMaxBits): org.apache.spark.sql.Column) {
      (b, rest) => when(n <= lit(KnnTargetOcc << b), lit(b)).otherwise(rest)
    }
  private[queries] def knnBucketSpark(nb: org.apache.spark.sql.Column) =
    (0 until KnnMaxBits).map(i =>
      when(lit(i) < nb && element_at(col("embedding"), i + 1) > 0f,
        lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
  private[queries] val knnBitsSql =
    (6 until KnnMaxBits).map(b => s"WHEN nvecs <= ${KnnTargetOcc << b} THEN $b")
      .mkString("CASE ", " ", s" ELSE $KnnMaxBits END")
  private[queries] val knnBucketSql =
    (0 until KnnMaxBits).map(i =>
      s"(CASE WHEN $i < nb AND embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")

  private val knnClassify = QueryDef(
    "q_knn_classify",
    (s, dir) => {
      val nv = Tables.embeddings(s, dir).agg(count(lit(1)).as("nvecs"))
      val e = Tables.embeddings(s, dir)
        .crossJoin(broadcast(nv))
        .withColumn("nb", knnBitsSpark(col("nvecs")))
        .withColumn("bucket", knnBucketSpark(col("nb")))
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", graft.functions.VectorFunctions.vecNorm(col("vecd")))
        .select(col("vec_id"), col("label"), col("bucket"), col("vecd"),
          col("nrm"))
      Cached.withPinned(e) { case Seq(e) => // r15: pin + plan-truncate
        val cand = e.select(col("vec_id").as("t_id"),
            col("label").as("t_label"), col("bucket"),
            col("vecd").as("tv"), col("nrm").as("tn"))
          .join(e.select(col("vec_id").as("n_id"), col("label").as("n_label"),
            col("bucket"), col("vecd").as("nv"), col("nrm").as("nn")),
            Seq("bucket"))
          .filter(col("t_id") =!= col("n_id"))
          .withColumn("cosine", graft.functions.VectorFunctions.cosine(
            col("tv"), col("nv"), col("tn"), col("nn")))
        val wK = org.apache.spark.sql.expressions.Window
          .partitionBy("t_id").orderBy(col("cosine").desc, col("n_id").asc)
        val top = cand.withColumn("rk", row_number().over(wK))
          .filter(col("rk") <= 5)
        val votes = top.groupBy("t_id", "t_label", "n_label")
          .agg(count(lit(1)).as("votes"))
        val wV = org.apache.spark.sql.expressions.Window
          .partitionBy("t_id").orderBy(col("votes").desc, col("n_label").asc)
        votes.withColumn("rv", row_number().over(wV)).filter(col("rv") === 1)
          .groupBy(col("t_label").as("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("n_label") === col("t_label"), 1L).otherwise(0L))
              .as("correct"))
          .withColumn("accuracy",
            dround(col("correct").cast("double") / col("n_vecs"), 4))
          .orderBy("label")
      }
    },
    Some(s"""
      WITH nv AS (SELECT count(*) AS nvecs FROM embeddings),
        nb AS (SELECT $knnBitsSql AS nb FROM nv),
        e AS (SELECT vec_id, label, $knnBucketSql AS bucket,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings, nb),
        cand AS (SELECT t.vec_id AS t_id, t.label AS t_label,
                   n.vec_id AS n_id, n.label AS n_label,
                   list_sum(list_transform(list_zip(t.vecd, n.vecd),
                     x -> x[1] * x[2])) / (t.nrm * n.nrm) AS cosine
                 FROM e t JOIN e n ON t.bucket = n.bucket
                                  AND t.vec_id <> n.vec_id),
        top AS (SELECT * FROM (SELECT *, row_number() OVER
                  (PARTITION BY t_id ORDER BY cosine DESC, n_id ASC) AS rk
                FROM cand) WHERE rk <= 5),
        votes AS (SELECT t_id, t_label, n_label,
                    CAST(count(*) AS BIGINT) AS votes
                  FROM top GROUP BY 1, 2, 3),
        pick AS (SELECT * FROM (SELECT *, row_number() OVER
                   (PARTITION BY t_id ORDER BY votes DESC, n_label ASC) AS rv
                 FROM votes) WHERE rv = 1)
      SELECT t_label AS label, CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(CASE WHEN n_label = t_label THEN 1 ELSE 0 END)
               AS BIGINT) AS correct,
             ${oround(
               "CAST(sum(CASE WHEN n_label = t_label THEN 1 ELSE 0 END) AS DOUBLE) / count(*)",
               4)} AS accuracy
      FROM pick GROUP BY t_label ORDER BY label"""))

  // -- Product quantization + asymmetric-distance search (Jégou et al.
  //    2011): the 64-dim space splits into M=8 subspaces of 8 dims, each
  //    with a K=16-entry codebook (subvectors of 16 deterministically
  //    sampled corpus vectors — ids 0,7,…,105 — the "sampled codebook"
  //    initializer; production would Lloyd-refine per subspace exactly as
  //    q_kmeans_refine does). Every vector encodes to 8 nibbles (4 bytes
  //    vs 256 — a 64× compression); search reconstructs from the
  //    codebook and ranks by ADC cosine, reporting true cosine and
  //    recall@3 against the exact ranking, like the SQ8 sibling.
  //    Encoding is one embarrassingly parallel expression scan against a
  //    1-row broadcast codebook; argmin ties resolve to the smallest code
  //    via array_position-of-min, identical in both engines.
  private val pqAdc = QueryDef(
    "q_pq_adc",
    (s, dir) => {
      import graft.functions.VectorFunctions.{cosine, vecNorm}
      // r15: withCached → withPinned — these ANN DAGs re-reference the
      // normalized embedding frame many times (audit plans: 120-378
      // Exchange nodes of duplicated lineage); the pin truncates every
      // consumer plan to a leaf (same mechanism as q_curation_e2e,
      // results byte-identical). The lambda shadows the raw name so the
      // body is unchanged.
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", vecNorm(col("vecd")))
        .select(col("vec_id"), col("vecd"), col("nrm"))
      Cached.withPinned(e) { case Seq(e) =>
        val cb = e.filter(col("vec_id") % 7 === 0 && col("vec_id") < 112)
          .select((col("vec_id") / 7).cast("int").as("c"), col("vecd"))
          .groupBy()
          .agg(expr(
            "transform(array_sort(collect_list(struct(c, vecd))), s -> s.vecd)")
            .as("cbv"))
        // Native encode (the §2.11 tier-(b) path): the HOF formulation is
        // interpreted — ~2k boxed lambda calls per vector — and even the
        // lambda-bound rewrite ran ~5 s at sf0.1; pq_encode codegens to
        // three tight loops with identical argmin/tie semantics
        // (PqEncodeSpec proves codes equal the HOF expression).
        val enc0 = e.crossJoin(broadcast(cb))
          .withColumn("codes", graft.functions.VectorFunctions.pqEncode(
            col("vecd"), col("cbv"), lit(8)))
          .withColumn("xhatv", expr(
            """flatten(transform(sequence(0, 7), m ->
                 slice(element_at(cbv,
                     element_at(codes, CAST(m + 1 AS INT)) + 1),
                   m * 8 + 1, 8)))"""))
          .withColumn("xnrm", vecNorm(col("xhatv")))
          .select(col("vec_id"), col("vecd"), col("nrm"), col("xhatv"),
            col("xnrm"))
        // four consumers (two rankings + recall join + output): materialize
        // the encode ONCE
        Cached.withPinned(enc0) { case Seq(enc0) => // r15: pin + truncate
        val enc = enc0
        val q = e.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("q_id"), col("vecd").as("qv"),
            col("nrm").as("qn"))
        val scored = enc.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .withColumn("adc_cosine",
            cosine(col("qv"), col("xhatv"), col("qn"), col("xnrm")))
          .withColumn("true_cosine",
            cosine(col("qv"), col("vecd"), col("qn"), col("nrm")))
          .select("q_id", "vec_id", "adc_cosine", "true_cosine")
        val wAdc = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("adc_cosine").desc, col("vec_id").asc)
        val wTrue = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("true_cosine").desc, col("vec_id").asc)
        val adc3 = scored.withColumn("rank", row_number().over(wAdc))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
            col("adc_cosine"), col("true_cosine"))
        val ex3 = scored.withColumn("rank", row_number().over(wTrue))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("vec_id").as("neighbor_id"))
        val rec = adc3.select("q_id", "neighbor_id")
          .join(ex3, Seq("q_id", "neighbor_id"))
          .groupBy("q_id").agg(count(lit(1)).as("hits"))
        adc3.join(broadcast(rec), Seq("q_id"), "left")
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            dround(col("adc_cosine"), 4).as("adc_cosine"),
            dround(col("true_cosine"), 4).as("true_cosine"),
            dround(coalesce(col("hits"), lit(0L)).cast("double") / 3.0, 4)
              .as("recall3"))
          .orderBy("q_id", "rank")
        }
      }
    },
    Some(s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        cb AS (SELECT list_transform(
                 list_sort(list(struct_pack(c := CAST(vec_id // 7 AS INT),
                                            v := vecd))),
                 s -> s.v) AS cbv
               FROM e WHERE vec_id % 7 = 0 AND vec_id < 112),
        enc AS (SELECT vec_id, vecd, nrm,
                  list_transform(generate_series(0, 7), m ->
                    list_position(
                      list_transform(generate_series(0, 15), c ->
                        list_sum(list_transform(generate_series(8*m, 8*m + 7),
                          j -> (vecd[j + 1] - cbv[c + 1][j + 1])
                             * (vecd[j + 1] - cbv[c + 1][j + 1])))),
                      list_min(
                        list_transform(generate_series(0, 15), c ->
                          list_sum(list_transform(generate_series(8*m, 8*m + 7),
                            j -> (vecd[j + 1] - cbv[c + 1][j + 1])
                               * (vecd[j + 1] - cbv[c + 1][j + 1]))))))
                    - 1) AS codes,
                  cbv
                FROM e, cb),
        rec2 AS (SELECT vec_id, vecd, nrm,
                   list_transform(generate_series(0, 63), i ->
                     cbv[codes[(i // 8) + 1] + 1][i + 1]) AS xhatv
                 FROM enc),
        n2 AS (SELECT vec_id, vecd, nrm, xhatv,
                 sqrt(list_sum(list_transform(xhatv, x -> x * x))) AS xnrm
               FROM rec2),
        q AS (SELECT vec_id AS q_id, vecd AS qv, nrm AS qn FROM e
              WHERE vec_id < $NQueries),
        scored AS (SELECT q.q_id, n2.vec_id,
                     list_sum(list_transform(list_zip(q.qv, n2.xhatv),
                       x -> x[1] * x[2])) / (q.qn * n2.xnrm) AS adc_cosine,
                     list_sum(list_transform(list_zip(q.qv, n2.vecd),
                       x -> x[1] * x[2])) / (q.qn * n2.nrm) AS true_cosine
                   FROM n2 JOIN q ON n2.vec_id <> q.q_id),
        adc3 AS (SELECT * FROM (SELECT *, row_number() OVER
                   (PARTITION BY q_id
                    ORDER BY adc_cosine DESC, vec_id ASC) AS rank
                 FROM scored) WHERE rank <= 3),
        ex3 AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
                  (PARTITION BY q_id
                   ORDER BY true_cosine DESC, vec_id ASC) AS rank
                FROM scored) WHERE rank <= 3),
        rec AS (SELECT adc3.q_id, CAST(count(*) AS BIGINT) AS hits
                FROM adc3 JOIN ex3 ON adc3.q_id = ex3.q_id
                                  AND adc3.vec_id = ex3.vec_id
                GROUP BY 1)
      SELECT adc3.q_id, adc3.rank, adc3.vec_id AS neighbor_id,
             ${oround("adc_cosine", 4)} AS adc_cosine,
             ${oround("true_cosine", 4)} AS true_cosine,
             ${oround("CAST(coalesce(rec.hits, 0) AS DOUBLE) / 3.0", 4)}
               AS recall3
      FROM adc3 LEFT JOIN rec ON adc3.q_id = rec.q_id
      ORDER BY adc3.q_id, adc3.rank"""))

  // -- IVF + PQ composed into the production ANN shape (FAISS IVFPQ,
  //    Jégou et al. 2011 §IV): the coarse quantizer (the q_ann_ivf cells)
  //    bounds CANDIDATE GENERATION — each query probes its nprobe=2
  //    nearest cells, so candidate mass is cell-bounded, never
  //    corpus-bounded — and ranking inside the probed cells runs on PQ
  //    codes of the RESIDUAL (x − cell centroid), the detail FAISS adds
  //    over plain PQ: residuals are centered, so a shared codebook covers
  //    them far better than raw vectors. Reconstruction is
  //    x̂ = centroid + decode(codes); ranking is ADC cosine against x̂,
  //    with true cosine and recall@3 vs the exact full-corpus ranking
  //    reported in-result (the labelled-baseline discipline of the PQ/SQ8
  //    siblings).
  //
  //    Scale: assignment is a corpus × NCells broadcast cross join (the
  //    certified q_ann_ivf shape); encode is one embarrassingly parallel
  //    pass against a 1-row broadcast codebook (native codegen'd
  //    pq_encode); search joins the tiny probes table (n_queries ×
  //    nprobe rows, broadcast) on the cell key — at 100 TB the encoded
  //    corpus is written partitioned by cell, so the probe join is
  //    partition-pruned and touches only nprobe cells per query. The
  //    exact ranking exists ONLY as the labelled recall baseline.
  private val IvfPqNProbe = 2

  private val ivfPq = QueryDef(
    "q_ann_ivfpq",
    (s, dir) => {
      import graft.functions.VectorFunctions.{cosine, vecNorm}
      // r15: withCached → withPinned — these ANN DAGs re-reference the
      // normalized embedding frame many times (audit plans: 120-378
      // Exchange nodes of duplicated lineage); the pin truncates every
      // consumer plan to a leaf (same mechanism as q_curation_e2e,
      // results byte-identical). The lambda shadows the raw name so the
      // body is unchanged.
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", vecNorm(col("vecd")))
        .select(col("vec_id"), col("vecd"), col("nrm"))
      Cached.withPinned(e) { case Seq(e) =>
        val cents = e.filter(col("vec_id") < NCells)
          .select(col("vec_id").as("cent_id"), col("vecd").as("cv"),
            col("nrm").as("cn"))
        // coarse assignment: nearest centroid by cosine (ties → lowest id)
        val wAssign = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("sim").desc, col("cent_id").asc)
        val cells = e.crossJoin(broadcast(cents))
          .withColumn("sim", cosine(col("vecd"), col("cv"), col("nrm"), col("cn")))
          .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
          .select(col("vec_id"), col("cent_id").as("cell"), col("vecd"),
            col("nrm"), col("cv"))
          .withColumn("resid", expr("zip_with(vecd, cv, (x, c) -> x - c)"))
        Cached.withPinned(cells) { case Seq(cells) => // r15: pin + truncate
          // residual codebook: sampled ids 0,7,…,105 (the q_pq_adc
          // initializer), but of RESIDUALS — ordered by sample index
          val cb = cells.filter(col("vec_id") % 7 === 0 && col("vec_id") < 112)
            .select((col("vec_id") / 7).cast("int").as("c"), col("resid"))
            .groupBy()
            .agg(expr(
              "transform(array_sort(collect_list(struct(c, resid))), s -> s.resid)")
              .as("cbv"))
          val enc = cells.crossJoin(broadcast(cb))
            .withColumn("codes", graft.functions.VectorFunctions.pqEncode(
              col("resid"), col("cbv"), lit(8)))
            .withColumn("rhat", expr(
              """flatten(transform(sequence(0, 7), m ->
                   slice(element_at(cbv,
                       element_at(codes, CAST(m + 1 AS INT)) + 1),
                     m * 8 + 1, 8)))"""))
            .withColumn("xhatv", expr("zip_with(cv, rhat, (c, r) -> c + r)"))
            .withColumn("xnrm", vecNorm(col("xhatv")))
            .select(col("vec_id"), col("cell"), col("xhatv"), col("xnrm"))
          // queries are NOT the centroids (ids NCells..NCells+NQueries),
          // so probe selection is non-degenerate
          val q = e.filter(col("vec_id") >= NCells &&
              col("vec_id") < NCells + NQueries)
            .select(col("vec_id").as("q_id"), col("vecd").as("qv"),
              col("nrm").as("qn"))
          val wProbe = org.apache.spark.sql.expressions.Window
            .partitionBy("q_id").orderBy(col("csim").desc, col("cent_id").asc)
          val probes = q.crossJoin(broadcast(cents))
            .withColumn("csim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
            .withColumn("pr", row_number().over(wProbe))
            .filter(col("pr") <= IvfPqNProbe)
            .select(col("q_id"), col("qv"), col("qn"), col("cent_id").as("cell"))
          val scored = enc.join(broadcast(probes), Seq("cell"))
            .filter(col("vec_id") =!= col("q_id"))
            .withColumn("adc_cosine",
              cosine(col("qv"), col("xhatv"), col("qn"), col("xnrm")))
          val wAdc = org.apache.spark.sql.expressions.Window
            .partitionBy("q_id").orderBy(col("adc_cosine").desc, col("vec_id").asc)
          val adc3 = scored.withColumn("rank", row_number().over(wAdc))
            .filter(col("rank") <= 3)
            .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
              col("cell"), col("adc_cosine"))
          // exact full-corpus ranking — the labelled recall baseline
          val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
            .withColumn("true_cosine",
              cosine(col("qv"), col("vecd"), col("qn"), col("nrm")))
            .select(col("q_id"), col("vec_id").as("neighbor_id"),
              col("true_cosine"))
          val wTrue = org.apache.spark.sql.expressions.Window
            .partitionBy("q_id").orderBy(col("true_cosine").desc,
              col("neighbor_id").asc)
          val ex3 = exact.withColumn("rk", row_number().over(wTrue))
            .filter(col("rk") <= 3).select("q_id", "neighbor_id")
          val rec = adc3.select("q_id", "neighbor_id")
            .join(ex3, Seq("q_id", "neighbor_id"))
            .groupBy("q_id").agg(count(lit(1)).as("hits"))
          adc3.join(exact, Seq("q_id", "neighbor_id"))
            .join(broadcast(rec), Seq("q_id"), "left")
            .select(col("q_id"), col("rank"), col("neighbor_id"), col("cell"),
              dround(col("adc_cosine"), 4).as("adc_cosine"),
              dround(col("true_cosine"), 4).as("true_cosine"),
              dround(coalesce(col("hits"), lit(0L)).cast("double") / 3.0, 4)
                .as("recall3"))
            .orderBy("q_id", "rank")
        }
      }
    },
    Some(s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        cents AS (SELECT vec_id AS cent_id, vecd AS cv, nrm AS cn FROM e
                  WHERE vec_id < $NCells),
        assigned AS (SELECT e.vec_id, cents.cent_id, cents.cv,
                       list_sum(list_transform(list_zip(e.vecd, cents.cv),
                         x -> x[1] * x[2])) / (e.nrm * cents.cn) AS sim
                     FROM e CROSS JOIN cents),
        cells AS (SELECT vec_id, cent_id AS cell, cv
                  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY sim DESC, cent_id ASC) AS rn
                        FROM assigned)
                  WHERE rn = 1),
        ec AS MATERIALIZED (
              SELECT e.vec_id, cells.cell, e.vecd, e.nrm, cells.cv,
                     list_transform(list_zip(e.vecd, cells.cv),
                       x -> x[1] - x[2]) AS resid
               FROM e JOIN cells ON e.vec_id = cells.vec_id),
        cb AS (SELECT list_transform(
                 list_sort(list(struct_pack(c := CAST(vec_id // 7 AS INT),
                                            v := resid))),
                 s -> s.v) AS cbv
               FROM ec WHERE vec_id % 7 = 0 AND vec_id < 112),
        enc AS (SELECT vec_id, cell, cv,
                  list_transform(generate_series(0, 7), m ->
                    list_position(
                      list_transform(generate_series(0, 15), c ->
                        list_sum(list_transform(generate_series(8*m, 8*m + 7),
                          j -> (resid[j + 1] - cbv[c + 1][j + 1])
                             * (resid[j + 1] - cbv[c + 1][j + 1])))),
                      list_min(
                        list_transform(generate_series(0, 15), c ->
                          list_sum(list_transform(generate_series(8*m, 8*m + 7),
                            j -> (resid[j + 1] - cbv[c + 1][j + 1])
                               * (resid[j + 1] - cbv[c + 1][j + 1]))))))
                    - 1) AS codes,
                  cbv
                FROM ec, cb),
        rec2 AS (SELECT vec_id, cell,
                   list_transform(generate_series(0, 63), i ->
                     cv[i + 1] + cbv[codes[(i // 8) + 1] + 1][i + 1]) AS xhatv
                 FROM enc),
        n2 AS (SELECT vec_id, cell, xhatv,
                 sqrt(list_sum(list_transform(xhatv, x -> x * x))) AS xnrm
               FROM rec2),
        q AS (SELECT vec_id AS q_id, vecd AS qv, nrm AS qn FROM e
              WHERE vec_id >= $NCells AND vec_id < ${NCells + NQueries}),
        probes AS (SELECT q_id, qv, qn, cell FROM (
                     SELECT q.q_id, q.qv, q.qn, cents.cent_id AS cell,
                            row_number() OVER (PARTITION BY q.q_id ORDER BY
                              list_sum(list_transform(list_zip(q.qv, cents.cv),
                                x -> x[1] * x[2])) / (q.qn * cents.cn) DESC,
                              cents.cent_id ASC) AS pr
                     FROM q CROSS JOIN cents)
                   WHERE pr <= $IvfPqNProbe),
        scored AS (SELECT p.q_id, n2.vec_id, n2.cell,
                     list_sum(list_transform(list_zip(p.qv, n2.xhatv),
                       x -> x[1] * x[2])) / (p.qn * n2.xnrm) AS adc_cosine
                   FROM n2 JOIN probes p ON n2.cell = p.cell
                                        AND n2.vec_id <> p.q_id),
        adc3 AS (SELECT * FROM (SELECT *, row_number() OVER
                   (PARTITION BY q_id
                    ORDER BY adc_cosine DESC, vec_id ASC) AS rank
                 FROM scored) WHERE rank <= 3),
        exact AS MATERIALIZED (
                 SELECT q.q_id, e.vec_id,
                        list_sum(list_transform(list_zip(q.qv, e.vecd),
                          x -> x[1] * x[2])) / (q.qn * e.nrm) AS true_cosine
                 FROM e JOIN q ON e.vec_id <> q.q_id),
        ex3 AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
                  (PARTITION BY q_id
                   ORDER BY true_cosine DESC, vec_id ASC) AS rk
                FROM exact) WHERE rk <= 3),
        rc AS (SELECT adc3.q_id, CAST(count(*) AS BIGINT) AS hits
               FROM adc3 JOIN ex3 ON adc3.q_id = ex3.q_id
                                 AND adc3.vec_id = ex3.vec_id
               GROUP BY 1)
      SELECT adc3.q_id, adc3.rank, adc3.vec_id AS neighbor_id, adc3.cell,
             ${oround("adc_cosine", 4)} AS adc_cosine,
             ${oround("true_cosine", 4)} AS true_cosine,
             ${oround("CAST(coalesce(rc.hits, 0) AS DOUBLE) / 3.0", 4)}
               AS recall3
      FROM adc3 JOIN exact ON adc3.q_id = exact.q_id
                          AND adc3.vec_id = exact.vec_id
           LEFT JOIN rc ON adc3.q_id = rc.q_id
      ORDER BY adc3.q_id, adc3.rank"""))

  // -- IVFPQ with a TRAINED coarse quantizer (round-13 verdict #6): the
  //    q_ann_ivfpq cells are seeded from the first-NCells vectors; a real
  //    FAISS index trains them (k-means on the corpus) before encoding.
  //    One Lloyd iteration (the q_kmeans_refine machinery: assign to the
  //    seeds, recompute each cell's centroid as the element-wise mean)
  //    produces the trained centroids; the full IVFPQ pipeline — assign,
  //    residual PQ encode, nprobe cell-bounded search, ADC rerank — then
  //    runs against them. Both coarse quantizers' CANDIDATE recall@3
  //    (fraction of the exact top-3 that lives in the probed cells — the
  //    quantity training improves) is reported per query next to the
  //    trained ADC recall, so trained-vs-seeded is itself certified
  //    output.
  //
  //    Scale: identical shape to q_ann_ivfpq plus one Lloyd round — the
  //    extra cost is one more corpus × NCells broadcast assign and a
  //    per-(cell, dim) mean (NCells × VDim grid, never corpus-sized
  //    state). The exact ranking remains ONLY the labelled baseline.
  private val ivfPqTrained = QueryDef(
    "q_ann_ivfpq_trained",
    (s, dir) => {
      import graft.functions.VectorFunctions.{cosine, vecNorm}
      // r15: withCached → withPinned — these ANN DAGs re-reference the
      // normalized embedding frame many times (audit plans: 120-378
      // Exchange nodes of duplicated lineage); the pin truncates every
      // consumer plan to a leaf (same mechanism as q_curation_e2e,
      // results byte-identical). The lambda shadows the raw name so the
      // body is unchanged.
      val e = Tables.embeddings(s, dir)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("nrm", vecNorm(col("vecd")))
        .select(col("vec_id"), col("vecd"), col("nrm"))
      Cached.withPinned(e) { case Seq(e) =>
        // nearest-centroid assignment keeping the winning centroid vector
        // (the residual needs it)
        def nearest(cents: org.apache.spark.sql.DataFrame) = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("vec_id").orderBy(col("sim").desc, col("cent_id").asc)
          e.crossJoin(broadcast(cents))
            .withColumn("sim", cosine(col("vecd"), col("cv"), col("nrm"), col("cn")))
            .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .select(col("vec_id"), col("cent_id").as("cell"), col("vecd"),
              col("nrm"), col("cv"))
        }
        val cents0 = e.filter(col("vec_id") < NCells)
          .select(col("vec_id").as("cent_id"), col("vecd").as("cv"),
            col("nrm").as("cn"))
        // the seeded assignment feeds BOTH the Lloyd mean and the seeded
        // candidate-recall baseline — computed once, pinned below
        val a0 = nearest(cents0).select(col("vec_id"), col("cell"), col("vecd"))
        // one Lloyd round: per-(cell, dim) mean, deterministic reassembly.
        // The mean lands on the 1e-9 integer grid BEFORE aggregation (r14
        // advisor): a plain avg over doubles is last-ulp nondeterministic
        // across partial-agg orders, and these floats gate DISCRETE
        // certified outputs (nearest-cell row_number, probe sets,
        // neighbor_id) — a near-tie could flip the hash between runs or
        // engines. Long sums are exact and order-free in both engines.
        val cents1 = a0
          .select(col("cell"), posexplode(col("vecd")).as(Seq("pos", "x")))
          .withColumn("xu", round(col("x") * lit(1e9)).cast("long"))
          .groupBy("cell", "pos")
          .agg((sum("xu").cast("double") / lit(1e9) / count(lit(1))).as("m"))
          .groupBy("cell")
          .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
            .as("cv"))
          .select(col("cell").as("cent_id"), col("cv"), vecNorm(col("cv")).as("cn"))
        val cells = nearest(cents1)
          .withColumn("resid", expr("zip_with(vecd, cv, (x, c) -> x - c)"))
        Cached.withPinned(a0, cells) { case Seq(a0, cells) => // r15: pin + truncate
          val cells0 = a0.select("vec_id", "cell")
          val cb = cells.filter(col("vec_id") % 7 === 0 && col("vec_id") < 112)
            .select((col("vec_id") / 7).cast("int").as("c"), col("resid"))
            .groupBy()
            .agg(expr(
              "transform(array_sort(collect_list(struct(c, resid))), s -> s.resid)")
              .as("cbv"))
          val enc = cells.crossJoin(broadcast(cb))
            .withColumn("codes", graft.functions.VectorFunctions.pqEncode(
              col("resid"), col("cbv"), lit(8)))
            .withColumn("rhat", expr(
              """flatten(transform(sequence(0, 7), m ->
                   slice(element_at(cbv,
                       element_at(codes, CAST(m + 1 AS INT)) + 1),
                     m * 8 + 1, 8)))"""))
            .withColumn("xhatv", expr("zip_with(cv, rhat, (c, r) -> c + r)"))
            .withColumn("xnrm", vecNorm(col("xhatv")))
            .select(col("vec_id"), col("cell"), col("xhatv"), col("xnrm"))
          val q = e.filter(col("vec_id") >= NCells &&
              col("vec_id") < NCells + NQueries)
            .select(col("vec_id").as("q_id"), col("vecd").as("qv"),
              col("nrm").as("qn"))
          def probesOf(cents: org.apache.spark.sql.DataFrame) = {
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("q_id").orderBy(col("csim").desc, col("cent_id").asc)
            q.crossJoin(broadcast(cents))
              .withColumn("csim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
              .withColumn("pr", row_number().over(w))
              .filter(col("pr") <= IvfPqNProbe)
              .select(col("q_id"), col("qv"), col("qn"), col("cent_id").as("cell"))
          }
          val probes = probesOf(cents1)
          val probes0 = probesOf(cents0)
          val scored = enc.join(broadcast(probes), Seq("cell"))
            .filter(col("vec_id") =!= col("q_id"))
            .withColumn("adc_cosine",
              cosine(col("qv"), col("xhatv"), col("qn"), col("xnrm")))
          val wAdc = org.apache.spark.sql.expressions.Window
            .partitionBy("q_id").orderBy(col("adc_cosine").desc, col("vec_id").asc)
          val adc3 = scored.withColumn("rank", row_number().over(wAdc))
            .filter(col("rank") <= 3)
            .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
              col("cell"), col("adc_cosine"))
          // exact full-corpus ranking — the labelled recall baseline
          val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
            .withColumn("true_cosine",
              cosine(col("qv"), col("vecd"), col("qn"), col("nrm")))
            .select(col("q_id"), col("vec_id").as("neighbor_id"),
              col("true_cosine"))
          val wTrue = org.apache.spark.sql.expressions.Window
            .partitionBy("q_id").orderBy(col("true_cosine").desc,
              col("neighbor_id").asc)
          val ex3 = exact.withColumn("rk", row_number().over(wTrue))
            .filter(col("rk") <= 3).select("q_id", "neighbor_id")
          val rec = adc3.select("q_id", "neighbor_id")
            .join(ex3, Seq("q_id", "neighbor_id"))
            .groupBy("q_id").agg(count(lit(1)).as("hits"))
          // candidate recall of each coarse quantizer: how many of the
          // exact top-3 live in the cells this quantizer probes
          def candRecall(assign: org.apache.spark.sql.DataFrame,
              pr: org.apache.spark.sql.DataFrame, name: String) =
            ex3.join(assign.select(col("vec_id").as("neighbor_id"), col("cell")),
                Seq("neighbor_id"))
              .join(pr.select("q_id", "cell"), Seq("q_id", "cell"))
              .groupBy("q_id").agg(count(lit(1)).as(name))
          val candT = candRecall(cells.select("vec_id", "cell"), probes, "hits_t")
          val candS = candRecall(cells0, probes0, "hits_s")
          adc3.join(exact, Seq("q_id", "neighbor_id"))
            .join(broadcast(rec), Seq("q_id"), "left")
            .join(broadcast(candT), Seq("q_id"), "left")
            .join(broadcast(candS), Seq("q_id"), "left")
            .select(col("q_id"), col("rank"), col("neighbor_id"), col("cell"),
              dround(col("adc_cosine"), 4).as("adc_cosine"),
              dround(col("true_cosine"), 4).as("true_cosine"),
              dround(coalesce(col("hits"), lit(0L)).cast("double") / 3.0, 4)
                .as("recall3"),
              dround(coalesce(col("hits_t"), lit(0L)).cast("double") / 3.0, 4)
                .as("cand_recall_trained"),
              dround(coalesce(col("hits_s"), lit(0L)).cast("double") / 3.0, 4)
                .as("cand_recall_seeded"))
            .orderBy("q_id", "rank")
        }
      }
    },
    Some(s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vecd,
                   sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings),
        c0 AS (SELECT vec_id AS cent_id, vecd AS cv, nrm AS cn FROM e
               WHERE vec_id < $NCells),
        a0 AS MATERIALIZED (SELECT vec_id, cent_id AS cell, vecd
               FROM (SELECT e.vec_id, c0.cent_id, e.vecd,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                         list_sum(list_transform(list_zip(e.vecd, c0.cv),
                           x -> x[1] * x[2])) / (e.nrm * c0.cn) DESC,
                         c0.cent_id ASC) AS rn
                     FROM e CROSS JOIN c0)
               WHERE rn = 1),
        dims AS (SELECT cell, i.i AS pos,
                   CAST(sum(CAST(round(vecd[i.i + 1] * 1e9) AS BIGINT))
                     AS DOUBLE) / 1e9 / count(*) AS m
                 FROM a0, (SELECT unnest(generate_series(0, 63)) AS i) i
                 GROUP BY cell, i.i),
        c1 AS (SELECT cell AS cent_id, list(m ORDER BY pos) AS cv,
                 sqrt(list_sum(list_transform(list(m ORDER BY pos), x -> x * x))) AS cn
               FROM dims GROUP BY cell),
        ec AS MATERIALIZED (
              SELECT vec_id, cell, vecd, nrm, cv,
                     list_transform(list_zip(vecd, cv), x -> x[1] - x[2]) AS resid
              FROM (SELECT e.vec_id, c1.cent_id AS cell, e.vecd, e.nrm, c1.cv,
                      row_number() OVER (PARTITION BY e.vec_id ORDER BY
                        list_sum(list_transform(list_zip(e.vecd, c1.cv),
                          x -> x[1] * x[2])) / (e.nrm * c1.cn) DESC,
                        c1.cent_id ASC) AS rn
                    FROM e CROSS JOIN c1)
              WHERE rn = 1),
        cb AS (SELECT list_transform(
                 list_sort(list(struct_pack(c := CAST(vec_id // 7 AS INT),
                                            v := resid))),
                 s -> s.v) AS cbv
               FROM ec WHERE vec_id % 7 = 0 AND vec_id < 112),
        enc AS (SELECT vec_id, cell, cv,
                  list_transform(generate_series(0, 7), m ->
                    list_position(
                      list_transform(generate_series(0, 15), c ->
                        list_sum(list_transform(generate_series(8*m, 8*m + 7),
                          j -> (resid[j + 1] - cbv[c + 1][j + 1])
                             * (resid[j + 1] - cbv[c + 1][j + 1])))),
                      list_min(
                        list_transform(generate_series(0, 15), c ->
                          list_sum(list_transform(generate_series(8*m, 8*m + 7),
                            j -> (resid[j + 1] - cbv[c + 1][j + 1])
                               * (resid[j + 1] - cbv[c + 1][j + 1]))))))
                    - 1) AS codes,
                  cbv
                FROM ec, cb),
        rec2 AS (SELECT vec_id, cell,
                   list_transform(generate_series(0, 63), i ->
                     cv[i + 1] + cbv[codes[(i // 8) + 1] + 1][i + 1]) AS xhatv
                 FROM enc),
        n2 AS (SELECT vec_id, cell, xhatv,
                 sqrt(list_sum(list_transform(xhatv, x -> x * x))) AS xnrm
               FROM rec2),
        q AS (SELECT vec_id AS q_id, vecd AS qv, nrm AS qn FROM e
              WHERE vec_id >= $NCells AND vec_id < ${NCells + NQueries}),
        probes AS (SELECT q_id, qv, qn, cell FROM (
                     SELECT q.q_id, q.qv, q.qn, c1.cent_id AS cell,
                            row_number() OVER (PARTITION BY q.q_id ORDER BY
                              list_sum(list_transform(list_zip(q.qv, c1.cv),
                                x -> x[1] * x[2])) / (q.qn * c1.cn) DESC,
                              c1.cent_id ASC) AS pr
                     FROM q CROSS JOIN c1)
                   WHERE pr <= $IvfPqNProbe),
        probes0 AS (SELECT q_id, cell FROM (
                      SELECT q.q_id, c0.cent_id AS cell,
                             row_number() OVER (PARTITION BY q.q_id ORDER BY
                               list_sum(list_transform(list_zip(q.qv, c0.cv),
                                 x -> x[1] * x[2])) / (q.qn * c0.cn) DESC,
                               c0.cent_id ASC) AS pr
                      FROM q CROSS JOIN c0)
                    WHERE pr <= $IvfPqNProbe),
        scored AS (SELECT p.q_id, n2.vec_id, n2.cell,
                     list_sum(list_transform(list_zip(p.qv, n2.xhatv),
                       x -> x[1] * x[2])) / (p.qn * n2.xnrm) AS adc_cosine
                   FROM n2 JOIN probes p ON n2.cell = p.cell
                                        AND n2.vec_id <> p.q_id),
        adc3 AS (SELECT * FROM (SELECT *, row_number() OVER
                   (PARTITION BY q_id
                    ORDER BY adc_cosine DESC, vec_id ASC) AS rank
                 FROM scored) WHERE rank <= 3),
        exact AS MATERIALIZED (
                 SELECT q.q_id, e.vec_id,
                        list_sum(list_transform(list_zip(q.qv, e.vecd),
                          x -> x[1] * x[2])) / (q.qn * e.nrm) AS true_cosine
                 FROM e JOIN q ON e.vec_id <> q.q_id),
        ex3 AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
                  (PARTITION BY q_id
                   ORDER BY true_cosine DESC, vec_id ASC) AS rk
                FROM exact) WHERE rk <= 3),
        rc AS (SELECT adc3.q_id, CAST(count(*) AS BIGINT) AS hits
               FROM adc3 JOIN ex3 ON adc3.q_id = ex3.q_id
                                 AND adc3.vec_id = ex3.vec_id
               GROUP BY 1),
        candT AS (SELECT ex3.q_id, CAST(count(*) AS BIGINT) AS hits_t
                  FROM ex3 JOIN ec ON ex3.vec_id = ec.vec_id
                           JOIN probes p ON p.q_id = ex3.q_id
                                        AND p.cell = ec.cell
                  GROUP BY 1),
        candS AS (SELECT ex3.q_id, CAST(count(*) AS BIGINT) AS hits_s
                  FROM ex3 JOIN a0 ON ex3.vec_id = a0.vec_id
                           JOIN probes0 p ON p.q_id = ex3.q_id
                                         AND p.cell = a0.cell
                  GROUP BY 1)
      SELECT adc3.q_id, adc3.rank, adc3.vec_id AS neighbor_id, adc3.cell,
             ${oround("adc_cosine", 4)} AS adc_cosine,
             ${oround("true_cosine", 4)} AS true_cosine,
             ${oround("CAST(coalesce(rc.hits, 0) AS DOUBLE) / 3.0", 4)}
               AS recall3,
             ${oround("CAST(coalesce(candT.hits_t, 0) AS DOUBLE) / 3.0", 4)}
               AS cand_recall_trained,
             ${oround("CAST(coalesce(candS.hits_s, 0) AS DOUBLE) / 3.0", 4)}
               AS cand_recall_seeded
      FROM adc3 JOIN exact ON adc3.q_id = exact.q_id
                          AND adc3.vec_id = exact.vec_id
           LEFT JOIN rc ON adc3.q_id = rc.q_id
           LEFT JOIN candT ON adc3.q_id = candT.q_id
           LEFT JOIN candS ON adc3.q_id = candS.q_id
      ORDER BY adc3.q_id, adc3.rank"""))

  override def queries: Seq[QueryDef] =
    Seq(bruteForceTopK, lshTopK, ivfTopK, normStats, centroidDrift,
      kmeansRefine, lshMultiprobe, sq8Adc, jlProjection, knnClassify, pqAdc,
      ivfPq, ivfPqTrained)
}
