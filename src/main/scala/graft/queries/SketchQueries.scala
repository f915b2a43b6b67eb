package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Det.{dround, oround}

/** Distinct-count and set-operation SKETCHES for the training-data curation
  * family (builder brief: "a novel sketch" is a first-class operator class).
  *
  * Both operators are K-Minimum-Values (KMV / bottom-k theta) sketches
  * [Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07]: hash every key to a
  * 32-bit integer, keep the K smallest DISTINCT hash values; the K-th
  * smallest hash h_K estimates the distinct count as (K-1) * 2^32 / (h_K+1).
  * Union sketches merge by taking the K smallest of the combined hash sets;
  * intersection follows by inclusion–exclusion. This is the sketch family
  * behind `APPROX_COUNT_DISTINCT` in warehouse engines, re-expressed here so
  * the DuckDB oracle can replay it bit-for-bit:
  *
  *   - the hash is a polynomial rolling hash over the key's characters
  *     followed by two LCG scramble rounds — pure 64-bit integer arithmetic
  *     with every intermediate product < 2^53, identical in Spark and DuckDB
  *     (Spark's xxhash64 / DuckDB's hash() would never agree);
  *   - "K smallest distinct hashes per group" is a groupBy-distinct (map-side
  *     combined) followed by a rank-filtered window, which Spark executes as
  *     WindowGroupLimit — each partition pre-prunes to K rows before the
  *     shuffle, so the sketch costs O(K) per group of shuffle traffic no
  *     matter how many keys a 100 TB corpus holds. That per-group-constant
  *     shuffle is the entire point of sketching at scale.
  *
  * Keys are the documents ingest-gate dedup key (first 8 tokens — the same
  * key S12/q_exact_dedup profiles), so the sketch estimates are directly
  * comparable to the exact distinct counts reported alongside them.
  */
object SketchQueries extends QueryModule {

  /** Polynomial rolling hash (base 31, mod 2^32) over a string column named
    * `s` — the shared base for the KMV hash and the CMS row hashes. The
    * rolling fold keeps acc < 2^32 so acc*31+c < 2^37 — no Long overflow
    * under ANSI mode even for adversarial keys. */
  private def sparkBase(s: String): String =
    s"""(CASE WHEN length($s) > 0
              THEN aggregate(transform(sequence(1, length($s)),
                               i -> CAST(ascii(substr($s, i, 1)) AS BIGINT)),
                             CAST(0 AS BIGINT),
                             (acc, x) -> (acc * 31 + x) % 4294967296)
              ELSE CAST(0 AS BIGINT) END)"""

  /** DuckDB twin of [[sparkBase]] — list_reduce has no init value, so the
    * zero accumulator is prepended; generate_series(1,0) is empty for the
    * guard arm, matching the Spark CASE. */
  private def duckBase(s: String): String =
    s"""(CASE WHEN length($s) > 0
              THEN list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, length($s)),
                         i -> CAST(ord(substr($s, i, 1)) AS BIGINT))),
                     (acc, x) -> (acc * 31 + x) % 4294967296)
              ELSE CAST(0 AS BIGINT) END)"""

  /** Base hash + 2 LCG scramble rounds — the KMV key hash. Scramble
    * multipliers stay < 2^21 so every product is < 2^53, identical 64-bit
    * integer arithmetic in both engines (Spark's xxhash64 / DuckDB's hash()
    * would never agree). */
  private def sparkHash(s: String): String =
    s"""((${sparkBase(s)}
          * 69069 + 12345) % 4294967296 * 1664525 + 1013904223) % 4294967296"""

  /** DuckDB twin of [[sparkHash]]. */
  private def duckHash(s: String): String =
    s"""((${duckBase(s)}
          * 69069 + 12345) % 4294967296 * 1664525 + 1013904223) % 4294967296"""

  private val K = 32

  // -- KMV distinct-count sketch per language: K smallest distinct hashes of
  //    the dedup key; estimate vs the exact distinct-HASH count in one
  //    result. Groups with fewer than K distinct hashes fall back to the
  //    exact (small) count — the standard KMV exact-mode branch.
  //
  //    The exact calibration column counts the 64-bit HASH, not the raw
  //    8-token string: the distinct-hash count is the exact quantity the
  //    sketch estimates (same domain, honest calibration), and the
  //    aggregation shuffles 8-byte longs instead of ~50-byte strings.
  //    Counting the raw strings instead measured 34.9× on 10× data — the
  //    worst funnel in the round-4 sweep — for a column that differs from
  //    this one only by 32-bit hash collisions.
  private val kmvDistinct = QueryDef(
    "q_kmv_distinct",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("k8", concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
        .withColumn("h", expr(sparkHash("k8")))
      val dh = d.select("lang", "h").distinct()
      val nh = dh.groupBy("lang").agg(count(lit(1)).as("n_exact"))
      val win = Window.partitionBy("lang").orderBy(col("h").asc)
      val hk = dh.withColumn("rn", row_number().over(win))
        .filter(col("rn") === K).select(col("lang"), col("h").as("hk"))
      nh.join(hk, Seq("lang"), "left")
        .withColumn("kmv_est",
          when(col("n_exact") >= K,
            lit((K - 1) * 4294967296.0) / (col("hk") + lit(1L)))
            .otherwise(col("n_exact").cast("double")))
        .select(col("lang"), col("n_exact"),
          dround(col("kmv_est"), 2).as("kmv_est"),
          dround((col("kmv_est") - col("n_exact"))
            / col("n_exact") * 100, 2).as("rel_err_pct"))
        .orderBy("lang")
    },
    Some(s"""
      WITH d AS (SELECT lang,
                   array_to_string((string_split(text, ' '))[1:8], ' ') AS k8
                 FROM documents),
        hd AS (SELECT lang, ${duckHash("k8")} AS h FROM d),
        dh AS (SELECT DISTINCT lang, h FROM hd),
        nh AS (SELECT lang, count(*) AS n_exact FROM dh GROUP BY lang),
        hk AS (SELECT lang, h AS hk
               FROM (SELECT lang, h, row_number() OVER
                       (PARTITION BY lang ORDER BY h ASC) AS rn FROM dh)
               WHERE rn = $K),
        est AS (SELECT n.lang, n.n_exact,
                  CASE WHEN n.n_exact >= $K
                       THEN ${(K - 1).toDouble} * 4294967296.0 / (k.hk + 1)
                       ELSE CAST(n.n_exact AS DOUBLE) END AS kmv_est
                FROM nh n LEFT JOIN hk k ON n.lang = k.lang)
      SELECT lang, n_exact, ${oround("kmv_est", 2)} AS kmv_est,
             ${oround("(kmv_est - n_exact) / n_exact * 100", 2)} AS rel_err_pct
      FROM est ORDER BY lang"""))

  // -- Theta-style set-operation sketch: split the corpus into two source
  //    groups (even/odd source number), sketch each side and the union,
  //    then estimate |A∩B| by inclusion–exclusion (clamped at 0) and
  //    Jaccard from the estimates. Exact counterparts (over the same hash
  //    domain, see q_kmv_distinct) ride along for calibration. At 100 TB
  //    each side's sketch is K rows — the merge is free.
  //
  //    Every sketch here is the NATIVE mergeable KmvSketchAgg: one pass
  //    over the (grp, h) stream, O(K) buffer per group, associative
  //    partial merge — no distinct-then-window, and in particular no
  //    unpartitioned bottom-K window for the union (the round-4 plan's
  //    single-partition sort). The TreeSet buffer dedups hashes itself,
  //    so the union sketch reads the raw per-group stream directly. The
  //    DuckDB oracle replays the sketch relationally (k-th smallest
  //    distinct hash), which is exactly the cross-engine agreement
  //    q_kmv_native_agg certifies per-group.
  private val thetaSetops = QueryDef(
    "q_theta_setops",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("grp", (substring(col("source"), 4, 10).cast("int") % 2)
          .cast("long"))
        .withColumn("k8", concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
        .withColumn("h", expr(sparkHash("k8")))
      val dh = d.select("grp", "h").distinct()
      val est = org.apache.spark.sql.graft.SketchFunctions
        .kmvDistinctEst(col("h"), K)
      val perGrp = dh.groupBy("grp")
        .agg(count(lit(1)).as("n"), est.as("e"))
      val ea = perGrp.filter(col("grp") === 0)
        .select(col("e").as("est_a"), col("n").as("n_a"))
      val eb = perGrp.filter(col("grp") === 1)
        .select(col("e").as("est_b"), col("n").as("n_b"))
      // union sketch: the same mergeable aggregate over BOTH groups' hash
      // stream — the buffer dedups, so no pre-distinct is needed
      val eu = dh.agg(est.as("est_union"))
      // exact union/intersection over the distinct (grp, hash) pairs:
      // ng ∈ {1, 2} groups per hash
      val exact = dh.groupBy("h").agg(count(lit(1)).as("ng"))
        .agg(count(lit(1)).as("n_union"),
          sum(when(col("ng") === 2, 1L).otherwise(0L)).as("n_inter"))
      broadcast(ea).crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
        .crossJoin(broadcast(exact))
        .withColumn("est_inter",
          greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
        .select(
          dround(col("est_a"), 2).as("est_a"),
          dround(col("est_b"), 2).as("est_b"),
          dround(col("est_union"), 2).as("est_union"),
          dround(col("est_inter"), 2).as("est_inter"),
          dround(col("est_inter") / col("est_union"), 4).as("jaccard_est"),
          col("n_a"), col("n_b"), col("n_union"), col("n_inter"))
    },
    Some(s"""
      WITH d AS (SELECT CAST(CAST(substr(source, 4, 10) AS INT) % 2 AS BIGINT) AS grp,
                   array_to_string((string_split(text, ' '))[1:8], ' ') AS k8
                 FROM documents),
        hd AS (SELECT grp, ${duckHash("k8")} AS h FROM d),
        dh AS (SELECT DISTINCT grp, h FROM hd),
        pg AS (SELECT g.grp, g.nh, k.hk,
                 CASE WHEN g.nh >= $K
                      THEN ${(K - 1).toDouble} * 4294967296.0 / (k.hk + 1)
                      ELSE CAST(g.nh AS DOUBLE) END AS e
               FROM (SELECT grp, count(*) AS nh FROM dh GROUP BY grp) g
               LEFT JOIN (SELECT grp, h AS hk
                          FROM (SELECT grp, h, row_number() OVER
                                  (PARTITION BY grp ORDER BY h ASC) AS rn FROM dh)
                          WHERE rn = $K) k ON g.grp = k.grp),
        du AS (SELECT DISTINCT h FROM dh),
        eu AS (SELECT CASE WHEN n.nhu >= $K
                           THEN ${(K - 1).toDouble} * 4294967296.0 / (k.hku + 1)
                           ELSE CAST(n.nhu AS DOUBLE) END AS est_union
               FROM (SELECT count(*) AS nhu FROM du) n,
                    (SELECT h AS hku
                     FROM (SELECT h, row_number() OVER (ORDER BY h ASC) AS rn
                           FROM du) WHERE rn = $K) k),
        exact AS (SELECT count(*) AS n_union,
                    CAST(sum(CASE WHEN ng = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_inter
                  FROM (SELECT h, count(*) AS ng FROM dh GROUP BY h)),
        core AS (SELECT a.e AS est_a, b.e AS est_b, u.est_union,
                   greatest(0.0, a.e + b.e - u.est_union) AS est_inter
                 FROM (SELECT e FROM pg WHERE grp = 0) a,
                      (SELECT e FROM pg WHERE grp = 1) b, eu u)
      SELECT ${oround("c.est_a", 2)} AS est_a, ${oround("c.est_b", 2)} AS est_b,
             ${oround("c.est_union", 2)} AS est_union,
             ${oround("c.est_inter", 2)} AS est_inter,
             ${oround("c.est_inter / c.est_union", 4)} AS jaccard_est,
             (SELECT nh FROM pg WHERE grp = 0) AS n_a,
             (SELECT nh FROM pg WHERE grp = 1) AS n_b,
             e.n_union, e.n_inter
      FROM core c, exact e"""))

  /** CMS geometry: D independent row hashes × W counters per row. Row
    * hashes are one LCG scramble of the shared polynomial base hash, with
    * per-row (multiplier, increment) pairs; multipliers < 2^21 keep every
    * product < 2^53 (same cross-engine-safe envelope as [[sparkHash]]). */
  private val CmsW = 512
  private val CmsLcg = Seq(
    (0, 69069L, 12345L),
    (1, 1664525L, 1013904223L),
    (2, 65539L, 362437L),
    (3, 2034059L, 1499101L))
  private val TopK = 20

  // -- Count-Min-Sketch heavy hitters over the corpus token stream
  //    [Cormode & Muthukrishnan 2005]: every token increments D=4 counters
  //    (one per row hash) in a D×W=4×512 grid; a token's frequency estimate
  //    is the MIN over its D counters, which can only OVERcount (collisions
  //    add, never subtract). The result certifies exactly that: the exact
  //    top-20 tokens ride along and `overcount = cms_est - n_exact` must be
  //    ≥ 0 in both engines, while the hash compare pins the estimates
  //    bit-for-bit.
  //
  //    Scale shape: the sketch state is 2,048 cells NO MATTER how many
  //    distinct tokens a 100 TB corpus holds — the cell aggregation is a
  //    2,048-group groupBy with map-side partial aggregation, i.e. constant
  //    shuffle per partition, where an exact per-token count would shuffle
  //    the full vocabulary. Here the cells are built from the per-token
  //    pre-aggregate (weighted by count) because the exact counts must
  //    exist anyway for the oracle's top-K calibration; a pure deployment
  //    builds the cells straight off the token stream and never holds
  //    per-token state. Candidate lookup is a broadcast join against the
  //    2,048-row cell table.
  private val cmsHeavyHitters = QueryDef(
    "q_cms_heavy_hitters",
    (s, dir) => {
      import org.apache.spark.sql.Column
      val toks = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val tokCounts = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .withColumn("b", expr(sparkBase("tok")))
      def rowCol(b: Column, a: Long, c: Long): Column =
        (b * lit(a) + lit(c)) % lit(4294967296L) % lit(CmsW.toLong)
      val rcArr = array(CmsLcg.map { case (_, a, c) =>
        rowCol(col("b"), a, c) }: _*)
      val cells = tokCounts
        .select(col("n"), posexplode(rcArr).as(Seq("r", "c")))
        .groupBy("r", "c").agg(sum("n").as("cnt"))
      val top = tokCounts
        .orderBy(col("n").desc, col("tok").asc).limit(TopK)
      val probes = top.select(col("tok"), col("n").as("n_exact"),
        posexplode(rcArr).as(Seq("r", "c")))
      probes.join(broadcast(cells), Seq("r", "c"))
        .groupBy("tok", "n_exact").agg(min("cnt").as("cms_est"))
        .select(col("tok"), col("n_exact"), col("cms_est"),
          (col("cms_est") - col("n_exact")).as("overcount"))
        .orderBy(col("n_exact").desc, col("tok").asc)
    },
    Some {
      val lcgValues = CmsLcg.map { case (r, a, c) => s"($r, $a, $c)" }
        .mkString(", ")
      s"""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
                    FROM documents),
        tc AS (SELECT tok, count(*) AS n, ${duckBase("tok")} AS b
               FROM toks WHERE length(tok) > 0 GROUP BY tok),
        lcg(r, a, c) AS (VALUES $lcgValues),
        cells AS (SELECT l.r, (t.b * l.a + l.c) % 4294967296 % $CmsW AS cc,
                    sum(t.n) AS cnt
                  FROM tc t, lcg l GROUP BY 1, 2),
        top AS (SELECT tok, n AS n_exact, b FROM tc
                ORDER BY n DESC, tok ASC LIMIT $TopK),
        probes AS (SELECT t.tok, t.n_exact, l.r,
                     (t.b * l.a + l.c) % 4294967296 % $CmsW AS cc
                   FROM top t, lcg l),
        est AS (SELECT p.tok, p.n_exact, min(ce.cnt) AS cms_est
                FROM probes p JOIN cells ce ON p.r = ce.r AND p.cc = ce.cc
                GROUP BY p.tok, p.n_exact)
      SELECT tok, n_exact, CAST(cms_est AS BIGINT) AS cms_est,
             CAST(cms_est - n_exact AS BIGINT) AS overcount
      FROM est ORDER BY n_exact DESC, tok ASC"""
    })

  // -- the SAME KMV sketch as q_kmv_distinct, but as the NATIVE mergeable
  //    aggregate (org.apache.spark.sql.graft.KmvSketchAgg, ladder tier (b):
  //    TypedImperativeAggregate): each partition folds rows into an O(K)
  //    buffer, partials merge at the exchange, no distinct and no window
  //    anywhere in the plan. The oracle replays the sketch relationally
  //    (k smallest distinct hashes), so the hash compare certifies that
  //    the imperative buffer path computes bit-for-bit what the
  //    declarative path computes — the two must agree on every group.
  private val kmvNativeAgg = QueryDef(
    "q_kmv_native_agg",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("k8", concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
        .withColumn("h", expr(sparkHash("k8")))
      d.groupBy("lang")
        .agg(org.apache.spark.sql.graft.SketchFunctions
          .kmvDistinctEst(col("h"), K).as("est"))
        .select(col("lang"), dround(col("est"), 2).as("kmv_est"))
        .orderBy("lang")
    },
    Some(s"""
      WITH d AS (SELECT lang,
                   array_to_string((string_split(text, ' '))[1:8], ' ') AS k8
                 FROM documents),
        hd AS (SELECT lang, ${duckHash("k8")} AS h FROM d),
        dh AS (SELECT DISTINCT lang, h FROM hd),
        nh AS (SELECT lang, count(*) AS n_hashes FROM dh GROUP BY lang),
        hk AS (SELECT lang, h AS hk
               FROM (SELECT lang, h, row_number() OVER
                       (PARTITION BY lang ORDER BY h ASC) AS rn FROM dh)
               WHERE rn = $K),
        est AS (SELECT n.lang,
                  CASE WHEN n.n_hashes >= $K
                       THEN ${(K - 1).toDouble} * 4294967296.0 / (k.hk + 1)
                       ELSE CAST(n.n_hashes AS DOUBLE) END AS kmv_est
                FROM nh n LEFT JOIN hk k ON n.lang = k.lang)
      SELECT lang, ${oround("kmv_est", 2)} AS kmv_est
      FROM est ORDER BY lang"""))

  /** Quantile probes and the rank tolerance certified by [[approxQuantiles]].
    * Spark's GK sketch guarantees rank error ≤ n/accuracy = 0.05% at
    * accuracy 2000; the certified band is ±0.5% — a 10× margin. */
  private val Probes = Seq(0.5, 0.9, 0.99)
  private val RankEps = 0.005
  private val Accuracy = 2000

  // -- Approximate quantiles (Greenwald–Khanna sketch, the engine-native
  //    `percentile_approx`) CERTIFIED against the exact quantile: the result
  //    carries the exact value and an integer flag proving the sketch output
  //    lies within the ±RankEps rank band [exact(q-ε), exact(q+ε)]. The
  //    DuckDB twin emits the same exact values with flag 1, so the hash
  //    compare fails iff the sketch ever leaves its guaranteed band. The
  //    sketch is THE quantile plan at 100 TB — single-pass, O(accuracy)
  //    state, mergeable across partitions — where the exact percentile
  //    (full sort per group) is the thing you can no longer afford;
  //    here the exact ride-along is what makes it certifiable.
  private val approxQuantiles = QueryDef(
    "q_approx_quantile_bounds",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      // The exact side runs as graft.operators.HistQuantiles — a histogram
      // + bucketed-rank plan whose shuffle carries DISTINCT cent values,
      // not rows. Spark's `percentile` aggregate (each instance buffers
      // the whole column) measured 7.4 s / 27.5 s at sf0.1 / sf1 here;
      // the histogram plan is ~10× lighter and scales with the value grid.
      val allQ = Probes.map(_ - RankEps) ++ Probes ++ Probes.map(_ + RankEps)
      val ex = graft.operators.HistQuantiles.quantiles(
        li, round(col("l_extendedprice") * 100), allQ, _ / 100.0)
      // one row carrying q→value for all probe points (single computation
      // of the histogram subtree; map lookup replaces three self-joins)
      val exMap = ex.groupBy().agg(
        map_from_entries(collect_list(struct(col("q"), col("value"))))
          .as("exm"))
      val apx = li.agg(percentile_approx(col("l_extendedprice"),
        array(Probes.map(lit): _*), lit(Accuracy)).as("apx"))
      apx.crossJoin(broadcast(exMap))
        .select(posexplode(col("apx")).as(Seq("pos", "apxv")), col("exm"))
        .select(
          element_at(array(Probes.map(lit): _*), col("pos") + 1).as("p"),
          col("apxv"), col("exm"))
        .select(col("p"),
          dround(element_at(col("exm"), col("p")), 4).as("exact_value"),
          (col("apxv") >= element_at(col("exm"), col("p") - lit(RankEps)) &&
            col("apxv") <= element_at(col("exm"), col("p") + lit(RankEps)))
            .cast("long").as("within_bounds"))
        .orderBy("p")
    },
    Some(Probes.map { q =>
      s"""SELECT CAST($q AS DOUBLE) AS p,
             ${oround(s"quantile_cont(l_extendedprice, $q)", 4)} AS exact_value,
             CAST(1 AS BIGINT) AS within_bounds
           FROM lineitem"""
    }.mkString("", "\n      UNION ALL\n      ", "\n      ORDER BY p")))

  // -- sketch ROLLUP (the Druid/BigQuery theta-sketch-column pattern):
  //    aggregate a KMV partial per DAY once (KmvSketchBinaryAgg → a
  //    binary column you could store), then answer WEEKLY distinct-user
  //    questions by merging the 7 daily partials (KmvMergeAgg) — the raw
  //    rows are never re-scanned for the coarser window. At 100 TB this
  //    is the only affordable repeated-distinct shape: the daily sketch
  //    table is ~K longs per bucket, and any window (week, month, ad-hoc
  //    range) merges in O(buckets × K). Merging same-k partials is
  //    EXACT w.r.t. the direct sketch of the unioned input (bottom-k of
  //    a union = bottom-k of per-part bottom-k's — asserted bit-for-bit
  //    in KmvSketchAggSpec), so certification mirrors
  //    q_table_profile_hll: the exact weekly countDistinct rides along
  //    and an integer flag proves every weekly estimate lands inside the
  //    KMV 3σ band; the oracle emits the same exact counts with flag 1.
  private val SketchRollupK = 256
  private val KmvBand = 3.0 / math.sqrt(SketchRollupK - 2) // 3σ ≈ 18.8%

  private val sketchRollup = QueryDef(
    "q_sketch_rollup",
    (s, dir) => {
      import org.apache.spark.sql.graft.SketchFunctions
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
        .withColumn("week", expr("day div 7"))
        // engine-internal scramble into the KMV hash domain [0, 2^32);
        // never crosses the oracle boundary (the oracle checks exact
        // counts + the band flag, not the sketch)
        .withColumn("h", pmod(xxhash64(col("user_id")), lit(4294967296L)))
      val daily = ev.groupBy("week", "day")
        .agg(SketchFunctions.kmvSketchPartial(col("h"), SketchRollupK).as("sk"))
      val weeklyEst = daily.groupBy("week")
        .agg(SketchFunctions.kmvMergeEst(col("sk"), SketchRollupK).as("est"))
      val weeklyExact = ev.groupBy("week")
        .agg(countDistinct("user_id").as("n_exact"))
      weeklyExact.join(weeklyEst, "week")
        .select(col("week"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            greatest(lit(3.0), lit(KmvBand) * col("n_exact")))
            .cast("long").as("within_bounds"))
        .orderBy("week")
    },
    Some("""
      SELECT (epoch_us(ts) // 86400000000) // 7 AS week,
             count(DISTINCT user_id) AS n_exact,
             CAST(1 AS BIGINT) AS within_bounds
      FROM events GROUP BY 1 ORDER BY week"""))

  // -- Apache DataSketches HLL rollup — the industry-standard sibling of
  //    the KMV rollup above, using Spark's BUILT-IN sketch column
  //    functions (hll_sketch_agg / hll_union_agg / hll_sketch_estimate,
  //    backed by datasketches-java): per-day binary partials that a
  //    warehouse stores as a sketch COLUMN, weekly answers by merging
  //    partials — raw rows never re-scanned. Same certification contract
  //    as q_sketch_rollup: the exact weekly countDistinct rides along and
  //    an integer flag proves every merged estimate lands inside the HLL
  //    5σ band (lgK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%, 5σ ≈ 8.1%); 5σ, not
  //    3σ, because the flag is folded into a pass/fail HASH gate — at 3σ
  //    an unlucky-but-healthy estimate (~0.3% per week bucket) would fail
  //    the round spuriously, while a genuinely broken merge path misses
  //    by far more than 8% (round-7 ADVICE). The
  //    oracle emits the same exact counts with flag 1. Where the KMV
  //    rollup certifies OUR native TypedImperativeAggregate, this one
  //    certifies the engine-provided path a user would reach first —
  //    both partial formats are storable and mergeable, which is the
  //    100 TB property (pre-aggregated sketch tables, constant-size
  //    state per (week, day)).
  private val HllLgK = 12
  private val HllBand = 5.0 * 1.04 / math.sqrt((1 << HllLgK).toDouble)

  private val hllRollup = QueryDef(
    "q_hll_sketch_rollup",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
        .withColumn("week", expr("day div 7"))
      val daily = ev.groupBy("week", "day")
        .agg(hll_sketch_agg(col("user_id"), lit(HllLgK)).as("sk"))
      val weeklyEst = daily.groupBy("week")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est"))
      val weeklyExact = ev.groupBy("week")
        .agg(countDistinct("user_id").as("n_exact"))
      weeklyExact.join(weeklyEst, "week")
        .select(col("week"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            greatest(lit(3.0), lit(HllBand) * col("n_exact")))
            .cast("long").as("within_bounds"))
        .orderBy("week")
    },
    Some("""
      SELECT (epoch_us(ts) // 86400000000) // 7 AS week,
             count(DISTINCT user_id) AS n_exact,
             CAST(1 AS BIGINT) AS within_bounds
      FROM events GROUP BY 1 ORDER BY week"""))

  override def queries: Seq[QueryDef] =
    Seq(kmvDistinct, thetaSetops, approxQuantiles, cmsHeavyHitters,
      kmvNativeAgg, sketchRollup, hllRollup)
}
