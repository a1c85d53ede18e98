package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Materialize.CutSyntax
import graft.Tables
import graft.QueryKit._
import graft.expressions.GraftExtensions
import graft.functions.TextAnalytics._

/** Similarity search over the `embeddings` table plus multimodal binary
  * plumbing — the vector half of the training-data pipeline surface.
  *
  * Scale notes: the brute-force top-k is probes × corpus with the corpus
  * side streamed (broadcast the probe set — it is the small side by
  * construction); ranking uses the rounded score so cross-engine ties are
  * deterministic. The LSH variants use banded random-hyperplane
  * signatures (AND-OR construction): b=4 bands of r sign bits each,
  * candidates = pairs agreeing on ANY full band, then exact cosine on
  * candidates only — never n². The band width r is ADAPTIVE:
  * r = ceil(log2(n / targetBucketSize)) clamped to [4, 62], computed with
  * exact integer arithmetic from the corpus count, so the per-band bucket
  * count grows ∝ n and expected bucket occupancy stays ~constant at any
  * scale (a fixed r is a fixed 2^r-bucket space whose intra-bucket pair
  * work grows quadratically with data — the round-2 scale defect).
  * Signatures are ARRAY<LONG> — one long per band key (graft_rpbands) —
  * so r is NOT capped by a single long's bit budget (the round-3 ceiling:
  * a packed 60-bit signature forces r ≤ 15, and past n ≈ 16·2¹⁵ the
  * keyspace stops growing and intra-bucket pair work goes quadratic
  * again; r ≤ 62 saturates at n ≈ 16·2⁶² — never). r itself is computed
  * INSIDE the plan from a one-row count aggregate cross-joined broadcast
  * (the RangeBuckets pattern) — no driver-side count() action per query
  * build. Hyperplane weights are ±1 derived from a portable integer hash
  * so the oracle reproduces them bit-for-bit.
  */
object SimilarityQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Bands in the AND-OR construction (OR over bands, AND within). */
  private val nBandsRp = 4

  /** Target expected rows per band bucket. */
  private val targetBucket = 16L

  /** Rows per hot-bucket CHUNK in the pair self-join (q_dedup_embedding):
    * one task verifies ≤ chunkTarget² candidate pairs. See the r14
    * hot-bucket note on that query. */
  private val chunkTarget = 256L

  /** Adaptive band width: smallest r with 2^r ≥ n/targetBucket, clamped
    * to [4, 62] (each band key is its own long, so 62 is the signed-long
    * bit budget PER BAND, not across the whole signature). Integer-exact:
    * r = bit_length(ceil(n/B) − 1) — no float log whose ulps could
    * disagree with the oracle at powers of 2. Spec-only twin of the
    * in-plan [[bandParams]] form (RpBandsSpec sweeps it past the old
    * 2¹⁵ saturation point). */
  private[queries] def bandWidth(n: Long): Int = {
    val m = math.max((n + targetBucket - 1) / targetBucket - 1, 1L)
    val r = 64 - java.lang.Long.numberOfLeadingZeros(m)
    math.min(62, math.max(4, r))
  }

  /** In-plan band width: one-row (r) frame from a count aggregate over
    * `base` — cross-joined broadcast into the signature computation so
    * the whole query stays ONE lazy DAG (no driver count() action).
    * Same integer formulation as [[bandWidth]]:
    * length(bin(x)) = bit_length(x) for x ≥ 1. */
  private def bandParams(base: DataFrame): DataFrame =
    base.agg(count(lit(1)).as("n"))
      .select(expr(s"CAST(least(62, greatest(4, length(bin(greatest(" +
        s"(n + ${targetBucket - 1}) div $targetBucket - 1, 1))))) AS INT)").as("r"))

  /** DuckDB twin of [[bandParams]]. */
  private def bandWidthDuck(src: String): String =
    s"SELECT CAST(least(62, greatest(4, " +
      s"length(bin(greatest((count(*) + ${targetBucket - 1}) // $targetBucket - 1, 1))))) AS INT) AS r " +
      s"FROM $src"

  /** ±1 pseudo-weight for (plane j, dim d): parity of a portable LCG mix —
    * the DuckDB twin of graft_rpsig (native side: expressions.FloatRpSig;
    * parity asserted in FloatRpSigSpec). */
  private def weightDuck(j: String, d: String): String =
    s"CASE WHEN (($j * 131071 + $d * 524287 + 17) % 1000003) % 2 = 0 THEN 1.0 ELSE -1.0 END"

  /** DuckDB twin of graft_rpbands: LIST of [[nBandsRp]] band keys, band
    * b's bit i = sign of plane j = b·r + i (`r` references the params
    * CTE). Each key is its own BIGINT, so r may exceed 15. */
  private def rpBandsDuck(emb: String): String = {
    val j = "(b * r + i)"
    s"list_transform(generate_series(0, ${nBandsRp - 1}), b -> " +
      s"CAST(list_sum(list_transform(generate_series(0, r - 1), i -> " +
      s"CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($emb)), d -> " +
      s"${weightDuck(j, "(d - 1)")} * CAST($emb[d] AS DOUBLE))), (s, v) -> s + v) >= 0 " +
      s"THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT))"
  }

  /** DuckDB CTE chain `params, e, bands, pairs`: adaptive-r banded
    * candidate pairs over `embeddings` (twin of the Spark banding in
    * q_ann_lsh / q_dedup_embedding). */
  private def bandedPairsDuck: String =
    s"""params AS (
       |  ${bandWidthDuck("embeddings")}
       |), e AS (
       |  SELECT vec_id, embedding, ${rpBandsDuck("embedding")} AS sig,
       |    ${dotDuck("embedding", "embedding")} AS n2, r
       |  FROM embeddings CROSS JOIN params
       |), bands AS (
       |  SELECT vec_id, b AS band, sig[b + 1] AS bkey
       |  FROM e, unnest(generate_series(0, ${nBandsRp - 1})) AS t(b)
       |), pairs AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id
       |)""".stripMargin

  /** DuckDB CTE chain replaying IvfIndex.buildLloyd(k, iters) EXACTLY:
    * `c0` = the k lowest-vec_id embeddings; each round r, `a{r}` assigns
    * every vector to its nearest centroid (same ‖c‖² − 2c·x argmin and
    * (dist, cluster) tie-break as IvfIndex.assign) and `c{r+1}` takes
    * the integer-exact per-(cluster, dim) mean (6-dp rounding → DECIMAL
    * sum → one double division → FLOAT cast — the identical arithmetic
    * of the Spark side, so the float centroids agree bit for bit), with
    * empty cells keeping the previous centroid via the LEFT JOIN
    * COALESCE. `afin` is the final assignment against c{iters}.
    *
    * `src` is the (vec_id, embedding) source relation and `pfx` prefixes
    * every CTE name — PqIndex's oracle replays m INDEPENDENT subspace
    * Lloyd builds in one WITH chain (src = the sliced subvector CTE,
    * pfx = s0_…s3_). */
  private def lloydDuck(k: String, iters: Int, src: String = "embeddings",
      pfx: String = ""): String = {
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, embedding, cluster FROM (
         |    SELECT e.vec_id, e.embedding, c.cluster,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotDuck("c.cent", "c.cent")} - 2 * ${dotDuck("e.embedding", "c.cent")},
         |        c.cluster) AS rn
         |    FROM $src e CROSS JOIN $cents c) WHERE rn = 1
         |)""".stripMargin
    def updateCte(name: String, prev: String, assigned: String): String =
      s"""$name AS (
         |  SELECT p.cluster, COALESCE(m.cent, p.cent) AS cent
         |  FROM $prev p LEFT JOIN (
         |    SELECT cluster,
         |      list(CAST(CAST(micro AS DOUBLE) / 1000000 / n AS FLOAT) ORDER BY pos) AS cent
         |    FROM (
         |      SELECT cluster, i - 1 AS pos,
         |        CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
         |          AS BIGINT)) AS BIGINT) AS micro,
         |        COUNT(*) AS n
         |      FROM $assigned, unnest(generate_series(1, len(embedding))) AS t(i)
         |      GROUP BY cluster, i)
         |    GROUP BY cluster) m ON p.cluster = m.cluster
         |)""".stripMargin
    val rounds = (0 until iters).map { r =>
      assignCte(s"${pfx}a$r", s"${pfx}c$r") + ",\n" +
        updateCte(s"${pfx}c${r + 1}", s"${pfx}c$r", s"${pfx}a$r")
    }.mkString(",\n")
    s"""${pfx}c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
       |    embedding AS cent
       |  FROM (SELECT vec_id, embedding FROM $src ORDER BY vec_id LIMIT $k)
       |),
       |$rounds,
       |${assignCte(s"${pfx}afin", s"${pfx}c$iters")}""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-label vector centroids — the cluster/profile aggregation of the
    // embedding family, in its exact MERGEABLE form: element-wise sums
    // are ORDER-DEPENDENT in floating point, so each element is rounded
    // to 6 dp (deterministic on both engines) and summed as
    // DECIMAL(18,6); the output is the integer-scaled sum (×1e6, a
    // BIGINT) plus the count — bit-identical at any partitioning with NO
    // float division anywhere (a rounded mean can land on a half-way
    // boundary where engines' double→decimal rounding differs; the
    // consumer divides sum/n once at the end). posexplode keys the
    // shuffle by (label, pos) — dim × labels groups, perfectly parallel.
    "q_embed_centroid" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(
          (sum(round(col("v").cast("double"), 6).cast("decimal(18,6)")) *
            lit(1000000)).cast("long").as("sum_micro6"),
          count(lit(1)).as("n"))
        .orderBy(col("label"), col("pos"))
    }),

    // Brute-force cosine top-k: the exact baseline every ANN variant is
    // measured against. FIXED probe universe (vec_id % 20 = 0 AND
    // vec_id < 2000 — the full id space at the largest test SF, so no
    // output changes at any SF): the probe workload is
    // query-determined, not corpus-proportional — a probe set growing
    // with the corpus made the decade rehearsal quadratic by
    // construction (55x at 10x; the q_ann_pq / retrievalFrames
    // precedent). Work is now probes(const) x corpus = linear. Norms
    // are precomputed per row (not per pair) — same doubles, 3x fewer
    // folds in the pair loop.
    "q_cosine_topk" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = t(s, dir, "embeddings")
        .withColumn("n2", expr("graft_fdot(embedding, embedding)"))
      val probes = e.filter(col("vec_id") % 20 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("n2").as("pn2"))
      val cands = e.select(col("vec_id").as("cand_id"),
        col("embedding").as("ce"), col("n2").as("cn2"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("cand_id"))
      broadcast(probes).join(cands, col("probe_id") =!= col("cand_id"))
        .withColumn("sim",
          r6(expr("graft_fdot(pe, ce)") / (sqrt(col("pn2")) * sqrt(col("cn2")))))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("probe_id"), col("cand_id"), col("sim"), col("rnk"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Banded-LSH ANN: adaptive-r AND-OR banding (see object doc) →
    // candidates share ≥1 full band with a probe → exact cosine on
    // candidates only → top-1 per probe. The probe side (5% sample) stays
    // broadcast through the band join, so candidate rows never shuffle.
    "q_ann_lsh" -> ((s, dir) => {
      GraftExtensions.register(s)
      val base = t(s, dir, "embeddings")
      val e = base.crossJoin(broadcast(bandParams(base)))
        .withColumn("sig", expr(s"graft_rpbands(embedding, $nBandsRp, r)"))
        .withColumn("n2", expr("graft_fdot(embedding, embedding)"))
      val bands = e
        .select(col("vec_id"), posexplode(col("sig")).as(Seq("band", "bkey")))
      val pBands = bands.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("probe_id"), col("band"), col("bkey"))
      val candPairs = bands.as("c")
        .join(broadcast(pBands).as("p"),
          col("p.band") === col("c.band") && col("p.bkey") === col("c.bkey") &&
            col("p.probe_id") =!= col("c.vec_id"))
        .select(col("p.probe_id").as("probe_id"), col("c.vec_id").as("cand_id"))
        .distinct()
      val probes = e.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("n2").as("pn2"))
      val cands = e.select(col("vec_id").as("cand_id"),
        col("embedding").as("ce"), col("n2").as("cn2"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("cand_id"))
      candPairs
        .join(cands, "cand_id")
        .join(broadcast(probes), "probe_id")
        .withColumn("sim",
          r6(expr("graft_fdot(pe, ce)") / (sqrt(col("pn2")) * sqrt(col("cn2")))))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("probe_id"), col("cand_id"), col("sim"))
        .orderBy(col("probe_id"))
    }),

    // Embedding-cosine near-duplicate pairs above a threshold, candidates
    // from the same adaptive-r banded LSH (both directions of the dedup
    // story: textual MinHash in TextQueries, embedding-cosine here).
    //
    // HOT-BUCKET CHUNKING (r14, from the 32x probe): projection skew —
    // an anisotropic embedding distribution making some hyperplane signs
    // one-sided — can concentrate thousands of vectors in one (band,key)
    // bucket even while AVERAGE occupancy stays at target. A plain
    // band-key self-join then lands that bucket's whole m² candidate
    // verification on ONE task (measured: 94s single-thread at 32x,
    // 62.9x wall for 32x data). The pair work is intrinsic (every
    // candidate must be verified; the dense region's true pairs are the
    // output), so the fix is DISTRIBUTION, not pruning: rows hash into
    // ceil(m/256) chunks per bucket, each row replicates once per
    // partner chunk, and the self-join keys on (band, bkey, chunk,
    // partner-chunk) — the hot bucket becomes nch² independent tasks of
    // ≤256² comparisons, identical pair set. Small buckets have nch=1
    // and pay one constant extra key column.
    //
    // The bucket size comes from a WINDOW count over (band, bkey), not a
    // separate count-table join: the window's one hash exchange IS the
    // co-partitioning both self-join sides need (join keys (band, bkey,
    // chunk, partner-chunk) ⊇ the exchange keys, so EnsureRequirements
    // adds only sorts), and because the two sides are the identical
    // subtree that exchange is REUSED — the scan + signature pipeline
    // runs once. The first chunked form joined a groupBy count table
    // back into the band rows; the asymmetric c/oc join keys made the
    // sides canonically different and the whole subtree (scan, rpbands,
    // count agg, join) silently recomputed per side — 10 parquet scans,
    // 8 rpbands evaluations, 0 reused exchanges at 1x.
    //
    // IN-STAGE VERIFICATION (r14, from the 32x spill profile): the
    // embedding (64 floats) and its precomputed norm RIDE the band rows,
    // so cosine verification happens inside the self-join's stage and
    // only SURVIVING pairs (sim ≥ threshold, ~1% of candidates in the
    // dense region) ever reach another operator. The previous shape
    // emitted bare (id_a, id_b) candidates and joined the embeddings
    // back on per-pair keys — candidate-count × 2 embeddings of
    // intermediate state (≈6 GB and ~28 GB of sort spill at 32x,
    // pair-QUADRATIC in the dense region at scale). Payload-on-band-rows
    // is 4·n·dim bytes through one exchange — LINEAR in the corpus, the
    // shape that survives 100 TB.
    "q_dedup_embedding" -> ((s, dir) => {
      GraftExtensions.register(s)
      val base = t(s, dir, "embeddings")
      val sigs = base.crossJoin(broadcast(bandParams(base)))
        .select(col("vec_id"),
          expr(s"graft_rpbands(embedding, $nBandsRp, r)").as("sig"),
          col("embedding").as("emb"),
          expr("graft_fdot(embedding, embedding)").as("n2"))
      // the full signature (4 longs) rides each band row so the join can
      // emit every pair exactly ONCE — from its EARLIEST co-bucketing
      // band — as an in-stage filter, instead of materializing the
      // multi-band duplicates through a corpus-of-pairs DISTINCT
      // exchange (at 32x that exchange was ~4x the unique pair volume)
      val bands = sigs
        .select(col("vec_id"), col("sig"), col("emb"), col("n2"),
          posexplode(col("sig")).as(Seq("band", "bkey")))
      val wBucket = Window.partitionBy(col("band"), col("bkey"))
      val ch = bands
        .withColumn("nch",
          greatest(lit(1L),
            ceil(count(lit(1)).over(wBucket) / lit(chunkTarget))).cast("int"))
        .withColumn("c", pmod(xxhash64(col("vec_id")), col("nch")).cast("int"))
        .withColumn("oc", explode(expr("sequence(0, nch - 1)")))
      // each side repartitions on its FULL chunk-key tuple, in an order
      // that is position-compatible with the join condition below
      // ((band, bkey, oc, c) on x lines up with (band, bkey, c, oc) on
      // y), so the join adds NO further exchange and a hot bucket's
      // nch² chunk pairs land on nch² different reducers — partitioning
      // the join on (band, bkey) alone would put the whole hot bucket
      // back on one task, the exact collapse the chunking exists to
      // prevent. The two repartition exchanges differ, but everything
      // BELOW the window's (band, bkey) exchange is one shared subtree,
      // so the scan + rpbands pipeline is computed once and reused.
      val chX = ch.repartition(col("band"), col("bkey"), col("oc"), col("c"))
      val chY = ch.repartition(col("band"), col("bkey"), col("c"), col("oc"))
      val pairs = chX.as("x")
        .join(chY.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.oc") === col("y.c") && col("x.c") === col("y.oc") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
          col("x.band").as("band"), col("x.sig").as("sa"), col("y.sig").as("sb"),
          col("x.emb").as("ea"), col("x.n2").as("na2"),
          col("y.emb").as("eb"), col("y.n2").as("nb2"))
        // keep the pair only at its first co-bucketing band (band 0 has
        // no earlier bands; sequence(0, -1) would DESCEND — guard it).
        // This filter comes BEFORE the cosine so CombineFilters keeps it
        // as the first conjunct: multi-band duplicates die on a few long
        // compares without paying the 64-float dot product.
        .filter(expr("CASE WHEN band = 0 THEN true ELSE NOT exists(" +
          "sequence(0, band - 1), b -> element_at(sa, b + 1) = element_at(sb, b + 1)) END"))
        .withColumn("sim",
          r6(expr("graft_fdot(ea, eb)") / (sqrt(col("na2")) * sqrt(col("nb2")))))
        .filter(col("sim") >= 0.35)
      pairs
        .select(col("id_a"), col("id_b"), col("sim"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Embedding dedup in its CANONICALIZATION form — the shape that stays
    // linear at 100 TB: group on the FULL banded signature (co-directional
    // duplicates agree on every sign bit), keep the lowest vec_id as
    // canonical. Pair-LISTING (q_dedup_embedding) is inherently
    // output-bound: a duplicate cluster of size m emits m²/2 true pairs,
    // so its work grows with the data's duplicate structure no matter how
    // the candidates are generated; a pipeline that only needs "one row
    // per near-dup group" uses this keep-first form instead (the
    // embedding twin of q_corpus_clean's exact-dedup stage). Exact-copy
    // dups injected (every 40th vector) — the synthetic corpus has none.
    "q_embed_dedup_canon" -> ((s, dir) => {
      GraftExtensions.register(s)
      val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val dups = base.filter(col("vec_id") % 40 === 0)
        .select((col("vec_id") + 500000).as("vec_id"), col("embedding"))
      val all = base.unionByName(dups)
      all.crossJoin(broadcast(bandParams(all)))
        .withColumn("sig", expr(s"graft_rpbands(embedding, $nBandsRp, r)"))
        .groupBy(col("sig"))
        .agg(min(col("vec_id")).as("canonical_id"),
          count(lit(1)).as("n_members"))
        .filter(col("n_members") > 1)
        .select(col("canonical_id"), col("n_members"))
        .orderBy(col("canonical_id"))
    }),

    // IVF ANN — the coarse-quantizer alternative to hyperplane LSH: a
    // k-means index partitions the vector space, probes search the
    // nProbe nearest cells with exact cosine (operators.IvfIndex; at
    // scale `cluster` is the table's partition key and pruning does the
    // rest). FULLY oracle-checked: the DuckDB twin replays the 3 Lloyd
    // rounds (integer-exact centroid means — see lloydDuck), picks the
    // same 2 nearest cells per probe, and reruns the exact-cosine top-k
    // over the probed members — every double is the same portable fold
    // on both engines, so the whole funnel hash-matches bit for bit.
    // Quality (recall vs brute force) is additionally gated by
    // IvfIndexSpec: recall@1 is monotone in nProbe, exact at nProbe = k.
    // Bounded DataFrame-native build (k=8, 3 Lloyd rounds — a coarse
    // quantizer converges in a few rounds and each round is a full
    // corpus pass; deterministic init — see IvfIndex.buildLloyd for why
    // not MLlib here).
    "q_ann_ivf" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = t(s, dir, "embeddings")
      // persisted quantizer (VectorIndex.ensureIvf): Lloyd trains once
      // per JVM and lands as parquet centroids + cluster-keyed vectors;
      // this query — like every later bench pass and q_ivf_probe_stats —
      // prices at read-back cost, the production split between the
      // scheduled index-maintenance job and the search path
      val index = graft.operators.VectorIndex.ensureIvf(s, s"$dir#ivf8",
        graft.operators.IvfIndex.buildLloyd(e, k = 8, iters = 3))
      // FIXED probe universe (vec_id < 5000 = the full id space at the
      // largest test SF, so no output changes at any SF): a probe set
      // growing with the corpus makes probes×members quadratic by
      // benchmark construction (the q_ann_pq precedent; the round-8
      // probe clocked the unpinned form at 14.6× wall at 16× data)
      val probes = e.filter(col("vec_id") % 20 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.operators.IvfIndex.search(index, probes, topK = 3, nProbe = 2)
        .select(col("probe_id"), col("cand_id"), r6(col("sim")).as("sim"),
          col("rnk"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // SemDeDup (Abbas et al. 2023) — semantic deduplication over
    // embedding clusters: k-means partitions the space (the SAME
    // integer-exact Lloyd build as the IVF quantizer, so the oracle
    // replays it bit-for-bit), exact cosine pairs are computed ONLY
    // within each cluster, and the paper's GREEDY keep rule runs
    // against the centroid-distance priority order: members sort by
    // ASCENDING cosine-to-centroid (farthest = least redundant = kept
    // first; ties by vec_id) and x is DROPPED iff SOME
    // earlier-priority y has sim(x, y) ≥ τ — the reference
    // implementation's upper-triangular max-sim test, which is pure
    // pairwise (one aggregation over the pair list), NOT a transitive
    // closure; an earlier components-based draft paid an eager
    // fixpoint loop per run for semantics the paper doesn't ask for.
    // Scale shape: within-cluster pairing is the published method's
    // cost model — k is SCALE-ADAPTIVE (IvfIndex.adaptiveK: ceil(n/64),
    // one count over the already-eager Lloyd build's input) so expected
    // cluster size stays ~64 and pair work is n·64, never n²/k with a
    // frozen k; cross-cluster near-dups are the method's documented
    // recall trade-off. The DuckDB twin recomputes the same k from its
    // own count(*) (subquery LIMIT in the Lloyd init), then replays
    // Lloyd, the same within-cluster pairs and the same greedy EXISTS.
    "q_semdedup" -> ((s, dir) => {
      GraftExtensions.register(s)
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val index = graft.operators.VectorIndex.ensureIvf(s, s"$dir#ivfAdaptive", {
        val k = graft.operators.IvfIndex.adaptiveK(e.count())
        graft.operators.IvfIndex.buildLloyd(e, k = k, iters = 3)
      })
      val cents = index.centers.map { case (i, a) => (i, a.toSeq) }
        .toDF("cluster", "centroid")
        .select(col("cluster"), col("centroid").cast("array<float>").as("centroid"))
      val asg = index.assignments
        .withColumn("n2", expr("graft_fdot(embedding, embedding)"))
        .join(broadcast(cents), Seq("cluster"))
        .withColumn("csim", r6(expr("graft_fdot(embedding, centroid)") /
          (sqrt(col("n2")) * sqrt(expr("graft_fdot(centroid, centroid)")))))
        .select(col("vec_id"), col("cluster"), col("embedding"), col("n2"),
          col("csim"))
        // r15: the eager cut that sat here was REMOVED (VERDICT r14 item
        // 7, the q_rrf_fusion F2 pattern): the self-join's two sides are
        // canonically identical and share one reused exchange, and the
        // third consumer's recompute is a cheap asset-parquet scan —
        // the checkpoint write+read of the embedding-carrying frame cost
        // more than it saved (interleaved min-of-10: 0.73→0.60 s).
      // directed pairs (y earlier-priority than x): count per x
      val dups = asg.as("a").join(asg.as("b"),
          col("a.cluster") === col("b.cluster") &&
            col("a.vec_id") =!= col("b.vec_id") &&
            (col("b.csim") < col("a.csim") ||
              (col("b.csim") === col("a.csim") &&
                col("b.vec_id") < col("a.vec_id"))))
        .withColumn("sim", r6(expr("graft_fdot(a.embedding, b.embedding)") /
          (sqrt(col("a.n2")) * sqrt(col("b.n2")))))
        .filter(col("sim") >= 0.35)
        .groupBy(col("a.vec_id").as("vec_id"))
        .agg(count(lit(1)).as("n_dup_earlier"))
      asg.join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"), col("csim"),
          coalesce(col("n_dup_earlier"), lit(0L)).as("n_dup_earlier"),
          (coalesce(col("n_dup_earlier"), lit(0L)) === 0).as("keep"))
        .orderBy(col("vec_id"))
    }),

    // PQ (product-quantization) ANN — the compression path of the ANN
    // trio (hyperplane LSH / IVF coarse quantizer / PQ codes): vectors
    // compress to m=4 byte codes, search is ADC table lookups — the
    // corpus float vectors are never read at query time (the property
    // that matters at 100 TB: 64× smaller scan). FULLY oracle-checked:
    // the DuckDB twin replays all four subspace Lloyd builds (the
    // q_pq_code_stats chain), re-derives every vector's codes from the
    // final assignments, rebuilds the per-probe integer-micro ADC
    // tables, and reruns the two-stage top-(k+1) → drop-self → top-k
    // ranking — ADC sums are BIGINT micros, so ranking and ties are
    // engine- and partitioning-exact. Quality is additionally gated by
    // PqIndexSpec (ADC ordering beats random 2×+, recall@10 floor vs
    // brute force). Self-matches excluded and re-ranked after the ADC
    // top-(k+1), mirroring q_ann_ivf semantics.
    "q_ann_pq" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = t(s, dir, "embeddings")
      // persisted codebooks + codes (VectorIndex.ensurePq): train/encode
      // once per JVM, the ADC scan reads the compressed parquet corpus
      val (cb, enc) = graft.operators.VectorIndex.ensurePq(s, s"$dir#pq4x16", {
        val book = graft.operators.PqIndex.train(e, m = 4, k = 16, iters = 3)
        (book, graft.operators.PqIndex.encode(e, book))
      })
      // FIXED probe universe (vec_id < 5000 = the full id space at the
      // largest test SF, so no output changes at any SF): each probe is
      // an exhaustive ADC scan — IndexPQ semantics, linear in corpus per
      // probe — so a probe set that grew with the corpus would make the
      // QUERY quadratic by benchmark construction (round-7 16× probe:
      // 91× wall). Query load is workload-determined, not
      // corpus-proportional; the scale path for corpus-sized probe sets
      // is the IVF coarse quantizer (q_ann_ivf).
      val probes = e.filter(col("vec_id") % 20 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("adist"), col("cand_id"))
      graft.operators.PqIndex.search(cb, enc, probes, topK = 4)
        .filter(col("probe_id") =!= col("cand_id"))
        .withColumn("rnk2", row_number().over(w))
        .filter(col("rnk2") <= 3)
        .select(col("probe_id"), col("cand_id"), r6(col("adist")).as("adist"),
          col("rnk2").as("rnk"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // The PQ path's HASH ANCHOR, symmetric with q_ivf_probe_stats: per
    // (subspace, code), the encode path's member count plus the search
    // path's integer-micro ADC table summed over all probes. Each
    // subspace codebook is the identical seeded integer-exact Lloyd
    // build, so the DuckDB oracle replays all FOUR subspace trainings
    // (m=4, k=16, 3 rounds each) in one chained-CTE query and
    // hash-matches bit for bit. With q_ann_pq's own full search replay
    // now oracle-checked too, this projection doubles as the small
    // fast-feedback anchor for the shared machinery.
    "q_pq_code_stats" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = t(s, dir, "embeddings")
      val (cb, enc) = graft.operators.VectorIndex.ensurePq(s, s"$dir#pq4x16", {
        val book = graft.operators.PqIndex.train(e, m = 4, k = 16, iters = 3)
        (book, graft.operators.PqIndex.encode(e, book))
      })
      // FIXED probe universe — see q_ann_ivf
      val probes = e.filter(col("vec_id") % 20 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.operators.PqIndex.codeStats(cb, enc, probes)
        .orderBy(col("s"), col("code"))
    }),

    // SQ8 ANN — the scalar-quantization member of the index family
    // (operators.SqIndex): per-dim 8-bit codes against trained [lo, hi]
    // bounds (FAISS IndexScalarQuantizer QT_8bit), searched by exact
    // squared-L2 against the RECONSTRUCTION. Sits between brute force
    // (no compression) and PQ (subspace codebooks): 4× memory cut, no
    // codebook training, and — like PQ — the float corpus stays cold at
    // query time. FULLY oracle-checked: train (per-dim min/max), encode
    // (double-exact half-up quantize), decode and the integer-micro
    // distance rank all replay bit-for-bit in DuckDB (no Lloyd chain
    // needed — the quantizer here is just the bound table). Same fixed
    // probe universe and two-stage top-(k+1) → drop-self → top-k ranking
    // as q_ann_pq. Persisted via VectorIndex.ensureSq: bounds + codes
    // land as parquet, consumers price at read-back cost.
    "q_ann_sq8" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = t(s, dir, "embeddings")
      val (b, codes) = graft.operators.VectorIndex.ensureSq(s, s"$dir#sq8", {
        val bounds = graft.operators.SqIndex.train(e)
        (bounds, graft.operators.SqIndex.encode(e, bounds))
      })
      // FIXED probe universe — see q_ann_ivf
      val probes = e.filter(col("vec_id") % 20 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("adist"), col("cand_id"))
      graft.operators.SqIndex.search(b, codes, probes, topK = 4)
        .filter(col("probe_id") =!= col("cand_id"))
        .withColumn("rnk2", row_number().over(w))
        .filter(col("rnk2") <= 3)
        .select(col("probe_id"), col("cand_id"), r6(col("adist")).as("adist"),
          col("rnk2").as("rnk"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // The k-means family's HASH ANCHOR: per-probe probed cells (rank
    // order) + each cell's member count, from the DataFrame-native Lloyd
    // build. Every input is deterministic — seeded lowest-vec_id init,
    // EXACT integer-decimal centroid means (order-invariant at any
    // partitioning), the portable graft_fdot fold — so the DuckDB oracle
    // replays all three Lloyd rounds in chained CTEs and hash-matches
    // bit for bit. Historically this was the k-means path's only hash
    // anchor; q_ann_ivf's full search replay is now oracle-checked as
    // well, and this projection remains as the funnel-shape check
    // (probed cells + member counts) the search output doesn't expose.
    "q_ivf_probe_stats" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = t(s, dir, "embeddings")
      val index = graft.operators.VectorIndex.ensureIvf(s, s"$dir#ivf8",
        graft.operators.IvfIndex.buildLloyd(e, k = 8, iters = 3))
      // FIXED probe universe — see q_ann_ivf
      val probes = e.filter(col("vec_id") % 20 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.operators.IvfIndex.probeStats(index, probes, nProbe = 2)
        .orderBy(col("probe_id"), col("cell_rnk"))
    }),

    // Incremental vector-index ingest — the ANN twin of
    // q_dedup_index_update: the quantizer trains (and persists) on the
    // 90% base corpus, then the 10% batch is ADDED against the FROZEN
    // centroids (VectorIndex.addIvf — FAISS IndexIVF.add semantics; one
    // broadcast-assign pass over the batch, the base corpus never
    // rescans or retrains) and the extended index's full assignment is
    // emitted. The DuckDB oracle recomputes everything from scratch —
    // replays base-corpus Lloyd, then assigns the batch against the
    // final centroids — so the hash proves an added vector lands in
    // exactly the cell a from-scratch assignment would give it at every
    // SF. Deliberately NOT add ≡ full-retrain (a retrained k-means moves
    // every centroid — see VectorIndex's scaladoc for why that contract
    // is wrong for a trained quantizer, unlike DedupIndex's exact
    // min-label repair).
    "q_ann_index_update" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = t(s, dir, "embeddings")
      val base = e.filter(col("vec_id") % 10 =!= 0)
      val batch = e.filter(col("vec_id") % 10 === 0)
      val ix = graft.operators.VectorIndex.ensureIvf(s, s"$dir#ivfBase90",
        graft.operators.IvfIndex.buildLloyd(base, k = 8, iters = 3))
      val added = graft.operators.VectorIndex.addIvf(s, ix, batch)
      val ext = graft.operators.VectorIndex.extendIvf(ix, added)
      ext.assignments
        .withColumn("src",
          when(col("vec_id") % 10 === 0, lit("batch")).otherwise(lit("base")))
        .select(col("vec_id"), col("cluster"), col("src"))
        .orderBy(col("vec_id"))
    }),

    // PQ incremental ingest — the compression twin of q_ann_index_update:
    // codebooks train (and persist) on the 90% base corpus, the 10%
    // batch is ENCODED against the FROZEN codebooks (VectorIndex.addPq —
    // FAISS IndexPQ.add semantics; m broadcast-assign passes over the
    // batch only). Output is the columnar code table (vec_id, s, code)
    // for base ∪ batch; the oracle recomputes everything from scratch —
    // replays all four base-corpus subspace Lloyds, re-derives base
    // codes from the final assignments, and assigns each batch subvector
    // against the final subspace centroids — so the hash proves an added
    // vector compresses to exactly the codes a from-scratch encode
    // against the same codebooks would give it.
    "q_pq_index_update" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = t(s, dir, "embeddings")
      val base = e.filter(col("vec_id") % 10 =!= 0)
      val batch = e.filter(col("vec_id") % 10 === 0)
      val (cb, baseCodes) = graft.operators.VectorIndex.ensurePq(s, s"$dir#pqBase90", {
        val book = graft.operators.PqIndex.train(base, m = 4, k = 16, iters = 3)
        (book, graft.operators.PqIndex.encode(base, book))
      })
      val added = graft.operators.VectorIndex.addPq(cb, batch)
      baseCodes.withColumn("src", lit("base"))
        .unionByName(added.withColumn("src", lit("batch")))
        .select(col("vec_id"), col("src"),
          posexplode(col("codes")).as(Seq("s", "code")))
        .select(col("vec_id"), col("s"), col("code"), col("src"))
        .orderBy(col("vec_id"), col("s"))
    }),

    // REAL multimodal decode — the family's former thinnest member, now
    // decoding two actual public image formats (PPM P6 + 24bpp BMP) in
    // pure JVM: deterministic planted fixtures (dims and every pixel
    // byte derive from doc_id; even ids PPM, odd BMP, every 17th
    // truncated mid-payload) run through the magic-dispatching decoder
    // per-partition, emitting width/height/exact channel sums — all
    // integers the DuckDB oracle recomputes in closed form WITHOUT a
    // decoder. The corrupt path (ok = 0, zeroed metadata, no exception)
    // is oracle-checked too.
    "q_image_meta" -> ((s, dir) => {
      val blobs = graft.operators.ImageCodec.plantImages(t(s, dir, "documents"))
      graft.operators.ImageCodec.extractImageMeta(blobs, "doc_id", "blob")
        .toDF()
        .select(col("doc_id"), col("fmt"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"),
          col("ok").cast("int").as("ok"))
        .orderBy(col("doc_id"))
    }),

    // REAL audio decode — RIFF/WAVE PCM16 chunk walker (AudioCodec), the
    // audio sibling of q_image_meta: deterministic planted clips (length,
    // rate and every sample derive from doc_id; every 19th truncated
    // mid-payload) decoded per-partition into rate / exact sample count /
    // integer duration / Σ|sample| / peak — all integers the DuckDB
    // oracle recomputes via generate_series WITHOUT a decoder. The
    // corrupt path (ok = 0, zeroed metadata, no exception) is
    // oracle-checked too.
    "q_audio_meta" -> ((s, dir) => {
      val blobs = graft.operators.AudioCodec.plantAudio(t(s, dir, "documents"))
      graft.operators.AudioCodec.extractAudioMeta(blobs, "doc_id", "blob")
        .toDF()
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("duration_ms"), col("sum_abs"), col("peak"),
          col("ok").cast("int").as("ok"))
        .orderBy(col("doc_id"))
    }),

    // Multimodal RESIZE — nearest-neighbor 4×4 thumbnail over the real
    // image codec: sample (tx,ty) = source pixel (tx·w div 4, ty·h div 4)
    // of the logical RGB plane, identical across PPM and BMP (the BMP
    // accessor maps padded bottom-up BGR rows back). FIXED output size
    // (16 pixels/image) whatever the source dims — the bounded-feature
    // property a training pipeline needs from resize — and pure integer
    // index arithmetic, so the oracle replays every sampled byte in
    // closed form from the planted fixtures. Corrupt blobs (every 17th,
    // truncated) contribute zero rows, never an exception.
    "q_image_resize" -> ((s, dir) => {
      val blobs = graft.operators.ImageCodec.plantImages(t(s, dir, "documents"))
      graft.operators.ImageCodec.extractThumbnails(blobs, "doc_id", "blob", side = 4)
        .toDF()
        .select(col("doc_id"), col("tx"), col("ty"),
          col("r"), col("g"), col("b"))
        .orderBy(col("doc_id"), col("ty"), col("tx"))
    }),

    // Strided frame sampling — the audio analog of video frame-sampling:
    // each decodable clip yields exactly maxFrames evenly-spaced probe
    // samples (stride = ceil(n/maxFrames)), a FIXED-size feature
    // regardless of clip length, so downstream batch shape is bounded at
    // any corpus scale. posexplode keeps the per-frame ordinal;
    // sample_idx is recomputed in-plan (integer div, stride interpolated
    // from AudioCodec.maxFrames so the decoder and this walk cannot
    // desync) and the oracle replays both the stride walk and the sample
    // values in closed form.
    "q_audio_frames" -> ((s, dir) => {
      val mf = graft.operators.AudioCodec.maxFrames
      val blobs = graft.operators.AudioCodec.plantAudio(t(s, dir, "documents"))
      graft.operators.AudioCodec.extractAudioMeta(blobs, "doc_id", "blob")
        .toDF()
        .filter(col("ok"))
        .select(col("doc_id"), col("n_samples"),
          posexplode(col("frames")).as(Seq("frame_idx", "value")))
        .select(col("doc_id"), col("frame_idx"),
          expr(s"frame_idx * ((n_samples + ${mf - 1}) div $mf)").as("sample_idx"),
          col("value"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Multimodal plumbing: opaque binary payload + typed metadata columns
    // — the Spark-side schema / batch shape contract, locked down here
    // with byte-level features; the REAL decoders live in
    // graft.operators.{ImageCodec, AudioCodec} (mapPartitions, so codec
    // init amortizes per batch of rows).
    "q_multimodal_meta" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("blob", expr("encode(text, 'UTF-8')"))
        .select(col("doc_id"),
          length(col("blob")).as("n_bytes"),
          lower(hex(expr("substring(blob, 1, 4)"))).as("head_hex"),
          expr("ascii(substring(text, 1, 1))").as("first_byte"),
          col("source"))
        .orderBy(col("doc_id"))
    }),

    // Int8 scalar quantization — the standard vector-store compression
    // (4 bytes → 1 per dim): per-DIM min/max over the corpus (a 64-row
    // broadcast), then floor((v−min)/(max−min)·255) clamped to 255.
    // Everything is elementwise IEEE double arithmetic on identical
    // inputs (sub/div/mul are correctly rounded, floor exact, NO float
    // summation anywhere), so the bytes are bit-portable across engines
    // and partitionings. Output is one row per (vec, dim) — the columnar
    // layout a quantized index writer produces.
    "q_embed_quantize" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast("long").as("dim"),
          col("col").cast("double").as("v"))
      val stats = e.groupBy(col("dim"))
        .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      e.join(broadcast(stats), "dim")
        .select(col("vec_id"), col("dim"),
          when(col("vmax") === col("vmin"), lit(0L))
            .otherwise(least(lit(255L),
              floor((col("v") - col("vmin")) / (col("vmax") - col("vmin")) * 255)))
            .as("q"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    // Johnson–Lindenstrauss random projection 64→8 dims: signs come from
    // the portable integer hash (oracle reproduces the matrix bit for
    // bit) and each component accumulates in micro-scaled BIGINTs, so
    // the sum is order-independent — the kernel and DuckDB's unordered
    // SUM agree exactly. Map-only per row via the fused codegen
    // graft_jlproj expression (the nested-HOF twin costs ~k·dim
    // interpreted lambda calls per row — JlProjectSpec pins bit-parity
    // between the two and the oracle); the projection that makes
    // downstream ANN affordable at 100 TB.
    "q_jl_projection" -> ((s, dir) => {
      GraftExtensions.register(s)
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(expr("graft_jlproj(embedding, 8)")))
        .select(col("vec_id"), col("pos").cast("long").as("j"),
          round(col("col") / 1000000.0, 6).as("proj"))
        .orderBy(col("vec_id"), col("j"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_jl_projection" ->
      """WITH u AS (
        |  SELECT vec_id, unnest(embedding) AS v,
        |    generate_subscripts(embedding, 1) - 1 AS i
        |  FROM embeddings
        |), s AS (
        |  SELECT vec_id, js.j,
        |    SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
        |      * CASE WHEN (js.j * 256 + i) % 1000000007 * 2654435761
        |                  % 1000000007 % 2 = 0
        |        THEN 1 ELSE -1 END) AS acc
        |  FROM u CROSS JOIN (SELECT unnest(range(0, 8)) AS j) js
        |  GROUP BY vec_id, js.j
        |)
        |SELECT vec_id, CAST(j AS BIGINT) AS j,
        |  ROUND(acc / 1000000.0, 6) AS proj
        |FROM s ORDER BY vec_id, j""".stripMargin,

    "q_embed_centroid" ->
      """WITH e AS (
        |  SELECT label, i - 1 AS pos,
        |    CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |)
        |SELECT label, CAST(pos AS INT) AS pos,
        |  CAST(SUM(v) * 1000000 AS BIGINT) AS sum_micro6,
        |  COUNT(*) AS n
        |FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q_cosine_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${dotDuck("embedding", "embedding")} AS n2 FROM embeddings
         |), p AS (
         |  SELECT vec_id AS probe_id, embedding AS pe, n2 AS pn2 FROM e
         |  WHERE vec_id % 20 = 0 AND vec_id < 2000
         |), scored AS (
         |  SELECT probe_id, vec_id AS cand_id,
         |    ROUND(${dotDuck("pe", "embedding")} / (sqrt(pn2) * sqrt(n2)), 6) AS sim
         |  FROM p JOIN e ON vec_id <> probe_id
         |), ranked AS (
         |  SELECT *, CAST(row_number() OVER
         |    (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS INT) AS rnk
         |  FROM scored
         |)
         |SELECT probe_id, cand_id, sim, rnk FROM ranked WHERE rnk <= 3
         |ORDER BY probe_id, rnk""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH $bandedPairsDuck, cand AS (
         |  SELECT id_a AS probe_id, id_b AS cand_id FROM pairs WHERE id_a % 20 = 0
         |  UNION
         |  SELECT id_b AS probe_id, id_a AS cand_id FROM pairs WHERE id_b % 20 = 0
         |), scored AS (
         |  SELECT probe_id, cand_id,
         |    ROUND(${dotDuck("p.embedding", "c.embedding")} / (sqrt(p.n2) * sqrt(c.n2)), 6) AS sim
         |  FROM cand
         |  JOIN e p ON p.vec_id = probe_id
         |  JOIN e c ON c.vec_id = cand_id
         |), ranked AS (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rnk
         |  FROM scored
         |)
         |SELECT probe_id, cand_id, sim FROM ranked WHERE rnk = 1
         |ORDER BY probe_id""".stripMargin,

    "q_dedup_embedding" ->
      s"""WITH $bandedPairsDuck
         |SELECT id_a, id_b,
         |  ROUND(${dotDuck("a.embedding", "b.embedding")} / (sqrt(a.n2) * sqrt(b.n2)), 6) AS sim
         |FROM pairs JOIN e a ON a.vec_id = id_a JOIN e b ON b.vec_id = id_b
         |WHERE ROUND(${dotDuck("a.embedding", "b.embedding")} / (sqrt(a.n2) * sqrt(b.n2)), 6) >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    "q_embed_dedup_canon" ->
      s"""WITH u AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 500000 AS vec_id, embedding
         |  FROM embeddings WHERE vec_id % 40 = 0
         |), params AS (
         |  ${bandWidthDuck("u")}
         |), e AS (
         |  SELECT vec_id, ${rpBandsDuck("embedding")} AS sig
         |  FROM u CROSS JOIN params
         |)
         |SELECT min(vec_id) AS canonical_id, COUNT(*) AS n_members
         |FROM e GROUP BY sig HAVING COUNT(*) > 1
         |ORDER BY canonical_id""".stripMargin,

    "q_pq_code_stats" -> {
      val m = 4; val k = 16; val sub = 16
      val subs = (0 until m).map { s =>
        s"""sub$s AS (
           |  SELECT vec_id, embedding[${s * sub + 1}:${(s + 1) * sub}] AS embedding
           |  FROM embeddings
           |)""".stripMargin + ",\n" + lloydDuck(k.toString, 3, s"sub$s", s"s${s}_")
      }.mkString(",\n")
      val hists = (0 until m).map { s =>
        s"SELECT $s AS s, cluster AS code, COUNT(*) AS n_members FROM s${s}_afin GROUP BY cluster"
      }.mkString("\n  UNION ALL ")
      val adcs = (0 until m).map { s =>
        val psv = s"p.embedding[${s * sub + 1}:${(s + 1) * sub}]"
        s"""SELECT $s AS s, c.cluster AS code,
           |    CAST(SUM(CAST(floor((${dotDuck("c.cent", "c.cent")}
           |      - 2 * ${dotDuck(psv, "c.cent")}) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           |      AS adc_micro_sum
           |  FROM probes p CROSS JOIN s${s}_c3 c GROUP BY c.cluster""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH $subs,
         |probes AS (
         |  SELECT vec_id AS probe_id, embedding FROM embeddings
         |  WHERE vec_id % 20 = 0 AND vec_id < 5000
         |), hist AS (
         |  $hists
         |), adc AS (
         |  $adcs
         |)
         |SELECT CAST(a.s AS INT) AS s, CAST(a.code AS INT) AS code,
         |  CAST(COALESCE(h.n_members, 0) AS BIGINT) AS n_members,
         |  a.adc_micro_sum
         |FROM adc a LEFT JOIN hist h ON a.s = h.s AND a.code = h.code
         |ORDER BY s, code""".stripMargin
    },

    // Full IVF search replay: same Lloyd chain as q_ivf_probe_stats,
    // then the probe→cells→members→exact-cosine→top-k funnel. Ranking
    // runs on the RAW double sim (as the Spark plan does) — the dot
    // fold, sqrt and division are identical IEEE ops on identical
    // inputs, so order and ties agree; rounding to 6 dp happens after,
    // in the projection, exactly like the Spark side.
    "q_ann_ivf" ->
      s"""WITH ${lloydDuck("8", 3)},
         |probes AS (
         |  SELECT vec_id AS probe_id, embedding AS pe
         |  FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 5000
         |), cells AS (
         |  SELECT probe_id, cluster FROM (
         |    SELECT p.probe_id, c.cluster,
         |      row_number() OVER (PARTITION BY p.probe_id ORDER BY
         |        -${dotDuck("p.pe", "c.cent")}, c.cluster) AS rn
         |    FROM probes p CROSS JOIN c3 c) WHERE rn <= 2
         |), scored AS (
         |  SELECT p.probe_id, a.vec_id AS cand_id,
         |    ${dotDuck("p.pe", "a.embedding")} /
         |      (sqrt(${dotDuck("p.pe", "p.pe")}) *
         |       sqrt(${dotDuck("a.embedding", "a.embedding")})) AS sim
         |  FROM probes p
         |  JOIN cells cl ON cl.probe_id = p.probe_id
         |  JOIN afin a ON a.cluster = cl.cluster
         |  WHERE a.vec_id <> p.probe_id
         |), ranked AS (
         |  SELECT *, CAST(row_number() OVER
         |    (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS INT) AS rnk
         |  FROM scored
         |)
         |SELECT probe_id, cand_id, ROUND(sim, 6) AS sim, rnk
         |FROM ranked WHERE rnk <= 3
         |ORDER BY probe_id, rnk""".stripMargin,

    // SemDeDup replay: the scale-adaptive k (same ceil(n/64) clamp as
    // IvfIndex.adaptiveK, recomputed from DuckDB's own count(*)), the
    // q_ann_ivf Lloyd chain at that k, centroid-cosine per member, the
    // same within-cluster directed earlier-priority pairs, and the
    // paper's greedy EXISTS drop rule.
    "q_semdedup" ->
      s"""WITH ${lloydDuck(
             "(SELECT least(1048576, greatest(2, (count(*) + 63) // 64)) FROM embeddings)",
             3)},
         |cs AS (
         |  SELECT a.vec_id, a.cluster, a.embedding,
         |    ${dotDuck("a.embedding", "a.embedding")} AS n2,
         |    ROUND(${dotDuck("a.embedding", "c.cent")} /
         |      (sqrt(${dotDuck("a.embedding", "a.embedding")}) *
         |       sqrt(${dotDuck("c.cent", "c.cent")})), 6) AS csim
         |  FROM afin a JOIN c3 c ON a.cluster = c.cluster
         |), dups AS (
         |  SELECT x.vec_id, COUNT(*) AS n_dup_earlier
         |  FROM cs x JOIN cs y
         |    ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
         |    AND (y.csim < x.csim OR (y.csim = x.csim AND y.vec_id < x.vec_id))
         |  WHERE ROUND(${dotDuck("x.embedding", "y.embedding")} /
         |    (sqrt(x.n2) * sqrt(y.n2)), 6) >= 0.35
         |  GROUP BY 1
         |)
         |SELECT cs.vec_id, cs.cluster, cs.csim,
         |  COALESCE(d.n_dup_earlier, 0) AS n_dup_earlier,
         |  COALESCE(d.n_dup_earlier, 0) = 0 AS keep
         |FROM cs LEFT JOIN dups d USING (vec_id) ORDER BY cs.vec_id""".stripMargin,

    // Full PQ search replay: the q_pq_code_stats subspace-Lloyd chain,
    // codes from the final per-subspace assignments, per-probe
    // integer-micro ADC tables, BIGINT-exact distance sums, and the
    // Spark side's exact two-stage ranking (ADC top-4 → drop self →
    // top-3, both ordered by (adist_micro, cand_id)).
    "q_ann_pq" -> {
      val m = 4; val k = 16; val sub = 16
      val subs = (0 until m).map { s =>
        s"""sub$s AS (
           |  SELECT vec_id, embedding[${s * sub + 1}:${(s + 1) * sub}] AS embedding
           |  FROM embeddings
           |)""".stripMargin + ",\n" + lloydDuck(k.toString, 3, s"sub$s", s"s${s}_")
      }.mkString(",\n")
      val encs = (0 until m).map { s =>
        s"SELECT $s AS s, vec_id, cluster AS code FROM s${s}_afin"
      }.mkString("\n  UNION ALL ")
      val tabs = (0 until m).map { s =>
        val psv = s"p.pe[${s * sub + 1}:${(s + 1) * sub}]"
        s"""SELECT p.probe_id, $s AS s, c.cluster AS code,
           |    CAST(floor((${dotDuck("c.cent", "c.cent")}
           |      - 2 * ${dotDuck(psv, "c.cent")}) * 1000000 + 0.5) AS BIGINT)
           |      AS pdist_micro
           |  FROM probes p CROSS JOIN s${s}_c3 c""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH $subs,
         |probes AS (
         |  SELECT vec_id AS probe_id, embedding AS pe
         |  FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 5000
         |), enc AS (
         |  $encs
         |), tab AS (
         |  $tabs
         |), ad AS (
         |  SELECT t.probe_id, e.vec_id AS cand_id,
         |    CAST(SUM(t.pdist_micro) AS BIGINT) AS adist_micro
         |  FROM enc e JOIN tab t ON t.s = e.s AND t.code = e.code
         |  GROUP BY t.probe_id, e.vec_id
         |), r1 AS (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY probe_id ORDER BY adist_micro, cand_id) AS rnk1
         |  FROM ad
         |), r2 AS (
         |  SELECT *, CAST(row_number() OVER
         |    (PARTITION BY probe_id ORDER BY adist_micro, cand_id) AS INT) AS rnk
         |  FROM r1 WHERE rnk1 <= 4 AND probe_id <> cand_id
         |)
         |SELECT probe_id, cand_id,
         |  ROUND(CAST(adist_micro AS DOUBLE) / 1000000.0, 6) AS adist, rnk
         |FROM r2 WHERE rnk <= 3
         |ORDER BY probe_id, rnk""".stripMargin
    },

    // Full SQ8 replay: per-dim min/max bounds, the identical double-
    // exact half-up quantize + decode (operand order mirrored from
    // SqIndex.encodeSql/decodeSql so every IEEE op matches), the same
    // pn2 − 2·dot + rn2 squared-L2 against the reconstruction quantized
    // to integer micros per pair, and the Spark side's exact two-stage
    // ranking (top-4 → drop self → top-3 by (dist_micro, cand_id)).
    "q_ann_sq8" ->
      s"""WITH bounds AS (
         |  SELECT i, min(embedding[i]) AS lo, max(embedding[i]) AS hi
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
         |  GROUP BY i
         |), blist AS (
         |  SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi FROM bounds
         |), rec AS (
         |  SELECT vec_id AS cand_id,
         |    list_transform(generate_series(1, len(embedding)), i ->
         |      CAST(CAST(lo[i] AS DOUBLE) + CAST((CASE
         |        WHEN hi[i] <= lo[i] THEN 0
         |        ELSE CAST(least(255.0, greatest(0.0, floor(
         |          (CAST(embedding[i] AS DOUBLE) - CAST(lo[i] AS DOUBLE)) /
         |          (CAST(hi[i] AS DOUBLE) - CAST(lo[i] AS DOUBLE)) * 255.0 + 0.5))) AS INT)
         |        END) AS DOUBLE) / 255.0 *
         |        (CAST(hi[i] AS DOUBLE) - CAST(lo[i] AS DOUBLE)) AS FLOAT)) AS rvec
         |  FROM embeddings CROSS JOIN blist
         |), probes AS (
         |  SELECT vec_id AS probe_id, embedding AS pe
         |  FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 5000
         |), ad AS (
         |  SELECT p.probe_id, r.cand_id,
         |    CAST(floor((${dotDuck("p.pe", "p.pe")}
         |      - 2.0 * ${dotDuck("p.pe", "r.rvec")}
         |      + ${dotDuck("r.rvec", "r.rvec")}) * 1000000 + 0.5) AS BIGINT)
         |      AS dist_micro
         |  FROM rec r CROSS JOIN probes p
         |), r1 AS (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY probe_id ORDER BY dist_micro, cand_id) AS rnk1
         |  FROM ad
         |), r2 AS (
         |  SELECT *, CAST(row_number() OVER
         |    (PARTITION BY probe_id ORDER BY dist_micro, cand_id) AS INT) AS rnk
         |  FROM r1 WHERE rnk1 <= 4 AND probe_id <> cand_id
         |)
         |SELECT probe_id, cand_id,
         |  ROUND(CAST(dist_micro AS DOUBLE) / 1000000.0, 6) AS adist, rnk
         |FROM r2 WHERE rnk <= 3
         |ORDER BY probe_id, rnk""".stripMargin,

    "q_ivf_probe_stats" ->
      s"""WITH ${lloydDuck("8", 3)},
         |probes AS (
         |  SELECT vec_id AS probe_id, embedding AS pe
         |  FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 5000
         |), cells AS (
         |  SELECT probe_id, cluster, CAST(rn AS INT) AS cell_rnk FROM (
         |    SELECT p.probe_id, c.cluster,
         |      row_number() OVER (PARTITION BY p.probe_id ORDER BY
         |        -${dotDuck("p.pe", "c.cent")}, c.cluster) AS rn
         |    FROM probes p CROSS JOIN c3 c) WHERE rn <= 2
         |), hist AS (
         |  SELECT cluster, COUNT(*) AS n_members FROM afin GROUP BY cluster
         |)
         |SELECT probe_id, cell_rnk, cluster,
         |  CAST(COALESCE(n_members, 0) AS BIGINT) AS n_members
         |FROM cells LEFT JOIN hist USING (cluster)
         |ORDER BY probe_id, cell_rnk""".stripMargin,

    // From-scratch recomputation of the incremental-add result: replay
    // base-corpus Lloyd, then assign the batch against the FINAL
    // centroids (the frozen-quantizer add contract).
    "q_ann_index_update" ->
      s"""WITH base AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0
         |),
         |${lloydDuck("8", 3, "base")},
         |batch AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0
         |), badd AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, c.cluster,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dotDuck("c.cent", "c.cent")} - 2 * ${dotDuck("e.embedding", "c.cent")},
         |        c.cluster) AS rn
         |    FROM batch e CROSS JOIN c3 c) WHERE rn = 1
         |)
         |SELECT vec_id, cluster, 'base' AS src FROM afin
         |UNION ALL
         |SELECT vec_id, cluster, 'batch' AS src FROM badd
         |ORDER BY vec_id""".stripMargin,

    // From-scratch recomputation of the PQ incremental-add result:
    // replay the four base-corpus subspace Lloyds, take base codes from
    // the final assignments, assign batch subvectors against the final
    // subspace centroids (the frozen-codebook add contract).
    "q_pq_index_update" -> {
      val m = 4; val k = 16; val sub = 16
      val subs = (0 until m).map { j =>
        s"""bsub$j AS (
           |  SELECT vec_id, embedding[${j * sub + 1}:${(j + 1) * sub}] AS embedding
           |  FROM embeddings WHERE vec_id % 10 <> 0
           |)""".stripMargin + ",\n" + lloydDuck(k.toString, 3, s"bsub$j", s"b${j}_")
      }.mkString(",\n")
      val baseCodes = (0 until m).map { j =>
        s"SELECT vec_id, $j AS s, cluster AS code, 'base' AS src FROM b${j}_afin"
      }.mkString("\n  UNION ALL ")
      val batchCodes = (0 until m).map { j =>
        s"""SELECT vec_id, $j AS s, cluster AS code, 'batch' AS src FROM (
           |    SELECT e.vec_id, c.cluster,
           |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |        ${dotDuck("c.cent", "c.cent")} - 2 * ${dotDuck("e.embedding", "c.cent")},
           |        c.cluster) AS rn
           |    FROM (SELECT vec_id, embedding[${j * sub + 1}:${(j + 1) * sub}] AS embedding
           |          FROM embeddings WHERE vec_id % 10 = 0) e
           |      CROSS JOIN b${j}_c3 c) WHERE rn = 1""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH $subs
         |SELECT vec_id, CAST(s AS INT) AS s, code, src FROM (
         |  $baseCodes
         |  UNION ALL $batchCodes
         |)
         |ORDER BY vec_id, s""".stripMargin
    },

    "q_image_meta" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 13 AS INT) AS w,
        |    CAST(3 + doc_id % 7 AS INT) AS h,
        |    (doc_id % 17 = 0) AS corrupt,
        |    CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt
        |  FROM documents
        |), px AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN i % 3 = 0 THEN (doc_id * 31 + i) % 256 ELSE 0 END) AS BIGINT) AS sum_r,
        |    CAST(SUM(CASE WHEN i % 3 = 1 THEN (doc_id * 31 + i) % 256 ELSE 0 END) AS BIGINT) AS sum_g,
        |    CAST(SUM(CASE WHEN i % 3 = 2 THEN (doc_id * 31 + i) % 256 ELSE 0 END) AS BIGINT) AS sum_b
        |  FROM d, unnest(generate_series(0, w * h * 3 - 1)) AS t(i)
        |  WHERE NOT corrupt
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id, d.fmt,
        |  CASE WHEN corrupt THEN 0 ELSE w END AS width,
        |  CASE WHEN corrupt THEN 0 ELSE h END AS height,
        |  COALESCE(sum_r, 0) AS sum_r,
        |  COALESCE(sum_g, 0) AS sum_g,
        |  COALESCE(sum_b, 0) AS sum_b,
        |  CAST(NOT corrupt AS INT) AS ok
        |FROM d LEFT JOIN px USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_image_resize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 13 AS INT) AS w,
        |    CAST(3 + doc_id % 7 AS INT) AS h
        |  FROM documents
        |  WHERE doc_id % 17 <> 0
        |), g AS (
        |  SELECT doc_id, w, h,
        |    CAST(i % 4 AS INT) AS tx, CAST(i // 4 AS INT) AS ty
        |  FROM d, unnest(generate_series(0, 15)) AS t(i)
        |), p AS (
        |  SELECT doc_id, tx, ty,
        |    ((ty * h // 4) * w + (tx * w // 4)) * 3 AS base
        |  FROM g
        |)
        |SELECT doc_id, tx, ty,
        |  CAST((doc_id * 31 + base) % 256 AS INT) AS r,
        |  CAST((doc_id * 31 + base + 1) % 256 AS INT) AS g,
        |  CAST((doc_id * 31 + base + 2) % 256 AS INT) AS b
        |FROM p ORDER BY doc_id, ty, tx""".stripMargin,

    "q_audio_meta" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(200 + doc_id % 301 AS BIGINT) AS n,
        |    CAST(8000 * (1 + doc_id % 3) AS INT) AS sr,
        |    (doc_id % 19 = 0) AS corrupt
        |  FROM documents
        |), s AS (
        |  SELECT doc_id,
        |    ABS(((doc_id * 7919 + i * 104729) % 65536) - 32768) AS a
        |  FROM d, unnest(generate_series(0, n - 1)) AS t(i)
        |  WHERE NOT corrupt
        |), agg AS (
        |  SELECT doc_id, CAST(SUM(a) AS BIGINT) AS sum_abs,
        |    CAST(MAX(a) AS INT) AS peak
        |  FROM s GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN corrupt THEN 0 ELSE sr END AS INT) AS sample_rate,
        |  CAST(CASE WHEN corrupt THEN 0 ELSE 1 END AS INT) AS channels,
        |  CAST(CASE WHEN corrupt THEN 0 ELSE n END AS BIGINT) AS n_samples,
        |  CAST(CASE WHEN corrupt THEN 0 ELSE n * 1000 // sr END AS BIGINT) AS duration_ms,
        |  COALESCE(sum_abs, 0) AS sum_abs,
        |  COALESCE(peak, 0) AS peak,
        |  CAST(NOT corrupt AS INT) AS ok
        |FROM d LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // stride/frame-count literals interpolated from AudioCodec.maxFrames
    // so a codec retune cannot silently desync decoder, plan and oracle
    "q_audio_frames" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(200 + doc_id % 301 AS BIGINT) AS n,
        |    (n + ${graft.operators.AudioCodec.maxFrames - 1}) // ${graft.operators.AudioCodec.maxFrames} AS stride
        |  FROM documents
        |  WHERE doc_id % 19 <> 0
        |)
        |SELECT doc_id,
        |  CAST(j AS INT) AS frame_idx,
        |  CAST(j * stride AS BIGINT) AS sample_idx,
        |  CAST(((doc_id * 7919 + j * stride * 104729) % 65536) - 32768 AS INT) AS value
        |FROM d, unnest(generate_series(0, ${graft.operators.AudioCodec.maxFrames - 1})) AS t(j)
        |WHERE j * stride < n
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  lower(hex(encode(substring(text, 1, 4)))) AS head_hex,
        |  ascii(substring(text, 1, 1)) AS first_byte,
        |  source
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, unnest(generate_series(1, len(embedding))) - 1 AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |), st AS (
        |  SELECT dim, min(v) AS vmin, max(v) AS vmax FROM e GROUP BY dim
        |)
        |SELECT vec_id, dim,
        |  CASE WHEN vmax = vmin THEN 0
        |    ELSE CAST(least(255, floor((v - vmin) / (vmax - vmin) * 255)) AS BIGINT)
        |  END AS q
        |FROM e JOIN st USING (dim)
        |ORDER BY vec_id, dim""".stripMargin
  )
}
