package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Materialize.CutSyntax
import graft.Tables
import graft.QueryKit._
import graft.ml.{GroupedFolds, PercentageCalc}

/** ML-adjacent operators with deterministic semantics, oracle-checked:
  * the custom PercentageCalc Estimator (SURVEY.md §2.12), the
  * group-aware fold assignment, and a Naive Bayes classifier whose
  * ENTIRE fitted model is integer counts and therefore cross-engine
  * oracle-able. Gradient-fitted model training (LR/GBT/RF/PCA) is
  * covered in MlSpec — no cross-engine oracle exists for iteratively
  * fitted float coefficients, which is exactly why the NB member
  * matters: it is the trained-and-served model the oracle CAN replay.
  * q_auc_exact is the evaluation-side twin: tie-corrected Mann–Whitney
  * ROC-AUC where every term is an exact integer (MLlib's evaluator
  * stays spec-gated; this one hash-matches cross-engine).
  */
object MlQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PercentageCalc end-to-end: fit per-user totals on events, transform.
    "q_percentage_calc" -> ((s, dir) => {
      val base = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val model = new PercentageCalc()
        .setByGroup("user_id").setVariables(Array("value")).setConstant(15.0)
        .fit(base)
      model.transform(base)
        .select(col("event_id"), col("user_id"), r6(col("value")).as("value_pct"))
        .orderBy(col("event_id"))
    }),

    // Multinomial Naive Bayes language classifier, trained AND served
    // inside one plan with a DuckDB oracle replaying the ENTIRE fitted
    // model — the counterexample to "no cross-engine oracle exists for
    // fitted coefficients": with Laplace smoothing the model is pure
    // integer counts, so P(w|l) = (c(w,l)+1)/(N_l+V) and the class
    // prior are single exact divisions, log-terms round at 6 dp into an
    // exact DECIMAL accumulator (the q_lm_kneser discipline), and the
    // argmax compares decimals with a lang tie-break — bit-identical
    // prediction in both engines. Honest held-out protocol: train on
    // doc_id % 5 ≠ 0, predict the % 5 = 0 docs. Scale shape: the
    // (lang, token)-count model shuffles on its own key (vocab×L-bounded,
    // NOT broadcast — at 100 TB the vocabulary table is large), while
    // the 5-row lang dim, one-row vocab size/doc total, and L-row
    // priors broadcast; test tokens fan out ×L through a broadcast
    // cross join — linear in corpus size. On the synthetic corpus the
    // held-out accuracy is ~0.40 vs the 0.20 five-class chance floor —
    // honest, because TESTDATA's generator draws every lang from the
    // SAME 31-token vocabulary (only frequency skew separates classes);
    // the query's contract is the bit-exact cross-engine replay of a
    // trained classifier, not benchmark accuracy.
    "q_nb_lang" -> ((s, dir) => {
      import graft.functions.TextAnalytics.tokenHashesSpark
      import org.apache.spark.sql.expressions.Window
      // Spread ahead of the tokenize front (r15 F1 fix; identity at
      // production row-group counts)
      val toks = graft.operators.Spread
        .byKey(t(s, dir, "documents"), col("doc_id"))
        .withColumn("th", expr(tokenHashesSpark("text")))
        .select(col("doc_id"), col("lang"), explode(col("th")).as("h"))
        // train counts + test scoring share ONE reused exchange on h
        // (the (lang,h) groupBy reuses h-partitioning: h ⊂ its keys);
        // loss recovery is plain shuffle recompute — no lineage cut
        .repartition(col("h"))
      val train = toks.filter(col("doc_id") % 5 =!= 0)
      val cwl = train.groupBy(col("lang").as("plang"), col("h"))
        .agg(count(lit(1)).as("cwl"))
      val nlp = train.groupBy(col("lang").as("plang"))
        .agg(count(lit(1)).as("nl"))
      val vocab = train.agg(countDistinct(col("h")).as("vv"))
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val trainDocs = docs.filter(col("doc_id") % 5 =!= 0)
      val prior = trainDocs.groupBy(col("lang").as("plang"))
        .agg(count(lit(1)).as("ndl"))
        .crossJoin(broadcast(trainDocs.agg(count(lit(1)).as("nd"))))
        .select(col("plang"),
          r6(log(col("ndl").cast("double") / col("nd").cast("double")))
            .as("prior"))
      val scored = toks.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("h"))
        .crossJoin(broadcast(prior.select(col("plang"))))
        .join(cwl, Seq("plang", "h"), "left")
        .join(broadcast(nlp), Seq("plang"))
        .crossJoin(broadcast(vocab))
        .withColumn("term", r6(log(
          (coalesce(col("cwl"), lit(0L)) + 1).cast("double") /
            (col("nl") + col("vv")).cast("double"))))
      val perLang = scored.groupBy(col("doc_id"), col("plang"))
        .agg(sum(col("term").cast("decimal(18,6)")).as("tsum"))
        .join(broadcast(prior), Seq("plang"))
        .withColumn("score", col("tsum") + col("prior").cast("decimal(18,6)"))
      perLang
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("plang"))))
        .filter(col("rnk") === 1)
        .join(docs.filter(col("doc_id") % 5 === 0), Seq("doc_id"))
        .select(col("doc_id"), col("plang").as("pred_lang"),
          col("score").cast("double").as("nb_score"),
          col("lang").as("true_lang"),
          (col("plang") === col("lang")).as("correct"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic group-fold assignment (crc32-based, engine-portable).
    "q_grouped_folds" -> ((s, dir) => {
      GroupedFolds.withFold(
        t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        "c_nationkey", 5)
        .orderBy(col("c_custkey"))
    }),

    // EXACT ROC-AUC at scale — Mann–Whitney with full tie correction,
    // zero sort of raw rows: AUC·2·n⁺·n⁻ = Σ over score groups of
    // c⁺·(2·negBelow + c⁻), every term an exact integer, so the one
    // float step is the final division (MLlib's evaluator stays
    // spec-gated in MlSpec; this is the oracle-checkable twin). The
    // scored task: rank label-0 embeddings by cosine to the label-0
    // centroid (the q_embed_centroid exact-decimal mean; resubstitution
    // protocol, documented — the score only needs to be deterministic
    // for the AUC machinery to be exercised). negBelow comes from the
    // KS-test decomposition: equi-depth buckets over the per-SCORE
    // group frame, bucket-offset prefix + bucket-local window — the
    // only global window runs over the 64-row bucket table, never data.
    "q_auc_exact" -> ((s, dir) => {
      graft.expressions.GraftExtensions.register(s)
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "embeddings")
      val cent = e.filter(col("label") === 0)
        .select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("pos"))
        .agg((sum(round(col("v").cast("double"), 6).cast("decimal(18,6)")) *
          lit(1000000)).cast("long").as("micro"),
          count(lit(1)).as("n"))
        .select(col("pos"), (col("micro").cast("double") / lit(1000000.0) /
          col("n").cast("double")).as("c"))
      val scored = e
        .withColumn("n2", expr("graft_fdot(embedding, embedding)"))
        .select(col("vec_id"), col("label"), col("n2"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .join(broadcast(cent), Seq("pos"))
        .groupBy(col("vec_id"), col("label"), col("n2"))
        .agg(sum(round(col("v").cast("double") * col("c"), 6)
          .cast("decimal(18,6)")).as("dot"))
        .select(col("label"),
          r6(col("dot").cast("double") / sqrt(col("n2"))).as("score"))
      val g = scored.groupBy(col("score"))
        .agg(sum((col("label") === 0).cast("long")).as("cpos"),
          sum((col("label") =!= 0).cast("long")).as("cneg"))
      val b = graft.operators.RangeBuckets
        .withEquiDepthBucket(g, "score", "bucket")
        .repartition(col("bucket"))
      val wOff = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = b.groupBy(col("bucket")).agg(sum(col("cneg")).as("bn"))
        .withColumn("offn", coalesce(sum(col("bn")).over(wOff), lit(0L)))
        .select(col("bucket"), col("offn"))
      val wLoc = Window.partitionBy(col("bucket")).orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      b.join(broadcast(off), Seq("bucket"))
        .withColumn("negbelow",
          coalesce(sum(col("cneg")).over(wLoc), lit(0L)) + col("offn"))
        .groupBy()
        .agg(sum(col("cpos")).as("npos"), sum(col("cneg")).as("nneg"),
          sum(col("cpos") * (lit(2) * col("negbelow") + col("cneg"))).as("u2"))
        .select(col("npos"), col("nneg"), col("u2"),
          r6(col("u2").cast("double") /
            (lit(2) * col("npos") * col("nneg")).cast("double")).as("auc"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_auc_exact" -> {
      import graft.functions.TextAnalytics.dotDuck
      s"""WITH cent AS (
         |  SELECT i - 1 AS pos,
         |    CAST(CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6)
         |        AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE)
         |      / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS c
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
         |  WHERE label = 0 GROUP BY 1
         |), scored AS (
         |  SELECT e.label,
         |    ROUND(CAST(SUM(CAST(ROUND(CAST(e.embedding[cent.pos + 1] AS DOUBLE)
         |        * cent.c, 6) AS DECIMAL(18,6))) AS DOUBLE)
         |      / sqrt(${dotDuck("e.embedding", "e.embedding")}), 6) AS score
         |  FROM embeddings e CROSS JOIN cent
         |  GROUP BY e.vec_id, e.label, e.embedding
         |), g AS (
         |  SELECT score,
         |    SUM(CAST(label = 0 AS BIGINT)) AS cpos,
         |    SUM(CAST(label <> 0 AS BIGINT)) AS cneg
         |  FROM scored GROUP BY 1
         |), pr AS (
         |  SELECT cpos, cneg,
         |    COALESCE(SUM(cneg) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS negbelow
         |  FROM g
         |)
         |SELECT CAST(SUM(cpos) AS BIGINT) AS npos,
         |  CAST(SUM(cneg) AS BIGINT) AS nneg,
         |  CAST(SUM(cpos * (2 * negbelow + cneg)) AS BIGINT) AS u2,
         |  ROUND(CAST(SUM(cpos * (2 * negbelow + cneg)) AS DOUBLE) /
         |    CAST(2 * SUM(cpos) * SUM(cneg) AS DOUBLE), 6) AS auc
         |FROM pr""".stripMargin
    },

    "q_nb_lang" -> {
      import graft.functions.TextAnalytics.tokenHashesDuck
      s"""WITH th AS (
         |  SELECT doc_id, lang, ${tokenHashesDuck("text")} AS th FROM documents
         |), p AS (
         |  SELECT doc_id, lang, unnest(th) AS h FROM th
         |), tr AS (
         |  SELECT * FROM p WHERE doc_id % 5 <> 0
         |), cwl AS (
         |  SELECT lang AS plang, h, COUNT(*) AS cwl FROM tr GROUP BY 1, 2
         |), nl AS (
         |  SELECT lang AS plang, COUNT(*) AS nl FROM tr GROUP BY 1
         |), vv AS (
         |  SELECT COUNT(DISTINCT h) AS vv FROM tr
         |), trd AS (
         |  SELECT doc_id, lang FROM documents WHERE doc_id % 5 <> 0
         |), ndl AS (
         |  SELECT lang AS plang, COUNT(*) AS ndl FROM trd GROUP BY 1
         |), nd AS (
         |  SELECT COUNT(*) AS nd FROM trd
         |), prior AS (
         |  SELECT plang,
         |    ROUND(ln(CAST(ndl AS DOUBLE) / CAST(nd AS DOUBLE)), 6) AS prior
         |  FROM ndl CROSS JOIN nd
         |), te AS (
         |  SELECT doc_id, h FROM p WHERE doc_id % 5 = 0
         |), sc AS (
         |  SELECT te.doc_id, l.plang,
         |    CAST(ROUND(ln(CAST(COALESCE(cwl.cwl, 0) + 1 AS DOUBLE)
         |      / CAST(nl.nl + vv.vv AS DOUBLE)), 6) AS DECIMAL(18,6)) AS term
         |  FROM te CROSS JOIN (SELECT plang FROM ndl) l
         |  JOIN nl USING (plang) CROSS JOIN vv
         |  LEFT JOIN cwl ON cwl.plang = l.plang AND cwl.h = te.h
         |), per AS (
         |  SELECT doc_id, plang, SUM(term) AS tsum FROM sc GROUP BY 1, 2
         |), per2 AS (
         |  SELECT doc_id, plang, tsum + CAST(prior AS DECIMAL(18,6)) AS score
         |  FROM per JOIN prior USING (plang)
         |), rk AS (
         |  SELECT doc_id, plang, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, plang) AS rnk
         |  FROM per2
         |)
         |SELECT r.doc_id, r.plang AS pred_lang, CAST(r.score AS DOUBLE) AS nb_score,
         |  d.lang AS true_lang, r.plang = d.lang AS correct
         |FROM rk r JOIN documents d USING (doc_id)
         |WHERE rnk = 1 ORDER BY r.doc_id""".stripMargin
    },

    "q_percentage_calc" ->
      """WITH tot AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS t
        |  FROM events GROUP BY user_id
        |)
        |SELECT event_id, e.user_id, ROUND(value / (t / 15.0), 6) AS value_pct
        |FROM events e JOIN tot USING (user_id)
        |ORDER BY event_id""".stripMargin,

    "q_grouped_folds" -> {
      val h = graft.functions.TextAnalytics.charHashDuck("CAST(c_nationkey AS VARCHAR)")
      s"""SELECT c_custkey, c_nationkey,
         |  CAST($h % 5 AS INT) AS fold
         |FROM customer ORDER BY c_custkey""".stripMargin
    }
  )
}
