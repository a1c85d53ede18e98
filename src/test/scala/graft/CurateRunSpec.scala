package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.DedupIndex

/** End-to-end audit of the curation capstone at sf0.001: every manifest
  * count re-derived independently, the export proven balanced/complete/
  * deterministic, and a re-run proven byte-identical in its decisions. */
class CurateRunSpec extends SparkSpec {

  private lazy val outDir =
    Files.createTempDirectory("graft-curate").toString
  private lazy val result =
    CurateRun.run(spark, sf("sf0.001"), outDir, log = _ => ())

  private def manifest: Map[String, Long] =
    spark.read.parquet(result.manifestPath)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("manifest stage counts match independent recomputation") {
    val counts = manifest
    val docs = Tables(spark, sf("sf0.001"), "documents")
    assert(counts("ingested") === docs.count())

    // quality gate, recomputed via SQL instead of the Column DSL
    docs.createOrReplaceTempView("curate_docs")
    val quality = spark.sql(
      """SELECT * FROM curate_docs
        |WHERE n_chars BETWEEN 150 AND 10000
        |  AND size(split(text, ' ')) >= 20
        |  AND lang IN ('en', 'de', 'fr', 'es')""".stripMargin)
    assert(counts("quality") === quality.count())

    // exact dedup count = distinct content hashes of the quality set
    assert(counts("exact_dedup") ===
      quality.select(countDistinct(md5(col("text")))).head.getLong(0))

    // near-dup: kept = exact − non-canonical members of the persisted
    // index (and the index on disk is exactly the one the run used)
    val ix = DedupIndex.load(spark, result.indexDir)
    val nonCanon = ix.labels.filter(col("component") =!= col("doc_id")).count()
    assert(counts("near_dedup") === counts("exact_dedup") - nonCanon)

    // rebalanced = |langs present| × min per-lang count
    val perLang = quality
      .withColumn("fp", md5(col("text")))
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY fp ORDER BY doc_id)"))
      .filter(col("rn") === 1)
      .join(ix.labels.filter(col("component") =!= col("doc_id"))
        .select(col("doc_id")), Seq("doc_id"), "left_anti")
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("rebalanced") === perLang.size * perLang.values.min)

    assert(counts("exported") === counts("rebalanced"))
  }

  test("export is balanced, complete, unique, and language-equal") {
    val back = spark.read.parquet(result.shardsPath)
    val n = manifest("exported")

    val byShard = back.groupBy(col("shard")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byShard.keySet === (0 until 8).toSet)
    assert(byShard.values.sum === n)
    assert(byShard.values.max - byShard.values.min <= 1,
      s"shard imbalance: $byShard")

    // one row per document, every kept document a real input document
    assert(back.select(col("doc_id")).distinct().count() === n)
    val src = Tables(spark, sf("sf0.001"), "documents").select(col("doc_id"))
    assert(back.select(col("doc_id")).exceptAll(src).isEmpty)

    // the rebalance contract survives the export: every language equal
    val langs = back.groupBy(col("lang")).count()
      .collect().map(_.getLong(1)).toSet
    assert(langs.size === 1, s"unequal language counts: $langs")
  }

  test("re-run is deterministic: identical manifest and shard assignment") {
    val first = spark.read.parquet(result.shardsPath)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val again = CurateRun.run(spark, sf("sf0.001"), outDir, log = _ => ())
    assert(again.counts === result.counts)
    val second = spark.read.parquet(again.shardsPath)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(second === first)
  }
}
