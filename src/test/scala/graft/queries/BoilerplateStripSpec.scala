package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of corpus-frequency boilerplate removal: the planted
  * recurring segments (and ONLY those) are stripped from every document,
  * organic text survives verbatim. */
class BoilerplateStripSpec extends SparkSpec {

  test("q_boilerplate_strip removes exactly the planted segments") {
    val out = graft.SparkEntry.queries("q_boilerplate_strip")(spark, sf("sf0.001"))
    val rows = out.collect()
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size, "every document must emit a row")
    rows.foreach { r =>
      val (id, nSegs, nKept, cleaned) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(!cleaned.contains("subscribe to our newsletter"),
        s"doc $id still carries boilerplate")
      assert(!cleaned.contains("all rights reserved"),
        s"doc $id still carries boilerplate")
      // organic text (the first segment) survives verbatim
      assert(cleaned === docs(id), s"doc $id organic text altered")
      // stripped count matches the planting pattern exactly
      val planted = (if (id % 5 < 2) 1 else 0) + (if (id % 7 == 0) 1 else 0)
      assert(nSegs - nKept === planted.toLong,
        s"doc $id stripped ${nSegs - nKept}, planted $planted")
    }
    // the rule actually fired somewhere
    assert(rows.exists(r => r.getLong(1) > r.getLong(2)))
  }

  test("frequency threshold: segments below 1% of docs are never stripped") {
    // each organic document body is unique in the corpus (frequency 1),
    // far below the 1% threshold — n_kept must count it for every doc
    val out = graft.SparkEntry.queries("q_boilerplate_strip")(spark, sf("sf0.001"))
    assert(out.filter(col("n_kept") < 1).isEmpty)
  }
}
