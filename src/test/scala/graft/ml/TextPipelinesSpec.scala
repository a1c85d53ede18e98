package graft.ml

import org.apache.spark.ml.linalg.Vector

import graft.{SparkSpec, Tables}

class TextPipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("topic pipeline: tokenize → stopwords → ngrams → countvec → LDA(4)") {
    val docs = Tables(spark, sf("sf0.001"), "documents").limit(200)
    val dists = TextPipelines.topicDistributions(docs, k = 4)
    val rows = dists.limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Vector]("topicDistribution")
      assert(v.size === 4)
      assert(math.abs(v.toArray.sum - 1.0) < 1e-6) // a distribution
    }
  }
}
