package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.{CountVectorizer, NGram, StopWordsRemover, Tokenizer}
import org.apache.spark.sql.DataFrame

/** Text→feature pipeline mirroring the reference's news-topic modelling
  * (SURVEY.md §2.11; ref: modelling_1 cells 22-28: stopword removal →
  * CountVectorizer(ngram≤3, max_df=0.9, max_features=60) → LDA(4
  * topics)).
  */
object TextPipelines {

  def topicPipeline(k: Int = 4, vocabSize: Int = 60, maxDF: Double = 0.9,
      ngram: Int = 2): Pipeline = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("tokens")
    val stop = new StopWordsRemover().setInputCol("tokens").setOutputCol("kept")
    val ng = new NGram().setN(ngram).setInputCol("kept").setOutputCol("ngrams")
    val cv = new CountVectorizer()
      .setInputCol("ngrams").setOutputCol("features")
      .setVocabSize(vocabSize).setMaxDF(maxDF)
    val lda = new LDA().setK(k).setMaxIter(10).setSeed(42L)
    new Pipeline().setStages(Array(tok, stop, ng, cv, lda))
  }

  /** Fit and return the per-document topic distribution frame. */
  def topicDistributions(documents: DataFrame, k: Int = 4): DataFrame = {
    val model = topicPipeline(k).fit(documents)
    model.transform(documents)
      .select("doc_id", "topicDistribution")
  }
}
