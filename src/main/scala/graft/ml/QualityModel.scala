package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained text-quality classifier — the fastText-style reference-vs-rest
  * filter the large-corpus pipelines use (keep documents a linear model
  * scores "reference-like"): hashed token features → logistic regression.
  * Complements the rule-based gate (`TextOps.qualityFilter`) and the LM
  * perplexity gate (`TextOps.lmScore`) as the third standard quality
  * signal.
  *
  * Scale notes: `HashingTF` is stateless and row-local (no vocabulary
  * fit, no shuffle — the hashing trick is what makes this trainable on a
  * 100 TB corpus sample and scoreable everywhere); LR training is MLlib's
  * distributed L-BFGS; scoring is one `model.transform` projection whose
  * broadcast is the coefficient vector (2^`numFeatures` doubles).
  */
object QualityModel {

  /** Weak label: membership in the trusted reference slice (here the
    * English documents — the same slice the LM trains on). A production
    * pipeline labels with a curated reference corpus vs raw crawl; the
    * engine-side pipeline is identical. */
  def referenceLabel: org.apache.spark.sql.Column =
    (col("lang") === "en").cast("double")

  /** Fit tokenizer → hashingTF → LR on labeled documents (`label`
    * column). Deterministic: hashing is seedless murmur3, LR is L-BFGS
    * from a fixed init on deterministic features. */
  def fit(labeledDocs: DataFrame, numFeatures: Int = 1 << 12): PipelineModel = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("__toks").setPattern("\\s+")
    val tf = new HashingTF()
      .setInputCol("__toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(25).setRegParam(0.01)
    new Pipeline().setStages(Array(tok, tf, lr)).fit(labeledDocs)
  }

  /** Score documents: adds `quality_probability` (P(reference-like)). */
  def score(model: PipelineModel, docs: DataFrame): DataFrame = {
    val p1 = element_at(
      org.apache.spark.ml.functions.vector_to_array(col("probability")), 2)
    model.transform(docs)
      .withColumn("quality_probability", p1)
      .drop("__toks", "features", "rawPrediction", "probability", "prediction")
  }
}
