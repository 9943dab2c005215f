package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real-time churn scoring (the north-star capability the reference's name
  * promises but never implements — its "model" is a hash-based sentiment
  * score, `Gold1.py:87`): logistic regression over the Gold feature table,
  * scored either in batch or per micro-batch on a stream.
  *
  * Scale notes: training reduces to MLlib's distributed L-BFGS over the
  * assembled feature vectors (one pass per iteration, no driver-side data);
  * scoring is a pure projection (`model.transform`) that rides micro-batches
  * or batch scans unchanged — the model broadcast is a few KB.
  */
object ChurnModel {

  val FeatureCols: Array[String] = Array(
    "login_gap_days", "total_sessions_last_30d", "total_declined_payments",
    "avg_payment_value", "arpu", "signup_days_ago")

  /** Nulls (customers missing a feature table) become 0 — the same
    * semantics a left-join enrichment implies: absence of activity. */
  def prepare(gold: DataFrame): DataFrame =
    FeatureCols.foldLeft(gold) { (df, c) =>
      df.withColumn(c, coalesce(col(c).cast("double"), lit(0.0)))
    }

  /** Deterministic weak label for self-supervised bootstrapping when no
    * ground truth exists: long login gap + low engagement ⇒ churned. A real
    * deployment replaces this with observed churn outcomes; the pipeline
    * around it is unchanged. */
  def weakLabel: org.apache.spark.sql.Column =
    (coalesce(col("login_gap_days"), lit(9999)) > 14 &&
      coalesce(col("total_sessions_last_30d"), lit(0L)) < 8).cast("double")

  /** Fit the scoring pipeline (assembler + logistic regression) on a Gold
    * feature frame with a `churned` label column. */
  def fit(labeledGold: DataFrame): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols).setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol("churned").setFeaturesCol("features")
      .setMaxIter(25).setRegParam(0.01)
    new Pipeline().setStages(Array(assembler, lr)).fit(prepare(labeledGold))
  }

  /** Score a (batch or streaming) Gold frame: adds churn_probability and
    * churn_prediction. `model.transform` is stream-safe — the same call
    * scores micro-batches. */
  def score(model: PipelineModel, gold: DataFrame): DataFrame = {
    val p1 = element_at(vector_to_array(col("probability")), 2)
    model.transform(prepare(gold))
      .withColumn("churn_probability", p1)
      .withColumn("churn_prediction", col("prediction"))
      .drop("features", "rawPrediction", "probability", "prediction")
  }

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)
}
