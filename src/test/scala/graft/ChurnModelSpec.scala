package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.ChurnDataGen
import graft.ml.ChurnModel
import graft.ops.SilverOps
import graft.stream.Pipelines

/** Train on generated Gold features, score in batch and per micro-batch. */
class ChurnModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val gold = {
    val tmp = Files.createTempDirectory("graft_ml_").toString
    val b = ChurnDataGen.generate(800)
    SilverOps.cleanCustomer(ChurnDataGen.profilesDF(spark, b))
      .write.parquet(s"$tmp/customer_profile")
    SilverOps.cleanAppUsage(ChurnDataGen.usageDF(spark, b))
      .write.parquet(s"$tmp/app_usage")
    SilverOps.cleanTransactions(ChurnDataGen.transactionsDF(spark, b))
      .write.parquet(s"$tmp/churn_transactions")
    SilverOps.cleanSupportTickets(ChurnDataGen.ticketsDF(spark, b))
      .write.parquet(s"$tmp/support_tickets")
    Pipelines.goldRefresh(spark, tmp, lit("2024-02-01 00:00:00").cast("timestamp"))
  }

  test("fit + batch score: calibrated probabilities separate the classes") {
    val labeled = gold.withColumn("churned", ChurnModel.weakLabel)
    val model = ChurnModel.fit(labeled)
    val scored = ChurnModel.score(model, gold)
    assert(scored.count() == gold.count())
    assert(scored.filter($"churn_probability" < 0 || $"churn_probability" > 1).count() == 0)
    // the model must rank churners above non-churners on average
    val byLabel = ChurnModel.score(model, labeled)
      .groupBy("churned").agg(avg($"churn_probability").as("p"))
      .as[(Double, Double)].collect().toMap
    assert(byLabel(1.0) > byLabel(0.0) + 0.2,
      s"churned avg p=${byLabel(1.0)} vs retained ${byLabel(0.0)}")
  }

  test("streaming micro-batch scoring with the fitted model") {
    val tmp = Files.createTempDirectory("graft_mlstream_").toString
    val labeled = gold.withColumn("churned", ChurnModel.weakLabel)
    val model = ChurnModel.fit(labeled)
    gold.write.parquet(s"$tmp/gold_in")
    val goldStream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/gold_in").schema)
      .parquet(s"$tmp/gold_in")
    val q = ChurnModel.score(model, goldStream)
      .select("customer_id", "churn_probability", "churn_prediction")
      .writeStream.format("parquet")
      .option("path", s"$tmp/scores").option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val scores = spark.read.parquet(s"$tmp/scores")
    assert(scores.count() == gold.count())
    assert(scores.filter($"churn_probability".isNull).count() == 0)
  }
}
