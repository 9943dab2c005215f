package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.ChurnDataGen
import graft.stream.Pipelines

/** The reference's full topology (`MainProcess.py`): producer wire → one
  * multi-topic bronze stream → four concurrent silver streaming queries →
  * gold refresh — end to end over files, no shortcuts. */
class MedallionE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("producer wire → bronze → 4 concurrent silver queries → gold") {
    val tmp = Files.createTempDirectory("graft_e2e_").toString
    val b = ChurnDataGen.generate(600)
    Seq(
      ("profiles", ChurnDataGen.profilesDF(spark, b)),
      ("usage", ChurnDataGen.usageDF(spark, b)),
      ("churn", ChurnDataGen.transactionsDF(spark, b)),
      ("support", ChurnDataGen.ticketsDF(spark, b))
    ).foreach { case (e, df) =>
      df.select(to_json(struct(col("*"))).as("value"),
          lit(Pipelines.Topics(e)).as("topic"))
        .write.mode("append").json(s"$tmp/wire")
    }
    val wire = spark.readStream.schema("value STRING, topic STRING")
      .json(s"$tmp/wire")
    val bronze = Pipelines.bronze(wire)
    val silver = Map(
      "customer_profile" -> Pipelines.silverCustomer(bronze("profiles")),
      "app_usage" -> Pipelines.silverAppUsage(bronze("usage")),
      "churn_transactions" -> Pipelines.silverTransactions(bronze("churn")),
      "support_tickets" -> Pipelines.silverSupport(bronze("support")))
    // the reference runs these concurrently and awaits any termination
    // (`Silver1.py:157`); AvailableNow + awaitTermination is the bounded
    // test analog of the same four-query topology
    val queries = silver.map { case (name, df) =>
      Pipelines.toParquetSink(df, s"$tmp/silver/$name", s"$tmp/ckpt/$name")
        .trigger(Trigger.AvailableNow()).start()
    }
    queries.foreach(_.awaitTermination())

    silver.keys.foreach { n =>
      assert(spark.read.parquet(s"$tmp/silver/$n").count() > 0, s"$n empty")
    }
    // cleansing really happened on the wire data
    val cust = spark.read.parquet(s"$tmp/silver/customer_profile")
    assert(cust.filter(col("age") <= 0).count() == 0)
    assert(cust.filter(col("email").contains("test")).count() == 0)
    assert(cust.filter(col("gender") === "unknown").count() == 0)
    val sup = spark.read.parquet(s"$tmp/silver/support_tickets")
    assert(sup.filter(col("status") === "open").count() == 0) // quirk §2.10.1

    val gold = Pipelines.goldRefresh(spark, s"$tmp/silver",
      lit("2024-02-01 00:00:00").cast("timestamp"))
    assert(gold.columns.length == 14)
    assert(gold.count() > 0)
    // payment declines flow all the way through (generator injects them)
    assert(gold.filter(col("total_declined_payments").isNotNull).count() > 0)
    // and the scoring layer runs on top of the streamed features
    val model = ml.ChurnModel.fit(gold.withColumn("churned", ml.ChurnModel.weakLabel))
    val scored = ml.ChurnModel.score(model, gold)
    assert(scored.filter(col("churn_probability").isNull).count() == 0)
  }
}
