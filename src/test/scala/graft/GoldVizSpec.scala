package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.ChurnDataGen
import graft.ops.{GoldOps, GoldViz}

/** Consumption edge: server-side summary stats, bounded sampling, and the
  * five-frame dashboard export (the reference's toPandas analog, without
  * the unbounded driver transfer). */
class GoldVizSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("featureSummary: one ordered-stats row per feature") {
    val gold = SparkEntry.queries("gold_enriched")(spark, dir)
    val out = GoldViz.featureSummary(gold).collect()
    assert(out.length == GoldViz.Features.size)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      if (n > 0) {
        val Seq(mn, p25, p50, p75, mx) =
          Seq("fmin", "p25", "p50", "p75", "fmax").map(r.getAs[Double])
        assert(mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mx,
          s"unordered stats for ${r.getAs[String]("feature")}: $r")
      }
    }
  }

  test("boundedSample caps rows and is deterministic") {
    val gold = SparkEntry.queries("gold_enriched")(spark, dir)
    val a = GoldViz.boundedSample(gold, 20).collect()
    val b = GoldViz.boundedSample(gold, 20).collect()
    assert(a.length == 20)
    assert(a.toSeq == b.toSeq)
  }

  test("exportCsv writes the five dashboard frames, sampled") {
    val out = Files.createTempDirectory("graft_viz_").toString
    val b = ChurnDataGen.generate(200)
    val now = lit("2024-02-01 00:00:00").cast("timestamp")
    val usage = ChurnDataGen.usageDF(spark, b)
    val txn = ChurnDataGen.transactionsDF(spark, b)
    val app = GoldOps.appFeatures(usage, now)
    val declines = GoldOps.paymentDeclines(txn)
    val arpu = GoldOps.revenueArpu(txn, app)
    val support = GoldOps.supportFeatures(ChurnDataGen.ticketsDF(spark, b))
    val enriched = GoldOps.enrich(
      ChurnDataGen.profilesDF(spark, b)
        .withColumn("signup_date", to_date($"signup_date")),
      app, declines, arpu, support, now)
    val frames = GoldViz.vizFrames(app, declines, arpu, support, enriched)
    GoldViz.exportCsv(frames, out, cap = 50)
    frames.keys.foreach { name =>
      val read = spark.read.option("header", "true").csv(s"$out/$name")
      assert(read.count() > 0 && read.count() <= 50, s"$name")
    }
    // the frame columns the dashboard plots are present
    val appCsv = spark.read.option("header", "true").csv(s"$out/app_features")
    assert(appCsv.columns.toSeq ==
      Seq("customer_id", "login_gap_days", "total_sessions_last_30d"))
  }
}
