package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the runnable demo main: the whole `MainProcess.py`-analog
  * topology (wire → bronze → silver → gold foreachBatch → scores) completes
  * in one process and leaves the expected artifacts. */
class DemoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Demo.run produces silver, 14-col gold, and churn scores") {
    val out = Files.createTempDirectory("graft_demo_spec_").toString
    Demo.run(spark, out, rows = 300)
    val gold = spark.read.parquet(s"$out/gold")
    assert(gold.columns.length == 15) // 14-col gold + foreachBatch batch_id
    assert(gold.columns.take(7).toSeq == Seq("customer_id", "name", "email",
      "age", "gender", "signup_date", "signup_days_ago"))
    assert(gold.count() > 0)
    val scores = spark.read.parquet(s"$out/scores")
    assert(scores.count() > 0)
    assert(scores.filter(org.apache.spark.sql.functions.col("churn_probability").isNull).count() == 0)
  }
}
