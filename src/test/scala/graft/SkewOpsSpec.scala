package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SkewOps

/** Salted join/aggregate must be row-identical to the unsalted plan. */
class SkewOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events = Tables.load(spark, "/root/testdata/sf0.001", "events")
  private def customer = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    .select($"c_custkey".as("user_id"), $"c_name", $"c_acctbal")

  test("saltedLeftJoin ≡ plain left join (incl. unmatched-left rows)") {
    val plain = events.join(customer, Seq("user_id"), "left")
    val salted = SkewOps.saltedLeftJoin(events, customer, "user_id",
      discriminator = $"event_id", buckets = 8)
    assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted.select(plain.columns.map(col): _*)).count() == 0)
    assert(salted.select(plain.columns.map(col): _*).exceptAll(plain).count() == 0)
  }

  test("saltedCount ≡ plain groupBy count") {
    val plain = events.groupBy($"user_id").agg(count(lit(1)).as("n"))
    val salted = SkewOps.saltedCount(events, "user_id", $"event_id", 8)
    assert(plain.exceptAll(salted).count() == 0 &&
      salted.exceptAll(plain).count() == 0)
  }

  test("AQE splits a skewed sort-merge join on its own (skew=true)") {
    // Manual salting (above) is the deliberate mitigation; this pins the
    // DEFAULT path: at 100× scale a hot key must trigger AQE's runtime
    // skew split even when nobody salted. Thresholds are lowered so the
    // test-sized shuffle exhibits the same decision a 256 MB-partition
    // production shuffle would.
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying 75% of the rows, the rest spread over 1000
      val left = spark.range(200000).select(
        when($"id" < 150000, lit(7L)).otherwise($"id" % 1000).as("k"),
        $"id".as("payload"))
      val right = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, Seq("k"))
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
