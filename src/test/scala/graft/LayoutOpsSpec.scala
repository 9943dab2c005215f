package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LayoutOps

/** Layout techniques must show up in the physical plan, not just run:
  * partition pruning in PartitionFilters, bucketing as a shuffle-free
  * join, compaction as a file-count drop with identical rows. */
class LayoutOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events = Tables.load(spark, "/root/testdata/sf0.001", "events")

  test("date-partitioned write prunes partitions on a day filter") {
    val tmp = Files.createTempDirectory("graft_part_").toString + "/events"
    LayoutOps.writeDatePartitioned(events, tmp, "ts")
    val day = LayoutOps.readDay(spark, tmp, "2024-01-05")
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("p_date"), s"no partition filter in:\n$plan")
    // pruned read returns exactly that day's rows
    val expected = events.filter(to_date($"ts") === "2024-01-05").count()
    assert(day.count() == expected && expected > 0)
    // and scans only one of the ~30 day directories
    val scanned = day.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("p_date=2024-01-06"))
  }

  test("bucketed tables join without any shuffle exchange") {
    val n1 = "graft_bkt_orders"
    val n2 = "graft_bkt_cust"
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select($"c_custkey", $"c_name")
    LayoutOps.writeBucketed(orders, n1, "o_custkey", 8)
    LayoutOps.writeBucketed(cust.withColumnRenamed("c_custkey", "o_custkey"), n2, "o_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table(n1).join(spark.table(n2), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // same rows as the unbucketed join
      val expected = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $n1")
      spark.sql(s"DROP TABLE IF EXISTS $n2")
    }
  }

  test("upsert applies CDC-style changes: update, insert, last-writer-wins") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val tmp = Files.createTempDirectory("graft_upsert_").toString + "/t"
    Seq(
      ("C1", "alice@v1", ts("2024-01-01 00:00:00")),
      ("C2", "bob@v1", ts("2024-01-01 00:00:00")))
      .toDF("customer_id", "email", "updated_at").write.parquet(tmp)
    val updates = Seq(
      ("C1", "alice@v2", ts("2024-01-02 00:00:00")), // update (newer)
      ("C2", "bob@stale", ts("2023-12-01 00:00:00")), // stale → ignored
      ("C3", "carol@v1", ts("2024-01-01 00:00:00"))) // insert
      .toDF("customer_id", "email", "updated_at")
    val rows = LayoutOps.upsert(spark, tmp, updates, "customer_id", "updated_at")
    assert(rows == 3)
    val out = spark.read.parquet(tmp)
      .select("customer_id", "email").as[(String, String)].collect().toMap
    assert(out == Map("C1" -> "alice@v2", "C2" -> "bob@v1", "C3" -> "carol@v1"))
    // tie on (key, orderCol): the update wins over current state
    val tie = Seq(("C2", "bob@tied", ts("2024-01-01 00:00:00")))
      .toDF("customer_id", "email", "updated_at")
    LayoutOps.upsert(spark, tmp, tie, "customer_id", "updated_at")
    val after = spark.read.parquet(tmp)
      .filter($"customer_id" === "C2").select("email").as[String].head()
    assert(after == "bob@tied")
  }

  test("compact shrinks file confetti without losing rows") {
    val tmp = Files.createTempDirectory("graft_compact_").toString + "/t"
    events.repartition(24).write.parquet(tmp) // 24 small files
    def files() = new java.io.File(tmp).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = files()
    val rowsBefore = spark.read.parquet(tmp).count()
    val rows = LayoutOps.compact(spark, tmp, target = 2)
    assert(rows == rowsBefore)
    assert(files() == 2, s"expected 2 files, found ${files()} (was $before)")
    assert(spark.read.parquet(tmp).count() == rowsBefore)
  }
}
