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
}
