package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ExpectOps
import graft.ops.ExpectOps._

/** Data-quality expectations: metric math, pass/fail intervals, null
  * handling, and the one-aggregation-pass plan claim. */
class ExpectOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (Some(1L), Some(10.0), "a"),
    (Some(2L), Some(20.0), "a"),
    (Some(2L), None, "b"),
    (None, Some(-5.0), "zz")).toDF("id", "amount", "tag")

  test("metrics and pass intervals: completeness, uniqueness, bounds, compliance, size") {
    val rows = ExpectOps.report(frame, Seq(
        completeness("id", atLeast = 0.9),
        completeness("amount", atLeast = 0.5),
        uniqueness("id", atLeast = 1.0),
        minAtLeast("amount", lo = 0.0),
        maxAtMost("amount", hi = 100.0),
        compliance("tag_known", col("tag").isin("a", "b"), atLeast = 0.5),
        sizeBetween(lo = 1.0, hi = 10.0)))
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("completeness(id)") == ((0.75, false)))
    assert(rows("completeness(amount)") == ((0.75, true)))
    // 2 distinct over 3 non-null ids
    assert(rows("uniqueness(id)")._1 == 2.0 / 3.0)
    assert(!rows("uniqueness(id)")._2)
    assert(rows("min(amount)") == ((-5.0, false)))
    assert(rows("max(amount)") == ((20.0, true)))
    assert(rows("compliance(tag_known)") == ((0.75, true)))
    assert(rows("size") == ((4.0, true)))
  }

  test("null metric fails closed; duplicate names rejected") {
    val allNull = Seq((Option.empty[Double], 1), (None, 2)).toDF("v", "k")
    val rows = ExpectOps.report(allNull, Seq(minAtLeast("v", lo = 0.0)))
      .select($"passed").as[Boolean].collect()
    assert(rows.toSeq == Seq(false),
      "min over an all-null column must fail, not pass vacuously")
    intercept[IllegalArgumentException] {
      ExpectOps.report(allNull, Seq(sizeBetween(1.0), sizeBetween(2.0)))
    }
  }

  test("report is one aggregation pass: no join, no window, partial agg present") {
    val p = ExpectOps.report(frame, Seq(
        completeness("id", 0.9), minAtLeast("amount", 0.0), sizeBetween(1.0)))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("Join") && !p.contains("Window"),
      s"expectations must not join or window:\n$p")
    assert(p.contains("partial"), s"expected map-side partial aggregation:\n$p")
  }
}
