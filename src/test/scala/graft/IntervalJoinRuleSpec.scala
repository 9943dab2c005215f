package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoinOps
import graft.plans.IntervalJoinRule

/** The optimizer rule must turn the hand-written point-in-interval theta
  * join into a nested-loop-free equi-join with IDENTICAL rows — and leave
  * everything it doesn't understand untouched. */
class IntervalJoinRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val points = Seq(
    (1L, "u1", ts("2024-01-01 10:30:00")),
    (2L, "u1", ts("2024-01-01 10:00:00")), // = start (inclusive)
    (3L, "u1", ts("2024-01-01 11:00:00")), // = end (inclusive)
    (4L, "u1", ts("2024-01-01 12:00:00")), // no interval
    (5L, "u1", ts("2024-01-02 03:00:00")), // multi-bin interval
    (6L, "u2", ts("2024-01-01 10:30:00"))  // key isolation
  ).toDF("id", "user", "t")

  private val intervals = Seq(
    ("u1", "A", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
    ("u1", "B", ts("2024-01-02 00:00:00"), ts("2024-01-02 08:00:00")),
    ("u1", "INV", ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00"))
  ).toDF("user", "iv", "s", "e")

  private def theta: DataFrame = points.join(intervals,
    points("user") === intervals("user") &&
      points("t") >= intervals("s") && points("t") <= intervals("e"))

  private def applyRule(df: DataFrame): DataFrame =
    GraftColumnBridge.ofRows(spark,
      IntervalJoinRule().apply(df.queryExecution.analyzed))

  test("rewrite is row-identical to the naive theta join") {
    val naive = theta.select($"id", $"iv").as[(Long, String)].collect().sorted
    val rewritten = applyRule(theta).select($"id", $"iv")
      .as[(Long, String)].collect().sorted
    assert(naive.nonEmpty)
    assert(rewritten.toSeq == naive.toSeq)
    // and to the hand-built binned range join
    val manual = RangeJoinOps.pointInIntervalJoin(points,
        intervals, Seq("user"), "t", "s", "e")
      .select($"id", $"iv").as[(Long, String)].collect().sorted
    assert(manual.toSeq == naive.toSeq)
  }

  test("keyed rewrite: the bin attribute becomes a join key") {
    val p = applyRule(theta).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"rewrite still nested-loops:\n$p")
    // the bin column participates as an equi key, bounding per-key fan-out
    assert(p.contains("__graft_bin"), s"bin key missing from plan:\n$p")
  }

  test("keyless interval join: nested loop becomes a bin hash join") {
    val keyless = points.join(intervals,
      points("t") >= intervals("s") && points("t") <= intervals("e"))
    // the test session loads GraftExtensions, so the SESSION optimizer
    // already applies the rewrite — no manual rule application
    val p = keyless.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"rewrite still nested-loops:\n$p")
    assert(p.contains("__graft_bin"), s"bin key missing:\n$p")
    // excluding the rule restores the nested loop (the fixture is real)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.IntervalJoinRule")
    try {
      val naive = points.join(intervals,
        points("t") >= intervals("s") && points("t") <= intervals("e"))
      val naiveP = naive.queryExecution.executedPlan.toString
      assert(naiveP.contains("BroadcastNestedLoopJoin"),
        s"fixture too easy:\n$naiveP")
      // identical rows with and without the rule
      val expect = naive.select($"id", $"iv").as[(Long, String)].collect().sorted
      spark.conf.unset("spark.sql.optimizer.excludedRules")
      val re = keyless.select($"id", $"iv").as[(Long, String)].collect().sorted
      assert(expect.nonEmpty && re.toSeq == expect.toSeq)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("non-matching shapes pass through untouched") {
    // missing upper bound → not an interval join
    val open = points.join(intervals,
      points("user") === intervals("user") && points("t") >= intervals("s"))
    assert(IntervalJoinRule().apply(open.queryExecution.analyzed)
      .sameResult(open.queryExecution.analyzed))
    // left join → untouched
    val outer = points.join(intervals,
      points("user") === intervals("user") &&
        points("t") >= intervals("s") && points("t") <= intervals("e"), "left")
    assert(IntervalJoinRule().apply(outer.queryExecution.analyzed)
      .sameResult(outer.queryExecution.analyzed))
  }

  test("a session built with GraftExtensions applies the rule on its own") {
    // the shared test session predates the extension, so check statically
    // that the extension injects the rule type
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(e)
    val rules = GraftColumnBridge.optimizerRules(e, spark)
    assert(rules.exists(_.isInstanceOf[IntervalJoinRule]),
      s"IntervalJoinRule not injected: $rules")
  }
}
