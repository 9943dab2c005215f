package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoinOps

/** Pins the binned range-join semantics: inclusive bounds, multi-bin
  * intervals matched exactly once, key isolation, non-matches dropped. */
class RangeJoinOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val points = Seq(
    (1L, "u1", ts("2024-01-01 10:30:00")), // inside iv A
    (2L, "u1", ts("2024-01-01 10:00:00")), // = start of A (inclusive)
    (3L, "u1", ts("2024-01-01 11:00:00")), // = end of A (inclusive)
    (4L, "u1", ts("2024-01-01 12:00:00")), // between intervals → dropped
    (5L, "u1", ts("2024-01-02 03:00:00")), // inside multi-bin iv B
    (6L, "u2", ts("2024-01-01 10:30:00"))  // other key, no intervals
  ).toDF("id", "user", "t")

  private val intervals = Seq(
    ("u1", "A", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
    // B spans 2024-01-02 00:00 .. 08:00 — nine 1-hour bins
    ("u1", "B", ts("2024-01-02 00:00:00"), ts("2024-01-02 08:00:00"))
  ).toDF("user", "iv", "s", "e")

  test("pointInIntervalJoin: inclusive containment, one match per pair") {
    val out = RangeJoinOps.pointInIntervalJoin(
        points, intervals, Seq("user"), "t", "s", "e", binSeconds = 3600L)
      .select("id", "iv").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "A"), (2L, "A"), (3L, "A"), (5L, "B")))
  }

  test("pointInIntervalJoin: tiny bins still match each pair exactly once") {
    val out = RangeJoinOps.pointInIntervalJoin(
        points, intervals, Seq("user"), "t", "s", "e", binSeconds = 60L)
      .select("id", "iv").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "A"), (2L, "A"), (3L, "A"), (5L, "B")))
  }

  test("pointInIntervalJoin drops inverted and null-bounded intervals") {
    val withJunk = intervals.union(Seq(
      // inverted: end < start — would emit a descending bin sequence
      ("u1", "INV", ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00")),
      ("u1", "NULLS", null.asInstanceOf[Timestamp], ts("2024-01-01 11:00:00"))
    ).toDF("user", "iv", "s", "e"))
    val out = RangeJoinOps.pointInIntervalJoin(
        points, withJunk, Seq("user"), "t", "s", "e", binSeconds = 3600L)
      .select("id", "iv").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "A"), (2L, "A"), (3L, "A"), (5L, "B")))
  }
}
