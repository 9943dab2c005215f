package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfOps

/** Pins the as-of join semantics: greatest right time <= left time per key,
  * inclusive tie, NULL payload when nothing precedes, independence across
  * keys. */
class AsOfOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    // (id, key, t)
    (1L, "u1", ts("2024-01-10 00:00:00")), // matches r at 01-05 (not 01-20)
    (2L, "u1", ts("2024-01-20 00:00:00")), // inclusive: r at exactly 01-20
    (3L, "u1", ts("2024-01-01 00:00:00")), // nothing precedes → null
    (4L, "u2", ts("2024-01-10 00:00:00")), // other key's rows invisible
    (5L, "u3", ts("2024-01-10 00:00:00"))  // key with no right rows at all
  ).toDF("id", "key", "t")

  private val right = Seq(
    ("u1", ts("2024-01-05 00:00:00"), "a"),
    ("u1", ts("2024-01-20 00:00:00"), "b"),
    ("u2", ts("2024-01-09 00:00:00"), "c")
  ).toDF("key", "rt", "payload")

  test("asOfJoin picks the greatest right time <= left time, per key") {
    val out = AsOfOps.asOfJoin(left, right, Seq("key"), "t", "rt")
      .orderBy("id")
      .as[(Long, String, Timestamp, Option[Timestamp], Option[String])]
      .collect()
    assert(out(0) == ((1L, "u1", ts("2024-01-10 00:00:00"),
      Some(ts("2024-01-05 00:00:00")), Some("a"))))
    assert(out(1) == ((2L, "u1", ts("2024-01-20 00:00:00"),
      Some(ts("2024-01-20 00:00:00")), Some("b")))) // inclusive tie
    assert(out(2)._4.isEmpty && out(2)._5.isEmpty)   // nothing precedes
    assert(out(3) == ((4L, "u2", ts("2024-01-10 00:00:00"),
      Some(ts("2024-01-09 00:00:00")), Some("c"))))  // key isolation
    assert(out(4)._4.isEmpty && out(4)._5.isEmpty)   // key absent on right
  }

  test("asOfJoin preserves left row count (no range-pair multiplication)") {
    val out = AsOfOps.asOfJoin(left, right, Seq("key"), "t", "rt")
    assert(out.count() == left.count())
    assert(out.columns.toSeq ==
      Seq("id", "key", "t", "rt", "payload"))
  }

  test("asOfJoin rejects colliding payload column names") {
    val bad = right.withColumnRenamed("payload", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfOps.asOfJoin(left, bad, Seq("key"), "t", "rt")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asOfJoin rejects inputs using the reserved temp column names") {
    val bad = left.withColumn("__t", left("t"))
    val e = intercept[IllegalArgumentException] {
      AsOfOps.asOfJoin(bad, right, Seq("key"), "t", "rt")
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("asOfJoin: NULL right times never match (standard ASOF semantics)") {
    val rWithNull = Seq(
      ("u3", null.asInstanceOf[Timestamp], "ghost"), // must never surface
      ("u1", ts("2024-01-05 00:00:00"), "a")
    ).toDF("key", "rt", "payload")
    val out = AsOfOps.asOfJoin(left, rWithNull, Seq("key"), "t", "rt")
      .orderBy("id")
      .as[(Long, String, Timestamp, Option[Timestamp], Option[String])]
      .collect()
    // u3's only right row has a null time → left row 5 stays unmatched
    assert(out(4)._4.isEmpty && out(4)._5.isEmpty)
    assert(!out.exists(_._5.contains("ghost")))
    // u1 still matches its real row
    assert(out(0)._5.contains("a"))
  }
}
