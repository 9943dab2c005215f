package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AsOfOps, RangeJoinOps}

/** Randomized equivalence: the scale-path join implementations (linear
  * as-of, binned range join) must produce exactly the rows of the naive
  * theta-join formulations they replace, across seeded random datasets
  * dense enough to hit ties, empty keys, and boundary timestamps. */
class JoinEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def randTs(rng: scala.util.Random, spreadMin: Int): Timestamp =
    new Timestamp(base + rng.nextInt(spreadMin) * 60000L)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for (seed <- Seq(1, 7, 42)) {
    test(s"asOfJoin equals naive greatest-preceding theta join (seed $seed)") {
      val rng = new scala.util.Random(seed)
      // dense key space (8 keys × ~25 rows) forces shared timestamps
      val left = Seq.fill(200)(
        (rng.nextLong(), "k" + rng.nextInt(8), randTs(rng, 120)))
        .toDF("id", "key", "t")
      val right = Seq.fill(100)(
        ("k" + rng.nextInt(10), randTs(rng, 120), rng.nextInt(1000)))
        .distinct.toDF("key", "rt", "payload")
        // naive picks an arbitrary winner among equal (key, rt) — dedupe so
        // both sides face a deterministic problem (same rule as the op doc)
        .groupBy("key", "rt").agg(max("payload").as("payload"))

      val fast = AsOfOps.asOfJoin(left, right, Seq("key"), "t", "rt")
      val naive = left.as("l")
        .join(right.as("r"), col("l.key") === col("r.key") && col("rt") <= col("t"), "left")
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("id"), col("l.key"), col("t"))
            .orderBy(col("rt").desc_nulls_last)))
        .filter(col("__rn") === 1)
        .select(col("id"), col("l.key").as("key"), col("t"), col("rt"), col("payload"))
      assert(sortedRows(fast) == sortedRows(naive))
    }

    test(s"pointInIntervalJoin equals naive containment theta join (seed $seed)") {
      val rng = new scala.util.Random(seed)
      val points = Seq.fill(150)(
        (rng.nextLong(), "k" + rng.nextInt(6), randTs(rng, 240)))
        .toDF("id", "key", "t")
      val intervals = Seq.fill(60) {
        val s = randTs(rng, 240)
        (("k" + rng.nextInt(6)), s,
          new Timestamp(s.getTime + rng.nextInt(180) * 60000L), rng.nextInt(100))
      }.toDF("key", "s", "e", "iv")

      val naive = points.join(intervals, Seq("key"))
        .filter(col("t").between(col("s"), col("e")))
        .select("id", "key", "t", "s", "e", "iv")
      for (binSeconds <- Seq(60L, 3600L, 86400L)) {
        val fast = RangeJoinOps.pointInIntervalJoin(
          points, intervals, Seq("key"), "t", "s", "e", binSeconds)
        assert(sortedRows(fast) == sortedRows(naive),
          s"bin=$binSeconds differs from naive")
      }
    }
  }
}
