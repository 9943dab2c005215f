package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IncrementalOps, LayoutOps, TxTable}

/** Incremental aggregate maintenance: the folded state must equal a full
  * recompute after every advance, touch only delta buckets, and no-op on
  * an unchanged source. */
class IncrementalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nBuckets = 4

  private def fullRecompute(source: String): Map[String, (Long, BigDecimal)] =
    TxTable.read(spark, source)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,2)")).as("s"))
      .as[(String, Long, BigDecimal)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  private def stateOf(state: String): Map[String, (Long, BigDecimal)] =
    TxTable.read(spark, state)
      .select($"user_id", $"n_rows", $"sum_value")
      .as[(String, Long, BigDecimal)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("advance folds each delta into state == full recompute; untouched buckets not rewritten") {
    val base = Files.createTempDirectory("graft_incr_").toString
    val source = s"$base/source"
    val state = s"$base/state"
    val seed = (1 to 32).map(i => (s"U${i % 8}", i * 1.5))
      .toDF("user_id", "value")
    TxTable.init(spark, source, seed, "user_id", nBuckets)
    var cursor = IncrementalOps.initState(spark, source, state,
      "user_id", Seq("value"), nBuckets)
    assert(stateOf(state) == fullRecompute(source))

    // single-key append: delta folds in, untouched state buckets stay
    val filesBefore = TxTable.snapshot(spark, state).entries
      .groupBy(_.bucket).view.mapValues(_.map(_.rel).toSet).toMap
    val touchedBucket = spark.range(1)
      .select(LayoutOps.bucketId(lit("U1"), nBuckets)).head().getInt(0)
    val b0 = Seq(("U1", 100.0), ("U1", 50.0)).toDF("user_id", "value")
    TxTable.appendOnce(spark, source, b0, "user_id", nBuckets, "incr-src", 0L)
    cursor = IncrementalOps.advance(spark, source, state,
      "user_id", Seq("value"), cursor, nBuckets)
    assert(stateOf(state) == fullRecompute(source),
      "state after advance must equal a full recompute")
    val filesAfter = TxTable.snapshot(spark, state).entries
      .groupBy(_.bucket).view.mapValues(_.map(_.rel).toSet).toMap
    filesBefore.foreach { case (b, rels) =>
      if (b != touchedBucket)
        assert(filesAfter(b) == rels,
          s"untouched state bucket $b was rewritten")
    }

    // second delta with a NEW key lands correctly too
    val b1 = Seq(("U99", 7.0), ("U2", 1.0)).toDF("user_id", "value")
    TxTable.appendOnce(spark, source, b1, "user_id", nBuckets, "incr-src", 1L)
    cursor = IncrementalOps.advance(spark, source, state,
      "user_id", Seq("value"), cursor, nBuckets)
    assert(stateOf(state) == fullRecompute(source))
    assert(stateOf(state).contains("U99"))

    // no new commits: advance is a no-op and bumps nothing
    val vBefore = TxTable.snapshot(spark, state).version
    val unchanged = IncrementalOps.advance(spark, source, state,
      "user_id", Seq("value"), cursor, nBuckets)
    assert(unchanged == cursor)
    assert(TxTable.snapshot(spark, state).version == vBefore)

    // crash-replay: a STALE cursor (0) must not double-count — the state
    // log's stamped watermark wins, and the cursor is recoverable
    assert(IncrementalOps.resume(spark, state).contains(cursor))
    val replayed = IncrementalOps.advance(spark, source, state,
      "user_id", Seq("value"), 0L, nBuckets)
    assert(replayed == cursor)
    assert(stateOf(state) == fullRecompute(source),
      "stale-cursor replay double-counted the delta")

    // stale cursor + NEW data: folds only the genuinely new commit
    val b2 = Seq(("U3", 9.0)).toDF("user_id", "value")
    TxTable.appendOnce(spark, source, b2, "user_id", nBuckets, "incr-src", 2L)
    val c3 = IncrementalOps.advance(spark, source, state,
      "user_id", Seq("value"), 0L, nBuckets)
    assert(c3 > cursor)
    assert(stateOf(state) == fullRecompute(source))
  }

  test("advanceDistinct: mergeable HLL state tracks distinct users per segment") {
    val base = Files.createTempDirectory("graft_incrd_").toString
    val source = s"$base/source"
    val state = s"$base/state"
    // 3 segments × overlapping user sets; duplicates within and across
    // batches must NOT inflate the distinct count
    val seed = (1 to 300).map(i => (s"seg${i % 3}", s"user${i % 50}"))
      .toDF("segment", "uid")
    TxTable.init(spark, source, seed, "segment", nBuckets)
    var cursor = IncrementalOps.initDistinctState(spark, source, state,
      "segment", "uid", nBuckets)

    def estimates(): Map[String, (Long, Double)] =
      IncrementalOps.distinctEstimates(spark, state, "segment")
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    def oneShot(): Map[String, Double] =
      TxTable.read(spark, source).groupBy($"segment")
        .agg(hll_sketch_estimate(hll_sketch_agg($"uid")).as("d"))
        .as[(String, Double)].collect().toMap
    def exact(): Map[String, Long] =
      TxTable.read(spark, source).groupBy($"segment")
        .agg(countDistinct($"uid").as("d")).as[(String, Long)].collect().toMap

    // batch 1: all-new users in seg0/seg1; batch 2 replays old users only
    val b1 = (300 to 340).map(i => (s"seg${i % 2}", s"user$i"))
      .toDF("segment", "uid")
    TxTable.appendOnce(spark, source, b1, "segment", nBuckets, "incrd", 0L)
    cursor = IncrementalOps.advanceDistinct(spark, source, state,
      "segment", "uid", cursor, nBuckets)
    val b2 = (1 to 40).map(i => (s"seg${i % 3}", s"user${i % 50}"))
      .toDF("segment", "uid")
    TxTable.appendOnce(spark, source, b2, "segment", nBuckets, "incrd", 1L)
    cursor = IncrementalOps.advanceDistinct(spark, source, state,
      "segment", "uid", cursor, nBuckets)

    val est = estimates()
    val one = oneShot()
    val ex = exact()
    // row counts are exact
    assert(est.map { case (k, v) => k -> v._1 } ==
      TxTable.read(spark, source).groupBy($"segment").count()
        .as[(String, Long)].collect().toMap)
    ex.foreach { case (seg, d) =>
      val incr = est(seg)._2
      // incremental union tracks the one-shot sketch tightly (same
      // register state up to union-estimator differences) and the truth
      // within HLL's error envelope at default lgConfigK
      assert(math.abs(incr - one(seg)) / d < 0.02,
        s"$seg: incremental $incr vs one-shot ${one(seg)}")
      assert(math.abs(incr - d) / d < 0.05,
        s"$seg: incremental $incr vs exact $d")
    }
    // determinism + replay: a stale-cursor advance with no new commits is
    // a no-op and estimates are bit-stable across reads
    val before = estimates()
    IncrementalOps.advanceDistinct(spark, source, state,
      "segment", "uid", 0L, nBuckets)
    assert(estimates() == before)
  }
}
