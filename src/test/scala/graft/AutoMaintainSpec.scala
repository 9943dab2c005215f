package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** The scheduled-maintenance driver: one call applies analyze_layout's
  * own recommendations (eq-delete fold, worst-first bounded compaction,
  * DV purge) as dataChange=false commits. Binding properties: per-call
  * I/O is bounded by max_buckets, repeated calls CONVERGE to
  * remaining_actions = 0, and the data never changes. */
class AutoMaintainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txam",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txam")
  }

  test("a fragmented + churned + eq-deleted table converges to ok across bounded calls; every maintenance commit is dataChange=false") {
    registered {
      val t = Files.createTempDirectory("graft_am_").toString + "/t"
      // fragment: 6 commits into 8 buckets; churn: a MOR delete; plus
      // one unfolded equality delete
      TxTable.init(spark, t,
        spark.range(200).select(col("id").as("k"),
          (col("id") * 10).as("v")), "k", 8)
      // the eq delete lands EARLY: its fold only addresses the init
      // generation, so the fold cannot accidentally defragment the
      // later appends (which is what makes multiple slices necessary)
      TxTable.deleteWhereEq(spark, t, Seq(1L, 77L, 131L).toDF("k"))
      (1 to 5).foreach { b =>
        TxTable.appendOnce(spark, t,
          spark.range(200L * b, 200L * b + 200).select(col("id").as("k"),
            (col("id") * 10).as("v")), "k", 8,
          appId = "am", batchId = b.toLong)
      }
      TxTable.deleteWhereMor(spark, t, col("k") % 9 === 0)
      val expect = TxTable.read(spark, t).select($"k", $"v")
        .as[(Long, Long)].collect().toSet
      val vStart = TxTable.snapshot(spark, t).version
      var calls = 0
      var remaining = Int.MaxValue
      while (remaining > 0 && calls < 10) {
        val r = spark.sql(
          s"CALL txam.auto_maintain('$t', 1, 0.0, 2)").collect().head
        assert(r.getInt(1) <= 2,
          s"per-call compaction must honor max_buckets: ${r.getInt(1)}")
        remaining = r.getInt(3)
        calls += 1
      }
      assert(remaining == 0, s"did not converge in $calls calls")
      assert(calls >= 2,
        "the fixture must genuinely need more than one bounded slice")
      // every maintenance commit since the fixture is a flagged rewrite
      val vEnd = TxTable.snapshot(spark, t).version
      val fs = new org.apache.hadoop.fs.Path(t).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      (vStart + 1 to vEnd).foreach { v =>
        assert(TxTable.commitIsRewrite(fs, t, v),
          s"v$v must be dataChange=false")
      }
      // change feeds saw NOTHING from maintenance
      assert(TxTable.changesBetween(spark, t, vStart, vEnd).count() == 0)
      // and the data is untouched
      assert(TxTable.read(spark, t).select($"k", $"v")
        .as[(Long, Long)].collect().toSet == expect)
      // converged layout: the next call is a no-op
      val idle = TxTable.autoMaintain(spark, t,
        maxFilesPerBucket = 1, maxDeletedFraction = 0.0, maxBuckets = 2)
      assert(idle("compacted_buckets") == 0 &&
        idle("purged_files") == 0 && idle("eq_folded_files") == 0 &&
        idle("remaining_actions") == 0, idle.toString)
    }
  }
}
