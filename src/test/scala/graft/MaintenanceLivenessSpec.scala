package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Maintenance liveness under write contention — the 100 TB operational
  * reality: a streaming sink lands a commit every trigger while scheduled
  * compaction slices run. The rewrite loop's cheap-re-commit path (a lost
  * CAS whose winner touched no target file re-commits the same staged
  * bytes, O(one manifest) with jittered backoff) must let bounded
  * compaction CONVERGE against a steady append load, with zero lost
  * appends and byte-identical data. */
class MaintenanceLivenessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compact(maxBuckets=1) slices converge against a steady append loop: no lost append, no starved maintenance, identical data") {
    val t = Files.createTempDirectory("graft_ml_").toString + "/t"
    // fragment all 4 buckets: 6 small commits
    TxTable.init(spark, t,
      (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
    (1 to 5).foreach { b =>
      TxTable.appendOnce(spark, t,
        (1 to 16).map(i => (s"F$b-$i", (b * 100 + i).toLong))
          .toDF("k", "v"), "k", 4, "ml-frag", b.toLong)
    }
    val before = TxTable.read(spark, t).select($"k", $"v")
      .as[(String, Long)].collect().toSet
    // steady writer: 12 appends, one every ~150 ms — the trigger cadence
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    @volatile var appendFailures = 0
    val writer = Future {
      (1 to 12).map { i =>
        val ok = scala.util.Try(TxTable.appendOnce(spark, t,
          Seq((s"A$i", (1000 + i).toLong)).toDF("k", "v"),
          "k", 4, "ml-live", i.toLong))
        if (ok.isFailure || !ok.get) appendFailures += 1
        Thread.sleep(150)
        ok
      }
    }
    // maintenance: one bounded slice per bucket, racing the writer.
    // Each call must complete within its retry budget — the cheap
    // re-commit path absorbs the append-only losses.
    val compacted = (1 to 4).map { _ =>
      TxTable.compact(spark, t, maxFilesPerBucket = 2, maxRetries = 5,
        maxBuckets = 1)
    }
    Await.result(writer, 180.seconds)
    assert(appendFailures == 0, "appends must never lose to maintenance")
    assert(compacted.sum >= 4,
      s"each slice should compact its worst bucket, got $compacted")
    val after = TxTable.read(spark, t).select($"k", $"v")
      .as[(String, Long)].collect().toSet
    val appended = (1 to 12).map(i => (s"A$i", (1000 + i).toLong)).toSet
    assert(after == before ++ appended,
      "post-maintenance data must be exactly pre-data + appends " +
        s"(missing: ${(before ++ appended -- after).take(5)}, " +
        s"extra: ${(after -- before -- appended).take(5)})")
    // and the maintenance commits are dataChange=false: the change feed
    // replays ONLY the appends, never the reorganization
    val head = TxTable.snapshot(spark, t).version
    val feed = TxTable.changesBetween(spark, t, 5L, head)
      .filter($"_change_type" === "insert")
      .select($"k").as[String].collect().toSet
    assert(feed == appended.map(_._1),
      "the change feed over the contended window must carry exactly " +
        "the appended rows")
    // a final unbounded pass leaves every bucket tight even though the
    // table kept moving the whole time
    TxTable.compact(spark, t, maxFilesPerBucket = 2)
    val perBucket = TxTable.snapshot(spark, t).entries
      .groupBy(_.bucket).map(_._2.size)
    assert(perBucket.forall(_ <= 2 + 12),
      s"buckets stay bounded, got $perBucket")
  }

  test("a winner that TOUCHES the slice forces a re-stage, not a wrong re-commit: delete racing compact never resurrects rows") {
    val t = Files.createTempDirectory("graft_ml2_").toString + "/t"
    spark.conf.set("spark.sql.catalog.txml",
      classOf[graft.sources.TxTableCatalog].getName)
    try {
      TxTable.init(spark, t,
        (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 2)
      (1 to 4).foreach { b =>
        TxTable.appendOnce(spark, t,
          (1 to 8).map(i => (s"F$b-$i", (b * 100 + i).toLong))
            .toDF("k", "v"), "k", 2, "ml2", b.toLong)
      }
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      // the delete rewrites/DV-marks files the compactor is re-staging —
      // whoever loses must converge to a state with the rows GONE
      val deleter = Future {
        spark.sql(s"DELETE FROM txml.`$t` WHERE v >= 400")
      }
      val compactor = Future {
        scala.util.Try(TxTable.compact(spark, t, maxFilesPerBucket = 1,
          maxRetries = 8))
      }
      Await.result(deleter, 120.seconds)
      val c = Await.result(compactor, 120.seconds)
      assert(c.isSuccess, s"compaction must absorb the delete race: $c")
      val got = TxTable.read(spark, t).select($"k").as[String]
        .collect().toSet
      assert(!got.exists(_.startsWith("F4-")),
        "a maintenance rewrite must never resurrect concurrently-" +
          "deleted rows")
      assert(TxTable.read(spark, t).count() == 16 + 24)
    } finally spark.conf.unset("spark.sql.catalog.txml")
  }
}
