package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable
import graft.sources.TxDistributedPrune

/** Distributed scan planning: past `spark.graft.planning.distributeAt`
  * live files, the per-file pruning verdicts (zone maps, partition
  * envelopes, blooms, bucket identity) evaluate as a Spark job over the
  * manifest entries instead of a driver-side O(files) walk — sidecars
  * are read executor-side, never collected into driver maps, and only
  * the kept rels return. The binding property is PARITY: both paths call
  * the same [[graft.sources.TxPruneVerdicts]] functions, and this spec
  * pins the kept set file for file across every pruning dimension. */
class TxDistributedPlanningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txdp",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txdp")
  }

  private def withThreshold[T](n: Int)(body: => T): T = {
    spark.conf.set("spark.graft.planning.distributeAt", n.toString)
    try body
    finally spark.conf.unset("spark.graft.planning.distributeAt")
  }

  private def scannedRels(df: org.apache.spark.sql.DataFrame)
      : Set[String] =
    df.queryExecution.executedPlan.collectLeaves().flatMap {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.flatMap {
          case f: org.apache.spark.sql.execution.datasources.FilePartition =>
            f.files.map(_.filePath.toString)
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }.toSet

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Fixture: days(ts) + bucket(4, id); zone maps on v; bloom on cat. */
  private def fixture(): String = {
    val t = Files.createTempDirectory("graft_dp_").toString + "/t"
    registered {
      spark.sql(s"""CREATE TABLE txdp.`$t`
        (id BIGINT, ts TIMESTAMP, v BIGINT, cat STRING)
        PARTITIONED BY (days(ts), bucket(4, id))""")
      (0 until 6).foreach { d =>
        (0 until 8).map { i =>
          (d * 100L + i, ts(f"2024-05-${10 + d}%02d 0$i:00:00"),
            d * 1000L + i, s"cat-${(d * 8 + i) % 5}")
        }.toDF("id", "ts", "v", "cat").writeTo(s"txdp.`$t`").append()
      }
      TxTable.computeStats(spark, t, "v")
      TxTable.computeBloom(spark, t, "cat")
    }
    t
  }

  test("parity: distributed planning keeps EXACTLY the driver walk's file set across zone, envelope, bloom, and bucket pruning") {
    registered {
      val t = fixture()
      val nFiles = TxTable.snapshot(spark, t).entries.size
      assert(nFiles > 10, s"fixture too small: $nFiles files")
      val queries: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
        Seq(
          "envelope range" -> (() => spark.table(s"txdp.`$t`")
            .filter($"ts" >= "2024-05-13 00:00:00")),
          "zone range" -> (() => spark.table(s"txdp.`$t`")
            .filter($"v" >= 4000L && $"v" < 5000L)),
          "bloom eq" -> (() => spark.table(s"txdp.`$t`")
            .filter($"cat" === "cat-3")),
          "bucket eq" -> (() => spark.table(s"txdp.`$t`")
            .filter($"id" === 207L)),
          "conjunction" -> (() => spark.table(s"txdp.`$t`")
            .filter($"ts" >= "2024-05-12 00:00:00" &&
              $"v" < 3000L && $"cat" === "cat-1")),
          "IN-list" -> (() => spark.table(s"txdp.`$t`")
            .filter($"cat".isin("cat-0", "cat-4"))))
      queries.foreach { case (name, q) =>
        val driverRels = withThreshold(nFiles + 1) { scannedRels(q()) }
        val before = TxDistributedPrune.runs.get()
        val (distRels, rows) = withThreshold(1) {
          (scannedRels(q()), q().collect().toSet)
        }
        assert(TxDistributedPrune.runs.get() > before,
          s"$name: distributed path must engage below the threshold")
        assert(distRels == driverRels,
          s"$name: kept sets diverge — driver ${driverRels.size} vs " +
            s"distributed ${distRels.size}")
        val driverRows = withThreshold(nFiles + 1) { q().collect().toSet }
        assert(rows == driverRows, s"$name: answers diverge")
      }
      // at least one of the queries must actually prune (a parity spec
      // over all-kept sets would prove nothing)
      val pruned = withThreshold(1) {
        scannedRels(spark.table(s"txdp.`$t`")
          .filter($"ts" >= "2024-05-13 00:00:00")).size
      }
      assert(pruned < nFiles, "fixture must exercise real pruning")
    }
  }

  test("the threshold gates engagement: sandbox-size scans stay on the driver walk by default") {
    registered {
      val t = fixture()
      val before = TxDistributedPrune.runs.get()
      // default threshold is 100000 files — never crossed here
      val df = spark.table(s"txdp.`$t`")
        .filter($"ts" >= "2024-05-13 00:00:00")
      df.collect()
      assert(TxDistributedPrune.runs.get() == before,
        "default threshold must keep small scans on the driver walk")
    }
  }

  test("no-pruning-context scans skip the job even past the threshold (nothing to evaluate)") {
    registered {
      val t = fixture()
      withThreshold(1) {
        val before = TxDistributedPrune.runs.get()
        spark.table(s"txdp.`$t`").collect() // no filters at all
        assert(TxDistributedPrune.runs.get() == before,
          "an unfiltered scan has no stage context; scheduling a job " +
            "for it would be pure overhead")
      }
    }
  }
}
