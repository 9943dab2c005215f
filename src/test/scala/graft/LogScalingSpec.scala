package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Commit-LOG scaling curves — the storage sibling of ScalingCurveSpec
  * (which covers query kernels). Builds the same table shape at 1× and
  * 10× COMMIT counts (60 vs 600 commits: every 5th a real append, the
  * rest property commits — the mixed shape of a live table's log) and
  * pins the three driver-side log walks:
  *
  *   - snapshot resolution: O(CheckpointInterval) MANIFEST reads via the
  *     checkpoint anchors (the walk-back collects at most 20 deltas no
  *     matter how long the log is) + one log-dir listing + the anchor
  *     parse, which is O(live files at that version) — a snapshot must
  *     materialize its entry list, so files (not commits) are its true
  *     scale input. Pinned ≤ 3 with the 0.25 s floor: measured ~10 ms
  *     per head resolution at 600 commits / ~960 files.
  *   - scan planning (catalog load + per-file envelope/zone-map prune):
  *     driver-side O(live files). Files grow ~10× with the appends here,
  *     so the pin is the same ≤ 12 near-linear bound the kernel curves
  *     use (measured 1.7 — analysis overhead still dominates).
  *   - CDF replay (changesBetween over the full range): O(commits) log
  *     walk + O(appended rows) data reads — both 10× here, so a LINEAR
  *     replay measures ≈ 10 by construction (measured 11.5: ~14 ms
  *     fixed per-commit frame cost). Pinned ≤ 15 — the pin catches a
  *     quadratic (≥ 30), not the expected linear 10.
  *
  * Ratios floor the denominator at 0.25 s (JVM noise guard, same as
  * ScalingCurveSpec); timed bodies loop enough iterations to clear the
  * floor at 1×. The checked-in LOG-SCALING section of SCALING.md is the
  * measured snapshot; this spec is the per-round re-validation. */
class LogScalingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txls",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txls")
  }

  /** A table whose log holds `appends` real append commits (20 rows
    * each, all 8 buckets touched) interleaved with 4 property commits
    * per append — commits = 5×appends + 1, live files ≈ 8×appends. */
  private def logTable(appends: Int): String = {
    val t = Files.createTempDirectory("graft_ls_").toString + "/t"
    TxTable.init(spark, t,
      (0 until 20).map(i => (i.toLong, i.toLong % 40, s"v$i"))
        .toDF("k", "day", "v"), "k", 8)
    (1 to appends).foreach { a =>
      TxTable.appendOnce(spark, t,
        (0 until 20).map(i => ((a * 1000 + i).toLong, (a % 40).toLong,
          s"v$a-$i")).toDF("k", "day", "v"),
        "k", 8, appId = "ls", batchId = a.toLong)
      (1 to 4).foreach(p => TxTable.setProperties(spark, t,
        set = Map("ls.tick" -> s"$a-$p")))
    }
    TxTable.computeStats(spark, t, "day")
    t
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  test("snapshot resolution stays O(checkpoint interval), scan planning stays O(files), CDF replay stays O(commits + rows) at 10x commits") {
    registered {
      val t1x = logTable(12) //  61 commits, ~96 live files
      val t10x = logTable(120) // 601 commits, ~960 live files
      val rows = Seq.newBuilder[String]
      def curve(name: String, pin: Double)(body: String => Unit): Unit = {
        body(t1x) // warm
        val a = Seq(time(body(t1x)), time(body(t1x))).min
        val b = Seq(time(body(t10x)), time(body(t10x))).min
        val ratio = b / math.max(a, 0.25)
        rows += f"| $name%-18s | $a%6.2f | $b%6.2f | $ratio%5.1f |"
        info(rows.result().last)
        assert(ratio <= pin,
          f"$name curves super-linearly over the LOG: T(1x)=$a%.2f s, " +
            f"T(10x)=$b%.2f s, ratio $ratio%.1f > $pin%.0f")
      }
      // 40 head resolutions per measurement: each walks back to the
      // nearest checkpoint (≤ 20 deltas) and folds forward — commit
      // COUNT must not appear in the cost beyond the one dir listing;
      // live-file count (the anchor parse) is the legitimate growth term
      curve("log_snapshot_head", pin = 3.0) { t =>
        (1 to 40).foreach(_ => TxTable.snapshot(spark, t))
      }
      // version-addressed resolution mid-log: same O(interval) walk
      curve("log_snapshot_pinned", pin = 3.0) { t =>
        val head = TxTable.snapshot(spark, t).version
        (1 to 40).foreach(i =>
          TxTable.snapshot(spark, t, Some(head / 2 + (i % 10))))
      }
      // full catalog scan planning with a pruning filter: analysis +
      // snapshot + per-file zone-map/envelope walk — O(live files)
      curve("log_scan_planning", pin = 12.0) { t =>
        (1 to 10).foreach { _ =>
          spark.table(s"txls.`$t`").filter($"day" === 5L)
            .queryExecution.executedPlan
        }
      }
      // full-range CDF replay: every commit's manifest diff + the
      // appended rows — both scale with the log, so linear ≈ 10 here
      curve("log_cdf_replay", pin = 15.0) { t =>
        TxTable.changesBetween(spark, t, 0L,
          TxTable.snapshot(spark, t).version).count()
        ()
      }
    }
  }

  test("distributed planning engages at the 10x-file fixture past the threshold and keeps the driver walk's exact file set") {
    registered {
      val t = logTable(60) // ~480 live files
      val nFiles = TxTable.snapshot(spark, t).entries.size
      assert(nFiles > 100, s"fixture too small: $nFiles")
      def kept(): Int =
        spark.table(s"txls.`$t`").filter($"day" === 5L)
          .queryExecution.executedPlan.collectLeaves().map {
            case b: org.apache.spark.sql.execution.datasources.v2
                .BatchScanExec => b.inputPartitions.length
            case _ => 0
          }.sum
      val driverKept = kept()
      val before = graft.sources.TxDistributedPrune.runs.get()
      spark.conf.set("spark.graft.planning.distributeAt", "100")
      try {
        val distKept = kept()
        assert(graft.sources.TxDistributedPrune.runs.get() > before,
          "the job path must engage past the threshold")
        assert(distKept == driverKept && driverKept < nFiles,
          s"kept sets must agree and genuinely prune: " +
            s"$distKept vs $driverKept of $nFiles")
      } finally spark.conf.unset("spark.graft.planning.distributeAt")
    }
  }

  test("sharded checkpoints make head-resolution driver work SUBLINEAR in files: zero entry materializations at 1x and 10x") {
    registered {
      // shardAt low so both fixtures cross it; the 10x fixture has ~10x
      // the live files of the 1x one — the pin is an exact ZERO driver
      // materializations for resolution + a pruned scan at BOTH scales,
      // which is stronger than any timing ratio (round-14 ask #2)
      spark.conf.set(TxTable.CheckpointShardAtConf, "40")
      spark.conf.set("spark.graft.planning.distributeAt", "40")
      try {
        Seq(logTable(12), logTable(120)).foreach { t =>
          val snap0 = TxTable.snapshot(spark, t)
          assert(snap0.entries.isInstanceOf[TxTable.LazyEntries],
            "fixture must resolve through a sharded anchor")
          val f0 = TxTable.LazyEntries.forces.get()
          (1 to 10).foreach { _ =>
            val s = TxTable.snapshot(spark, t)
            assert(s.entries.size > 0) // O(1) from shard counts
          }
          spark.table(s"txls.`$t`").filter($"day" === 5L)
            .queryExecution.executedPlan
          assert(TxTable.LazyEntries.forces.get() == f0,
            "10 head resolutions + a pruned scan plan must parse ZERO " +
              "entry lines on the driver — at this scale and at 10x it")
        }
      } finally {
        spark.conf.unset(TxTable.CheckpointShardAtConf)
        spark.conf.unset("spark.graft.planning.distributeAt")
      }
    }
  }
}
