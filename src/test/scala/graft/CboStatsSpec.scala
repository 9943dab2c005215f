package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** DSv2 column statistics for the CBO: the zone-map sidecars fold into
  * per-column (min, max, nullCount) over the planned file set, and
  * NDV-ANALYZEd columns add a distinctCount from merged per-file HLL
  * sketches. The pin is the DECISION, not the numbers: a selective range
  * filter joined to a large table plans sort-merge without stats (the
  * filter's size estimate stays the child's) and flips to broadcast-hash
  * once column stats let FilterEstimation see the true selectivity. */
class CboStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txcbo",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txcbo")
  }

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val prev = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def joins(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        "smj"
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        "bhj"
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        "shj"
    }

  test("a selective range filter flips the join to broadcast ONLY with column stats present; NDV estimate within 5%") {
    registered {
      val base = Files.createTempDirectory("graft_cbo_").toString
      val fact = s"$base/fact"
      val dim = s"$base/dim"
      val n = 60000L
      TxTable.init(spark, fact,
        spark.range(n).select(col("id").as("k"),
          (col("id") % 10000).as("v"),
          concat(lit("payload-"), col("id")).as("pad")),
        "k", 4)
      TxTable.init(spark, dim,
        spark.range(n).select(col("id").as("k"),
          concat(lit("dim-"), col("id")).as("d")),
        "k", 4)
      withConfs(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString) {
        def query = spark.table(s"txcbo.`$dim`")
          .join(spark.table(s"txcbo.`$fact`").filter($"v" > 9990),
            Seq("k"))
        // WITHOUT column stats the filter's estimate stays its child's
        // size (both sides well past the 256 KB threshold): sort-merge
        assert(joins(query) == Seq("smj"),
          s"expected smj pre-stats, got ${joins(query)}")
        // ANALYZE with distinct sketches — one column-pruned scan
        val profiled = spark.sql(
          s"CALL txcbo.compute_stats_ndv('$fact', 'v')").as[Int].head()
        assert(profiled > 0)
        // the CBO now sees min/max/ndv: v > 9990 is ~0.1% selective,
        // the filtered side estimates under the threshold -> broadcast
        assert(joins(query) == Seq("bhj"),
          s"expected bhj with stats, got ${joins(query)}")
        // and the answers are identical either way
        assert(query.count() ==
          n / 10000 * 9) // v in 9991..9999 -> 9 ids per 10k block
        // the reported NDV folds the per-file sketches: ~10000 ± 5%
        val ndvSeen = query.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation
              if r.relation.table.name.contains("fact") => r
        }.headOption.flatMap(r => r.stats.attributeStats.find(
          _._1.name == "v").flatMap(_._2.distinctCount))
        // MUST be visible immediately: the pre-ANALYZE smj probe above
        // already asked for this version's NDV and memoized the miss —
        // the memo is keyed by the sidecar mtime precisely so the
        // ANALYZE (which rewrites the sidecar WITHOUT a table commit)
        // invalidates it (a version-keyed memo pins the miss forever)
        assert(ndvSeen.isDefined,
          "NDV computed by compute_stats_ndv must surface without an " +
            "intervening table commit")
        ndvSeen.foreach(d => assert(
          math.abs(d.toLong - 10000L) <= 500, s"ndv=$d"))
        // stats vanish when CBO is off: no fold is paid, plan reverts
        withConfs("spark.sql.cbo.enabled" -> "false") {
          assert(joins(query) == Seq("smj"))
        }
        // a fresh append lands a sketch-less file (footer auto-refresh
        // gives it min/max only): honest coverage withdraws the NDV;
        // re-ANALYZE is INCREMENTAL — only the new files rescan — and
        // the fold returns
        TxTable.appendOnce(spark, fact,
          spark.range(60000, 61000).select(col("id").as("k"),
            (col("id") % 10000).as("v"),
            concat(lit("payload-"), col("id")).as("pad")),
          "k", 4, appId = "cbo-frag", batchId = 1L)
        val total = TxTable.snapshot(spark, fact).entries.size
        val reprofiled = spark.sql(
          s"CALL txcbo.compute_stats_ndv('$fact', 'v')").as[Int].head()
        assert(reprofiled > 0 && reprofiled < total,
          s"NDV re-ANALYZE must be incremental: $reprofiled of $total")
        val ndv2 = query.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation
              if r.relation.table.name.contains("fact") => r
        }.headOption.flatMap(r => r.stats.attributeStats.find(
          _._1.name == "v").flatMap(_._2.distinctCount))
        assert(ndv2.exists(d => math.abs(d.toLong - 10000L) <= 500),
          s"ndv after incremental re-ANALYZE: $ndv2")
      }
    }
  }

  test("CBO join reorder: with column stats a 3-table chain joins the selective pair first; without stats the written order stands") {
    registered {
      val base = Files.createTempDirectory("graft_cbo3_").toString
      val a = s"$base/a"; val b = s"$base/b"; val c = s"$base/c"
      val n = 40000L
      // a ⋈ b is 1:1 on k (40k rows); a ⋈ c is selective: c holds only
      // 200 matching keys — joining (a ⋈ c) first shrinks the chain
      TxTable.init(spark, a, spark.range(n).select(col("id").as("k"),
        (col("id") % 5000).as("v"),
        concat(lit("a-"), col("id")).as("pa")), "k", 4)
      TxTable.init(spark, b, spark.range(n).select(col("id").as("k"),
        concat(lit("b-"), col("id")).as("pb")), "k", 4)
      TxTable.init(spark, c, spark.range(200).select(
        (col("id") * 100).as("k"), concat(lit("c-"), col("id")).as("pc")),
        "k", 4)
      Seq(a, b, c).foreach(t =>
        spark.sql(s"CALL txcbo.compute_stats_ndv('$t', 'k')"))
      withConfs(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false",
        // force every join shuffled so ORDER (not broadcast) is the
        // observable decision
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        // written order: (a ⋈ b) ⋈ c — the worst order (the 1:1 join
        // first keeps 40k rows in flight before c's 200 keys cut them)
        def query = spark.table(s"txcbo.`$a`")
          .join(spark.table(s"txcbo.`$b`"), Seq("k"))
          .join(spark.table(s"txcbo.`$c`"), Seq("k"))
        def firstJoinTables(df: org.apache.spark.sql.DataFrame)
            : Set[String] = {
          // the DEEPEST Join in the optimized tree = the pair joined
          // first; report which base tables feed it
          val plan = df.queryExecution.optimizedPlan
          val joins = plan.collect {
            case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
          }
          val deepest = joins.last
          deepest.collectLeaves().collect {
            case r: org.apache.spark.sql.execution.datasources.v2
                .DataSourceV2ScanRelation => r.relation.table.name()
          }.map(_.split('/').last).toSet
        }
        assert(firstJoinTables(query) == Set("a", "c"),
          s"CBO must reorder the selective pair first, " +
            s"got ${firstJoinTables(query)}")
        withConfs("spark.sql.cbo.enabled" -> "false") {
          assert(firstJoinTables(query) == Set("a", "b"),
            "without stats the written order must stand")
        }
        assert(query.count() == 200)
      }
    }
  }

  test("min/max/nullCount come from zone maps without an NDV pass; the commit auto-refresh keeps the fold current across appends") {
    registered {
      val base = Files.createTempDirectory("graft_cbo2_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        spark.range(1000).select(col("id").as("k"), col("id").as("v")),
        "k", 2)
      TxTable.computeStats(spark, t, "v") // footer-first, no sketches
      withConfs("spark.sql.cbo.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false") {
        def vStats = spark.table(s"txcbo.`$t`")
          .queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.v2
                .DataSourceV2ScanRelation => r
          }.head.stats.attributeStats.find(_._1.name == "v").map(_._2)
        val s0 = vStats
        assert(s0.exists(_.min.isDefined) && s0.exists(_.max.isDefined),
          s"zone-map min/max must surface: $s0")
        assert(s0.exists(_.nullCount.contains(BigInt(0))))
        assert(s0.forall(_.distinctCount.isEmpty),
          "no NDV without a sketch pass")
        // an append auto-refreshes the sidecar from the new file's
        // footer (commit-time ride-along), so the fold stays CURRENT:
        // the new extreme surfaces immediately — never a stale max
        // (and had the refresh been lost, rels.forall coverage would
        // withdraw the column's stats rather than serve the stale fold)
        TxTable.appendOnce(spark, t,
          spark.range(5000, 5100).select(col("id").as("k"),
            col("id").as("v")), "k", 2, appId = "cbo2", batchId = 1L)
        val s1 = vStats
        assert(s1.isEmpty || s1.exists(_.max.contains(5099L)) ||
          s1.exists(_.max.isEmpty), s"stale stats served: $s1")
        assert(!s1.exists(_.max.contains(999L)),
          "a stale pre-append max must never be served")
      }
    }
  }

  test("partition envelopes feed the CBO with ZERO sidecars: a days(ts) table bounds ts from its paths and flips the selective join; identity fields report an exact NDV") {
    registered {
      val base = Files.createTempDirectory("graft_cbo5_").toString
      val fact = s"$base/fact"
      val dim = s"$base/dim"
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // 30 days x 2000 rows, deliberately NEVER ANALYZEd — the only
      // stats source is the part-<day>/ envelope
      spark.sql(s"""CREATE TABLE txcbo.`$fact`
        (k BIGINT, ts TIMESTAMP, region STRING, pad STRING)
        PARTITIONED BY (days(ts), identity(region), bucket(4, k))""")
      (0 until 30).foreach { d =>
        spark.range(d * 2000L, d * 2000L + 2000)
          .select(col("id").as("k"),
            lit(ts(f"2024-04-${d + 1}%02d 12:00:00")).as("ts"),
            concat(lit("r"), col("id") % 3).as("region"),
            concat(lit("pad-"), col("id")).as("pad"))
          .writeTo(s"txcbo.`$fact`").append()
      }
      TxTable.init(spark, dim,
        spark.range(60000L).select(col("id").as("k"),
          concat(lit("d-"), col("id")).as("d")), "k", 4)
      withConfs(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> (512 * 1024).toString) {
        def query = spark.table(s"txcbo.`$dim`")
          .join(spark.table(s"txcbo.`$fact`")
            .filter($"ts" >= "2024-04-30 00:00:00"), Seq("k"))
        val scan = spark.table(s"txcbo.`$fact`")
          .queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.v2
                .DataSourceV2ScanRelation => r
          }.head
        val tsStats = scan.stats.attributeStats.find(_._1.name == "ts")
          .map(_._2)
        assert(tsStats.exists(s => s.min.isDefined && s.max.isDefined),
          s"ts must bound from partition envelopes: $tsStats")
        val regionStats = scan.stats.attributeStats
          .find(_._1.name == "region").map(_._2)
        assert(regionStats.exists(_.distinctCount.contains(BigInt(3))),
          s"identity field must report its EXACT segment NDV: " +
            s"$regionStats")
        // the 1/30-selective day filter broadcasts (here BOTH partition
        // pruning and the envelope min/max agree — the stats assertions
        // above are the envelope-specific pin; the pruning path is
        // pinned in PartitionTransformSpec)
        assert(joins(query) == Seq("bhj"),
          s"expected bhj, got ${joins(query)}")
        assert(query.count() == 2000L)
      }
    }
  }

  test("nullCount is clamped to the DV-adjusted live row count after MOR deletes") {
    registered {
      val base = Files.createTempDirectory("graft_cbo4_").toString
      val t = s"$base/t"
      // v is NULL on 80% of rows; a MOR delete then removes half the
      // table — the sidecar's ANALYZE-time null counts (whole-file) now
      // exceed the live row count, and an unclamped CBO would see
      // nullCount > rowCount (impossible) and skew selectivity
      TxTable.init(spark, t,
        spark.range(1000).select(col("id").as("k"),
          when(col("id") % 5 === 0, col("id")).as("v")),
        "k", 2)
      TxTable.computeStats(spark, t, "v")
      val killed = TxTable.deleteWhereMor(spark, t, col("k") >= 100)
      assert(killed == 900L)
      withConfs("spark.sql.cbo.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false") {
        val scan = spark.table(s"txcbo.`$t`")
          .queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.v2
                .DataSourceV2ScanRelation => r
          }.head
        val rowCount = scan.stats.rowCount
        val vNulls = scan.stats.attributeStats.find(_._1.name == "v")
          .flatMap(_._2.nullCount)
        assert(rowCount.contains(BigInt(100)), s"live rows: $rowCount")
        // raw sidecar sum is 800 nulls; live rows are 100 — the clamp
        // must cap the report (over-counting after the clamp only
        // under-estimates a not-null predicate, never inverts it)
        vNulls.foreach(nc => assert(nc <= BigInt(100),
          s"nullCount $nc exceeds live row count 100"))
        assert(vNulls.isDefined, "nullCount must still surface")
      }
    }
  }
}
