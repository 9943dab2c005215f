package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Round-10 maintenance/observability closures: VACUUM DRY RUN (report
  * the would-be deletions, touch nothing), the `t#refs` system table
  * (tags + branches as one queryable frame), and the `analyze_layout`
  * advisor (per-bucket fragmentation/deleted-fraction/bytes with the
  * maintenance action — the scheduled-OPTIMIZE decision input). */
class MaintenanceSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txmt",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txmt")
  }

  private def fresh(): String = {
    val t = Files.createTempDirectory("graft_mt_").toString + "/t"
    TxTable.init(spark, t,
      (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
    t
  }

  test("vacuum dry run reports exactly what the real run then deletes — and deletes nothing itself") {
    registered {
      val t = fresh()
      // fragment + compact so old files and manifests become prunable
      TxTable.appendOnce(spark, t,
        (1 to 8).map(i => (s"A$i", i + 100L)).toDF("k", "v"),
        "k", 4, "mt-spec", 1L)
      TxTable.compact(spark, t, maxFilesPerBucket = 1)
      val before = TxTable.snapshot(spark, t)
      val planned = spark.sql(
        s"CALL txmt.vacuum('$t', 1, 0, -1, true)").as[Int].head()
      assert(planned > 0, "there must be prunable state to report")
      // NOTHING changed: all versions still resolvable, all files intact
      (0L to before.version).foreach(v =>
        assert(TxTable.snapshot(spark, t, Some(v)).version == v))
      // the real run deletes the same count (no racing writers here)
      val deleted = TxTable.vacuum(spark, t, keepVersions = 1,
        orphanRetentionMs = 0L)
      assert(deleted.size == planned,
        s"dry run planned $planned, real run deleted ${deleted.size}")
      assert(TxTable.read(spark, t).count() == 40)
    }
  }

  test("t#refs lists tags and branches with kind/version/commits; empty when none") {
    registered {
      val t = fresh()
      assert(spark.table(s"txmt.`$t#refs`").count() == 0)
      TxTable.tag(spark, t, "train-v1")
      TxTable.createBranch(spark, t, "dev")
      TxTable.appendToBranch(spark, t, "dev",
        Seq(("B1", 500L)).toDF("k", "v"))
      spark.conf.set("spark.graft.wap.id", "aud")
      try spark.sql(s"INSERT INTO txmt.`$t` VALUES ('W1', 999)")
      finally spark.conf.unset("spark.graft.wap.id")
      val refs = spark.table(s"txmt.`$t#refs`")
        .as[(String, String, Long, Int)].collect().toSet
      assert(refs == Set(("dev", "branch", 0L, 1),
        ("train-v1", "tag", 0L, 0), ("aud", "wap", 0L, 1)))
      TxTable.dropStaged(spark, t, "aud")
      // SQL-composable like every system table
      assert(spark.sql(
        s"SELECT count(*) FROM txmt.`$t#refs` WHERE kind = 'branch'")
        .as[Long].head() == 1L)
      TxTable.dropBranch(spark, t, "dev")
      assert(spark.table(s"txmt.`$t#refs`").count() == 1)
    }
  }

  test("zorder with AUTO bounds: derived from zone maps (ANALYZE on demand), prunes like explicit bounds") {
    registered {
      val t = Files.createTempDirectory("graft_mt_z_").toString + "/t"
      // scattered layout: every pre-compact file overlaps any x bound
      def batch(seed: Int) = (0 until 256).map { i =>
        (s"k${seed}_$i", ((i * 37 + seed * 11) % 256).toLong,
          ((i * 53 + seed * 7) % 256).toLong)
      }.toDF("k", "x", "y").coalesce(2)
      TxTable.init(spark, t, batch(0), "k", 4)
      for (b <- 1 until 5)
        TxTable.appendOnce(spark, t, batch(b), "k", 4, "za", b - 1L)
      // derived bounds match the data's actual range — no sidecar exists
      // yet for y, so the derivation ANALYZEs footer-first on demand
      val derived = TxTable.zOrderAutoBounds(spark, t, Seq("x", "y"))
      assert(derived == Seq(("x", 0.0, 255.0), ("y", 0.0, 255.0)))
      val beforeRows = TxTable.readWhere(spark, t, "x", 0L, 31L)
      val beforeFiles = beforeRows.inputFiles.length
      assert(beforeFiles > 4)
      val n = spark.sql(s"CALL txmt.zorder('$t', 'x,y')").as[Int].head()
      assert(n == 4, s"all four buckets fragmented, compacted $n")
      val after = TxTable.readWhere(spark, t, "x", 0L, 31L)
      assert(after.inputFiles.length < beforeFiles,
        s"auto-bounded z-order must prune: ${after.inputFiles.length} " +
          s"vs $beforeFiles")
      assert(after.count() == beforeRows.count())
      // a non-numeric column refuses loudly
      val e = intercept[Exception] {
        TxTable.zOrderAutoBounds(spark, t, Seq("k", "x"))
      }
      assert(e.getMessage.contains("numeric"))
    }
  }

  test("bounded compaction slices: max_buckets rewrites the worst offenders first and converges") {
    registered {
      val t = fresh() // 4 buckets, 1 file each
      // fragment unevenly: several appends → every bucket gains files
      (1 to 6).foreach(b => TxTable.appendOnce(spark, t,
        (1 to 8).map(i => (s"S$b-$i", (b * 100 + i).toLong)).toDF("k", "v"),
        "k", 4, "mt-slice", b.toLong))
      val before = TxTable.snapshot(spark, t)
      val fragBefore = before.entries.groupBy(_.bucket)
        .filter(_._2.size > 1)
      assert(fragBefore.size == 4, "all four buckets fragmented")
      val worst = fragBefore.maxBy { case (b, es) => (es.size, -b) }._1
      // one slice of budget 1 → exactly the worst bucket rewrites
      val n1 = spark.sql(s"CALL txmt.compact('$t', 1, 1)").as[Int].head()
      assert(n1 == 1)
      val mid = TxTable.snapshot(spark, t)
      assert(mid.entries.count(_.bucket == worst) == 1,
        "the worst bucket must be compacted to one file")
      val untouched = before.entries.filter(_.bucket != worst).map(_.rel)
      assert(untouched.forall(mid.entries.map(_.rel).toSet),
        "other buckets' files carry verbatim")
      // repeated slices converge; the data never changes
      var guard = 0
      while (TxTable.compact(spark, t, maxFilesPerBucket = 1,
          maxBuckets = 1) > 0 && guard < 10) guard += 1
      assert(guard <= 3, "three remaining buckets -> three slices")
      val after = TxTable.snapshot(spark, t)
      assert(after.entries.groupBy(_.bucket).forall(_._2.size == 1))
      assert(TxTable.read(spark, t).count() == 32 + 48)
    }
  }

  test("analyze_layout recommends compact for fragmented buckets and purge_deletes for DV-heavy ones") {
    registered {
      val t = fresh()
      // healthy table: every bucket 'ok'
      val ok = spark.sql(s"CALL txmt.analyze_layout('$t')")
      assert(ok.select("recommendation").as[String].collect()
        .forall(_ == "ok"))
      // fragment every bucket past the default max_files_per_bucket
      (1 to 5).foreach(b => TxTable.appendOnce(spark, t,
        (1 to 8).map(i => (s"F$b-$i", (b * 1000 + i).toLong)).toDF("k", "v"),
        "k", 4, "mt-frag", b.toLong))
      val frag = spark.sql(s"CALL txmt.analyze_layout('$t')")
        .select($"bucket", $"n_files", $"recommendation")
        .as[(Int, Int, String)].collect()
      assert(frag.exists(_._3 == "compact"))
      frag.filter(_._2 > 4).foreach { case (_, _, rec) =>
        assert(rec == "compact")
      }
      TxTable.compact(spark, t, maxFilesPerBucket = 1)
      // MOR-delete a third of the rows -> purge recommendation
      val n = TxTable.read(spark, t).count()
      assert(TxTable.deleteWhereMor(spark, t,
        $"v" >= 1L && $"v" <= 12L) == 12L)
      val dv = spark.sql(s"CALL txmt.analyze_layout('$t')")
        .select($"deleted_rows", $"recommendation")
        .as[(Long, String)].collect()
      assert(dv.filter(_._1 > 0).forall(_._2 == "purge_deletes"),
        s"DV-heavy buckets must recommend purge_deletes: ${dv.toSeq}")
      assert(dv.map(_._1).sum == 12L)
      assert(n == 72L)
    }
  }

  test("open eq-delete registries surface in analyze_layout (bucket=-1 pressure row) and t#refs (kind=eqdelete) — and vanish at the fold") {
    registered {
      val t = fresh()
      // a healthy registry-less table shows neither surface
      assert(spark.sql(s"CALL txmt.analyze_layout('$t')")
        .filter($"bucket" === -1).count() == 0)
      assert(spark.table(s"txmt.`$t#refs`")
        .filter($"kind" === "eqdelete").count() == 0)
      // two registrations: the layout advisor folds them into ONE
      // bucket=-1 row (files = open entries, rows = known key tuples),
      // the refs table lists each entry like a WAP id
      assert(TxTable.deleteWhereEq(spark, t,
        Seq("K1", "K2", "K3").toDF("k")) == 3L)
      assert(TxTable.deleteWhereEq(spark, t,
        Seq("K4", "K5").toDF("k")) == 2L)
      val reg = spark.sql(s"CALL txmt.analyze_layout('$t')")
        .filter($"bucket" === -1)
        .select($"n_files", $"rows", $"deleted_rows", $"total_bytes",
          $"recommendation", $"detail")
        .as[(Int, Long, Long, Long, String, String)].collect()
      assert(reg.length == 1)
      val (nEntries, keys, del0, bytes, rec, detail) = reg.head
      assert(nEntries == 2 && keys == 5L && del0 == 0L && bytes > 0L)
      assert(rec == "fold_eq_deletes")
      assert(detail.contains("keys=5") && detail.contains("budget="),
        s"the detail must name the budget pressure: $detail")
      // per-bucket rows keep their own shape (no detail, real buckets)
      assert(spark.sql(s"CALL txmt.analyze_layout('$t')")
        .filter($"bucket" >= 0 && $"detail".isNotNull).count() == 0)
      val eqRefs = spark.table(s"txmt.`$t#refs`")
        .filter($"kind" === "eqdelete")
        .as[(String, String, Long, Int)].collect().sortBy(_._3)
      assert(eqRefs.length == 2)
      assert(eqRefs.map(_._3).toSeq == Seq(1L, 2L),
        "version = each delete's own commit")
      assert(eqRefs.map(_._4).toSeq == Seq(3, 2),
        "count = the entry's known key tuples")
      // the recommended action clears both surfaces; the data already
      // read as deleted before it
      assert(TxTable.read(spark, t).count() == 27L)
      assert(TxTable.foldEqDeletes(spark, t) >= 1)
      assert(spark.sql(s"CALL txmt.analyze_layout('$t')")
        .filter($"bucket" === -1).count() == 0)
      assert(spark.table(s"txmt.`$t#refs`")
        .filter($"kind" === "eqdelete").count() == 0)
      assert(TxTable.read(spark, t).count() == 27L)
    }
  }

  test("vacuum at file-count scale: one-level orphan listing, distributed recursive deletes past the threshold") {
    val t = java.nio.file.Files.createTempDirectory("graft_vd_")
      .toString + "/t"
    TxTable.init(spark, t,
      (1 to 8).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 2)
    // simulate a fleet of crashed writers: 100 unreferenced staging dirs
    // (each with nested partition/bucket levels and a data file, so the
    // recursive delete has real work)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1 to 100).foreach { i =>
      val d = new org.apache.hadoop.fs.Path(t,
        s"files/orphan-$i/part-19793/bucket-0")
      fs.mkdirs(d)
      val out = fs.create(new org.apache.hadoop.fs.Path(d, "x.parquet"))
      out.write(Array.fill(16)(i.toByte)); out.close()
      // age past the in-flight horizon used below
      fs.setTimes(new org.apache.hadoop.fs.Path(t, s"files/orphan-$i"),
        System.currentTimeMillis() - 120000L, -1L)
    }
    // dry run reports the full set without deleting (and never
    // distributes)
    val report = TxTable.vacuum(spark, t, keepVersions = 1,
      orphanRetentionMs = 60000L, dryRun = true, distributeDeletesAt = 8)
    assert(report.count(_.contains("/files/orphan-")) == 100, report.size)
    assert(fs.exists(new org.apache.hadoop.fs.Path(t, "files/orphan-50")))
    // the real sweep crosses the threshold -> the cluster-parallel path
    val swept = TxTable.vacuum(spark, t, keepVersions = 1,
      orphanRetentionMs = 60000L, distributeDeletesAt = 8)
    assert(swept.count(_.contains("/files/orphan-")) == 100)
    (1 to 100).foreach { i =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(t,
        s"files/orphan-$i")), s"orphan-$i must be gone")
    }
    // referenced data is untouched and the table reads fine
    assert(TxTable.read(spark, t).count() == 8)
  }
}
