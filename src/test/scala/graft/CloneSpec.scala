package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Shallow CLONE (the Delta CLONE / Iceberg snapshot-export shape): a
  * zero-copy table fork whose v0 manifest references the source's live
  * files, pinning the source version in the source's own log; both sides
  * then diverge independently, source vacuum never breaks a live clone,
  * and clone-side maintenance localizes rows until the pin can release. */
class CloneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txcl",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txcl")
  }

  private def fresh(n: Int = 32): String = {
    val t = Files.createTempDirectory("graft_cl_").toString + "/src"
    TxTable.init(spark, t,
      (1 to n).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
    t
  }

  private def dataBytes(dir: String): Long = {
    val d = new java.io.File(dir, "files")
    if (!d.exists()) 0L
    else {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).fold(0L)(_.map(walk).sum)
      walk(d)
    }
  }

  test("clone shares bytes: zero data I/O at create, identical reads, pin visible in the source's refs") {
    registered {
      val src = fresh()
      val dst = Files.createTempDirectory("graft_cl_").toString + "/dst"
      val snap = TxTable.cloneTable(spark, src, dst)
      assert(dataBytes(dst) == 0L,
        "a shallow clone must not copy or write a single data byte")
      assert(snap.entries.nonEmpty &&
        snap.entries.forall(_.rel.startsWith("..")),
        s"clone entries must reference the source: " +
          snap.entries.take(2).map(_.rel))
      assert(TxTable.read(spark, dst).select($"k", $"v")
        .as[(String, Long)].collect().toSet ==
        TxTable.read(spark, src).select($"k", $"v")
          .as[(String, Long)].collect().toSet)
      // the pin is an ordinary immutable tag in the SOURCE's log
      val pins = TxTable.tags(spark, src).filter(_._1.startsWith("clone."))
      assert(pins.values.toSeq == Seq(0L))
      assert(spark.table(s"txcl.`$src#refs`")
        .filter($"name".startsWith("clone.")).count() == 1)
    }
  }

  test("divergence is independent on both sides; a clone-side DELETE writes locally and never touches source bytes") {
    registered {
      val src = fresh()
      val dst = Files.createTempDirectory("graft_cl_").toString + "/dst"
      TxTable.cloneTable(spark, src, dst)
      val srcBytes = dataBytes(src)
      // clone-side append + SQL DELETE over SHARED files
      TxTable.appendOnce(spark, dst,
        Seq(("C1", 100L), ("C2", 200L)).toDF("k", "v"),
        "k", 4, "cl-app", 1L)
      spark.sql(s"DELETE FROM txcl.`$dst` WHERE v <= 4")
      // source-side append + delete of DIFFERENT rows
      TxTable.appendOnce(spark, src,
        Seq(("S1", 7L)).toDF("k", "v"), "k", 4, "cl-src", 1L)
      spark.sql(s"DELETE FROM txcl.`$src` WHERE v >= 30")
      val cloneKs = TxTable.read(spark, dst)
        .select($"k").as[String].collect().toSet
      assert(cloneKs.contains("C1") && cloneKs.contains("C2"))
      assert(!cloneKs.contains("S1"), "source appends must not leak in")
      assert(!cloneKs.contains("K4") && cloneKs.contains("K30"),
        "the clone keeps ITS OWN delete, not the source's")
      val srcKs = TxTable.read(spark, src)
        .select($"k").as[String].collect().toSet
      assert(srcKs.contains("S1") && srcKs.contains("K4") &&
        !srcKs.contains("K30"))
      assert(dataBytes(src) == srcBytes +
        (dataBytes(src) - srcBytes).max(0L)) // no source file shrank
      assert(TxTable.read(spark, dst).count() == 28 + 2)
    }
  }

  test("source vacuum never breaks a live clone; release_clone + vacuum then collects; compact localizes first") {
    registered {
      val src = fresh()
      val dst = Files.createTempDirectory("graft_cl_").toString + "/dst"
      spark.sql(s"CALL txcl.clone('$src', '$dst')")
      // source moves on and rewrites everything (so v0's files become
      // pre-horizon): overwrite-ish via delete + append, then vacuum hard
      spark.sql(s"DELETE FROM txcl.`$src` WHERE v <= 16")
      TxTable.appendOnce(spark, src,
        (101 to 116).map(i => (s"N$i", i.toLong)).toDF("k", "v"),
        "k", 4, "cl-mv", 1L)
      TxTable.compact(spark, src)
      TxTable.vacuum(spark, src, keepVersions = 1)
      // the clone still serves the EXACT cloned snapshot
      assert(TxTable.read(spark, dst).select($"k", $"v")
        .as[(String, Long)].collect().toSet ==
        (1 to 32).map(i => (s"K$i", i.toLong)).toSet,
        "source vacuum must not collect files a live clone references")
      // the incremental deep copy rewrites shared rows into the clone
      assert(spark.sql(s"CALL txcl.localize_clone('$dst')")
        .as[Int].head() > 0)
      val post = TxTable.snapshot(spark, dst)
      assert(post.entries.forall(!_.rel.startsWith("..")),
        s"localize must leave nothing shared: " +
          post.entries.take(2).map(_.rel))
      assert(spark.sql(s"CALL txcl.localize_clone('$dst')")
        .as[Int].head() == 0)
      assert(dataBytes(dst) > 0L)
      // now the pin can release; a later source vacuum is free to
      // collect, and the clone keeps working from its own bytes
      assert(spark.sql(s"CALL txcl.release_clone('$dst')")
        .as[Boolean].head())
      assert(TxTable.tags(spark, src).isEmpty)
      TxTable.vacuum(spark, src, keepVersions = 1)
      assert(TxTable.read(spark, dst).count() == 32)
    }
  }

  test("clone of a hidden-partitioned table keeps partition pruning and the transform for new writes") {
    registered {
      val base = Files.createTempDirectory("graft_cl_hp_").toString
      val src = s"$base/src"
      spark.sql(s"""CREATE TABLE txcl.`$src`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      (0 until 20).map(i => (i.toLong,
        java.sql.Timestamp.valueOf(f"2024-03-${10 + i / 10}%02d 01:00:00"),
        s"e$i")).toDF("id", "ts", "kind")
        .writeTo(s"txcl.`$src`").append()
      val dst = s"$base/dst"
      TxTable.cloneTable(spark, src, dst)
      // cross-table rels keep their part-<day> segments → pruning works
      val one = spark.table(s"txcl.`$dst`")
        .filter($"ts" >= "2024-03-11 00:00:00")
      assert(one.count() == 10)
      val planned = one.queryExecution.executedPlan.collectLeaves().map {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.map {
            case f: org.apache.spark.sql.execution.datasources.FilePartition =>
              f.files.length
            case _ => 0
          }.sum
        case _ => 0
      }.sum
      val day2 = TxTable.snapshot(spark, dst).entries.count(e =>
        graft.ops.PartitionTransforms.partOfRel(e.rel).exists(_ >= 19793L))
      assert(planned == day2 && day2 < TxTable.snapshot(spark, dst)
        .entries.size)
      // new clone-side writes keep splitting by the inherited transform
      spark.sql(s"INSERT INTO txcl.`$dst` VALUES " +
        "(100, TIMESTAMP '2024-03-20 00:00:00', 'x')")
      val newest = TxTable.snapshot(spark, dst).entries
        .filterNot(_.rel.startsWith(".."))
      assert(newest.nonEmpty && newest.forall(e =>
        graft.ops.PartitionTransforms.partOfRel(e.rel).contains(19802L)))
      TxTable.releaseClone(spark, dst)
    }
  }

  test("refusals: cloning onto an existing table, and a failed clone leaves no dangling pin") {
    registered {
      val src = fresh(8)
      val dst = Files.createTempDirectory("graft_cl_").toString + "/dst"
      TxTable.cloneTable(spark, src, dst)
      intercept[Exception] { TxTable.cloneTable(spark, src, dst) }
      // exactly ONE pin (the failed clone withdrew its own)
      assert(TxTable.tags(spark, src)
        .count(_._1.startsWith("clone.")) == 1)
      TxTable.releaseClone(spark, dst)
      assert(!TxTable.releaseClone(spark, dst) ||
        TxTable.tags(spark, src).isEmpty)
    }
  }

  test("ANALYZE on a clone keys sidecars by manifest rels: zone-map pruning works over shared files") {
    registered {
      val src = Files.createTempDirectory("graft_cl_an_").toString + "/src"
      TxTable.init(spark, src,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      TxTable.appendOnce(spark, src,
        (33 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"),
        "k", 4, "an", 1L)
      val dst = Files.createTempDirectory("graft_cl_an_").toString + "/dst"
      TxTable.cloneTable(spark, src, dst)
      // the clone starts stats-less; ANALYZE over the SHARED files must
      // key the sidecar by the clone's ../ manifest rels (manifestRel
      // canonicalization), or pruning would silently never engage
      TxTable.computeStats(spark, dst, "v")
      val stats = TxTable.fileStats(spark, dst, "v")
      assert(stats.nonEmpty && stats.keys.forall(_.startsWith("..")),
        s"sidecar keys must be the clone's manifest rels: " +
          stats.keys.take(2))
      val pruned = TxTable.readWhere(spark, dst, "v", 60L, 64L)
      assert(pruned.count() == 5)
      TxTable.releaseClone(spark, dst)
    }
  }

  test("cloning a generated-column table carries the expression: clone-side writes compute, conflicts refuse") {
    registered {
      val base = Files.createTempDirectory("graft_cl_gc_").toString
      val src = s"$base/src"
      spark.sql(s"""CREATE TABLE txcl.`$src` (
        id BIGINT, ts TIMESTAMP,
        event_date DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
        PARTITIONED BY (bucket(2, id))""")
      spark.sql(s"INSERT INTO txcl.`$src` (id, ts) " +
        "VALUES (1, TIMESTAMP '2024-03-10 08:00:00')")
      val dst = s"$base/dst"
      TxTable.cloneTable(spark, src, dst)
      spark.sql(s"INSERT INTO txcl.`$dst` (id, ts) " +
        "VALUES (2, TIMESTAMP '2024-04-01 09:00:00')")
      val got = spark.table(s"txcl.`$dst`").orderBy($"id")
        .select($"event_date".cast("string")).as[String].collect().toSeq
      assert(got == Seq("2024-03-10", "2024-04-01"),
        "the clone must compute generated values like the source")
      intercept[Exception] {
        spark.sql(s"INSERT INTO txcl.`$dst` VALUES " +
          "(3, TIMESTAMP '2024-04-02 00:00:01', DATE '2024-04-01')")
      }
      TxTable.releaseClone(spark, dst)
    }
  }
}
