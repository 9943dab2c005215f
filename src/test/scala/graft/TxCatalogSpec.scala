package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** The DSv2 catalog surface over TxTable: snapshot reads through
  * spark.table(), reported bucket partitioning, and the 100 TB headline —
  * storage-partitioned joins and aggregations that plan WITHOUT a shuffle
  * because the commit log's (key, nBuckets) identity is visible to the
  * planner. */
class TxCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nBuckets = 4

  private def freshTables(): (String, String) = {
    val base = Files.createTempDirectory("graft_cat_").toString
    val (a, b) = (s"$base/a", s"$base/b")
    val left = (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v")
    val right = (1 to 64).map(i => (s"K$i", i * 10L)).toDF("k", "w")
    TxTable.init(spark, a, left, "k", nBuckets)
    TxTable.init(spark, b, right, "k", nBuckets)
    (a, b)
  }

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txspj",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txspj")
  }

  private def tbl(path: String) = spark.table(s"txspj.`$path`")

  test("spark.table over a TxTable path reads the committed snapshot") {
    registered {
      val (a, _) = freshTables()
      val viaCatalog = tbl(a).select($"k", $"v")
        .as[(String, Long)].collect().toSet
      val viaApi = TxTable.read(spark, a).select($"k", $"v")
        .as[(String, Long)].collect().toSet
      assert(viaCatalog == viaApi && viaCatalog.size == 64)
      // snapshot isolation: rows committed after the table was resolved
      // are invisible to the pinned scan, visible to a fresh resolution
      val df = tbl(a)
      TxTable.appendOnce(spark, a,
        Seq(("K999", 999L)).toDF("k", "v"), "k", nBuckets, "cat", 0L)
      assert(df.count() == 64)
      assert(tbl(a).count() == 65)
    }
  }

  test("storage-partitioned join of co-bucketed TxTables: zero shuffle, exact rows") {
    registered {
      val (a, b) = freshTables()
      withSpjConfs {
        val j = tbl(a).join(tbl(b), "k").select($"k", $"v", $"w")
        val rows = j.as[(String, Long, Long)].collect().toSet
        assert(rows == (1 to 64).map(i => (s"K$i", i.toLong, i * 10L)).toSet)
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"),
          s"co-bucketed TxTable join must not shuffle:\n$p")
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"expected a shuffle-class join relying on reported partitioning:\n$p")
      }
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    registered {
      val (a, _) = freshTables()
      withSpjConfs {
        val g = tbl(a).groupBy($"k").agg(sum($"v").as("s"))
        val total = g.agg(sum($"s")).as[Long].head()
        assert(total == (1 to 64).map(_.toLong).sum)
        val p = g.queryExecution.executedPlan.toString
        // the final single-row agg above is a separate query; inspect g's
        // own plan: partial+final collapse onto the reported partitioning
        assert(!p.contains("Exchange hashpartitioning"),
          s"bucket-key aggregation must reuse the storage partitioning:\n$p")
      }
    }
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().map {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.map {
          case f: org.apache.spark.sql.execution.datasources.FilePartition =>
            f.files.length
          case _ => 0
        }.sum
      case _ => 0
    }.sum

  test("catalog pushdown: zone maps skip commits, bucket key prunes to its buckets") {
    registered {
      val base = Files.createTempDirectory("graft_cat_pd_").toString
      val table = s"$base/t"
      def batch(days: Range) = days.map(d => (s"k$d", d.toLong, d * 2L))
        .toDF("k", "day", "size")
      TxTable.init(spark, table, batch(0 until 100), "k", nBuckets = 4)
      TxTable.appendOnce(spark, table, batch(100 until 200), "k", 4, "pd", 0L)
      TxTable.appendOnce(spark, table, batch(200 until 300), "k", 4, "pd", 1L)
      TxTable.computeStats(spark, table, "day")
      val all = TxTable.snapshot(spark, table).entries.size
      // range inside commit 1 only: zone maps must skip the other commits
      val ranged = tbl(table).filter($"day".between(120L, 180L))
      assert(ranged.count() == 61)
      assert(scannedFiles(ranged) < all,
        s"zone maps must prune: ${scannedFiles(ranged)} of $all")
      // bucket-key point lookup: only the key's bucket files open
      val point = tbl(table).filter($"k" === "k42")
      assert(point.select($"day").as[Long].collect().toSeq == Seq(42L))
      assert(scannedFiles(point) <= all / 2,
        s"bucket identity must prune: ${scannedFiles(point)} of $all")
      // unprofiled column: no pruning, full correctness
      val up = tbl(table).filter($"size".between(240L, 360L))
      assert(up.count() ==
        TxTable.read(spark, table).filter($"size".between(240L, 360L)).count())
      assert(scannedFiles(up) == all, "unprofiled columns must not prune")
    }
  }

  test("SPJ survives AQE and compaction: executed plan still shuffle-free") {
    registered {
      val (a, b) = freshTables()
      // compact one side: files merge per bucket, layout identity intact
      TxTable.compact(spark, a, maxFilesPerBucket = 1)
      val confs = Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "true")
      val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val j = tbl(a).join(tbl(b), "k").select($"k", $"v", $"w")
        val rows = j.as[(String, Long, Long)].collect().toSet
        assert(rows == (1 to 64).map(i => (s"K$i", i.toLong, i * 10L)).toSet)
        // AQE finalizes after the action; the FINAL plan must be
        // exchange-free too
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"),
          s"SPJ must hold under AQE and after compaction:\n$p")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("time travel through the catalog: @vN pins a committed version") {
    registered {
      val (a, _) = freshTables()
      TxTable.appendOnce(spark, a,
        Seq(("K100", 100L)).toDF("k", "v"), "k", nBuckets, "tt", 0L)
      assert(tbl(s"$a@v0").count() == 64)
      assert(tbl(a).count() == 65)
      intercept[Exception] { tbl(s"$a@v99").count() } // absent version: loud
    }
  }

  test("SQL INSERT commits one manifest version with the writers' bucket routing") {
    registered {
      val (a, _) = freshTables()
      val v0 = graft.ops.TxTable.snapshot(spark, a).version
      spark.sql(s"INSERT INTO txspj.`$a` VALUES ('K100', 100), ('K101', 101)")
      val snap = TxTable.snapshot(spark, a)
      assert(snap.version == v0 + 1, "one INSERT = one atomic commit")
      // visible to both surfaces
      assert(tbl(a).count() == 66 && TxTable.read(spark, a).count() == 66)
      // bucket routing matches the layout hash: the point-lookup read
      // (which opens ONLY the keys' buckets) finds the inserted rows
      val got = TxTable.readKeys(spark, a, "k", Seq("K100", "K101"), nBuckets)
        .select($"k", $"v").as[(String, Long)].collect().toSet
      assert(got == Set(("K100", 100L), ("K101", 101L)))
      // and the in-file bucket column agrees with the manifest placement
      val inFile = TxTable.read(spark, a)
        .filter($"k".isin("K100", "K101"))
        .select($"k", col(graft.ops.LayoutOps.BucketCol).cast("int"))
        .as[(String, Int)].collect().toMap
      val expected = Seq("K100", "K101").map { k =>
        k -> spark.range(1)
          .select(graft.ops.LayoutOps.bucketId(lit(k), nBuckets))
          .head().getInt(0)
      }.toMap
      assert(inFile == expected)
      // time-travel snapshots cannot be INSERT targets
      intercept[Exception] {
        spark.sql(s"INSERT INTO txspj.`$a@v0` VALUES ('K9', 9)")
      }
    }
  }

  test("writeStream.toTable: one manifest version per epoch, replayed epochs no-op") {
    registered {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      implicit val ctx = spark.sqlContext
      val (a, _) = freshTables()
      val v0 = TxTable.snapshot(spark, a).version
      val in = MemoryStream[(String, Long)]
      val ckpt = Files.createTempDirectory("graft_cat_stream_").toString
      def run(): Unit = {
        val q = in.toDF().toDF("k", "v").writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .toTable(s"txspj.`$a`")
        q.awaitTermination()
      }
      in.addData(("S1", 1L), ("S2", 2L)); run()
      in.addData(("S3", 3L)); run()
      assert(TxTable.read(spark, a).count() == 67)
      val snap = TxTable.snapshot(spark, a)
      assert(snap.version == v0 + 2, "one atomic commit per epoch")
      // the exactly-once stamp rides the manifest headers
      val stamps = TxTable.history(spark, a)
        .filter($"txn_app".startsWith("txcat:"))
        .select($"txn_app", $"txn_batch").as[(String, Long)].collect().toSeq
      assert(stamps.map(_._2).sorted == Seq(0L, 1L))
      val appId = stamps.head._1

      // a replayed epoch (crash between sink commit and checkpoint write)
      // must detect its stamp, drop its staged files, and commit nothing
      val sw = new graft.sources.TxStreamingWrite(a,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))),
        ("k", nBuckets), queryId = appId.stripPrefix("txcat:"))
      val fs = new org.apache.hadoop.fs.Path(a)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staged = new org.apache.hadoop.fs.Path(a,
        "files/replay-e0/bucket-0/f.parquet")
      fs.mkdirs(staged.getParent)
      fs.create(staged).close()
      sw.commit(0L, Array(graft.sources.TxCommitMessage(
        Seq((0, "files/replay-e0/bucket-0/f.parquet", 1L)))))
      assert(TxTable.snapshot(spark, a).version == snap.version,
        "replayed epoch must not commit")
      assert(!fs.exists(staged.getParent.getParent),
        "replayed epoch must drop its staged files")
    }
  }

  test("writeStream outputMode(complete): each epoch REPLACES the table, prior epochs stay time-travelable") {
    registered {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      implicit val ctx = spark.sqlContext
      val base = Files.createTempDirectory("graft_cat_complete_").toString
      val t = s"$base/agg"
      spark.sql(s"CREATE TABLE txspj.`$t` (k STRING, cnt BIGINT) " +
        s"PARTITIONED BY (bucket($nBuckets, k))")
      val in = MemoryStream[String]
      val ckpt = Files.createTempDirectory("graft_cat_complete_ck_").toString
      def run(): Unit = {
        val q = in.toDF().toDF("k").groupBy($"k").agg(count("*").as("cnt"))
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .toTable(s"txspj.`$t`")
        q.awaitTermination()
      }
      in.addData("A", "A", "B"); run()
      assert(spark.table(s"txspj.`$t`").as[(String, Long)].collect().toMap
        == Map("A" -> 2L, "B" -> 1L))
      in.addData("A", "C"); run()
      // Complete mode recomputes the FULL aggregate each epoch: the table
      // must hold exactly the latest result, never an append next to the
      // previous epoch's rows (Spark routes Complete through
      // SupportsTruncate.truncate(), so the epoch commit removes the
      // snapshot it lands on)
      assert(spark.table(s"txspj.`$t`").as[(String, Long)].collect().toMap
        == Map("A" -> 3L, "B" -> 1L, "C" -> 1L))
      assert(spark.table(s"txspj.`$t`").count() == 3)
      // the replaced epoch-1 result remains time-travelable until vacuum
      assert(spark.table(s"txspj.`$t@v1`").as[(String, Long)].collect().toMap
        == Map("A" -> 2L, "B" -> 1L))
    }
  }

  test("DROP TABLE refuses time-travel snapshots loudly (exec ignores the boolean)") {
    registered {
      val (a, _) = freshTables()
      spark.sql(s"INSERT INTO txspj.`$a` VALUES ('D1', 1)")
      // Spark's DropTableExec discards dropTable's return value, so a
      // silent `false` would report success — the refusal must throw
      val e = intercept[Exception] {
        spark.sql(s"DROP TABLE txspj.`$a@v0`")
      }
      assert(e.getMessage.contains("time-travel"))
      // nothing was dropped: head and snapshot both still readable
      assert(spark.table(s"txspj.`$a`").count() == 65)
      assert(spark.table(s"txspj.`$a@v0`").count() == 64)
    }
  }

  test("@vN is reserved but cannot hijack a literal path that IS a table") {
    registered {
      val base = Files.createTempDirectory("graft_cat_at_").toString
      // a directory whose NAME ends in @v3 and which is itself a table:
      // the literal path wins — head read, INSERT accepted — instead of
      // silently version-pinning a read of `.../snap`
      val literal = s"$base/snap@v3"
      TxTable.init(spark, literal,
        (1 to 8).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      assert(tbl(literal).count() == 8)
      spark.sql(s"INSERT INTO txspj.`$literal` VALUES ('K9', 9)")
      assert(tbl(literal).count() == 9)
      // with no literal table at the raw path, the suffix is time travel
      val plain = s"$base/t"
      TxTable.init(spark, plain,
        (1 to 4).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      TxTable.appendOnce(spark, plain,
        Seq(("K5", 5L)).toDF("k", "v"), "k", nBuckets, "at", 0L)
      assert(tbl(s"$plain@v0").count() == 4 && tbl(plain).count() == 5)
    }
  }

  test("SPJ skew posture: default groups per bucket; partially-clustered splits the hot bucket") {
    registered {
      val base = Files.createTempDirectory("graft_cat_skew_").toString
      val (a, b) = (s"$base/hot", s"$base/dim")
      // 16 keys, one row each; then the HOT key gains 100× rows across
      // three more commits — several files in its bucket, the split
      // granularity partially-clustered distribution works with
      TxTable.init(spark, a,
        (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      (0 until 3).foreach { i =>
        TxTable.appendOnce(spark, a,
          (1 to 500).map(j => ("K1", (1000 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "skew", i.toLong)
      }
      TxTable.init(spark, b,
        (1 to 16).map(i => (s"K$i", i * 10L)).toDF("k", "w"), "k", nBuckets)
      val expected = 16 + 3 * 500
      withSpjConfs {
        // THE PINNED DEFAULT: full grouping — one task per bucket, zero
        // exchange. Correct, and the hot bucket is one straggler task
        // (AQE cannot split it: there is no exchange to re-plan).
        val j1 = tbl(a).join(tbl(b), "k").select($"k", $"v", $"w")
        assert(j1.count() == expected)
        val p1 = j1.queryExecution.executedPlan.toString
        assert(!p1.contains("Exchange"), s"SPJ must hold under skew:\n$p1")
        val grouped = j1.rdd.getNumPartitions
        assert(grouped <= nBuckets,
          s"default grouping must be one task per bucket, got $grouped")
        // THE ESCAPE HATCH (documented, spec-pinned): partially-clustered
        // distribution keeps the hot bucket's files as separate tasks and
        // replicates the dim side — still no exchange, same rows, but the
        // straggler is now |files| parallel tasks. This is the knob to
        // flip at 100× when one bucket dominates a co-bucketed join.
        val saved = Seq(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
          "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
          .map(k => k -> spark.conf.getOption(k))
        saved.foreach { case (k, _) => spark.conf.set(k, "true") }
        try {
          val j2 = tbl(a).join(tbl(b), "k").select($"k", $"v", $"w")
          assert(j2.count() == expected,
            "partially-clustered SPJ must stay exact")
          val p2 = j2.queryExecution.executedPlan.toString
          assert(!p2.contains("Exchange"),
            s"partially-clustered must not reintroduce a shuffle:\n$p2")
          assert(j2.rdd.getNumPartitions > grouped,
            s"hot bucket must split beyond $grouped bucket-tasks, got " +
              s"${j2.rdd.getNumPartitions}")
        } finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    registered {
      val base = Files.createTempDirectory("graft_cat_mm_").toString
      val (a, b) = (s"$base/a", s"$base/b")
      TxTable.init(spark, a,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      TxTable.init(spark, b,
        (1 to 32).map(i => (s"K$i", i * 2L)).toDF("k", "w"), "k", 8)
      withSpjConfs {
        val j = tbl(a).join(tbl(b), "k").select($"k", $"v", $"w")
        assert(j.count() == 32) // correctness first: layouts differ → shuffle
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains("Exchange"),
          s"incompatible layouts must shuffle, not silently mis-join:\n$p")
      }
    }
  }

  test("ALTER TABLE ADD/DROP COLUMN: one schema-only commit, old files project NULL / around dropped bytes") {
    registered {
      val base = Files.createTempDirectory("graft_cat_alter_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      val v0 = TxTable.snapshot(spark, t).version
      val rels0 = TxTable.snapshot(spark, t).entries.map(_.rel).toSet
      spark.sql(s"ALTER TABLE txspj.`$t` ADD COLUMN note STRING")
      val snap1 = TxTable.snapshot(spark, t)
      assert(snap1.version == v0 + 1, "one schema-only commit")
      assert(snap1.entries.map(_.rel).toSet == rels0,
        "ALTER must touch zero data files")
      // pre-change rows project the new column as NULL
      assert(tbl(t).schema.fieldNames.toSeq == Seq("k", "v", "note"))
      assert(tbl(t).filter($"note".isNull).count() == 32)
      // new writes carry it; old and new rows coexist
      spark.sql(
        s"INSERT INTO txspj.`$t` VALUES ('K100', 100L, 'fresh')")
      assert(tbl(t).filter($"note" === "fresh").count() == 1)
      assert(tbl(t).count() == 33)
      // time travel keeps the pre-change schema
      assert(!spark.table(s"txspj.`$t@v$v0`")
        .schema.fieldNames.contains("note"))
      // DROP projects around the stored bytes (v survives in files)
      spark.sql(s"ALTER TABLE txspj.`$t` DROP COLUMN note")
      assert(tbl(t).schema.fieldNames.toSeq == Seq("k", "v"))
      assert(tbl(t).count() == 33)
      // the drop TOMBSTONES the name: a pre-drop writer whose batch still
      // carries 'note' cannot silently revert it through union evolution
      TxTable.appendOnce(spark, t,
        Seq(("K200", 200L, "ghost")).toDF("k", "v", "note"),
        "k", nBuckets, "alter-spec", 9L)
      assert(tbl(t).schema.fieldNames.toSeq == Seq("k", "v"),
        "a stale writer must not resurrect a dropped column")
      assert(tbl(t).count() == 34)
      // re-adding the name refuses while live files still carry bytes
      // under it (reading them back would resurrect 'fresh'/'ghost')
      val eAdd = intercept[Exception] {
        spark.sql(s"ALTER TABLE txspj.`$t` ADD COLUMN note STRING")
      }
      assert(eAdd.getMessage.contains("resurrect"))
      // after a full rewrite sheds the bytes, the name is reusable and
      // every pre-change row reads NULL — the tombstone clears
      TxTable.compact(spark, t, maxFilesPerBucket = 0)
      spark.sql(s"ALTER TABLE txspj.`$t` ADD COLUMN note STRING")
      assert(tbl(t).filter($"note".isNull).count() == 34,
        "no stored value may survive into the re-added column")
      assert(TxTable.snapshot(spark, t).dropped.isEmpty)
      // guard rails: bucket key cannot drop, colliding renames and
      // positions refuse (renames themselves are supported — column
      // mapping — so the collision is the refusal to pin here)
      intercept[Exception] {
        spark.sql(s"ALTER TABLE txspj.`$t` DROP COLUMN k")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE txspj.`$t` RENAME COLUMN v TO note")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE txspj.`$t` ADD COLUMN zzz INT FIRST")
      }
      assert(tbl(t).count() == 34, "refused ALTERs leave the table intact")
    }
  }

  test("SQL-only lifecycle: CREATE TABLE + CTAS bootstrap TxTables; the created pair SPJ-joins with zero exchanges") {
    registered {
      val base = Files.createTempDirectory("graft_cat_ddl_").toString
      val (a, b) = (s"$base/a", s"$base/b")
      // CREATE TABLE: empty v0 manifest carrying schema + bucket identity
      spark.sql(s"CREATE TABLE txspj.`$a` (k STRING, v BIGINT) " +
        "PARTITIONED BY (bucket(4, k))")
      assert(TxTable.isTxTable(spark, a))
      val snap0 = TxTable.snapshot(spark, a)
      assert(snap0.version == 0L && snap0.entries.isEmpty &&
        snap0.bucketing.contains(("k", 4)))
      assert(tbl(a).count() == 0L, "empty created table reads as 0 rows")
      // fill via SQL INSERT, then CTAS a co-bucketed sibling
      val values = (1 to 32).map(i => s"('K$i', $i)").mkString(", ")
      spark.sql(s"INSERT INTO txspj.`$a` VALUES $values")
      spark.sql(s"CREATE TABLE txspj.`$b` PARTITIONED BY (bucket(4, k)) " +
        s"AS SELECT k, v * 10 AS w FROM txspj.`$a`")
      assert(tbl(b).count() == 32L)
      // the created pair is co-committed: storage-partitioned join, no
      // exchange on either side
      withSpjConfs {
        val j = tbl(a).join(tbl(b), "k").select($"k", $"v", $"w")
        assert(j.as[(String, Long, Long)].collect().toSet ==
          (1 to 32).map(i => (s"K$i", i.toLong, i * 10L)).toSet)
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"),
          s"CTAS-created co-bucketed pair must join shuffle-free:\n$p")
      }
      // duplicate create refuses; missing bucket transform refuses
      intercept[org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException] {
        spark.sql(s"CREATE TABLE txspj.`$a` (k STRING) " +
          "PARTITIONED BY (bucket(4, k))")
      }
      intercept[Exception] {
        spark.sql(s"CREATE TABLE txspj.`$base/c` (k STRING, v BIGINT)")
      }
      // DROP TABLE removes the log; the path stops resolving
      spark.sql(s"DROP TABLE txspj.`$b`")
      assert(!TxTable.isTxTable(spark, b))
      intercept[Exception] { tbl(b).count() }
    }
  }

  private def bucketOf(k: String): Int = spark.range(1)
    .select(graft.ops.LayoutOps.bucketId(org.apache.spark.sql.functions
      .lit(k), nBuckets)).head().getInt(0)

  test("MERGE WITH SCHEMA EVOLUTION: new source column widens the table; old files project NULL; time travel keeps the old schema") {
    registered {
      val (a, _) = freshTables() // schema (k, v), K1..K64
      Seq(("K1", 100L, "gold"), ("KNEW", 999L, "silver"))
        .toDF("k", "v", "tier").createOrReplaceTempView("evo_src")
      val sql =
        s"""MERGE WITH SCHEMA EVOLUTION INTO txspj.`$a` t
           |USING evo_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin
      // OFF (default): no capability advertised — Spark degrades the
      // statement to a plain merge; the schema must NOT widen
      val before = TxTable.snapshot(spark, a)
      spark.sql(sql)
      val offSnap = TxTable.snapshot(spark, a)
      assert(!offSnap.schema.get.fieldNames.contains("tier"),
        "schema must stay narrow while autoMerge is off")
      assert(tbl(a).count() == 65) // the merge itself still landed
      // ON: the merge widens the schema and lands the data
      spark.conf.set("spark.graft.sql.schema.autoMerge", "true")
      try {
        spark.sql(sql)
        val head = TxTable.snapshot(spark, a)
        assert(head.schema.get.fieldNames.contains("tier"))
        val m = tbl(a).select($"k", $"v", $"tier")
          .as[(String, Long, Option[String])].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(m.size == 65)
        assert(m("K1") == ((100L, Some("gold"))))
        assert(m("KNEW") == ((999L, Some("silver"))))
        // an old file's rows project the new column as NULL
        assert(m("K3") == ((3L, None)))
        // time travel below the evolution shows the pre-evolution schema
        assert(!spark.read.table(s"txspj.`$a@v${before.version}`")
          .columns.contains("tier"))
      } finally spark.conf.unset("spark.graft.sql.schema.autoMerge")
    }
  }

  test("SQL MERGE INTO rewrites only the buckets the source keys hash into — one atomic commit") {
    registered {
      val (a, _) = freshTables() // K1..K64 -> v = 1..64
      Seq(("K1", 100L), ("K2", 200L), ("KNEW", 999L)).toDF("k", "v")
        .createOrReplaceTempView("merge_updates")
      val snap0 = TxTable.snapshot(spark, a)
      spark.sql(
        s"""MERGE INTO txspj.`$a` t USING merge_updates s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET t.v = s.v
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
           |""".stripMargin)
      val snap1 = TxTable.snapshot(spark, a)
      assert(snap1.version == snap0.version + 1, "one atomic commit")
      // row-level semantics: updates applied, insert landed, rest intact
      val m = tbl(a).as[(String, Long)].collect().toMap
      assert(m.size == 65 && m("K1") == 100L && m("K2") == 200L &&
        m("KNEW") == 999L && m("K3") == 3L)
      // COW granularity: ONLY the touched buckets' files were replaced —
      // runtime group filtering hashed the source keys through the layout
      // kernel; untouched buckets' files carried into the manifest verbatim
      val touched = Seq("K1", "K2", "KNEW").map(bucketOf).toSet
      val removed = snap0.entries.map(_.rel).toSet --
        snap1.entries.map(_.rel).toSet
      assert(removed.nonEmpty, "rewritten files must be swapped out")
      val removedBuckets =
        snap0.entries.filter(e => removed(e.rel)).map(_.bucket).toSet
      assert(removedBuckets.subsetOf(touched),
        s"MERGE rewrote buckets $removedBuckets beyond the touched $touched")
      val untouchedCarried = snap0.entries
        .filter(e => !touched(e.bucket)).map(_.rel)
        .forall(snap1.entries.map(_.rel).toSet)
      assert(untouchedCarried, "untouched buckets must carry verbatim")
      // time travel shows the pre-merge state
      assert(tbl(s"$a@v${snap0.version}").filter($"k" === "K1")
        .select($"v").as[Long].head() == 1L)
    }
  }

  test("maintenance as SQL: CALL compact / compute_stats / vacuum / purge_deletes / rebucket") {
    registered {
      val base = Files.createTempDirectory("graft_cat_proc_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      (1 to 5).foreach { i =>
        TxTable.appendOnce(spark, t,
          (1 to 32).map(j => (s"K$j", (100 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "proc", i.toLong)
      }
      val before = TxTable.snapshot(spark, t).entries.size
      // compact: fragmented buckets rewritten through the same kernel the
      // Scala caller uses; default max_files_per_bucket filled by Spark
      val c = spark.sql(s"CALL txspj.compact('$t', 1)")
      assert(c.head().getInt(0) == nBuckets, "every bucket was fragmented")
      assert(TxTable.snapshot(spark, t).entries.size < before)
      // compute_stats, then the metadata MIN/MAX shortcut answers
      val st = spark.sql(s"CALL txspj.compute_stats('$t', 'v')")
      assert(st.head().getInt(0) > 0)
      val mm = spark.sql(s"SELECT min(v) AS lo, max(v) AS hi FROM txspj.`$t`")
      assert((mm.head().getLong(0), mm.head().getLong(1)) == ((1L, 532L)))
      assert(mm.queryExecution.executedPlan.toString
        .contains("LocalTableScan"))
      // vacuum drops the pre-compaction files; the head stays intact
      val v = spark.sql(s"CALL txspj.vacuum('$t', 1, 0)")
      assert(v.head().getInt(0) > 0)
      assert(tbl(t).count() == 32L * 6)
      // purge_deletes folds deletion vectors for the dirty files alone
      spark.sql(s"DELETE FROM txspj.`$t` WHERE v <= 3")
      assert(TxTable.snapshot(spark, t).entries.exists(_.dv.isDefined))
      val pg = spark.sql(s"CALL txspj.purge_deletes('$t', 0.0D)")
      assert(pg.head().getInt(0) > 0)
      assert(TxTable.snapshot(spark, t).entries.forall(_.dv.isEmpty))
      assert(tbl(t).count() == 32L * 6 - 3)
      // rebucket migrates the layout identity in one commit
      val rb = spark.sql(s"CALL txspj.rebucket('$t', 'k', 8)")
      assert(rb.head().getLong(0) > 0L)
      assert(TxTable.snapshot(spark, t).bucketing.contains(("k", 8)))
      assert(tbl(t).count() == 32L * 6 - 3)
      // DESCRIBE HISTORY from SQL: one metadata row per retained version
      val h = spark.sql(s"CALL txspj.history('$t')")
      assert(h.count() == TxTable.history(spark, t).count())
      assert(h.columns.toSeq.take(2) == Seq("version", "kind"))
      // unknown procedures fail loudly with the available list
      val e = intercept[Exception] {
        spark.sql(s"CALL txspj.optimize('$t')").collect()
      }
      def msgs(x: Throwable): String =
        if (x == null) "" else x.getMessage + "|" + msgs(x.getCause)
      assert(msgs(e).contains("compact"), msgs(e))
    }
  }

  test("LIMIT pushdown opens only enough files to cover n; filters block it") {
    registered {
      val base = Files.createTempDirectory("graft_cat_lim_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      (0 until 3).foreach { i =>
        TxTable.appendOnce(spark, t,
          (1 to 64).map(j => (s"K$j", (100 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "lim", i.toLong)
      }
      val total = TxTable.snapshot(spark, t).entries.size
      val lim = spark.sql(s"SELECT k, v FROM txspj.`$t` LIMIT 5")
      assert(lim.count() == 5L)
      assert(scannedFiles(lim) < total,
        s"LIMIT 5 must not plan all $total files")
      // a residual filter blocks the offer: every matching row stays
      // eligible and the result is exact
      val f = spark.sql(
        s"SELECT k, v FROM txspj.`$t` WHERE v > 250 LIMIT 4")
      assert(f.count() == 4L)
      assert(f.select($"v").as[Long].collect().forall(_ > 250L))
    }
  }

  test("bloom sidecars: equality on a non-key column prunes to the files that might hold it") {
    registered {
      val base = Files.createTempDirectory("graft_cat_bloom_").toString
      val t = s"$base/t"
      // grp values are commit-localized but UNCLUSTERED within a commit
      // (zone maps would be useless here even if profiled); the bucket
      // key k is unrelated, so only a membership structure can prune
      def batch(r: Range) = scala.util.Random.shuffle(
        r.map(i => (s"K$i", s"G$i"))).toDF("k", "grp")
      TxTable.init(spark, t, batch(1 to 200), "k", nBuckets)
      TxTable.appendOnce(spark, t, batch(201 to 400), "k", nBuckets, "bl", 0L)
      TxTable.appendOnce(spark, t, batch(401 to 600), "k", nBuckets, "bl", 1L)
      spark.sql(s"CALL txspj.compute_bloom('$t', 'grp')")
      val total = TxTable.snapshot(spark, t).entries.size
      val q = spark.table(s"txspj.`$t`").filter($"grp" === "G250")
      assert(q.select($"k").as[String].collect().toSeq == Seq("K250"))
      assert(scannedFiles(q) <= total / 2,
        s"bloom must prune to the middle commit's files: " +
          s"${scannedFiles(q)} of $total")
      // IN-lists probe every value; files outside all probes drop
      val in = spark.table(s"txspj.`$t`")
        .filter($"grp".isin("G10", "G20"))
      assert(in.count() == 2)
      assert(scannedFiles(in) <= total / 2)
      // a commit landed after the bloom refresh: its files are unknown to
      // the sidecar and must never be pruned
      TxTable.appendOnce(spark, t, batch(601 to 700), "k", nBuckets, "bl", 2L)
      val late = spark.table(s"txspj.`$t`").filter($"grp" === "G650")
      assert(late.select($"k").as[String].collect().toSeq == Seq("K650"))
      // incremental refresh profiles only the new files; lookups then prune
      assert(spark.sql(s"CALL txspj.compute_bloom('$t', 'grp')")
        .head().getInt(0) > 0)
      val fresh = spark.table(s"txspj.`$t`").filter($"grp" === "G650")
      assert(fresh.select($"k").as[String].collect().toSeq == Seq("K650"))
      assert(scannedFiles(fresh) < total)
      // SHOW TBLPROPERTIES surfaces the opt-in
      val props = spark.sql(s"SHOW TBLPROPERTIES txspj.`$t`")
        .as[(String, String)].collect().toMap
      assert(props("bloom.columns") == "grp")
    }
  }

  test("bloom records all-null files with an EMPTY filter: they prune and never re-scan") {
    registered {
      val base = Files.createTempDirectory("graft_cat_bloom_null_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 100).map(i => (s"K$i", Some(s"G$i"))).toDF("k", "grp"),
        "k", nBuckets)
      // the schema-evolution shape: a whole commit whose probed column is
      // null — an equality probe can never match it
      TxTable.appendOnce(spark, t,
        (101 to 200).map(i => (s"K$i", None: Option[String]))
          .toDF("k", "grp"), "k", nBuckets, "bn", 0L)
      val total = TxTable.snapshot(spark, t).entries.size
      assert(TxTable.computeBloom(spark, t, "grp") == total,
        "every file gets a bloom row, all-null ones an empty filter")
      // no rescan loop: the all-null files are recorded, not re-missing
      assert(TxTable.computeBloom(spark, t, "grp") == 0)
      val q = spark.table(s"txspj.`$t`").filter($"grp" === "G5")
      assert(q.select($"k").as[String].collect().toSeq == Seq("K5"))
      assert(scannedFiles(q) <= total / 2,
        s"all-null files must prune for equality: ${scannedFiles(q)} of $total")
    }
  }

  test("pushed filters reach the parquet reader: row groups INSIDE kept files skip") {
    registered {
      val base = Files.createTempDirectory("graft_cat_rg_").toString
      val t = s"$base/t"
      // small parquet blocks -> many row groups per bucket file; rows
      // written in v order so each row group covers a narrow v range
      val hc = spark.sparkContext.hadoopConfiguration
      val (oldBlock, oldPage) =
        (hc.get("parquet.block.size"), hc.get("parquet.page.size"))
      hc.setInt("parquet.block.size", 64 * 1024)
      hc.setInt("parquet.page.size", 16 * 1024)
      try {
        val rows = (1 to 60000).map(i => (s"K$i", i.toLong, "x" * 64))
          .toDF("k", "v", "pad").orderBy("v").coalesce(1)
        TxTable.init(spark, t, rows, "k", nBuckets)
      } finally {
        if (oldBlock == null) hc.unset("parquet.block.size")
        else hc.set("parquet.block.size", oldBlock)
        if (oldPage == null) hc.unset("parquet.page.size")
        else hc.set("parquet.page.size", oldPage)
      }
      // no sidecar: file-level pruning keeps everything, so any scan
      // shrink below is the parquet reader's row-group statistics at work
      val q = spark.table(s"txspj.`$t`")
        .filter($"v" <= 1000L).select($"k", $"v")
      assert(q.count() == 1000)
      q.collect()
      val scanRows = q.queryExecution.executedPlan.collectLeaves().collect {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b.metrics("numOutputRows").value
      }.sum
      assert(scanRows > 0 && scanRows < 15000,
        s"row-group skipping must bound the scan to the matching groups, " +
          s"read $scanRows of 60000")
    }
  }

  test("TopN pushdown: ORDER BY LIMIT opens only files that can hold a top-n value") {
    registered {
      val base = Files.createTempDirectory("graft_cat_topn_").toString
      val t = s"$base/t"
      // time-clustered appends: commit i holds v in [100i, 100i+63]
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      (1 to 3).foreach { i =>
        TxTable.appendOnce(spark, t,
          (1 to 64).map(j => (s"K$j", (100 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "topn", i.toLong)
      }
      TxTable.computeStats(spark, t, "v")
      val total = TxTable.snapshot(spark, t).entries.size
      val top = spark.sql(s"SELECT k, v FROM txspj.`$t` ORDER BY v DESC LIMIT 5")
      assert(top.select($"v").as[Long].collect().toSeq ==
        Seq(364L, 363L, 362L, 361L, 360L))
      // only the newest commit's files can hold a top-5 value
      assert(scannedFiles(top) <= nBuckets,
        s"TopN must prune to the tail commit: ${scannedFiles(top)} of $total")
      // ascending mirror: only the OLDEST commit's files
      val bottom = spark.sql(s"SELECT k, v FROM txspj.`$t` ORDER BY v LIMIT 5")
      assert(bottom.select($"v").as[Long].collect().toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L))
      assert(scannedFiles(bottom) <= nBuckets)
      // a residual filter blocks the shrink; the result stays exact
      val filtered = spark.sql(
        s"SELECT k, v FROM txspj.`$t` WHERE v <= 170 ORDER BY v DESC LIMIT 3")
      assert(filtered.select($"v").as[Long].collect().toSeq ==
        Seq(164L, 163L, 162L))
      // an unprofiled sort column refuses: exact result over the full scan
      val byK = spark.sql(s"SELECT k, v FROM txspj.`$t` ORDER BY k LIMIT 4")
      assert(scannedFiles(byK) == total, "unprofiled sort column must not prune")
      assert(byK.count() == 4)
    }
  }

  test("SQL DELETE never rewrites data: full coverage drops files by metadata, partial coverage takes a deletion vector") {
    registered {
      val base = Files.createTempDirectory("graft_cat_mdel_").toString
      val t = s"$base/t"
      // three key-range commits: v in [1,64], [101,164], [201,264]
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      (1 to 2).foreach { i =>
        TxTable.appendOnce(spark, t,
          (1 to 64).map(j => (s"K$j", (100 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "mdel", i.toLong)
      }
      TxTable.computeStats(spark, t, "v")
      val before = TxTable.snapshot(spark, t)
      val rels0 = before.entries.map(_.rel).toSet
      // fully covers commit 0 (range [1,64] < 100), zero-covers the rest:
      // one manifest commit, no files read or written
      spark.sql(s"DELETE FROM txspj.`$t` WHERE v < 100")
      val after = TxTable.snapshot(spark, t)
      assert(after.version == before.version + 1)
      val rels1 = after.entries.map(_.rel).toSet
      assert(rels1.subsetOf(rels0),
        "metadata DELETE must not write new files")
      assert(rels1.size < rels0.size)
      assert(spark.table(s"txspj.`$t`").count() == 128)
      assert(spark.table(s"txspj.`$t`").agg(min($"v")).head().getLong(0)
        == 101L)
      // the dropped slice stays time-travelable
      assert(spark.table(s"txspj.`$t@v${before.version}`").count() == 192)
      // a mid-file cut is PARTIAL coverage: the statement marks the rows
      // dead in per-file deletion vectors — SAME data files, one DV
      // sidecar, rows exact through every read surface
      spark.sql(s"DELETE FROM txspj.`$t` WHERE v < 130")
      val after2 = TxTable.snapshot(spark, t)
      val rels2 = after2.entries.map(_.rel).toSet
      assert(rels2.subsetOf(rels1),
        "partial coverage must not add or rewrite data files (MOR)")
      val dvd = after2.entries.filter(_.dv.isDefined)
      assert(dvd.nonEmpty, "partially-covered files must carry DVs")
      assert(after2.entries.flatMap(_.liveRows).sum == 99,
        "manifest live counts must account for every DV'd row")
      assert(spark.table(s"txspj.`$t`").count() == 99)
      assert(spark.table(s"txspj.`$t`").agg(min($"v")).head().getLong(0)
        == 130L)
      assert(TxTable.read(spark, t).count() == 99,
        "the DataFrame surface agrees with the catalog surface")
      // the pre-delete slice stays time-travelable WITH its rows
      assert(spark.table(s"txspj.`$t@v${after2.version - 1}`").count()
        == 128)
    }
  }

  test("DV'd tables through the catalog: COUNT(*) stays metadata-only and exact; MIN/MAX and TopN refuse; SPJ joins stay shuffle-free") {
    registered {
      val base = Files.createTempDirectory("graft_cat_dv_").toString
      val (a, b) = (s"$base/a", s"$base/b")
      TxTable.init(spark, a,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      TxTable.init(spark, b,
        (1 to 64).map(i => (s"K$i", i * 10L)).toDF("k", "w"), "k", nBuckets)
      TxTable.computeStats(spark, a, "v")
      assert(TxTable.deleteWhereMor(spark, a,
        $"v" % 2 === 0 && $"v" <= 40) == 20L)
      // COUNT(*) answers from the manifest's live counts: zero jobs read
      // data files (LocalTableScan plan), value exact
      val cnt = spark.sql(s"SELECT count(*) AS c FROM txspj.`$a`")
      assert(cnt.queryExecution.executedPlan.toString
        .contains("LocalTableScan"),
        "COUNT(*) over a DV'd table must stay metadata-only")
      assert(cnt.as[Long].head() == 44L)
      // MIN/MAX refuse metadata answers (a deleted row may hold the
      // extremum) and fall back to the exact scan
      val mn = spark.sql(s"SELECT min(v) AS m FROM txspj.`$a`")
      assert(!mn.queryExecution.executedPlan.toString
        .contains("LocalTableScan"))
      assert(mn.as[Long].head() == 1L)
      // TopN refuses file pruning on DV'd files and sorts exactly: the
      // top-3 ascending v skips deleted 2 and 4
      val top = spark.sql(
        s"SELECT v FROM txspj.`$a` ORDER BY v LIMIT 3").as[Long].collect()
      assert(top.toSeq == Seq(1L, 3L, 5L))
      // row-serving parity with the DataFrame surface
      assert(tbl(a).select($"k").as[String].collect().toSet ==
        TxTable.read(spark, a).select($"k").as[String].collect().toSet)
      // SPJ: the DV'd side still reports its bucket partitioning — join
      // plans with zero exchange and dead rows stay dead
      withSpjConfs {
        val j = tbl(a).join(tbl(b), "k").select($"k", $"v", $"w")
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"),
          s"DV'd co-bucketed join must not shuffle:\n$p")
        val rows = j.as[(String, Long, Long)].collect().toSet
        val expect = (1 to 64).filterNot(i => i % 2 == 0 && i <= 40)
          .map(i => (s"K$i", i.toLong, i * 10L)).toSet
        assert(rows == expect)
      }
    }
  }

  test("clean tables keep the vectorized scan; a deletion vector downgrades that table's scan to row-based until purged") {
    registered {
      val base = Files.createTempDirectory("graft_cat_dvplan_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      def planOf() = tbl(t).filter($"v" > 10L).queryExecution
        .executedPlan.toString
      assert(planOf().contains("ColumnarToRow"),
        s"clean TxTable scans must stay columnar/vectorized:\n${planOf()}")
      spark.sql(s"DELETE FROM txspj.`$t` WHERE v = 5")
      assert(!planOf().contains("ColumnarToRow"),
        "a DV'd file forces the scan row-based (DSv2 refuses mixed " +
          "row/columnar partitions) — the documented MOR read tax")
      // purge restores the vectorized path
      TxTable.purgeDeletes(spark, t, minDeletedFraction = 0.0)
      assert(planOf().contains("ColumnarToRow"),
        "purging the vectors must restore the columnar scan")
      assert(tbl(t).count() == 63)
    }
  }

  test("SQL UPDATE and REPLACE WHERE over DV'd files do not resurrect dead rows") {
    registered {
      val base = Files.createTempDirectory("graft_cat_dvup_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      spark.sql(s"DELETE FROM txspj.`$t` WHERE v <= 8")
      assert(TxTable.snapshot(spark, t).entries.exists(_.dv.isDefined))
      // the COW rewrite reads the affected files through the DV wrapper:
      // K9 updates, K1..K8 stay dead
      spark.sql(s"UPDATE txspj.`$t` SET v = v + 1000 WHERE k = 'K9'")
      assert(tbl(t).count() == 56)
      assert(tbl(t).filter($"v" <= 8).count() == 0,
        "a row-level rewrite must not resurrect DV-deleted rows")
      assert(tbl(t).filter($"k" === "K9").select($"v").as[Long]
        .head() == 1009L)
      assert(TxTable.snapshot(spark, t).entries.exists(_.dv.isDefined),
        "buckets the UPDATE did not touch keep their vectors")
      // REPLACE WHERE's remainder rewrite is likewise DV-aware
      Seq(("K10", 5000L)).toDF("k", "v").writeTo(s"txspj.`$t`")
        .overwrite($"k" === "K10")
      assert(tbl(t).count() == 56)
      assert(tbl(t).filter($"v" <= 8).count() == 0,
        "the remainder rewrite must not resurrect DV-deleted rows")
      assert(tbl(t).filter($"k" === "K10").select($"v").as[Long]
        .head() == 5000L)
    }
  }

  test("REPLACE WHERE: full slices drop by metadata, partial files rewrite remainders, zero files untouched") {
    registered {
      val base = Files.createTempDirectory("graft_cat_rw_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      (1 to 2).foreach { i =>
        TxTable.appendOnce(spark, t,
          (1 to 64).map(j => (s"K$j", (100 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "rw", i.toLong)
      }
      TxTable.computeStats(spark, t, "v")
      val snap0 = TxTable.snapshot(spark, t)
      val rels0 = snap0.entries.map(_.rel).toSet
      val commit1Rels =
        TxTable.snapshot(spark, t, Some(1L)).entries.map(_.rel).toSet --
          TxTable.snapshot(spark, t, Some(0L)).entries.map(_.rel).toSet
      // backfill EXACTLY commit 1's slice: every one of its files is
      // fully covered -> dropped from the manifest unread; commits 0 and
      // 2 are zero-covered -> carried verbatim
      val repl = (1 to 10).map(i => (s"R$i", (100 + i).toLong)).toDF("k", "v")
      repl.writeTo(s"txspj.`$t`").overwrite($"v".between(101L, 164L))
      val snap1 = TxTable.snapshot(spark, t)
      val rels1 = snap1.entries.map(_.rel).toSet
      assert((rels1 & rels0) == (rels0 -- commit1Rels),
        "zero-covered files must be carried verbatim; full files dropped")
      assert(spark.table(s"txspj.`$t`").count() == 138)
      assert(spark.table(s"txspj.`$t`")
        .filter($"v".between(101L, 164L)).select($"k").as[String]
        .collect().toSet == (1 to 10).map(i => s"R$i").toSet)
      // a mid-range backfill: only the partially-covered files rewrite
      // their non-matching remainder; everything else is untouched
      TxTable.computeStats(spark, t, "v") // profile the backfill's files
      Seq(("P1", 215L)).toDF("k", "v")
        .writeTo(s"txspj.`$t`").overwrite($"v".between(210L, 220L))
      val after = spark.table(s"txspj.`$t`")
      assert(after.filter($"v".between(210L, 220L)).select($"k")
        .as[String].collect().toSeq == Seq("P1"))
      assert(after.filter($"v".between(201L, 209L)).count() == 9)
      assert(after.filter($"v" >= 221L).count() == 44)
      assert(after.count() == 138 - 11 + 1)
      // zero-covered survivors of round 2 carried verbatim again
      val rels2 = TxTable.snapshot(spark, t).entries.map(_.rel).toSet
      assert((rels1 -- rels2).forall(!_.isEmpty)) // removed some
      assert((rels2 & rels1).nonEmpty,
        "untouched files must survive a partial REPLACE WHERE")
    }
  }

  test("NaN poisons parquet footer stats: the harvest refuses and DELETE stays exact") {
    registered {
      val base = Files.createTempDirectory("graft_cat_nan_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"K$i", i.toDouble)).toDF("k", "d"),
        "k", nBuckets)
      TxTable.computeStats(spark, t, "d")
      // clean rows in one commit, the NaN row alone in the next: only the
      // NaN row's file carries poisoned footer stats
      TxTable.appendOnce(spark, t,
        Seq(("N1", 100.0), ("N3", 101.0)).toDF("k", "d"),
        "k", nBuckets, "nan", 0L)
      val before = TxTable.snapshot(spark, t).entries.map(_.rel).toSet
      // parquet-mr DROPS a float/double chunk's min/max when it holds a
      // NaN (keeping null_count) — the harvest must refuse such files
      // rather than record them as all-null
      TxTable.appendOnce(spark, t,
        Seq(("N2", Double.NaN)).toDF("k", "d"), "k", nBuckets, "nan", 1L)
      val nanRels = TxTable.snapshot(spark, t).entries.map(_.rel).toSet -- before
      assert(nanRels.nonEmpty)
      val stats = TxTable.fileStatsWithNulls(spark, t, "d")
      assert(nanRels.forall(r => !stats.contains(r)),
        "NaN-poisoned footers must refuse, not harvest")
      // NaN sorts GREATEST in Spark: d >= 100 matches all three appended
      // rows. A poisoned (all-null) stats row would zero-cover their file
      // and silently resurrect them through the metadata DELETE path.
      spark.sql(s"DELETE FROM txspj.`$t` WHERE d >= 100")
      assert(spark.table(s"txspj.`$t`").count() == 64)
      // and TopN over the column still answers exactly (missing stats
      // refuse the pushdown instead of crashing the ranking)
      val top = spark.sql(s"SELECT k, d FROM txspj.`$t` ORDER BY d DESC LIMIT 3")
      assert(top.select($"d").as[Double].collect().toSeq ==
        Seq(64.0, 63.0, 62.0))
    }
  }

  test("SQL INSERT auto-refreshes sidecars: a metadata DELETE decides on rows committed after ANALYZE") {
    registered {
      val base = Files.createTempDirectory("graft_cat_fresh_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      TxTable.computeStats(spark, t, "v")
      // the INSERT's commit harvests its own files' footer stats (incl.
      // null counts), so a retention delete covering EXACTLY those rows
      // is still decidable with no ANALYZE in between
      spark.sql(s"INSERT INTO txspj.`$t` VALUES ('F1', 1001), ('F2', 1002)")
      val before = TxTable.snapshot(spark, t)
      spark.sql(s"DELETE FROM txspj.`$t` WHERE v > 1000")
      val after = TxTable.snapshot(spark, t)
      assert(after.version == before.version + 1)
      assert(after.entries.map(_.rel).toSet
        .subsetOf(before.entries.map(_.rel).toSet),
        "the freshly-inserted files must drop by metadata, not rewrite")
      assert(spark.table(s"txspj.`$t`").count() == 64)
    }
  }

  test("metadata DELETE treats null counts as load-bearing: null rows survive a below-range cut") {
    registered {
      val base = Files.createTempDirectory("graft_cat_mdel_null_").toString
      val t = s"$base/t"
      // every non-null v is below the cut, but nulls ride along: dropping
      // whole files would destroy rows the predicate does NOT match
      TxTable.init(spark, t,
        ((1 to 60).map(i => (s"K$i", Some(i.toLong))) ++
          (61 to 64).map(i => (s"K$i", None: Option[Long])))
          .toDF("k", "v"), "k", nBuckets)
      TxTable.computeStats(spark, t, "v")
      spark.sql(s"DELETE FROM txspj.`$t` WHERE v < 100")
      val left = spark.table(s"txspj.`$t`")
        .select($"k").as[String].collect().toSet
      assert(left == (61 to 64).map(i => s"K$i").toSet,
        "null-v rows must survive: v < 100 is not true for NULL")
      // an unprofiled column also refuses metadata routing; rows exact
      spark.sql(s"DELETE FROM txspj.`$t` WHERE k = 'K61'")
      assert(spark.table(s"txspj.`$t`").count() == 3)
    }
  }

  test("TopN pushdown honors null ordering via sidecar null counts") {
    registered {
      val base = Files.createTempDirectory("graft_cat_topn_null_").toString
      val t = s"$base/t"
      // commit 0: no nulls; commit 1: eight null-v rows among non-nulls
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"N$i", Some(i.toLong))).toDF("k", "v"),
        "k", nBuckets)
      TxTable.appendOnce(spark, t,
        (65 to 128).map(i =>
          (s"N$i", if (i <= 72) None else Some(i.toLong))).toDF("k", "v"),
        "k", nBuckets, "topnn", 0L)
      TxTable.computeStats(spark, t, "v")
      val total = TxTable.snapshot(spark, t).entries.size
      // ASC is NULLS FIRST: top-10 = the 8 nulls + v=1,2
      val asc = spark.sql(s"SELECT k, v FROM txspj.`$t` ORDER BY v LIMIT 10")
      val got = asc.as[(String, Option[Long])].collect().toSet
      val wantNullKeys = (65 to 72).map(i => s"N$i").toSet
      assert(got.filter(_._2.isEmpty).map(_._1) == wantNullKeys)
      assert(got.flatMap(_._2) == Set(1L, 2L))
      // DESC is NULLS LAST: nulls can never surface in a covered top-n,
      // so the all-non-null tail answers and null-only pruning still holds
      val desc = spark.sql(s"SELECT k, v FROM txspj.`$t` ORDER BY v DESC LIMIT 3")
      assert(desc.select($"v").as[Long].collect().toSeq ==
        Seq(128L, 127L, 126L))
      assert(scannedFiles(desc) <= total)
    }
  }

  test("scan statistics come from the log: a TxTable dim auto-broadcasts with no hint") {
    registered {
      val (a, _) = freshTables() // 64 rows — a few KB on disk
      val fact = spark.range(20000)
        .selectExpr("concat('K', (id % 64) + 1) AS k", "id AS x")
      val saved = Seq("spark.sql.adaptive.enabled")
        .map(k => k -> spark.conf.getOption(k))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        // without SupportsReportStatistics a DSv2 relation reports the
        // conf default size (effectively infinite) and the dim side
        // would plan sort-merge; with manifest-exact sizeInBytes the
        // planner broadcasts it under the stock 10 MB threshold
        val j = fact.join(tbl(a), "k")
        assert(j.count() == 20000L)
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains("BroadcastHashJoin"),
          s"log-backed stats must let the small dim auto-broadcast:\n$p")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("dynamic runtime filtering prunes the fact scan to the dim's surviving buckets") {
    registered {
      val base = Files.createTempDirectory("graft_cat_dpp_").toString
      val fact = s"$base/fact"
      // several commits → several files per bucket, so pruning is visible
      TxTable.init(spark, fact,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      (0 until 3).foreach { i =>
        TxTable.appendOnce(spark, fact,
          (1 to 64).map(j => (s"K$j", (100 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "dpp", i.toLong)
      }
      val total = TxTable.snapshot(spark, fact).entries.size
      val dim = (1 to 64).map(i => (s"K$i", if (i <= 2) "hot" else "cold"))
        .toDF("k", "tag")
      dim.createOrReplaceTempView("dpp_dim")
      tbl(fact).createOrReplaceTempView("dpp_fact")
      val q = spark.sql(
        """SELECT f.k, f.v FROM dpp_fact f
          |JOIN dpp_dim d ON f.k = d.k WHERE d.tag = 'hot'""".stripMargin)
      // correctness first: exactly the hot keys' rows (4 commits each)
      assert(q.count() == 2L * 4)
      // the executed scan served only the buckets K1/K2 hash into —
      // Spark fed the dim's surviving keys into the scan at runtime and
      // the layout hash dropped every other bucket's files
      val hotBuckets = Seq("K1", "K2").map(bucketOf).toSet
      val expectedMax = TxTable.snapshot(spark, fact).entries
        .count(e => hotBuckets(e.bucket))
      val read = scannedFiles(q)
      assert(read <= expectedMax && read < total,
        s"runtime filter must prune the fact scan: read $read of $total " +
          s"(hot buckets hold $expectedMax)")
    }
  }

  test("INSERT OVERWRITE truncates and writes in one atomic commit; history stays travelable") {
    registered {
      val (a, _) = freshTables() // 64 rows at v0
      val v0 = TxTable.snapshot(spark, a).version
      spark.sql(
        s"INSERT OVERWRITE txspj.`$a` VALUES ('W1', 1), ('W2', 2)")
      val snap1 = TxTable.snapshot(spark, a)
      assert(snap1.version == v0 + 1, "one atomic truncate-and-write")
      assert(tbl(a).as[(String, Long)].collect().toSet ==
        Set(("W1", 1L), ("W2", 2L)))
      // the pre-overwrite snapshot remains readable until vacuum
      assert(tbl(s"$a@v$v0").count() == 64L)
      // the overwrite's file counts ride the manifest: metadata COUNT(*)
      val c = spark.sql(s"SELECT count(*) AS n FROM txspj.`$a`")
      assert(c.head().getLong(0) == 2L)
      assert(c.queryExecution.executedPlan.toString
        .contains("LocalTableScan"))
      // TRUNCATE TABLE: one commit to empty, history intact, appendable
      spark.sql(s"TRUNCATE TABLE txspj.`$a`")
      assert(tbl(a).count() == 0L)
      assert(TxTable.snapshot(spark, a).version == snap1.version + 1)
      assert(tbl(s"$a@v${snap1.version}").count() == 2L)
      spark.sql(s"INSERT INTO txspj.`$a` VALUES ('T1', 1)")
      assert(tbl(a).as[(String, Long)].collect().toSet == Set(("T1", 1L)))
    }
  }

  test("SQL UPDATE and DELETE ride the row-level path with static bucket pruning") {
    registered {
      val (a, _) = freshTables()
      val snap0 = TxTable.snapshot(spark, a)
      spark.sql(s"UPDATE txspj.`$a` SET v = v + 1000 WHERE k = 'K5'")
      val snap1 = TxTable.snapshot(spark, a)
      assert(snap1.version == snap0.version + 1)
      assert(tbl(a).filter($"k" === "K5").select($"v").as[Long]
        .head() == 1005L)
      val removed1 = snap0.entries.map(_.rel).toSet --
        snap1.entries.map(_.rel).toSet
      val removedBuckets1 =
        snap0.entries.filter(e => removed1(e.rel)).map(_.bucket).toSet
      assert(removedBuckets1 == Set(bucketOf("K5")),
        s"static equality must prune the rewrite to K5's bucket, " +
          s"got $removedBuckets1")
      spark.sql(s"DELETE FROM txspj.`$a` WHERE k = 'K7'")
      assert(tbl(a).filter($"k" === "K7").count() == 0L)
      assert(tbl(a).count() == 63L, "only K7's row may disappear")
      assert(TxTable.snapshot(spark, a).version == snap1.version + 1)
    }
  }

  test("vacuum collects a crashed INSERT's staged files, honoring the in-flight horizon") {
    registered {
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      import org.apache.spark.unsafe.types.UTF8String
      val (a, _) = freshTables()
      val before = TxTable.read(spark, a).count()
      val v0 = TxTable.snapshot(spark, a).version
      // run the DSv2 INSERT machinery up to the task commit, then "crash"
      // the driver before the manifest publish — the staged files are now
      // exactly an unreferenced orphan directory
      val bw = new graft.sources.TxBatchWrite(a,
        StructType(Seq(StructField("k", StringType),
          StructField("v", LongType))), ("k", nBuckets))
      val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
      w.write(new GenericInternalRow(
        Array[Any](UTF8String.fromString("CRASHED"), 1L)))
      w.commit()
      val fs = new org.apache.hadoop.fs.Path(a)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val filesRoot = new org.apache.hadoop.fs.Path(a, "files")
      val stagedDirs = fs.listStatus(filesRoot).length
      // a horizon longer than the stage's age presumes an in-flight
      // writer: the stage survives, nothing else is touched
      val protectedSweep =
        TxTable.vacuum(spark, a, orphanRetentionMs = 3600L * 1000)
      assert(protectedSweep.isEmpty,
        s"fresh stage must ride out the horizon: $protectedSweep")
      assert(fs.listStatus(filesRoot).length == stagedDirs)
      // past the horizon it is garbage: swept, table bit-identical
      val swept = TxTable.vacuum(spark, a)
      assert(swept.nonEmpty, "orphaned stage must be collected")
      assert(fs.listStatus(filesRoot).length == stagedDirs - 1)
      assert(TxTable.read(spark, a).count() == before)
      assert(TxTable.snapshot(spark, a).version == v0,
        "vacuum must not commit anything")
    }
  }

  test("metadata-only aggregates answer from the log with zero data files opened") {
    registered {
      val (a, _) = freshTables() // 64 rows, v = 1..64
      TxTable.computeStats(spark, a, "v")
      val q = spark.sql(
        s"SELECT count(*) AS n, min(v) AS lo, max(v) AS hi FROM txspj.`$a`")
      val r = q.head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((64L, 1L, 64L)))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("LocalTableScan") && !p.contains("BatchScan"),
        s"expected a metadata-only local scan:\n$p")

      // an append WITHOUT an ANALYZE in between: counts ride every commit
      // and the commit auto-harvested the profiled column's footer stats,
      // so count(*) AND min/max all stay metadata-only and see the row
      TxTable.appendOnce(spark, a,
        Seq(("K0", 0L)).toDF("k", "v"), "k", nBuckets, "agg", 0L)
      val c2 = spark.sql(s"SELECT count(*) AS n FROM txspj.`$a`")
      assert(c2.head().getLong(0) == 65L)
      assert(c2.queryExecution.executedPlan.toString
        .contains("LocalTableScan"))
      val m2 = spark.sql(s"SELECT min(v) AS lo FROM txspj.`$a`")
      assert(m2.head().getLong(0) == 0L)
      assert(m2.queryExecution.executedPlan.toString
        .contains("LocalTableScan"),
        "footer-harvested stats must keep the metadata shortcut")
      // an UNPROFILED column still refuses gracefully: ordinary scan
      val mk = spark.sql(s"SELECT min(k) AS lo FROM txspj.`$a`")
      assert(mk.head().getString(0) == "K0", "fallback scan must be correct")
      assert(mk.queryExecution.executedPlan.toString.contains("BatchScan"),
        "unprofiled column must refuse the metadata shortcut")

      // time travel composes: the pinned snapshot's counts answer
      val tt = spark.sql(s"SELECT count(*) AS n FROM txspj.`$a@v0`")
      assert(tt.head().getLong(0) == 64L)
      assert(tt.queryExecution.executedPlan.toString
        .contains("LocalTableScan"))

      // grouped and filtered aggregates plan the ordinary scan, correctly
      val g = spark.sql(
        s"SELECT k, count(*) AS n FROM txspj.`$a` GROUP BY k")
      assert(g.count() == 65L)
      assert(g.queryExecution.executedPlan.toString.contains("BatchScan"))
      val f = spark.sql(
        s"SELECT count(*) AS n FROM txspj.`$a` WHERE v > 10")
      assert(f.head().getLong(0) == 54L)
      assert(f.queryExecution.executedPlan.toString.contains("BatchScan"))
    }
  }

  // --- streaming SOURCE over the commit log ------------------------------

  /** Drain `spark.readStream.table(txspj.path)` with AvailableNow into a
    * collector; returns the per-micro-batch row sets (batch order). */
  private def drain(path: String, ckpt: String,
                    opts: Map[String, String] = Map.empty)
      : Seq[Set[(String, Long)]] = {
    import org.apache.spark.sql.streaming.Trigger
    val batches = scala.collection.mutable.ArrayBuffer
      .empty[Set[(String, Long)]]
    val reader = opts.foldLeft(spark.readStream) { case (r, (k, v)) =>
      r.option(k, v) }
    val q = reader.table(s"txspj.`$path`")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select($"k", $"v").as[(String, Long)].collect().toSet
        batches.synchronized { batches += rows; () }
      }
      .start()
    q.awaitTermination()
    batches.toSeq
  }

  test("readStream over a RENAMED table: batches arrive under logical names, physical files serve both sides of the DDL") {
    registered {
      import org.apache.spark.sql.streaming.Trigger
      val base = Files.createTempDirectory("graft_cat_rnstream_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 8).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      spark.sql(s"ALTER TABLE txspj.`$t` RENAME COLUMN v TO amount")
      // a post-rename append under the logical name
      TxTable.appendOnce(spark, t,
        Seq(("K9", 9L)).toDF("k", "amount"), "k", nBuckets, "rnstr", 0L)
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val q = spark.readStream.table(s"txspj.`$t`")
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          // the stream's schema is the LOGICAL one
          assert(df.columns.contains("amount") && !df.columns.contains("v"))
          val rows = df.select($"k", $"amount").as[(String, Long)]
            .collect()
          got.synchronized { got ++= rows; () }
        }
        .start()
      q.awaitTermination()
      assert(got.toSet ==
        ((1 to 8).map(i => (s"K$i", i.toLong)) :+ (("K9", 9L))).toSet,
        s"both pre- and post-rename commits must stream: ${got.toSet}")
    }
  }

  test("readStream over a TxTable: commits stream as micro-batches, restart resumes at the right version") {
    registered {
      val (a, _) = freshTables()
      val ckpt = Files.createTempDirectory("graft_cat_src_").toString
      // run 1: the initial snapshot (v0) is the first batch
      val run1 = drain(a, ckpt)
      assert(run1.flatten.toSet ==
        (1 to 64).map(i => (s"K$i", i.toLong)).toSet)
      // two more commits while the stream is DOWN
      TxTable.appendOnce(spark, a,
        Seq(("S1", 1001L), ("S2", 1002L)).toDF("k", "v"), "k", nBuckets,
        "src", 1L)
      TxTable.appendOnce(spark, a,
        Seq(("S3", 1003L)).toDF("k", "v"), "k", nBuckets, "src", 2L)
      // run 2 from the SAME checkpoint: exactly the two commits' rows, one
      // micro-batch per commit under maxVersionsPerTrigger=1 — no replay
      // of the snapshot, no gaps
      val run2 = drain(a, ckpt, Map("maxVersionsPerTrigger" -> "1"))
      assert(run2.map(_.map(_._1)) == Seq(Set("S1", "S2"), Set("S3")),
        s"expected one batch per commit, got $run2")
      // run 3, nothing new: zero batches (or only empty ones)
      assert(drain(a, ckpt).forall(_.isEmpty))
    }
  }

  test("streaming source: startingVersion subscribes mid-log") {
    registered {
      val (a, _) = freshTables()
      TxTable.appendOnce(spark, a,
        Seq(("S1", 1L)).toDF("k", "v"), "k", nBuckets, "sv", 1L)
      val fromV1 = drain(a,
        Files.createTempDirectory("graft_cat_sv_").toString,
        Map("startingVersion" -> "1"))
      assert(fromV1.flatten.toSet == Set(("S1", 1L)),
        "startingVersion=1 must skip the v0 snapshot")
      // latest: nothing until a NEW commit lands
      val ckpt = Files.createTempDirectory("graft_cat_svl_").toString
      assert(drain(a, ckpt, Map("startingVersion" -> "latest"))
        .forall(_.isEmpty))
      TxTable.appendOnce(spark, a,
        Seq(("S2", 2L)).toDF("k", "v"), "k", nBuckets, "sv", 2L)
      assert(drain(a, ckpt, Map("startingVersion" -> "latest"))
        .flatten.toSet == Set(("S2", 2L)))
    }
  }

  test("streaming source: maxFilesPerTrigger caps batch admission by added files") {
    registered {
      val base = Files.createTempDirectory("graft_cat_mft_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      (1 to 2).foreach { i =>
        TxTable.appendOnce(spark, t,
          (1 to 16).map(j => (s"K$j", (100 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "mft", i.toLong)
      }
      val nFiles = TxTable.snapshot(spark, t).entries.size
      // admission granularity is the COMMIT: a cap of 1 admits exactly one
      // version per batch (the at-least-one rule keeps an over-sized
      // commit from stalling the stream) → one batch per commit
      val tight = drain(t,
        Files.createTempDirectory("graft_cat_mft_ck1_").toString,
        Map("maxFilesPerTrigger" -> "1")).filter(_.nonEmpty)
      assert(tight.size == 3,
        s"cap below any commit's files = one commit per batch, got " +
          s"${tight.size}")
      assert(tight.flatten.size == 48, "no rows lost or duplicated")
      // a cap covering everything drains in one batch
      val wide = drain(t,
        Files.createTempDirectory("graft_cat_mft_ck2_").toString,
        Map("maxFilesPerTrigger" -> nFiles.toString)).filter(_.nonEmpty)
      assert(wide.size == 1 && wide.flatten.size == 48)
    }
  }

  test("streaming source: maxRowsPerTrigger caps admission by the manifests' exact row counts") {
    registered {
      val base = Files.createTempDirectory("graft_cat_mrt_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      (1 to 2).foreach { i =>
        TxTable.appendOnce(spark, t,
          (1 to 16).map(j => (s"K$j", (100 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "mrt", i.toLong)
      }
      // 16 rows per commit: a cap of 20 fits one commit but not two →
      // one batch per commit (commit-granular admission, at-least-one)
      val tight = drain(t,
        Files.createTempDirectory("graft_cat_mrt_ck1_").toString,
        Map("maxRowsPerTrigger" -> "20")).filter(_.nonEmpty)
      assert(tight.size == 3,
        s"20-row cap must admit one 16-row commit per batch, got " +
          s"${tight.size}")
      assert(tight.flatten.size == 48, "no rows lost or duplicated")
      // a cap of 32 fits two commits, then the third alone → two batches
      val paired = drain(t,
        Files.createTempDirectory("graft_cat_mrt_ck2_").toString,
        Map("maxRowsPerTrigger" -> "32")).filter(_.nonEmpty)
      assert(paired.size == 2 && paired.flatten.size == 48,
        s"32-row cap must pack two commits then one, got ${paired.size}")
    }
  }

  test("SHOW TBLPROPERTIES surfaces manifest metadata without opening data files") {
    registered {
      val (a, _) = freshTables()
      TxTable.computeStats(spark, a, "v")
      val props = spark.sql(s"SHOW TBLPROPERTIES txspj.`$a`")
        .as[(String, String)].collect().toMap
      assert(props("format") == "graft-txtable")
      assert(props("bucket.key") == "k")
      assert(props("bucket.count") == nBuckets.toString)
      assert(props("files").toInt ==
        TxTable.snapshot(spark, a).entries.size)
      assert(props("rows").toLong == 64L)
      assert(props("stats.columns") == "v")
      // a time-travel identifier reports ITS version's metadata
      spark.sql(s"INSERT INTO txspj.`$a` VALUES ('T1', 1)")
      val v0 = spark.sql(s"SHOW TBLPROPERTIES txspj.`$a@v0`")
        .as[(String, String)].collect().toMap
      assert(v0("version") == "0" && v0("rows").toLong == 64L)
      val head = spark.sql(s"SHOW TBLPROPERTIES txspj.`$a`")
        .as[(String, String)].collect().toMap
      assert(head("rows").toLong == 65L)
    }
  }

  test("streaming CDF admission parity: row/file caps drain a multi-commit history in bounded micro-batches") {
    registered {
      import org.apache.spark.sql.streaming.Trigger
      val base = Files.createTempDirectory("graft_cat_adm_").toString
      val t = s"$base/t"
      // v0: 16 rows; v1..v3: appends of 8 rows each; v4: MOR delete of 4
      TxTable.init(spark, t,
        (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      (1 to 3).foreach(b => TxTable.appendOnce(spark, t,
        (1 to 8).map(i => (s"A$b-$i", (b * 100 + i).toLong)).toDF("k", "v"),
        "k", 4, "adm-spec", b.toLong))
      assert(TxTable.deleteWhereMor(spark, t, $"v" >= 1L && $"v" <= 4L) == 4L)
      val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      def drain(opts: Map[String, String]): Unit = {
        val reader = opts.foldLeft(spark.readStream) { case (r, (k, v)) =>
          r.option(k, v) }
        val q = reader.table(s"txspj.`$t#changes`")
          .writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("graft_adm_ck_").toString)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val got = df.select($"k", $"_change_type", $"_commit_version")
              .as[(String, String, Long)].collect()
            batches.synchronized {
              if (got.nonEmpty) { batches += got.length.toLong
                rows ++= got }
              ()
            }
          }.start()
        q.awaitTermination()
      }
      // rows-capped: every micro-batch stays under the cap except where
      // a single commit alone exceeds it (always-admit-one), and the
      // union replays the exact history
      drain(Map("maxRowsPerTrigger" -> "10"))
      assert(batches.size >= 4,
        s"a 10-row cap must split the 44-change history, got $batches")
      assert(batches.forall(n => n <= 16),
        s"no batch may exceed one commit past the cap: $batches")
      assert(rows.size == 16 + 24 + 4, s"exact replay, got ${rows.size}")
      assert(rows.count(_._2 == "delete") == 4)
      // file-capped second subscription: same union, bounded batches
      batches.clear(); rows.clear()
      drain(Map("maxFilesPerTrigger" -> "2"))
      assert(rows.size == 44 && batches.size >= 3,
        s"file cap must bound batches too: $batches")
    }
  }

  test("dataChange=false: compact/zorder/purge/rebucket are invisible to the CDF and the append stream") {
    registered {
      val (a, _) = freshTables() // v0: 64 rows, 4 buckets, 1 file each
      val ckpt = Files.createTempDirectory("graft_cat_dc_").toString
      drain(a, ckpt) // consume the snapshot
      // v1: append (fragments every bucket to 2 files)
      TxTable.appendOnce(spark, a,
        (101 to 116).map(i => (s"A$i", i.toLong)).toDF("k", "v"),
        "k", nBuckets, "dc-spec", 1L)
      // v2: compaction — data-preserving rewrite, flagged
      assert(TxTable.compact(spark, a, maxFilesPerBucket = 1) > 0)
      // v3: append
      TxTable.appendOnce(spark, a,
        Seq(("B1", 1000L)).toDF("k", "v"), "k", nBuckets, "dc-spec", 2L)
      // the append stream drains WITHOUT skipChangeCommits/ignoreChanges:
      // no error, and it serves exactly the two appends' rows
      val served = drain(a, ckpt).flatten.toSet
      assert(served ==
        ((101 to 116).map(i => (s"A$i", i.toLong)).toSet + (("B1", 1000L))),
        s"stream must serve only the appends, got ${served.size} rows")
      // batch CDF (both APIs): nothing at the compaction version
      val head3 = TxTable.snapshot(spark, a).version
      val ch = TxTable.changesBetween(spark, a, 0L, head3)
      assert(ch.filter($"_commit_version" === 2L).count() == 0,
        "a flagged rewrite must emit nothing in changesBetween")
      assert(ch.count() == 17L, "the two appends' inserts, nothing else")
      val dsv2 = spark.read.option("startingVersion", 1)
        .table(s"txspj.`$a#changes`")
      assert(dsv2.filter($"_commit_version" === 2L).count() == 0)
      assert(dsv2.count() == 17L)
      // v4: MOR delete (a real data change — its deletes DO feed)
      assert(TxTable.deleteWhereMor(spark, a, $"v" >= 101L && $"v" <= 108L)
        == 8L)
      // v5: purge folds the vectors — flagged, nothing to emit
      assert(TxTable.purgeDeletes(spark, a, minDeletedFraction = 0.01) > 0)
      // v6: rebucket — flagged
      TxTable.rebucket(spark, a, "k", 8)
      val head6 = TxTable.snapshot(spark, a).version
      val tail = TxTable.changesBetween(spark, a, head3, head6)
      assert(tail.filter($"_change_type" === "delete").count() == 8L,
        "the MOR delete's rows feed exactly once")
      assert(tail.filter($"_commit_version" > 4L).count() == 0,
        "purge and rebucket must emit nothing")
      // the append stream also skips v5/v6 silently (v4 removed no file)
      assert(drain(a, ckpt).flatten.isEmpty)
      // table content is intact through the flagged maintenance
      assert(tbl(a).count() == 64L + 17L - 8L)
      // and a rewrite that DOES change rows keeps current semantics:
      // upsert is loud without options (pinned by the sibling spec below)
    }
  }

  test("streaming source: rewriting commits are loud by default, skippable, or re-emitted") {
    registered {
      val (a, _) = freshTables()
      val ckpt = Files.createTempDirectory("graft_cat_rw_").toString
      drain(a, ckpt) // consume the snapshot
      // an upsert REWRITES a bucket's files
      TxTable.upsert(spark, a,
        Seq(("K1", 9999L)).toDF("k", "v"), "k", "v", nBuckets)
      val err = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { drain(a, ckpt) }
      assert(err.getMessage.contains("skipChangeCommits") ||
        Option(err.getCause).exists(
          _.getMessage.contains("skipChangeCommits")),
        s"rewrite commit must fail with guidance: ${err.getMessage}")
      // skipChangeCommits: the rewrite commit vanishes from the feed
      assert(drain(a, ckpt, Map("skipChangeCommits" -> "true"))
        .forall(_.isEmpty))
      // ignoreChanges (fresh subscription at the rewrite commit): the
      // rewritten bucket's files re-emit — at-least-once, rows present
      val v = TxTable.snapshot(spark, a).version
      val reEmit = drain(a,
        Files.createTempDirectory("graft_cat_rw2_").toString,
        Map("ignoreChanges" -> "true", "startingVersion" -> v.toString))
      assert(reEmit.flatten.exists(_ == ("K1", 9999L)),
        s"rewritten rows must surface under ignoreChanges, got $reEmit")
    }
  }

  test("commit-to-commit replication: readStream.table into writeStream.toTable, exactly-once end to end") {
    registered {
      import org.apache.spark.sql.streaming.Trigger
      val base = Files.createTempDirectory("graft_cat_repl_").toString
      val (src, dst) = (s"$base/src", s"$base/dst")
      TxTable.init(spark, src,
        (1 to 8).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      // the replica is born from pure SQL DDL, then maintained by the
      // source→sink loop: five lines of code, exactly-once on both ends
      spark.sql(s"CREATE TABLE txspj.`$dst` (k STRING, v BIGINT) " +
        s"PARTITIONED BY (bucket($nBuckets, k))")
      val ckpt = Files.createTempDirectory("graft_cat_repl_ck_").toString
      def replicate(): Unit = {
        val q = spark.readStream.table(s"txspj.`$src`")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .toTable(s"txspj.`$dst`")
        q.awaitTermination()
      }
      replicate()
      assert(tbl(dst).as[(String, Long)].collect().toSet ==
        (1 to 8).map(i => (s"K$i", i.toLong)).toSet)
      // new commits on the source flow through; nothing replays
      TxTable.appendOnce(spark, src,
        Seq(("K9", 9L)).toDF("k", "v"), "k", nBuckets, "repl", 1L)
      replicate()
      replicate() // no new source commits: replica unchanged
      assert(tbl(dst).count() == 9L)
      assert(tbl(dst).as[(String, Long)].collect().toSet ==
        (1 to 9).map(i => (s"K$i", i.toLong)).toSet)
      // the replica is a real co-bucketed TxTable: it SPJ-joins the source
      withSpjConfs {
        val j = tbl(src).join(tbl(dst).withColumnRenamed("v", "w"), "k")
        assert(j.count() == 9L)
        assert(!j.queryExecution.executedPlan.toString.contains("Exchange"))
      }
    }
  }

  test("streaming a time-travel snapshot is refused") {
    registered {
      val (a, _) = freshTables()
      val e = intercept[Exception] {
        spark.readStream.table(s"txspj.`$a@v0`").writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("graft_cat_tts_").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
          .start().awaitTermination()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("time-travel")), s"got: ${msgs(e)}")
    }
  }

  private def withMorRowLevel[T](body: => T): T = {
    val k = "spark.graft.sql.rowlevel.mor"
    val saved = spark.conf.getOption(k)
    spark.conf.set(k, "true")
    try body
    finally saved match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("delta MERGE (mor): matched rows become deletion-vector bits, inserts append — zero data files rewritten") {
    registered {
      withMorRowLevel {
        val base = Files.createTempDirectory("graft_cat_dmrg_").toString
        val t = s"$base/t"
        TxTable.init(spark, t,
          (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"),
          "k", nBuckets)
        val before = TxTable.snapshot(spark, t)
        val rels0 = before.entries.map(_.rel).toSet
        Seq(("K5", 500L), ("K7", 700L), ("K100", 1000L))
          .toDF("k", "v").createOrReplaceTempView("dmrg_src")
        spark.sql(
          s"""MERGE INTO txspj.`$t` tgt USING dmrg_src src ON tgt.k = src.k
             |WHEN MATCHED THEN UPDATE SET v = src.v
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        val after = TxTable.snapshot(spark, t)
        assert(after.version == before.version + 1, "one atomic commit")
        // every original file is still live (none rewritten); the only
        // new rels are the appended inserts + updated row versions
        assert(rels0.subsetOf(after.entries.map(_.rel).toSet),
          "delta MERGE must not rewrite or drop existing data files")
        assert(after.entries.exists(_.dv.isDefined),
          "matched rows' files must carry deletion vectors")
        // runtime group filtering holds for the delta shape too: only
        // the source keys' buckets may be touched
        val touchedBuckets = after.entries.filter(_.dv.isDefined)
          .map(_.bucket).toSet
        assert(touchedBuckets.subsetOf(
          Set(bucketOf("K5"), bucketOf("K7"))),
          s"DV'd buckets $touchedBuckets must be within the matched " +
            "source keys' buckets")
        // rows exact through both surfaces
        assert(tbl(t).count() == 65)
        assert(tbl(t).filter($"k" === "K5").select($"v").as[Long]
          .head() == 500L)
        assert(tbl(t).filter($"k" === "K7").select($"v").as[Long]
          .head() == 700L)
        assert(tbl(t).filter($"k" === "K100").select($"v").as[Long]
          .head() == 1000L)
        assert(TxTable.read(spark, t).count() == 65)
        // pre-merge version intact
        assert(spark.table(s"txspj.`$t@v${before.version}`").count() == 64)
        // a SECOND delta statement on the same files UNIONS vectors
        spark.sql(s"UPDATE txspj.`$t` SET v = v + 1 WHERE k = 'K5'")
        assert(tbl(t).filter($"k" === "K5").select($"v").as[Long]
          .head() == 501L)
        assert(tbl(t).count() == 65)
        // metadata COUNT(*) stays exact over the merged vectors
        val cnt = spark.sql(s"SELECT count(*) AS c FROM txspj.`$t`")
        assert(cnt.queryExecution.executedPlan.toString
          .contains("LocalTableScan"))
        assert(cnt.as[Long].head() == 65L)
      }
    }
  }

  test("delta MERGE/UPDATE emit exact update_preimage/update_postimage CDF rows; deletes stay deletes") {
    registered {
      withMorRowLevel {
        val base = Files.createTempDirectory("graft_cat_ucdf_").toString
        val t = s"$base/t"
        TxTable.init(spark, t,
          (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"),
          "k", nBuckets)
        Seq(("K5", 500L), ("K7", 700L), ("K100", 1000L))
          .toDF("k", "v").createOrReplaceTempView("ucdf_src")
        spark.sql(
          s"""MERGE INTO txspj.`$t` tgt USING ucdf_src src ON tgt.k = src.k
             |WHEN MATCHED THEN UPDATE SET v = src.v
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)         // v1
        def feed(from: Int, to: Int) = spark.read
          .option("startingVersion", from).option("endingVersion", to)
          .table(s"txspj.`$t#changes`")
          .select($"k", $"v", $"_change_type", $"_commit_version")
          .as[(String, Long, String, Long)].collect().toSet
        val v1 = feed(1, 1)
        assert(v1 == Set(
          ("K5", 5L, "update_preimage", 1L),
          ("K7", 7L, "update_preimage", 1L),
          ("K5", 500L, "update_postimage", 1L),
          ("K7", 700L, "update_postimage", 1L),
          ("K100", 1000L, "insert", 1L)),
          s"MERGE must pair update halves, got $v1")
        // Scala-surface parity
        val sc = TxTable.changesBetween(spark, t, 0L, 1L)
          .filter($"_commit_version" === 1L)
          .select($"k", $"v", $"_change_type", $"_commit_version")
          .as[(String, Long, String, Long)].collect().toSet
        assert(sc == v1, "changesBetween must classify identically")
        // a plain DELETE keeps the 'delete' type
        spark.sql(s"DELETE FROM txspj.`$t` WHERE k = 'K3'")           // v2
        assert(feed(2, 2) == Set(("K3", 3L, "delete", 2L)))
        // an UPDATE migrating the bucket key still pairs across buckets
        spark.sql(s"UPDATE txspj.`$t` SET k = 'K999' WHERE k = 'K5'") // v3
        assert(feed(3, 3) == Set(
          ("K5", 500L, "update_preimage", 3L),
          ("K999", 500L, "update_postimage", 3L)))
        // the classification sidecar survives vacuum while its commit is
        // retained
        TxTable.vacuum(spark, t, keepVersions = 10,
          orphanRetentionMs = 0L)
        assert(feed(1, 1) == v1,
          "vacuum must keep retained commits' update classification")
      }
    }
  }

  test("delta UPDATE that kills a whole file: pre-images ride the dropped file, post-images the fresh one") {
    registered {
      withMorRowLevel {
        val base = Files.createTempDirectory("graft_cat_ucdf2_").toString
        val t = s"$base/t"
        // ONE bucket = one file: a full-match UPDATE fully-deads it
        TxTable.init(spark, t,
          (1 to 4).map(i => (s"K$i", i.toLong)).toDF("k", "v"),
          "k", nBuckets = 1)
        spark.sql(s"UPDATE txspj.`$t` SET v = v + 100")               // v1
        val rows = spark.read.option("startingVersion", 1)
          .table(s"txspj.`$t#changes`")
          .select($"k", $"v", $"_change_type")
          .as[(String, Long, String)].collect().toSet
        val expected =
          (1 to 4).map(i => (s"K$i", i.toLong, "update_preimage")).toSet ++
          (1 to 4).map(i => (s"K$i", i + 100L, "update_postimage"))
        assert(rows == expected, s"got $rows")
        assert(TxTable.changesBetween(spark, t, 0L, 1L)
          .filter($"_commit_version" === 1L)
          .select($"k", $"v", $"_change_type")
          .as[(String, Long, String)].collect().toSet == expected)
        // the table itself reads exactly the new versions
        assert(tbl(t).select($"v").as[Long].collect().toSet ==
          (1 to 4).map(_ + 100L).toSet)
      }
    }
  }

  test("delta UPDATE migrating the bucket key moves the row to its new bucket") {
    registered {
      withMorRowLevel {
        val base = Files.createTempDirectory("graft_cat_dkey_").toString
        val t = s"$base/t"
        TxTable.init(spark, t,
          (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"),
          "k", nBuckets)
        spark.sql(s"UPDATE txspj.`$t` SET k = 'K999' WHERE k = 'K3'")
        assert(tbl(t).filter($"k" === "K3").count() == 0)
        val moved = tbl(t).filter($"k" === "K999")
        assert(moved.count() == 1)
        assert(moved.select($"v").as[Long].head() == 3L)
        // the new row version lives in K999's bucket (the writers' own
        // hash), not K3's old one — delete+insert migrates by construction
        assert(tbl(t).filter($"k" === "K999")
          .select(col(graft.ops.LayoutOps.BucketCol)).as[Int].head()
          == bucketOf("K999"),
          "migrated row must land in its key's bucket")
      }
    }
  }

  private def withWapId[T](id: String)(body: => T): T = {
    val k = "spark.graft.wap.id"
    val saved = spark.conf.getOption(k)
    spark.conf.set(k, id)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("write-audit-publish: staged INSERTs are invisible, auditable via @wap.<id>, published as ONE commit") {
    registered {
      val base = Files.createTempDirectory("graft_cat_wap_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      val v0 = TxTable.snapshot(spark, t).version

      // two INSERTs staged under one id — neither visible to readers
      withWapId("etl.42") {
        spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K100', 100)")
        spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K101', 101)")
      }
      assert(tbl(t).count() == 32, "staged rows must be invisible")
      assert(TxTable.snapshot(spark, t).version == v0,
        "staging must not commit")
      assert(TxTable.stagedIds(spark, t) == Seq("etl.42"))

      // the audit view = head + staged; read-only — and even its
      // COUNT(*) answers metadata-only (staged manifests record exact
      // per-file row counts like any commit)
      val audit = spark.table(s"txspj.`$t@wap.etl.42`")
      val cnt = audit.groupBy().count()
      assert(cnt.queryExecution.executedPlan.toString
        .contains("LocalTableScan"),
        "audit-view COUNT(*) must stay metadata-only")
      assert(audit.count() == 34)
      assert(audit.filter($"k" === "K100").select($"v").as[Long]
        .head() == 100L)
      intercept[Exception] {
        spark.sql(s"INSERT INTO txspj.`$t@wap.etl.42` VALUES ('X', 1)")
      }
      // Scala surface parity
      assert(TxTable.readStaged(spark, t, "etl.42").count() == 34)

      // vacuum must NOT sweep staged files while the stage is open
      TxTable.vacuum(spark, t, keepVersions = 10, orphanRetentionMs = 0L)
      assert(spark.table(s"txspj.`$t@wap.etl.42`").count() == 34,
        "open stages must survive the orphan sweep")

      // mutations refuse under an active WAP id
      withWapId("etl.42") {
        intercept[Exception] {
          spark.sql(s"DELETE FROM txspj.`$t` WHERE k = 'K1'")
        }
        intercept[Exception] {
          spark.sql(s"UPDATE txspj.`$t` SET v = 0 WHERE k = 'K1'")
        }
      }

      // publish: both stagings land as ONE commit
      val pub = spark.sql(
        s"CALL txspj.publish_staged('$t', 'etl.42')").head().getLong(0)
      assert(pub == v0 + 1, "publish must be one atomic commit")
      assert(tbl(t).count() == 34)
      assert(TxTable.stagedIds(spark, t).isEmpty)
      // re-publish finds nothing
      intercept[Exception] {
        spark.sql(s"CALL txspj.publish_staged('$t', 'etl.42')")
      }
      // pre-publish history is intact; the audit view name is gone
      assert(spark.table(s"txspj.`$t@v$v0`").count() == 32)
      intercept[Exception] {
        spark.table(s"txspj.`$t@wap.etl.42`").count()
      }
    }
  }

  test("write-audit-publish: constraints enforce at stage time; dropped stages vacuum away; rebucket makes publish loud") {
    registered {
      val base = Files.createTempDirectory("graft_cat_wap2_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      spark.sql(s"ALTER TABLE txspj.`$t` ADD CONSTRAINT v_pos CHECK (v >= 0)")

      // a violating row fails AT STAGE TIME (the auditor must only ever
      // see rows that could land)
      withWapId("audit.1") {
        intercept[Exception] {
          spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K90', -1)")
        }
        spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K90', 90)")
      }
      assert(spark.table(s"txspj.`$t@wap.audit.1`").count() == 17)

      // drop the stage: files become orphans and vacuum collects them
      assert(TxTable.dropStaged(spark, t, "audit.1") == 1)
      assert(TxTable.stagedIds(spark, t).isEmpty)
      TxTable.vacuum(spark, t, keepVersions = 10, orphanRetentionMs = 0L)
      assert(tbl(t).count() == 16, "the table is untouched")

      // a rebucket between stage and publish fails the publish loudly
      TxTable.stageAppend(spark, t,
        Seq(("K91", 91L)).toDF("k", "v"), "k", nBuckets, "audit.2")
      TxTable.rebucket(spark, t, "k", newBuckets = 8)
      val e = intercept[Exception] {
        TxTable.publishStaged(spark, t, "audit.2")
      }
      assert(e.getMessage.contains("bucket identity"),
        s"stale-layout publish must be loud, got: ${e.getMessage}")
      TxTable.dropStaged(spark, t, "audit.2")
    }
  }

  test("#files and #history metadata tables: manifest-only rows, LocalTableScan plans, zero data I/O") {
    registered {
      val base = Files.createTempDirectory("graft_cat_meta_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      TxTable.appendOnce(spark, t,
        Seq(("K33", 33L)).toDF("k", "v"), "k", nBuckets, "meta", 1L)
      TxTable.deleteWhereMor(spark, t, $"v" <= 2L)                    // v2

      val files = spark.table(s"txspj.`$t#files`")
      val plan = files.queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
        s"#files must not scan data:\n$plan")
      val snap = TxTable.snapshot(spark, t)
      val got = files.select($"rel", $"bucket", $"rows", $"deleted_rows")
        .as[(String, Int, Option[Long], Long)].collect()
      assert(got.length == snap.entries.size)
      assert(got.map(_._4).sum == 2L,
        "the MOR delete's exact deleted counts must surface")
      // size_bytes is the real physical length
      val one = files.select($"rel", $"size_bytes")
        .as[(String, Long)].head()
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(one._2 == fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$t/${one._1}")).getLen)

      val hist = spark.table(s"txspj.`$t#history`")
      assert(hist.queryExecution.executedPlan.toString
        .contains("LocalTableScan"))
      val kinds = hist.select($"version", $"kind")
        .as[(Long, String)].collect().toMap
      assert(kinds == Map(0L -> "full", 1L -> "delta", 2L -> "delta"))
      // composable like any table: SQL aggregation over the system table
      val totalLive = spark.sql(
        s"SELECT sum(rows - deleted_rows) FROM txspj.`$t#files`")
        .as[Long].head()
      assert(totalLive == 31L)
    }
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: target-only rows delete/update through both row-level shapes") {
    registered {
      def runShape(mor: Boolean): Unit = {
        val base = Files.createTempDirectory("graft_cat_nmbs_").toString
        val t = s"$base/t"
        TxTable.init(spark, t,
          (1 to 12).map(i => (s"K$i", i.toLong)).toDF("k", "v"),
          "k", nBuckets)
        Seq(("K2", 200L), ("K4", 400L)).toDF("k", "v")
          .createOrReplaceTempView("nmbs_src")
        def body(): Unit = {
          spark.sql(
            s"""MERGE INTO txspj.`$t` tgt USING nmbs_src src
               |ON tgt.k = src.k
               |WHEN MATCHED THEN UPDATE SET v = src.v
               |WHEN NOT MATCHED BY SOURCE AND tgt.v > 10
               |  THEN DELETE
               |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = tgt.v + 1000
               |""".stripMargin)
          val rows = tbl(t).select($"k", $"v")
            .as[(String, Long)].collect().toMap
          // matched keys updated; v∈{11,12} deleted; the rest bumped
          val expect = Map("K2" -> 200L, "K4" -> 400L) ++
            (1 to 10).filterNot(Set(2, 4)).map(i => s"K$i" -> (i + 1000L))
          assert(rows == expect, s"mor=$mor got $rows")
        }
        if (mor) withMorRowLevel(body()) else body()
      }
      runShape(mor = false) // copy-on-write
      runShape(mor = true)  // delta / deletion vectors
    }
  }

  test("CALL zorder: SQL-only OPTIMIZE ZORDER BY rewrites and prunes like the Scala path") {
    registered {
      val base = Files.createTempDirectory("graft_cat_zo_").toString
      val t = s"$base/t"
      // scattered 2-D data in many small commits → fragmented buckets
      def batch(r: Range) = r.map(i =>
        (s"k$i", (i * 37 % 100).toLong, (i * 61 % 100).toLong))
        .toDF("k", "x", "y")
      TxTable.init(spark, t, batch(0 until 64), "k", nBuckets = 2)
      (1 to 7).foreach(b => TxTable.appendOnce(spark, t,
        batch(b * 64 until (b + 1) * 64), "k", 2, "zo", b.toLong))
      TxTable.computeStats(spark, t, "x")
      TxTable.computeStats(spark, t, "y")
      def opened(): Int = {
        val snap = TxTable.snapshot(spark, t)
        TxTable.readWhereAll(spark, t,
          Seq(("x", 10L, 30L), ("y", 10L, 30L)))
          .queryExecution.executedPlan.collectLeaves().flatMap {
            case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
              sc.relation.location.inputFiles.toSeq
            case _ => Nil
          }.size
      }
      val before = opened()
      val n = spark.sql(
        s"CALL txspj.zorder('$t', 'x,y', '0:100,0:100')").head().getInt(0)
      assert(n > 0, "fragmented buckets must rewrite")
      val after = opened()
      assert(after < before,
        s"z-order must open fewer files for the 2-D box: $after vs $before")
      // rows intact
      assert(tbl(t).count() == 512)
    }
  }

  test("WAP staging on a RENAMED table: stages store physical names, audit and publish serve logical ones") {
    registered {
      val base = Files.createTempDirectory("graft_cat_waprn_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 8).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      spark.sql(s"ALTER TABLE txspj.`$t` RENAME COLUMN v TO amount")
      withWapId("rn.1") {
        spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K9', 9)")
      }
      // the staged file stores the PHYSICAL field name
      val stagedRel = TxTable.readStaged(spark, t, "rn.1")
        .filter($"k" === "K9")
      assert(stagedRel.columns.contains("amount"))
      val audit = spark.table(s"txspj.`$t@wap.rn.1`")
      assert(audit.columns.toSeq == Seq("k", "amount"))
      assert(audit.filter($"k" === "K9").select($"amount").as[Long]
        .head() == 9L)
      val relsBefore = TxTable.snapshot(spark, t).entries.map(_.rel).toSet
      spark.sql(s"CALL txspj.publish_staged('$t', 'rn.1')")
      val published = TxTable.snapshot(spark, t).entries.map(_.rel)
        .filterNot(relsBefore)
      assert(published.nonEmpty, "publish must add the staged files")
      val stored = spark.read.parquet(s"$t/${published.head}").schema
      assert(stored.fieldNames.contains("v") &&
        !stored.fieldNames.contains("amount"),
        s"published stage must hold physical names: ${stored.simpleString}")
      assert(tbl(t).filter($"k" === "K9").select($"amount").as[Long]
        .head() == 9L)
    }
  }

  test("named tags pin versions: t@name reads the snapshot, vacuum keeps it alive, tags are immutable") {
    registered {
      val base = Files.createTempDirectory("graft_cat_tag_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      val v1 = spark.sql(s"CALL txspj.tag('$t', 'train.v1')")
        .head().getLong(0)
      assert(v1 == TxTable.snapshot(spark, t).version)
      // advance the table well past the tag
      (1 to 4).foreach { i =>
        TxTable.appendOnce(spark, t,
          (1 to 32).map(j => (s"K$j", (100 * i + j).toLong)).toDF("k", "v"),
          "k", nBuckets, "tag-spec", i.toLong)
      }
      assert(tbl(t).count() == 32L * 5)
      // the tag reads the pinned snapshot by name
      assert(spark.table(s"txspj.`$t@train.v1`").count() == 32)
      assert(spark.table(s"txspj.`$t@train.v1`")
        .agg(max($"v")).head().getLong(0) == 32L)
      // tags are immutable; bad names refuse
      intercept[Exception] { TxTable.tag(spark, t, "train.v1") }
      intercept[Exception] { TxTable.tag(spark, t, "v7") }
      // vacuum keeps ONLY the head + the pinned version — and the pin
      // survives with its data files readable
      TxTable.vacuum(spark, t, keepVersions = 1, orphanRetentionMs = 0L)
      assert(spark.table(s"txspj.`$t@train.v1`").count() == 32,
        "a tagged snapshot must survive vacuum intact")
      assert(tbl(t).count() == 32L * 5)
      // a tagged snapshot refuses writes like any pinned version
      intercept[Exception] {
        spark.sql(s"INSERT INTO txspj.`$t@train.v1` VALUES ('X', 1L)")
      }
      // untag releases the pin; the next vacuum collects the version
      assert(TxTable.untag(spark, t, "train.v1"))
      TxTable.vacuum(spark, t, keepVersions = 1, orphanRetentionMs = 0L)
      intercept[Exception] {
        spark.table(s"txspj.`$t@train.v1`").count()
      }
      assert(tbl(t).count() == 32L * 5, "the head is untouched")
    }
  }

  test("RESTORE rolls the head to a prior version as a new commit: DV resets, history preserved, undo-able, tag-addressable") {
    registered {
      val base = Files.createTempDirectory("graft_cat_restore_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      TxTable.appendOnce(spark, t,
        (33 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"),
        "k", nBuckets, "restore-spec", 1L)                         // v1
      assert(TxTable.deleteWhereMor(spark, t, $"v" <= 8L) == 8L)   // v2
      assert(tbl(t).count() == 56)
      // SQL restore to v1: metadata-only new commit v3, DVs reset so the
      // merge-on-read-deleted rows genuinely come back
      val r = spark.sql(s"CALL txspj.restore('$t', version => 1)").head()
      assert((r.getLong(0), r.getLong(1)) == ((3L, 1L)))
      assert(tbl(t).count() == 64)
      assert(TxTable.snapshot(spark, t).entries.forall(_.dv.isEmpty),
        "restoring past a MOR delete must reset the deletion vectors")
      // history is preserved: the pre-restore head still time-travels
      assert(TxTable.read(spark, t, version = Some(2L)).count() == 56)
      // the rollback is itself undo-able by restoring forward
      assert(TxTable.restore(spark, t, 2L) == 4L)
      assert(tbl(t).count() == 56)
      // tag-addressed restore
      TxTable.tag(spark, t, "good", Some(1L))
      val r2 = spark.sql(s"CALL txspj.restore('$t', tag => 'good')").head()
      assert((r2.getLong(0), r2.getLong(1)) == ((5L, 1L)))
      assert(tbl(t).count() == 64)
      // exactly one of version/tag
      intercept[Exception] {
        spark.sql(s"CALL txspj.restore('$t', version => 1, tag => 'good')")
          .collect()
      }
      intercept[Exception] {
        spark.sql(s"CALL txspj.restore('$t')").collect()
      }
    }
  }

  test("RESTORE keeps tombstones permanent, carries the target's bucket identity, and refuses vacuumed targets") {
    registered {
      val base = Files.createTempDirectory("graft_cat_restore2_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      spark.sql(s"ALTER TABLE txspj.`$t` ADD COLUMN note STRING")    // v1
      TxTable.appendOnce(spark, t,
        (33 to 64).map(i => (s"K$i", i.toLong, s"n$i"))
          .toDF("k", "v", "note"), "k", nBuckets, "restore-spec", 1L) // v2
      spark.sql(s"ALTER TABLE txspj.`$t` DROP COLUMN note")          // v3
      // restore to v2 (whose schema carried `note`): data comes back,
      // the DROPPED column does not — tombstones survive the rollback
      assert(TxTable.restore(spark, t, 2L) == 4L)
      val snap4 = TxTable.snapshot(spark, t)
      assert(!tbl(t).columns.contains("note"),
        "a restore must never resurrect a dropped column")
      assert(snap4.dropped.exists(_.equalsIgnoreCase("note")))
      assert(tbl(t).count() == 64)
      // restore across a rebucket resurrects the OLD layout, correctly
      // labeled in the log — point reads keep working against it
      TxTable.rebucket(spark, t, "k", nBuckets * 2)                  // v5
      assert(TxTable.snapshot(spark, t).bucketing.contains(("k", nBuckets * 2)))
      assert(TxTable.restore(spark, t, 4L) == 6L)
      assert(TxTable.snapshot(spark, t).bucketing.contains(("k", nBuckets)))
      assert(TxTable.readKeys(spark, t, "k", Seq("K7"), nBuckets)
        .count() == 1)
      // a vacuum after the restore keeps the restored head's files alive
      TxTable.vacuum(spark, t, keepVersions = 1, orphanRetentionMs = 0L)
      assert(tbl(t).count() == 64)
      // …and a target the vacuum collected refuses loudly
      val e = intercept[Exception] { TxTable.restore(spark, t, 0L) }
      assert(e.getMessage.contains("does not exist"))
    }
  }

  test("row-level change feed via #changes: batch ranges, DV-diff exactness, streaming drain, restart, hijack guard") {
    registered {
      val base = Files.createTempDirectory("graft_cat_cdf_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      TxTable.appendOnce(spark, t,
        (33 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"),
        "k", nBuckets, "cdf-spec", 1L)                               // v1
      assert(TxTable.deleteWhereMor(spark, t, $"v" <= 8L) == 8L)     // v2
      TxTable.restore(spark, t, 1L)                                  // v3
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select($"k", $"v", $"_change_type", $"_commit_version")
          .as[(String, Long, String, Long)].collect().toSet
      // full history: initial snapshot as inserts, the MOR delete as
      // exactly the newly-dead rows, the restore as exactly the revived
      val all = rows(spark.read.table(s"txspj.`$t#changes`"))
      val expected =
        (1 to 32).map(i => (s"K$i", i.toLong, "insert", 0L)).toSet ++
        (33 to 64).map(i => (s"K$i", i.toLong, "insert", 1L)) ++
        (1 to 8).map(i => (s"K$i", i.toLong, "delete", 2L)) ++
        (1 to 8).map(i => (s"K$i", i.toLong, "insert", 3L))
      assert(all == expected)
      // version-range batch read: just the delete commit
      assert(rows(spark.read.option("startingVersion", 2)
        .option("endingVersion", 2).table(s"txspj.`$t#changes`")) ==
        (1 to 8).map(i => (s"K$i", i.toLong, "delete", 2L)).toSet)
      // parity with the Scala batch CDF (which starts EXCLUSIVE)
      assert(rows(spark.read.option("startingVersion", 1)
        .table(s"txspj.`$t#changes`")) ==
        rows(TxTable.changesBetween(spark, t, 0L, 3L)))
      // streaming drain: one commit per micro-batch under the admission
      // cap, full history replayed exactly
      import org.apache.spark.sql.streaming.Trigger
      val got = scala.collection.mutable.ArrayBuffer
        .empty[Set[(String, Long, String, Long)]]
      def drainChanges(ckpt: String,
                       opts: Map[String, String] = Map.empty): Unit = {
        val reader = opts.foldLeft(spark.readStream) { case (r, (k, v)) =>
          r.option(k, v) }
        val q = reader.table(s"txspj.`$t#changes`")
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val b = rows(df)
            got.synchronized { got += b; () }
          }.start()
        q.awaitTermination()
      }
      val ckpt = s"$base/ckpt"
      drainChanges(ckpt, Map("maxVersionsPerTrigger" -> "1"))
      assert(got.count(_.nonEmpty) == 4)
      assert(got.flatten.toSet == expected)
      // restart-exactness: a new commit after the drain is the ONLY
      // thing the checkpointed stream serves next
      got.clear()
      TxTable.appendOnce(spark, t,
        Seq(("K65", 65L)).toDF("k", "v"), "k", nBuckets, "cdf-spec", 2L)
      drainChanges(ckpt)
      assert(got.flatten.toSet ==
        Set(("K65", 65L, "insert", 4L)))
      // the feed is read-only
      intercept[Exception] {
        spark.sql(s"INSERT INTO txspj.`$t#changes` VALUES ('X', 1L)")
      }
      // cannot-hijack: a literal table path ending in #changes reads as
      // ITSELF, not as some other table's change feed
      val weird = s"$base/w#changes"
      TxTable.init(spark, weird,
        Seq(("A", 1L)).toDF("k", "v"), "k", nBuckets)
      assert(!spark.table(s"txspj.`$weird`").columns
        .contains("_change_type"))
      assert(spark.table(s"txspj.`$weird`").count() == 1)
    }
  }

  test("TIMESTAMP AS OF / VERSION AS OF: SQL time travel off the log's own publication times") {
    registered {
      val base = Files.createTempDirectory("graft_cat_ts_").toString
      val t = s"$base/t"
      TxTable.init(spark, t, Seq(("A", 1L)).toDF("k", "v"), "k", nBuckets)
      Thread.sleep(30)
      val betweenV0V1 = new java.sql.Timestamp(System.currentTimeMillis())
      Thread.sleep(30)
      TxTable.appendOnce(spark, t,
        Seq(("B", 2L)).toDF("k", "v"), "k", nBuckets, "ts-spec", 1L)
      Thread.sleep(30)
      val afterV1 = new java.sql.Timestamp(System.currentTimeMillis())
      TxTable.tag(spark, t, "first", Some(0L))

      // VERSION AS OF: number and tag
      assert(spark.sql(s"SELECT count(*) FROM txspj.`$t` VERSION AS OF 0")
        .as[Long].head() == 1)
      assert(spark.sql(
        s"SELECT count(*) FROM txspj.`$t` VERSION AS OF 'first'")
        .as[Long].head() == 1)
      // TIMESTAMP AS OF: between the commits -> v0; after the head -> head
      assert(spark.sql(s"SELECT count(*) FROM txspj.`$t` " +
        s"TIMESTAMP AS OF '$betweenV0V1'").as[Long].head() == 1)
      assert(spark.sql(s"SELECT count(*) FROM txspj.`$t` " +
        s"TIMESTAMP AS OF '$afterV1'").as[Long].head() == 2)
      // before the earliest retained commit: loud
      intercept[Exception] {
        spark.sql(s"SELECT count(*) FROM txspj.`$t` " +
          "TIMESTAMP AS OF '2001-01-01 00:00:00'").collect()
      }
      // history carries the clock TIMESTAMP AS OF resolves against
      val h = TxTable.history(spark, t)
        .select($"version", $"commit_ts").as[(Long, java.sql.Timestamp)]
        .collect().sortBy(_._1)
      assert(h.map(_._1).toSeq == Seq(0L, 1L))
      assert(h(0)._2.getTime <= h(1)._2.getTime)
      assert(TxTable.versionAsOfTimestamp(spark, t,
        betweenV0V1.getTime) == 0L)
      assert(TxTable.firstVersionAtOrAfter(spark, t,
        betweenV0V1.getTime).contains(1L))

      // change feed with timestamp bounds: only v1's insert
      val cf = spark.read
        .option("startingTimestamp", betweenV0V1.toString)
        .table(s"txspj.`$t#changes`")
        .select($"k", $"_change_type", $"_commit_version")
        .as[(String, String, Long)].collect().toSet
      assert(cf == Set(("B", "insert", 1L)))
      val cfEnd = spark.read
        .option("endingTimestamp", betweenV0V1.toString)
        .table(s"txspj.`$t#changes`")
        .select($"k", $"_commit_version").as[(String, Long)]
        .collect().toSet
      assert(cfEnd == Set(("A", 0L)))

      // streaming source startingTimestamp: at-or-after serves only v1
      import org.apache.spark.sql.streaming.Trigger
      val outDir = s"$base/out"
      spark.readStream
        .option("startingTimestamp", betweenV0V1.toString)
        .table(s"txspj.`$t`")
        .writeStream.format("parquet")
        .option("checkpointLocation", s"$base/ckpt")
        .option("path", outDir)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      val streamed = spark.read.parquet(outDir)
        .select($"k", $"v").as[(String, Long)].collect().toSet
      assert(streamed == Set(("B", 2L)),
        s"startingTimestamp must serve commits at-or-after, got $streamed")
    }
  }

  test("INSERT clusters rows by the bucket transform: ~one file per bucket, not per task x bucket") {
    registered {
      val base = Files.createTempDirectory("graft_cat_dist_").toString
      val t = s"$base/t"
      spark.sql(s"CREATE TABLE txspj.`$t` (k STRING, v BIGINT) " +
        "PARTITIONED BY (bucket(4, k))")
      // a 16-partition source where every partition holds keys of every
      // bucket — without the write's clustered distribution this stages
      // up to 16x4 files; with it, at most one per non-empty bucket
      (1 to 256).map(i => (s"K$i", i.toLong)).toDF("k", "v")
        .repartition(16).createOrReplaceTempView("dist_src")
      spark.sql(s"INSERT INTO txspj.`$t` SELECT * FROM dist_src")
      val snap = TxTable.snapshot(spark, t)
      assert(snap.entries.map(_.bucket).distinct.size == 4,
        "256 keys must hit all 4 buckets")
      assert(snap.entries.size <= 4,
        s"clustered write must stage <=1 file per bucket, " +
          s"got ${snap.entries.size}: ${snap.entries.map(_.rel)}")
      assert(tbl(t).count() == 256)
      // rows landed in the right buckets regardless of the shuffle: a
      // point read by key opens exactly one bucket's files
      val one = tbl(t).filter($"k" === "K17")
      assert(one.as[(String, Long)].collect().toSeq == Seq(("K17", 17L)))
    }
  }

  test("CHECK constraints: SQL DDL lifecycle, native write enforcement, NULL passes, validated adds") {
    registered {
      val base = Files.createTempDirectory("graft_cat_check_").toString
      val t = s"$base/t"
      spark.sql(s"CREATE TABLE txspj.`$t` (k STRING, v BIGINT) " +
        "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('team'='graft')")
      // user TBLPROPERTIES persist in the log
      val props = spark.sql(s"SHOW TBLPROPERTIES txspj.`$t`")
        .as[(String, String)].collect().toMap
      assert(props.get("team").contains("graft"))
      spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K1', 5), ('K2', 7)")
      // ADD CONSTRAINT validates existing rows, then enforces every write
      spark.sql(s"ALTER TABLE txspj.`$t` ADD CONSTRAINT pos CHECK (v > 0)")
      assert(TxTable.constraintsOf(TxTable.snapshot(spark, t))
        .get("pos").exists(_.contains("v > 0")))
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K3', -1)")
      }
      assert((e.getMessage + Option(e.getCause).fold("")(_.getMessage))
        .toLowerCase.contains("check"))
      // SQL-standard CHECK: NULL passes
      spark.sql(s"INSERT INTO txspj.`$t` VALUES ('KN', NULL)")
      assert(tbl(t).count() == 3)
      // adding a constraint existing rows violate refuses
      intercept[Exception] {
        spark.sql(s"ALTER TABLE txspj.`$t` ADD CONSTRAINT vmax CHECK (v < 6)")
      }
      assert(!TxTable.constraintsOf(TxTable.snapshot(spark, t))
        .contains("vmax"))
      // a column under a CHECK cannot drop; the constraint can
      intercept[Exception] {
        spark.sql(s"ALTER TABLE txspj.`$t` DROP COLUMN v")
      }
      spark.sql(s"ALTER TABLE txspj.`$t` DROP CONSTRAINT pos")
      spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K3', -1)")
      assert(tbl(t).count() == 4)
      // constraint keys refuse raw SET TBLPROPERTIES (no validation)
      intercept[Exception] {
        spark.sql(s"ALTER TABLE txspj.`$t` " +
          "SET TBLPROPERTIES ('constraint.x'='v > 0')")
      }
      // generic properties: SET/UNSET are one metadata commit each
      spark.sql(s"ALTER TABLE txspj.`$t` SET TBLPROPERTIES ('tier'='gold')")
      spark.sql(s"ALTER TABLE txspj.`$t` UNSET TBLPROPERTIES ('team')")
      val props2 = spark.sql(s"SHOW TBLPROPERTIES txspj.`$t`")
        .as[(String, String)].collect().toMap
      assert(props2.get("tier").contains("gold") && !props2.contains("team"))
    }
  }

  test("CHECK constraints bind the Scala writers, survive vacuum anchors, and roll with RESTORE") {
    registered {
      val base = Files.createTempDirectory("graft_cat_check2_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      val preConstraint = TxTable.snapshot(spark, t).version
      TxTable.addConstraint(spark, t, "pos", "v > 0")
      // appendOnce: a violating batch fails DURING the write pass with
      // the constraint name; nothing commits
      val headV = TxTable.snapshot(spark, t).version
      val e = intercept[Exception] {
        TxTable.appendOnce(spark, t,
          Seq(("KX", -5L)).toDF("k", "v"), "k", nBuckets, "check-spec", 1L)
      }
      assert(sparkRootMessage(e).contains("pos"))
      assert(TxTable.snapshot(spark, t).version == headV)
      // a valid batch passes; a batch OMITTING the constrained column
      // passes too (stored NULL, SQL CHECK semantics)
      assert(TxTable.appendOnce(spark, t,
        Seq(("K17", 17L)).toDF("k", "v"), "k", nBuckets, "check-spec", 2L))
      spark.sql(s"ALTER TABLE txspj.`$t` ADD COLUMN note STRING")
      TxTable.addConstraint(spark, t, "kx", "coalesce(note, 'ok') != 'bad'")
      assert(TxTable.appendOnce(spark, t,
        Seq(("K18", 18L)).toDF("k", "v"), "k", nBuckets, "check-spec", 3L))
      intercept[Exception] {
        TxTable.appendOnce(spark, t,
          Seq(("K19", 19L, "bad")).toDF("k", "v", "note"),
          "k", nBuckets, "check-spec", 4L)
      }
      // upsert enforces too
      intercept[Exception] {
        TxTable.upsert(spark, t,
          Seq(("K1", -1L, 99L)).toDF("k", "v", "ord"),
          "k", "ord", nBuckets)
      }
      // constraints survive a vacuum's checkpoint anchor
      TxTable.vacuum(spark, t, keepVersions = 1, orphanRetentionMs = 0L)
      assert(TxTable.constraintsOf(TxTable.snapshot(spark, t))
        .keySet == Set("pos", "kx"))
      // RESTORE rolls metadata with the data: the pre-constraint version
      // has no constraints, so the violating append now lands
      // (vacuum kept only the head — re-pin the old version first)
      val t2 = s"$base/t2"
      TxTable.init(spark, t2,
        Seq(("A", 1L)).toDF("k", "v"), "k", nBuckets)
      TxTable.addConstraint(spark, t2, "pos", "v > 0")
      TxTable.restore(spark, t2, 0L)
      assert(TxTable.constraintsOf(TxTable.snapshot(spark, t2)).isEmpty)
      assert(TxTable.appendOnce(spark, t2,
        Seq(("B", -1L)).toDF("k", "v"), "k", nBuckets, "check-spec", 1L))
      assert(preConstraint == 0L)
    }
  }

  test("CHECK constraints ride CREATE TABLE and bind the exactly-once streaming sink") {
    registered {
      val base = Files.createTempDirectory("graft_cat_check3_").toString
      val t = s"$base/t"
      // inline table-level constraint through the TableInfo create path
      spark.sql(s"CREATE TABLE txspj.`$t` (k STRING, v BIGINT, " +
        "CONSTRAINT pos CHECK (v > 0)) PARTITIONED BY (bucket(4, k))")
      assert(TxTable.constraintsOf(TxTable.snapshot(spark, t))
        .get("pos").exists(_.contains("v > 0")))
      intercept[Exception] {
        spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K1', 0)")
      }
      spark.sql(s"INSERT INTO txspj.`$t` VALUES ('K1', 1)")
      // streaming writes enforce natively too: a micro-batch with a
      // violating row fails the query; nothing commits
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      val mem = MemoryStream[(String, Long)]
      mem.addData(("K2", 2L), ("K3", -3L))
      val q = mem.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .toTable(s"txspj.`$t`")
      val e = intercept[Exception] { q.awaitTermination() }
      assert(sparkRootMessage(e).toLowerCase.contains("check") ||
        sparkRootMessage(e).contains("pos"),
        s"expected a CHECK violation, got: ${sparkRootMessage(e).take(500)}")
      assert(tbl(t).count() == 1, "the failed micro-batch must not commit")
    }
  }

  /** Message of the deepest cause (Spark wraps write-task failures). */
  private def sparkRootMessage(e: Throwable): String = {
    var cur: Throwable = e
    val sb = new StringBuilder
    while (cur != null) { sb.append(Option(cur.getMessage).getOrElse(""))
      sb.append('\n'); cur = cur.getCause }
    sb.toString
  }

  test("a concurrent MOR delete between scan and commit makes both row-level commit shapes fail loudly") {
    registered {
      import org.apache.spark.sql.connector.write.RowLevelOperation.Command
      val base = Files.createTempDirectory("graft_cat_race_").toString
      val t = s"$base/t"
      TxTable.init(spark, t,
        (1 to 64).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", nBuckets)
      val scanBasis = TxTable.snapshot(spark, t)
      // the "concurrent" delete: lands AFTER the ops captured their basis
      assert(TxTable.deleteWhereMor(spark, t, $"v" <= 10L) == 10L)
      val drifted = TxTable.snapshot(spark, t).entries
        .find(_.dv.isDefined).get
      // group-based (COW) commit over the stale basis: committing would
      // resurrect the deleted rows AND erase the delete — must throw
      val cowOp = new graft.sources.TxRowLevelOperation(t, scanBasis,
        ("k", nBuckets), tbl(t).schema, Command.UPDATE)
      val cowWrite = new graft.sources.TxReplaceBatchWrite(cowOp, t,
        tbl(t).schema, ("k", nBuckets))
      val e1 = intercept[java.util.ConcurrentModificationException] {
        cowWrite.commit(Array(graft.sources.TxCommitMessage(Seq.empty)))
      }
      assert(e1.getMessage.contains("stale"))
      // delta commit touching the drifted file: the union cannot tell an
      // update-of-a-concurrently-deleted-row apart — must throw
      val dOp = new graft.sources.TxDeltaRowLevelOperation(t, scanBasis,
        ("k", nBuckets), tbl(t).schema, Command.UPDATE)
      val dWrite = new graft.sources.TxDeltaBatchWrite(dOp, t,
        tbl(t).schema, ("k", nBuckets))
      val bm = new org.roaringbitmap.RoaringBitmap(); bm.add(0)
      val e2 = intercept[java.util.ConcurrentModificationException] {
        dWrite.commit(Array(graft.sources.TxDeltaCommitMessage(Seq.empty,
          Seq(drifted.rel ->
            graft.ops.DeletionVectors.serialize(bm)))))
      }
      assert(e2.getMessage.contains("stale"))
      // the table is untouched by both refused commits
      assert(tbl(t).count() == 54)
    }
  }

  private def withSpjConfs[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
  test("ALTER TABLE RENAME COLUMN: metadata-only SQL rename; reads, inserts and time travel follow the map") {
    registered {
      val base = Files.createTempDirectory("graft_cat_rn_").toString
      val table = s"$base/t"
      val df = (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v")
      TxTable.init(spark, table, df, "k", nBuckets)
      val filesBefore = TxTable.snapshot(spark, table).entries.map(_.rel).toSet

      spark.sql(s"ALTER TABLE txspj.`$table` RENAME COLUMN v TO amount")
      // metadata-only: same data files, one new version
      val snap = TxTable.snapshot(spark, table)
      assert(snap.entries.map(_.rel).toSet == filesBefore)
      assert(snap.renames == Map("amount" -> "v"))

      // SQL sees only the new name
      assert(tbl(table).columns.toSeq == Seq("k", "amount"))
      val total = spark.sql(
        s"SELECT sum(amount) FROM txspj.`$table`").as[Long].head()
      assert(total == (1 to 32).map(_.toLong).sum)
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT v FROM txspj.`$table`").collect()
      }

      // INSERT under the logical name; the staged file stores the
      // PHYSICAL field name
      spark.sql(s"INSERT INTO txspj.`$table` VALUES ('K99', 990)")
      val newRels = TxTable.snapshot(spark, table).entries.map(_.rel)
        .filterNot(filesBefore)
      assert(newRels.nonEmpty)
      val stored = spark.read.parquet(s"$table/${newRels.head}").schema
      assert(stored.fieldNames.contains("v") &&
        !stored.fieldNames.contains("amount"),
        s"INSERT must store physical names: ${stored.simpleString}")
      assert(spark.sql(
        s"SELECT amount FROM txspj.`$table` WHERE k = 'K99'")
        .as[Long].head() == 990L)

      // time travel serves the pre-rename version under its own name
      assert(spark.table(s"txspj.`$table@v0`").columns.toSeq ==
        Seq("k", "v"))

      // UPDATE and DELETE under the logical name (COW row-level ops)
      spark.sql(s"UPDATE txspj.`$table` SET amount = 1000 WHERE k = 'K99'")
      assert(spark.sql(
        s"SELECT amount FROM txspj.`$table` WHERE k = 'K99'")
        .as[Long].head() == 1000L)
      spark.sql(s"DELETE FROM txspj.`$table` WHERE amount = 1000")
      assert(tbl(table).filter($"k" === "K99").count() == 0)

      // MERGE under the logical name
      Seq(("K1", 111L), ("K77", 777L)).toDF("k", "amount")
        .createOrReplaceTempView("rn_updates")
      spark.sql(
        s"""MERGE INTO txspj.`$table` t USING rn_updates u ON t.k = u.k
           |WHEN MATCHED THEN UPDATE SET amount = u.amount
           |WHEN NOT MATCHED THEN INSERT (k, amount) VALUES (u.k, u.amount)
           |""".stripMargin)
      val merged = tbl(table).filter($"k".isin("K1", "K77"))
        .select($"k", $"amount").as[(String, Long)].collect().toMap
      assert(merged == Map("K1" -> 111L, "K77" -> 777L))

      // the change feed surfaces the logical name
      assert(spark.table(s"txspj.`$table#changes`").columns
        .contains("amount"))
    }
  }

  test("rename + pushdown: zone maps, bucket pruning and metadata aggregates answer under the logical name") {
    registered {
      val base = Files.createTempDirectory("graft_cat_rnpd_").toString
      val table = s"$base/t"
      def batch(days: Range) = days.map(d => (s"k$d", d.toLong))
        .toDF("k", "day")
      TxTable.init(spark, table, batch(0 until 100), "k", nBuckets)
      TxTable.appendOnce(spark, table, batch(100 until 200), "k", nBuckets,
        "rnpd", 0L)
      TxTable.computeStats(spark, table, "day")
      spark.sql(s"ALTER TABLE txspj.`$table` RENAME COLUMN day TO event_day")

      // zone-map file pruning fires for a filter on the LOGICAL name —
      // no re-ANALYZE happened, the physical sidecar serves it
      val all = scannedFiles(tbl(table))
      val lo = tbl(table).filter($"event_day" < 50)
      assert(lo.count() == 50)
      assert(scannedFiles(lo) < all,
        s"zone maps must prune on the renamed column (${scannedFiles(lo)} vs $all)")

      // bucket pruning on the renamed KEY
      spark.sql(s"ALTER TABLE txspj.`$table` RENAME COLUMN k TO id")
      val point = tbl(table).filter($"id" === "k7")
      assert(point.count() == 1)
      assert(scannedFiles(point) < all,
        "bucket identity must prune on the renamed key")

      // metadata-only aggregates under logical names: zero files opened
      val agg = spark.sql(
        s"SELECT count(*), min(event_day), max(event_day) FROM txspj.`$table`")
      assert(agg.as[(Long, Long, Long)].head() == ((200L, 0L, 199L)))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
        s"metadata aggregate must not scan:\n$plan")
    }
  }

  test("rename on co-bucketed tables: the storage-partitioned join stays exchange-free under logical keys") {
    registered {
      val (a, b) = freshTables()
      spark.sql(s"ALTER TABLE txspj.`$a` RENAME COLUMN k TO id")
      spark.sql(s"ALTER TABLE txspj.`$b` RENAME COLUMN k TO id")
      withSpjConfs {
        val j = tbl(a).join(tbl(b), "id").select($"id", $"v", $"w")
        val rows = j.as[(String, Long, Long)].collect().toSet
        assert(rows == (1 to 64).map(i => (s"K$i", i.toLong, i * 10L)).toSet)
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"),
          s"renamed co-bucketed join must stay storage-partitioned:\n$p")
      }
      // constraints keep enforcing across the rename boundary
      spark.sql(s"ALTER TABLE txspj.`$a` ADD CONSTRAINT v_pos CHECK (v >= 0)")
      intercept[Exception] {
        spark.sql(s"INSERT INTO txspj.`$a` VALUES ('K200', -5)")
      }
      spark.sql(s"INSERT INTO txspj.`$a` VALUES ('K200', 5)")
      assert(tbl(a).filter($"id" === "K200").count() == 1)
      // DROP COLUMN of a renamed column tombstones the PHYSICAL name
      spark.sql(s"ALTER TABLE txspj.`$b` RENAME COLUMN w TO weight")
      spark.sql(s"ALTER TABLE txspj.`$b` DROP COLUMN weight")
      assert(TxTable.snapshot(spark, b).dropped == Set("w"))
      // the dropped column's map entry dies; the key's rename survives
      assert(TxTable.snapshot(spark, b).renames == Map("id" -> "k"))
      assert(tbl(b).columns.toSeq == Seq("id"))
    }
  }
}
