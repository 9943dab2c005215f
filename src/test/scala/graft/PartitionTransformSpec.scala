package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PartitionTransforms, TxTable}

/** Hidden partitioning (the Iceberg partition-transform shape): CREATE
  * declares `PARTITIONED BY (days(ts), bucket(n, key))`; writers derive
  * each row's partition value and split staged files under `part-<v>/`
  * segments; scans convert predicates on the SOURCE column to exact
  * per-file envelopes (planned-file counts pinned here); day-boundary
  * retention DELETEs decide Full per file from the envelope alone —
  * a metadata-only commit, zero files read or rewritten. */
class PartitionTransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txpt",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txpt")
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

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** 40 rows across 4 UTC days (10/day), keyed k1..k40. */
  private def fourDays = (0 until 40).map { i =>
    (i.toLong, ts(f"2024-03-${10 + i / 10}%02d 0${i % 10}:30:00"), s"e$i")
  }.toDF("id", "ts", "kind")

  test("transform expressions match the driver-side java.time mirrors exactly (hours/days/months/years, incl. pre-1970)") {
    val instants = Seq(
      "1969-12-31 23:59:59.999999", "1970-01-01 00:00:00",
      "1999-12-31 23:59:59", "2000-02-29 12:00:00",
      "2024-01-01 00:00:00", "2024-02-29 23:59:59.5",
      "2024-03-01 00:00:00", "2024-12-31 23:59:59.999999",
      "1900-07-15 06:07:08", "2100-01-31 23:00:00",
      // past 2^53 epoch micros (~year 2255): a double-division floor
      // would round a row one micro before a day boundary INTO the next
      // partition — the write expression must stay exact long floorDiv
      "2255-06-07 00:00:00", "2500-06-01 00:00:00",
      "4999-12-31 23:59:59.999999", "5000-01-01 00:00:00",
      "9999-12-31 23:59:59.999999")
    // evaluate the WRITE expression in a UTC session so the literal
    // strings above are themselves UTC instants
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      val df = instants.toDF("s").select(to_timestamp($"s").as("ts"))
      for (fn <- Seq("hours", "days", "months", "years")) {
        val spec = PartitionTransforms.Field(fn, "ts")
        val got = df.select(PartitionTransforms.partExpr(spec,
          org.apache.spark.sql.types.TimestampType).as("p"), $"ts")
          .collect().map(r => (r.getTimestamp(1), r.getLong(0)))
        got.foreach { case (t, p) =>
          val micros = Math.floorDiv(t.getTime, 1000L) * 1000000L +
            t.getNanos / 1000L
          val want = PartitionTransforms.valueOfMicros(fn, micros)
          assert(p == want, s"$fn($t): expr=$p mirror=$want")
          // and the mirror's range re-contains the instant
          val (lo, hi) = PartitionTransforms.rangeMicros(fn, p)
          assert(micros >= lo && micros < hi,
            s"$fn($t)=$p but range [$lo,$hi) misses $micros")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("partOfRel parses ONLY the canonical files/<uuid>/part-<v>/ segment — a cross-table prefix traversing a dir literally named part-<n> is not a partition") {
    // native partitioned rel
    assert(PartitionTransforms.partOfRel(
      "files/ab12cd/part-19793/bucket-0/f1.parquet") == Some(19793L))
    assert(PartitionTransforms.partOfRel(
      "files/ab12cd/part--5/bucket-3/f.parquet") == Some(-5L))
    // unpartitioned rel: no value
    assert(PartitionTransforms.partOfRel(
      "files/ab12cd/bucket-0/f1.parquet").isEmpty)
    // a CLONE's cross-table rel whose traversal passes through a user
    // directory literally named part-7 must NOT parse as partition 7
    assert(PartitionTransforms.partOfRel(
      "../../part-7/src_tbl/files/ab12cd/bucket-0/f1.parquet").isEmpty)
    // ... while the same clone rel over a genuinely partitioned shared
    // file still parses ITS value, not the prefix's
    assert(PartitionTransforms.partOfRel(
      "../../part-7/src_tbl/files/ab12cd/part-42/bucket-0/f1.parquet")
      == Some(42L))
    // null-partition segment: no value, but the segment is recognized
    assert(PartitionTransforms.partOfRel(
      "files/ab12cd/part-null/bucket-0/f.parquet").isEmpty)
    assert(PartitionTransforms.hasPartSegment(
      "files/ab12cd/part-null/bucket-0/f.parquet"))
    assert(!PartitionTransforms.hasPartSegment(
      "../../part-null/src/files/ab12cd/bucket-0/f.parquet"))
  }

  test("CTAS with days(ts)+bucket lays files under part-<day>/bucket-<b>; scans prune to the predicate's days (planned-file counts pinned)") {
    registered {
      val t = Files.createTempDirectory("graft_pt1_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpt.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(4, id))""")
      fourDays.writeTo(s"txpt.`$t`").append()
      val snap = TxTable.snapshot(spark, t)
      assert(snap.entries.nonEmpty)
      assert(snap.entries.forall(e =>
        PartitionTransforms.partOfRel(e.rel).isDefined),
        s"every staged file must carry a part segment: " +
          snap.entries.take(3).map(_.rel))
      val days = snap.entries
        .flatMap(e => PartitionTransforms.partOfRel(e.rel)).distinct.sorted
      assert(days.size == 4, s"4 UTC days expected, got $days")
      // full scan reads everything
      val all = spark.table(s"txpt.`$t`")
      assert(scannedFiles(all) == snap.entries.size)
      // one-day range prunes to that day's files — NO ANALYZE ever ran,
      // the envelope comes from the path segment alone
      val day = spark.table(s"txpt.`$t`")
        .filter($"ts" >= "2024-03-11 00:00:00" && $"ts" < "2024-03-12 00:00:00")
      val dayFiles = snap.entries.count(e =>
        PartitionTransforms.partOfRel(e.rel)
          .contains(ts("2024-03-11 00:00:00").getTime / 86400000L))
      assert(scannedFiles(day) == dayFiles && dayFiles < snap.entries.size,
        s"expected exactly the day's $dayFiles files, " +
          s"scanned ${scannedFiles(day)} of ${snap.entries.size}")
      assert(day.count() == 10)
      // a mid-day bound still keeps the boundary day (envelope overlap)
      val half = spark.table(s"txpt.`$t`")
        .filter($"ts" >= "2024-03-12 12:00:00")
      val tail = snap.entries.count(e =>
        PartitionTransforms.partOfRel(e.rel).exists(_ >= 19794L))
      assert(scannedFiles(half) == tail)
      assert(half.count() == fourDays.where(
        $"ts" >= "2024-03-12 12:00:00").count())
    }
  }

  test("day-boundary retention DELETE is a metadata-only commit: no file read, no file staged; mid-day cuts fall back correctly") {
    registered {
      val t = Files.createTempDirectory("graft_pt2_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpt.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(4, id))""")
      fourDays.writeTo(s"txpt.`$t`").append()
      val before = TxTable.snapshot(spark, t)
      // day-boundary cutoff: the first two days' files are FULLY covered
      // by their envelopes -> a pure manifest commit
      spark.sql(s"DELETE FROM txpt.`$t` WHERE ts < '2024-03-12 00:00:00'")
      val after = TxTable.snapshot(spark, t)
      assert(after.version == before.version + 1)
      val beforeRels = before.entries.map(_.rel).toSet
      assert(after.entries.forall(e => beforeRels(e.rel)),
        "metadata delete must stage NOTHING new")
      assert(after.entries.forall(_.dv.isEmpty),
        "metadata delete must not mint deletion vectors")
      assert(after.entries.size < before.entries.size)
      assert(after.entries.flatMap(e =>
        PartitionTransforms.partOfRel(e.rel)).forall(_ >= 19794L))
      assert(spark.table(s"txpt.`$t`").count() == 20)
      // a NON-boundary cutoff partially covers one day -> exact rewrite
      // (or DV), same answers — soundness over speed
      spark.sql(s"DELETE FROM txpt.`$t` WHERE ts < '2024-03-12 05:00:00'")
      assert(spark.table(s"txpt.`$t`").count() ==
        fourDays.where($"ts" >= "2024-03-12 05:00:00").count())
    }
  }

  test("NULL source values land under part-null, survive partition deletes, and IS NULL resolves them exactly") {
    registered {
      val t = Files.createTempDirectory("graft_pt3_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpt.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      val withNulls = fourDays.limit(10)
        .union(Seq((100L, null.asInstanceOf[java.sql.Timestamp], "n1"),
          (101L, null.asInstanceOf[java.sql.Timestamp], "n2"))
          .toDF("id", "ts", "kind"))
      withNulls.writeTo(s"txpt.`$t`").append()
      val snap = TxTable.snapshot(spark, t)
      assert(snap.entries.exists(e => e.rel.contains("/part-null/")),
        s"null rows must land under part-null: ${snap.entries.map(_.rel)}")
      // a time-range DELETE never touches part-null rows
      spark.sql(s"DELETE FROM txpt.`$t` WHERE ts < '2024-03-11 00:00:00'")
      assert(spark.table(s"txpt.`$t`").count() == 2)
      assert(spark.table(s"txpt.`$t`").where($"ts".isNull).count() == 2)
      // IS NULL delete: part-valued files prove Zero from the envelope
      // (no nulls possible there); only part-null files are touched
      spark.sql(s"DELETE FROM txpt.`$t` WHERE ts IS NULL")
      assert(spark.table(s"txpt.`$t`").count() == 0)
    }
  }

  test("months(ts) partitions by UTC calendar month and prunes month ranges") {
    registered {
      val t = Files.createTempDirectory("graft_pt4_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpt.`$t`
        (id BIGINT, ts TIMESTAMP)
        PARTITIONED BY (months(ts), bucket(2, id))""")
      val rows = Seq(
        (1L, ts("2023-12-31 23:59:59")), (2L, ts("2024-01-01 00:00:00")),
        (3L, ts("2024-01-31 23:59:59")), (4L, ts("2024-02-01 00:00:00")),
        (5L, ts("2024-02-29 23:59:59")), (6L, ts("2024-03-01 00:00:00")))
        .toDF("id", "ts")
      rows.writeTo(s"txpt.`$t`").append()
      val snap = TxTable.snapshot(spark, t)
      val months = snap.entries
        .flatMap(e => PartitionTransforms.partOfRel(e.rel)).distinct.sorted
      assert(months == Seq(647L, 648L, 649L, 650L), s"got $months")
      val feb = spark.table(s"txpt.`$t`")
        .filter($"ts" >= "2024-02-01 00:00:00" && $"ts" < "2024-03-01 00:00:00")
      val febFiles = snap.entries.count(e =>
        PartitionTransforms.partOfRel(e.rel).contains(649L))
      assert(scannedFiles(feb) == febFiles)
      assert(feb.as[(Long, java.sql.Timestamp)].collect()
        .map(_._1).sorted.toSeq == Seq(4L, 5L))
      // month-boundary retention: metadata-only
      val before = TxTable.snapshot(spark, t)
      spark.sql(s"DELETE FROM txpt.`$t` WHERE ts < '2024-02-01 00:00:00'")
      val after = TxTable.snapshot(spark, t)
      val beforeRels = before.entries.map(_.rel).toSet
      assert(after.entries.forall(e => beforeRels(e.rel)) &&
        after.entries.forall(_.dv.isEmpty))
      assert(spark.table(s"txpt.`$t`").count() == 3)
    }
  }

  test("transform survives maintenance rewrites; DDL guards: source-column drop, history edits, no-op evolution, UNSET all refuse") {
    registered {
      val t = Files.createTempDirectory("graft_pt5_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpt.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      fourDays.writeTo(s"txpt.`$t`").append()
      fourDays.withColumn("id", $"id" + 1000)
        .writeTo(s"txpt.`$t`").append()
      // compaction rewrites recompute the part value from the rows, so
      // outputs stay day-split — never a cross-day merged file
      TxTable.compact(spark, t)
      val snap = TxTable.snapshot(spark, t)
      assert(snap.entries.forall(e =>
        PartitionTransforms.partOfRel(e.rel).isDefined),
        s"compaction must preserve partition segments: " +
          snap.entries.take(3).map(_.rel))
      assert(spark.table(s"txpt.`$t`").count() == 80)
      // pruning still exact post-compaction
      val day = spark.table(s"txpt.`$t`")
        .filter($"ts" >= "2024-03-13 00:00:00")
      assert(scannedFiles(day) == snap.entries.count(e =>
        PartitionTransforms.partOfRel(e.rel).exists(_ >= 19795L)))
      // guards: dropping the HEAD spec's source column refuses; the
      // engine's spec HISTORY is never directly settable; re-SETting
      // the unchanged transform refuses (evolution must evolve);
      // UNSET refuses (history interprets existing files)
      val e1 = intercept[Exception] {
        spark.sql(s"ALTER TABLE txpt.`$t` DROP COLUMN ts")
      }
      assert(e1.getMessage.contains("hidden-partition source"))
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE txpt.`$t` SET TBLPROPERTIES " +
          s"('${PartitionTransforms.Prop}'='days(ts)')")
      }
      assert(e2.getMessage.contains("already the head"))
      val e3 = intercept[Exception] {
        spark.sql(s"ALTER TABLE txpt.`$t` SET TBLPROPERTIES " +
          s"('${PartitionTransforms.SpecsProp}'='days(ts)')")
      }
      assert(e3.getMessage.contains("append-only"))
      val e4 = intercept[Exception] {
        spark.sql(s"ALTER TABLE txpt.`$t` UNSET TBLPROPERTIES " +
          s"('${PartitionTransforms.Prop}')")
      }
      assert(e4.getMessage.contains("cannot be UNSET"))
      // and the declared layout is reported back through DESCRIBE
      val parts = spark.sql(s"DESCRIBE TABLE EXTENDED txpt.`$t`")
        .collect().map(_.toString).mkString("\n")
      assert(parts.contains("days(ts)"), parts)
    }
  }

  test("hours() refuses a DATE column; a DATE column partitions by days; unknown transforms refuse") {
    registered {
      val bad = Files.createTempDirectory("graft_pt6_").toString + "/b"
      val e = intercept[Exception] {
        spark.sql(s"""CREATE TABLE txpt.`$bad` (id BIGINT, d DATE)
          PARTITIONED BY (hours(d), bucket(2, id))""")
      }
      assert(e.getMessage.contains("TIMESTAMP"))
      val t = Files.createTempDirectory("graft_pt6_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpt.`$t` (id BIGINT, d DATE)
        PARTITIONED BY (days(d), bucket(2, id))""")
      Seq((1L, java.sql.Date.valueOf("2024-03-10")),
        (2L, java.sql.Date.valueOf("2024-03-11")))
        .toDF("id", "d").writeTo(s"txpt.`$t`").append()
      val snap = TxTable.snapshot(spark, t)
      assert(snap.entries.flatMap(e2 =>
        PartitionTransforms.partOfRel(e2.rel)).distinct.sorted ==
        Seq(19792L, 19793L))
      val one = spark.table(s"txpt.`$t`").filter($"d" === "2024-03-11")
      assert(scannedFiles(one) == snap.entries.count(e2 =>
        PartitionTransforms.partOfRel(e2.rel).contains(19793L)))
      assert(one.count() == 1)
    }
  }

  test("partition-aligned maintenance: compact_partition rewrites one day's buckets only; #partitions is the retention decision input") {
    registered {
      val t = Files.createTempDirectory("graft_pt7_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpt.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      // three appends -> each day's buckets fragment to 3 files
      (0 until 3).foreach { b =>
        (0 until 2).map { d =>
          (b * 100 + d.toLong, ts(f"2024-03-${10 + d}%02d 0$b:00:00"),
            s"e$b-$d")
        }.toDF("id", "ts", "kind").writeTo(s"txpt.`$t`").append()
      }
      val before = TxTable.snapshot(spark, t)
      val day0 = 19792L
      def filesOf(snap: TxTable.Snapshot, p: Long) = snap.entries
        .filter(e => PartitionTransforms.partOfRel(e.rel).contains(p))
      assert(filesOf(before, day0).size >= 3)
      val day1Before = filesOf(before, 19793L).map(_.rel).toSet
      val n = spark.sql(s"CALL txpt.compact_partition('$t', $day0)")
        .as[Int].head()
      assert(n >= 1)
      val after = TxTable.snapshot(spark, t)
      // day 0 coalesced to one file per touched bucket; day 1 untouched
      assert(filesOf(after, day0).size < filesOf(before, day0).size)
      assert(filesOf(after, 19793L).map(_.rel).toSet == day1Before,
        "partition-aligned maintenance must not touch other days")
      assert(spark.table(s"txpt.`$t`").count() == 6)
      // the rewrite is dataChange=false: nothing replays downstream
      assert(TxTable.changesBetween(spark, t, before.version,
        after.version).count() == 0)
      // #partitions: one row per day with exact rows/files — the
      // "what does dropping a day free?" input
      val parts = spark.table(s"txpt.`$t#partitions`")
        .select($"part", $"part_start", $"files", $"rows")
        .as[(Option[Long], String, Int, Option[Long])]
        .collect().sortBy(_._1)
      assert(parts.map(_._1) sameElements
        Array(Some(19792L), Some(19793L)))
      assert(parts.head._2.startsWith("2024-03-10"))
      assert(parts.map(_._4).forall(_.contains(3L)))
      assert(parts.forall(_._3 >= 1))
    }
  }

  test("time travel on a partitioned table prunes per version: each snapshot plans its own day set") {
    registered {
      val t = Files.createTempDirectory("graft_pt8_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpt.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      fourDays.limit(20).writeTo(s"txpt.`$t`").append()   // days 10-11
      val v1 = TxTable.snapshot(spark, t).version
      fourDays.filter($"ts" >= "2024-03-12 00:00:00")
        .writeTo(s"txpt.`$t`").append()                    // days 12-13
      // head prunes across all four days; the pinned version never
      // plans files from days it predates
      val headDay = spark.table(s"txpt.`$t`")
        .filter($"ts" >= "2024-03-12 00:00:00")
      assert(headDay.count() == 20)
      val old = spark.table(s"txpt.`$t@v$v1`")
        .filter($"ts" >= "2024-03-12 00:00:00")
      assert(old.count() == 0)
      assert(scannedFiles(old) == 0,
        "a pinned pre-append read must plan ZERO files for the later days")
      assert(spark.table(s"txpt.`$t@v$v1`").count() == 20)
    }
  }

  test("CALL drop_partition removes exactly one day's files by metadata; the change feed sees file-granular deletes") {
    registered {
      val t = Files.createTempDirectory("graft_pt9_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpt.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      fourDays.writeTo(s"txpt.`$t`").append()
      val before = TxTable.snapshot(spark, t)
      val day0Files = before.entries.count(e =>
        PartitionTransforms.partOfRel(e.rel).contains(19792L))
      val n = spark.sql(s"CALL txpt.drop_partition('$t', 19792)")
        .as[Int].head()
      assert(n == day0Files && n >= 1)
      val after = TxTable.snapshot(spark, t)
      // metadata-only: surviving entries are a strict subset, nothing
      // staged, the other days untouched
      val beforeRels = before.entries.map(_.rel).toSet
      assert(after.entries.forall(e => beforeRels(e.rel)))
      assert(after.entries.forall(e =>
        PartitionTransforms.partOfRel(e.rel).exists(_ >= 19793L)))
      assert(spark.table(s"txpt.`$t`").count() == 30)
      // rows actually died -> the change feed replays them as deletes
      val feed = TxTable.changesBetween(spark, t, before.version,
        after.version)
      assert(feed.filter($"_change_type" === "delete").count() == 10)
      // idempotent: a second call is a no-op
      assert(spark.sql(s"CALL txpt.drop_partition('$t', 19792)")
        .as[Int].head() == 0)
      // unpartitioned tables refuse
      val u = Files.createTempDirectory("graft_pt9u_").toString + "/u"
      TxTable.init(spark, u, Seq((1L, "a")).toDF("id", "k"), "id", 2)
      val e = intercept[Exception] {
        spark.sql(s"CALL txpt.drop_partition('$u', 1)")
      }
      assert(e.getMessage.contains("no partition transform"))
    }
  }
}
