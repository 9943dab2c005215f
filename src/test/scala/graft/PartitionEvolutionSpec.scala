package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PartitionTransforms, TxTable}

/** Partition-spec EVOLUTION (the Iceberg v2 feature): `ALTER TABLE t SET
  * TBLPROPERTIES ('graft.partition.transform' = '…')` records a NEW spec
  * for FUTURE commits — one property commit, zero files touched. Files
  * written under earlier specs keep their original `part-<v>/` envelopes
  * (post-evolution generations are stamped with a `spec-<sid>/` path
  * level); mixed-generation scans prune each file under the spec that
  * placed it, and partition-addressed maintenance decides old-spec files
  * by envelope containment — refusing loudly when a file's envelope
  * straddles the requested slice. */
class PartitionEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txpe",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txpe")
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

  /** 20 rows across 2 UTC days (10/day), keyed k0..k19. */
  private def twoDays = (0 until 20).map { i =>
    (i.toLong, ts(f"2024-03-${10 + i / 10}%02d 0${i % 10}:30:00"), s"e$i")
  }.toDF("id", "ts", "kind")

  test("ALTER evolves days(ts) -> hours(ts): old files keep day envelopes, new files land spec-1/part-<hour>; both generations prune under their own spec") {
    registered {
      val t = Files.createTempDirectory("graft_pe1_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpe.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      twoDays.writeTo(s"txpe.`$t`").append() // days 19792-19793, sid 0
      val vPre = TxTable.snapshot(spark, t).version
      spark.sql(s"ALTER TABLE txpe.`$t` SET TBLPROPERTIES " +
        s"('${PartitionTransforms.Prop}'='hours(ts)')")
      val snapAfterAlter = TxTable.snapshot(spark, t)
      // the evolution itself is ONE property commit: zero files touched
      assert(snapAfterAlter.version == vPre + 1)
      assert(snapAfterAlter.entries.map(_.rel).toSet ==
        TxTable.snapshot(spark, t, Some(vPre)).entries.map(_.rel).toSet)
      assert(PartitionTransforms.history(snapAfterAlter.props)
        .map(_.render) == IndexedSeq("days(ts)", "hours(ts)"))
      // new writes land under spec-1/part-<hour>
      (0 until 4).map(i =>
        (100L + i, ts(s"2024-03-12 0$i:15:00"), s"n$i"))
        .toDF("id", "ts", "kind").writeTo(s"txpe.`$t`").append()
      val snap = TxTable.snapshot(spark, t)
      val gen1 = snap.entries.filter(_.rel.contains("/spec-1/"))
      assert(gen1.nonEmpty, snap.entries.map(_.rel))
      val hours = gen1.flatMap(e => PartitionTransforms.partsOfRel(e.rel))
        .map(_.raw.head.get.toLong).distinct.sorted
      assert(hours == Seq(475056L, 475057L, 475058L, 475059L),
        s"4 distinct UTC hours of 2024-03-12 expected, got $hours")
      // old files still parse as generation 0 day values
      val gen0 = snap.entries.filterNot(_.rel.contains("/spec-1/"))
      assert(gen0.flatMap(e => PartitionTransforms.partOfRel(e.rel))
        .distinct.sorted == Seq(19792L, 19793L))
      // mixed-generation pruning: an hour slice inside day 12 plans ONLY
      // that hour's gen-1 files (gen-0 days are disjoint -> all pruned)
      val oneHour = spark.table(s"txpe.`$t`")
        .filter($"ts" >= "2024-03-12 01:00:00" &&
          $"ts" < "2024-03-12 02:00:00")
      val hourFiles = gen1.count(e =>
        PartitionTransforms.partsOfRel(e.rel)
          .exists(_.raw.head.get.toLong == 475057L))
      assert(scannedFiles(oneHour) == hourFiles && hourFiles >= 1,
        s"expected the hour's $hourFiles files, " +
          s"scanned ${scannedFiles(oneHour)} of ${snap.entries.size}")
      assert(oneHour.count() == 1)
      // ... and a day-10 slice plans only gen-0 day-10 files (every
      // gen-1 hour of day 12 is disjoint)
      val day10 = spark.table(s"txpe.`$t`")
        .filter($"ts" < "2024-03-11 00:00:00")
      assert(scannedFiles(day10) == gen0.count(e =>
        PartitionTransforms.partOfRel(e.rel).contains(19792L)))
      assert(day10.count() == 10)
      // full scan answers stay exact across generations
      assert(spark.table(s"txpe.`$t`").count() == 24)
    }
  }

  test("drop_partition across mixed generations: containment drops, straddling refuses, compact_partition migrates the slice to the head spec") {
    registered {
      val t = Files.createTempDirectory("graft_pe2_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpe.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      twoDays.writeTo(s"txpe.`$t`").append() // gen 0: days 19792, 19793
      spark.sql(s"ALTER TABLE txpe.`$t` SET TBLPROPERTIES " +
        s"('${PartitionTransforms.Prop}'='hours(ts)')")
      (0 until 2).map(i => (200L + i, ts(s"2024-03-12 0$i:00:00"), "x"))
        .toDF("id", "ts", "kind").writeTo(s"txpe.`$t`").append()
      // dropping an HOUR inside gen-0's day 10 must refuse: the day file
      // straddles the hour slice (rows outside the hour share the file)
      val h10 = 19792L * 24 // first hour of day 19792
      val e = intercept[Exception] {
        spark.sql(s"CALL txpe.drop_partition('$t', $h10)")
      }
      assert(e.getMessage.contains("straddle") ||
        e.getMessage.contains("cannot decide"), e.getMessage)
      // dropping an hour fully inside gen-1 works: gen-0 days are
      // disjoint, gen-1 hour files are exact
      val h12 = 475056L // 2024-03-12 00:00
      val n = spark.sql(s"CALL txpe.drop_partition('$t', $h12)")
        .as[Int].head()
      assert(n >= 1)
      assert(spark.table(s"txpe.`$t`").count() == 21)
      // compact_partition MIGRATES gen-0 files intersecting the slice:
      // after it, day 19792's rows live in spec-1/part-<hour> files
      val moved = spark.sql(s"CALL txpe.compact_partition('$t', " +
        s"${19792L * 24 + 5})").as[Int].head()
      assert(moved >= 1)
      val snap = TxTable.snapshot(spark, t)
      val day0Gen0 = snap.entries.filter(e2 =>
        PartitionTransforms.partOfRel(e2.rel).contains(19792L))
      assert(day0Gen0.isEmpty,
        s"migration must rewrite day-19792 gen-0 files: " +
          day0Gen0.map(_.rel))
      assert(spark.table(s"txpe.`$t`").count() == 21)
      // now the hour drop that refused before succeeds (all gen-1)
      val n2 = spark.sql(s"CALL txpe.drop_partition('$t', " +
        s"${19792L * 24})").as[Int].head()
      assert(n2 >= 1)
      assert(spark.table(s"txpe.`$t`")
        .filter($"ts" < "2024-03-10 01:00:00").count() == 0)
    }
  }

  test("coarsening evolution days -> months: a month drop takes the contained day files by metadata alone") {
    registered {
      val t = Files.createTempDirectory("graft_pe3_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpe.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      // gen 0: March days
      twoDays.writeTo(s"txpe.`$t`").append()
      spark.sql(s"ALTER TABLE txpe.`$t` SET TBLPROPERTIES " +
        s"('${PartitionTransforms.Prop}'='months(ts)')")
      // gen 1: April month files
      Seq((300L, ts("2024-04-05 10:00:00"), "a"),
        (301L, ts("2024-04-20 11:00:00"), "b"))
        .toDF("id", "ts", "kind").writeTo(s"txpe.`$t`").append()
      val before = TxTable.snapshot(spark, t)
      // March = month 650: every gen-0 day file is CONTAINED -> dropped
      // with zero reads even though no gen-1 March file exists
      val n = spark.sql(s"CALL txpe.drop_partition('$t', 650)")
        .as[Int].head()
      assert(n == before.entries.count(e =>
        PartitionTransforms.partOfRel(e.rel).isDefined))
      val after = TxTable.snapshot(spark, t)
      assert(after.entries.map(_.rel).toSet
        .subsetOf(before.entries.map(_.rel).toSet))
      assert(spark.table(s"txpe.`$t`").count() == 2)
      assert(spark.table(s"txpe.`$t`").agg(min($"ts")).head()
        .getTimestamp(0).toString.startsWith("2024-04"))
    }
  }

  test("a table born unpartitioned can evolve: new files partition and prune; drop_partition refuses while segment-free files remain") {
    registered {
      val t = Files.createTempDirectory("graft_pe4_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpe.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (bucket(2, id))""")
      twoDays.writeTo(s"txpe.`$t`").append() // segment-free gen 0
      spark.sql(s"ALTER TABLE txpe.`$t` SET TBLPROPERTIES " +
        s"('${PartitionTransforms.Prop}'='days(ts)')")
      val snap0 = TxTable.snapshot(spark, t)
      assert(PartitionTransforms.history(snap0.props).map(_.render) ==
        IndexedSeq("none", "days(ts)"))
      Seq((400L, ts("2024-03-15 08:00:00"), "z"))
        .toDF("id", "ts", "kind").writeTo(s"txpe.`$t`").append()
      val snap = TxTable.snapshot(spark, t)
      val gen1 = snap.entries.filter(_.rel.contains("/spec-1/"))
      assert(gen1.nonEmpty)
      // pre-partitioning files are never pruned (over-keep), the gen-1
      // file is: a day-10 slice plans all gen-0 files + zero gen-1
      val day10 = spark.table(s"txpe.`$t`")
        .filter($"ts" < "2024-03-11 00:00:00")
      assert(scannedFiles(day10) == snap.entries.size - gen1.size)
      assert(day10.count() == 10)
      // partition-addressed retention cannot decide segment-free files
      val e = intercept[Exception] {
        spark.sql(s"CALL txpe.drop_partition('$t', 19792)")
      }
      assert(e.getMessage.contains("cannot decide"), e.getMessage)
      assert(spark.table(s"txpe.`$t`").count() == 21)
    }
  }

  test("evolution to a MULTI-FIELD spec: new files nest part/part2, conjunction pruning applies to the new generation, old files keep single-dim envelopes") {
    registered {
      val t = Files.createTempDirectory("graft_pe6_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpe.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      twoDays.limit(10).writeTo(s"txpe.`$t`").append() // day 19792, sid 0
      spark.sql(s"ALTER TABLE txpe.`$t` SET TBLPROPERTIES " +
        s"('${PartitionTransforms.Prop}'='days(ts),identity(kind)')")
      (for (d <- 0 until 2; k <- Seq("x", "y"); i <- 0 until 2)
        yield (500L + d * 100 + i, ts(f"2024-03-${14 + d}%02d 0$i:00:00"), k))
        .toDF("id", "ts", "kind").writeTo(s"txpe.`$t`").append()
      val snap = TxTable.snapshot(spark, t)
      val hist = PartitionTransforms.history(snap.props)
      assert(hist.map(_.render) ==
        IndexedSeq("days(ts)", "days(ts),identity(kind)"))
      val gen1 = snap.entries.filter(_.rel.contains("/spec-1/"))
      assert(gen1.nonEmpty && gen1.forall(e =>
        PartitionTransforms.resolve(e.rel, hist)
          .exists(r => r.raw.length == 2 && r.raw.forall(_.isDefined))),
        gen1.map(_.rel))
      // (day, kind) conjunction opens exactly the gen-1 cell; the gen-0
      // day file is disjoint on ts and prunes on its single dimension
      val cell = spark.table(s"txpe.`$t`")
        .filter($"ts" >= "2024-03-15 00:00:00" && $"kind" === "x")
      val want = gen1.count(e =>
        PartitionTransforms.resolve(e.rel, hist).exists(r =>
          r.raw(0).get.toLong == 19797L &&
            PartitionTransforms.decodeIdStr(r.raw(1).get).contains("x")))
      assert(scannedFiles(cell) == want && want >= 1,
        s"expected the cell's $want files, scanned ${scannedFiles(cell)}")
      assert(cell.count() == 2)
      // answers stay exact across the mixed generations
      assert(spark.table(s"txpe.`$t`").count() == 18)
      // dropping the pre-evolution day takes only the gen-0 files
      // (containment over the shared field-0 column)
      val n = spark.sql(s"CALL txpe.drop_partition('$t', 19792)")
        .as[Int].head()
      assert(n >= 1)
      assert(spark.table(s"txpe.`$t`").count() == 8)
    }
  }

  test("#partitions over evolution and time travel: per-generation rows with spec_id; t@vN#partitions renders the pinned snapshot") {
    registered {
      val t = Files.createTempDirectory("graft_pe5_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpe.`$t`
        (id BIGINT, ts TIMESTAMP, kind STRING)
        PARTITIONED BY (days(ts), bucket(2, id))""")
      twoDays.writeTo(s"txpe.`$t`").append()
      val v1 = TxTable.snapshot(spark, t).version
      spark.sql(s"ALTER TABLE txpe.`$t` SET TBLPROPERTIES " +
        s"('${PartitionTransforms.Prop}'='hours(ts)')")
      Seq((500L, ts("2024-03-12 03:00:00"), "h"))
        .toDF("id", "ts", "kind").writeTo(s"txpe.`$t`").append()
      val parts = spark.table(s"txpe.`$t#partitions`")
        .select($"spec_id", $"spec", $"part", $"part_start")
        .as[(Option[Int], String, Option[Long], String)].collect()
      assert(parts.count(_._1.contains(0)) == 2, parts.mkString(", "))
      assert(parts.count(_._1.contains(1)) == 1)
      assert(parts.filter(_._1.contains(0)).forall(_._2 == "days(ts)"))
      assert(parts.filter(_._1.contains(1)).forall(_._2 == "hours(ts)"))
      assert(parts.exists(p => p._3.contains(475059L) &&
        p._4 == "2024-03-12T03:00:00Z"), parts.mkString(", "))
      // the pinned pre-evolution snapshot renders only generation 0
      val pinned = spark.table(s"txpe.`$t@v$v1#partitions`")
        .select($"spec_id", $"part")
        .as[(Option[Int], Option[Long])].collect()
      assert(pinned.length == 2 && pinned.forall(_._1.contains(0)))
      assert(pinned.flatMap(_._2).sorted.toSeq == Seq(19792L, 19793L))
      // a tagged snapshot resolves the same way
      TxTable.tag(spark, t, "evo-base", Some(v1))
      val tagged = spark.table(s"txpe.`$t@evo-base#partitions`")
      assert(tagged.count() == 2)
      // #files resolves the same pinned-snapshot refs
      val pinnedFiles = spark.table(s"txpe.`$t@v$v1#files`").count()
      assert(pinnedFiles ==
        TxTable.snapshot(spark, t, Some(v1)).entries.size)
      assert(spark.table(s"txpe.`$t#files`").count() >= pinnedFiles)
      // and a branch head renders ITS partitions
      TxTable.createBranch(spark, t, "side")
      TxTable.appendToBranch(spark, t, "side",
        Seq((600L, ts("2024-03-12 07:00:00"), "b"))
          .toDF("id", "ts", "kind"))
      val br = spark.table(s"txpe.`$t@branch.side#partitions`")
        .select($"part").as[Option[Long]].collect().flatten
      assert(br.contains(475063L), br.mkString(", "))
    }
  }
}
