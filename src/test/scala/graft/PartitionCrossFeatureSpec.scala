package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PartitionTransforms, TxTable}

/** Hidden partitioning × the older metadata layers: the transform is
  * part of the table's layout identity, so EVERY write surface — branch
  * deltas, WAP stagings, streaming epochs, REPLACE WHERE remainders —
  * must place files under the same `part-<v>/` segments, and every
  * reader of those surfaces must keep partition pruning. */
class PartitionCrossFeatureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txpx",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txpx")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def freshPartitioned(buckets: Int = 2): String = {
    val t = Files.createTempDirectory("graft_px_").toString + "/t"
    spark.sql(s"""CREATE TABLE txpx.`$t`
      (id BIGINT, ts TIMESTAMP, kind STRING)
      PARTITIONED BY (days(ts), bucket($buckets, id))""")
    (0 until 20).map(i => (i.toLong,
      ts(f"2024-03-${10 + i / 10}%02d 01:00:00"), s"e$i"))
      .toDF("id", "ts", "kind").writeTo(s"txpx.`$t`").append()
    t
  }

  test("branch appends split by the transform; publish lands prunable files on main") {
    registered {
      val t = freshPartitioned()
      TxTable.createBranch(spark, t, "dev")
      TxTable.appendToBranch(spark, t, "dev",
        Seq((100L, ts("2024-03-20 05:00:00"), "b1"),
          (101L, ts("2024-03-21 05:00:00"), "b2"))
          .toDF("id", "ts", "kind"))
      val head = TxTable.branchSnapshot(spark, t, "dev")
      val branchNew = head.entries.filter(e =>
        PartitionTransforms.partOfRel(e.rel).exists(_ >= 19802L))
      assert(branchNew.nonEmpty && branchNew.forall(e =>
        PartitionTransforms.partOfRel(e.rel).isDefined),
        s"branch deltas must carry part segments: " +
          head.entries.takeRight(2).map(_.rel))
      TxTable.publishBranch(spark, t, "dev")
      // post-publish: a day filter on main prunes to exactly that day
      val one = spark.table(s"txpx.`$t`")
        .filter($"ts" >= "2024-03-21 00:00:00")
      assert(one.count() == 1)
      val planned = one.queryExecution.executedPlan.collectLeaves().map {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.length
        case _ => 0
      }.sum
      val want = TxTable.snapshot(spark, t).entries.count(e =>
        PartitionTransforms.partOfRel(e.rel).exists(_ >= 19803L))
      assert(planned == want, s"planned $planned, want $want")
    }
  }

  test("WAP stagings split by the transform; the audit view and the published head both prune") {
    registered {
      val t = freshPartitioned()
      spark.conf.set("spark.graft.wap.id", "px1")
      try {
        spark.sql(s"INSERT INTO txpx.`$t` VALUES " +
          "(200, TIMESTAMP '2024-03-25 00:00:00', 'w1')")
      } finally spark.conf.unset("spark.graft.wap.id")
      // staged rows invisible on main, visible (and prunable) in audit
      assert(spark.table(s"txpx.`$t`").count() == 20)
      val audit = spark.table(s"txpx.`$t@wap.px1`")
        .filter($"ts" >= "2024-03-25 00:00:00")
      assert(audit.count() == 1)
      TxTable.publishStaged(spark, t, "px1")
      val now = TxTable.snapshot(spark, t)
      val staged = now.entries.filter(e =>
        PartitionTransforms.partOfRel(e.rel).contains(19807L))
      assert(staged.nonEmpty,
        s"published WAP rows must sit in their day's partition: " +
          now.entries.takeRight(2).map(_.rel))
    }
  }

  test("streaming epochs split by the transform; the per-day layout feeds compact_partition") {
    registered {
      val t = freshPartitioned()
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, java.sql.Timestamp, String)]
      val q = in.toDF().toDF("id", "ts", "kind")
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft_px_ck_").toString)
        .toTable(s"txpx.`$t`")
      try {
        in.addData((300L, ts("2024-03-10 09:00:00"), "s1"),
          (301L, ts("2024-03-11 09:00:00"), "s2"))
        q.processAllAvailable()
        in.addData((302L, ts("2024-03-10 10:00:00"), "s3"))
        q.processAllAvailable()
      } finally q.stop()
      val snap = TxTable.snapshot(spark, t)
      assert(snap.entries.forall(e =>
        PartitionTransforms.partOfRel(e.rel).isDefined),
        s"epoch files must carry part segments: " +
          snap.entries.takeRight(2).map(_.rel))
      // two epochs fragmented day 19792 -> one partition-aligned slice
      // coalesces it without touching day 19793
      val d1Before = snap.entries.filter(e =>
        PartitionTransforms.partOfRel(e.rel).contains(19793L))
        .map(_.rel).toSet
      TxTable.compactPartition(spark, t, 19792L)
      val after = TxTable.snapshot(spark, t)
      assert(after.entries.filter(e =>
        PartitionTransforms.partOfRel(e.rel).contains(19793L))
        .map(_.rel).toSet == d1Before)
      assert(spark.table(s"txpx.`$t`").count() == 23)
    }
  }

  test("REPLACE WHERE on a day boundary drops the day's files unread and stages only the replacement") {
    registered {
      val t = freshPartitioned()
      val before = TxTable.snapshot(spark, t)
      val repl = Seq((500L, ts("2024-03-10 12:00:00"), "R"))
        .toDF("id", "ts", "kind")
      repl.writeTo(s"txpx.`$t`").overwrite(
        $"ts" >= "2024-03-10 00:00:00" && $"ts" < "2024-03-11 00:00:00")
      val after = TxTable.snapshot(spark, t)
      val beforeRels = before.entries.map(_.rel).toSet
      // old day-10 files dropped by METADATA (their envelopes prove Full
      // coverage); days 11..13 untouched; only the replacement staged
      val survivors = after.entries.filter(e => beforeRels(e.rel))
      assert(survivors.forall(e =>
        PartitionTransforms.partOfRel(e.rel).exists(_ >= 19793L)))
      val fresh = after.entries.filterNot(e => beforeRels(e.rel))
      assert(fresh.nonEmpty && fresh.forall(e =>
        PartitionTransforms.partOfRel(e.rel).contains(19792L)))
      assert(spark.table(s"txpx.`$t`").count() == 11)
      assert(spark.table(s"txpx.`$t`")
        .filter($"kind" === "R").count() == 1)
    }
  }

  test("type widening and rename on NON-layout columns compose with the transform; the source column itself refuses widening via rename safety") {
    registered {
      val t = freshPartitioned()
      // widen id (the bucket key refuses; use a new column)
      spark.sql(s"ALTER TABLE txpx.`$t` ADD COLUMN cnt INT")
      spark.sql(s"INSERT INTO txpx.`$t` VALUES " +
        "(700, TIMESTAMP '2024-03-13 01:00:00', 'x', 7)")
      spark.sql(s"ALTER TABLE txpx.`$t` ALTER COLUMN cnt TYPE BIGINT")
      // renaming the partition SOURCE column is allowed (identity is
      // physical) and pruning keeps working under the new logical name
      spark.sql(s"ALTER TABLE txpx.`$t` RENAME COLUMN ts TO event_ts")
      val one = spark.table(s"txpx.`$t`")
        .filter($"event_ts" >= "2024-03-13 00:00:00")
      assert(one.count() == 1)
      val planned = one.queryExecution.executedPlan.collectLeaves().map {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.map {
            case f: org.apache.spark.sql.execution.datasources.FilePartition =>
              f.files.length
            case _ => 0
          }.sum
        case _ => 0
      }.sum
      val want = TxTable.snapshot(spark, t).entries.count(e =>
        PartitionTransforms.partOfRel(e.rel).exists(_ >= 19795L))
      assert(planned == want,
        s"pruning must survive the rename: planned $planned, want $want")
      // and new writes under the new name still split by day
      spark.sql(s"INSERT INTO txpx.`$t` VALUES " +
        "(701, TIMESTAMP '2024-03-30 01:00:00', 'y', 8)")
      assert(TxTable.snapshot(spark, t).entries.exists(e =>
        PartitionTransforms.partOfRel(e.rel).contains(19812L)))
    }
  }
}
