package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PartitionTransforms, TxTable}

/** Partition-spec evolution composed with the rest of the table surface:
  * clones pin their fork-point spec history and diverge independently;
  * WAP stagings placed under the pre-evolution spec publish as valid
  * old-generation files; a running streaming sink's stale tagger keeps
  * landing valid old-generation placements (history is append-only, so a
  * sid is interpretable forever); the CDF spans the evolution property
  * commit silently. */
class EvolutionCrossFeatureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txev",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txev")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def freshDays(): String = {
    val t = Files.createTempDirectory("graft_ev_").toString + "/t"
    spark.sql(s"""CREATE TABLE txev.`$t`
      (id BIGINT, ts TIMESTAMP, kind STRING)
      PARTITIONED BY (days(ts), bucket(2, id))""")
    (0 until 10).map(i =>
      (i.toLong, ts(f"2024-03-${10 + i / 5}%02d 0${i % 5}:00:00"), s"e$i"))
      .toDF("id", "ts", "kind").writeTo(s"txev.`$t`").append()
    t
  }

  test("clone pins the fork-point spec; source and clone evolve independently and each reads/prunes its own generations") {
    registered {
      val t = freshDays()
      val c = Files.createTempDirectory("graft_evc_").toString + "/c"
      TxTable.cloneTable(spark, t, c)
      // source evolves to hours; clone keeps days
      spark.sql(s"ALTER TABLE txev.`$t` SET TBLPROPERTIES " +
        s"('${PartitionTransforms.Prop}'='hours(ts)')")
      Seq((100L, ts("2024-03-12 05:30:00"), "s"))
        .toDF("id", "ts", "kind").writeTo(s"txev.`$t`").append()
      Seq((200L, ts("2024-03-12 06:30:00"), "c"))
        .toDF("id", "ts", "kind").writeTo(s"txev.`$c`").append()
      val srcHist = PartitionTransforms
        .history(TxTable.snapshot(spark, t).props).map(_.render)
      val clnHist = PartitionTransforms
        .history(TxTable.snapshot(spark, c).props).map(_.render)
      assert(srcHist == IndexedSeq("days(ts)", "hours(ts)"))
      assert(clnHist == IndexedSeq("days(ts)"), clnHist)
      // the clone's new write is a DAY file (sid 0), the source's an
      // HOUR file under spec-1
      assert(TxTable.snapshot(spark, c).entries.exists(e =>
        PartitionTransforms.partOfRel(e.rel).contains(19794L)))
      assert(TxTable.snapshot(spark, t).entries.exists(
        _.rel.contains("/spec-1/")))
      // the clone still reads the fork-point files it SHARES with the
      // source, plus its own divergence; the source likewise
      assert(spark.table(s"txev.`$c`").count() == 11)
      assert(spark.table(s"txev.`$t`").count() == 11)
      // and the clone can evolve its OWN way without touching the source
      spark.sql(s"ALTER TABLE txev.`$c` SET TBLPROPERTIES " +
        s"('${PartitionTransforms.Prop}'='months(ts)')")
      Seq((201L, ts("2024-04-02 00:00:00"), "m"))
        .toDF("id", "ts", "kind").writeTo(s"txev.`$c`").append()
      assert(PartitionTransforms
        .history(TxTable.snapshot(spark, c).props).map(_.render) ==
        IndexedSeq("days(ts)", "months(ts)"))
      assert(PartitionTransforms
        .history(TxTable.snapshot(spark, t).props).map(_.render) ==
        srcHist)
      assert(spark.table(s"txev.`$c`").count() == 12)
    }
  }

  test("a WAP staging placed pre-evolution publishes as a valid old-generation file; drop_partition refusals stay exact across it") {
    registered {
      val t = freshDays()
      spark.conf.set("spark.graft.wap.id", "ev1")
      try {
        spark.sql(s"INSERT INTO txev.`$t` VALUES " +
          "(300, TIMESTAMP '2024-03-20 12:00:00', 'w')")
      } finally spark.conf.unset("spark.graft.wap.id")
      spark.sql(s"ALTER TABLE txev.`$t` SET TBLPROPERTIES " +
        s"('${PartitionTransforms.Prop}'='hours(ts)')")
      TxTable.publishStaged(spark, t, "ev1")
      val snap = TxTable.snapshot(spark, t)
      val hist = PartitionTransforms.history(snap.props)
      // the published file was PLACED under days (sid 0) — it stays a
      // day file and resolves under ITS generation
      val wapFile = snap.entries.filter(e =>
        PartitionTransforms.partOfRel(e.rel).contains(19802L))
      assert(wapFile.nonEmpty, snap.entries.map(_.rel))
      assert(PartitionTransforms.resolve(wapFile.head.rel, hist)
        .exists(_.sid == 0))
      assert(spark.table(s"txev.`$t`").count() == 11)
      // dropping an HOUR inside that day refuses (the day file straddles)
      val e = intercept[Exception] {
        spark.sql(s"CALL txev.drop_partition('$t', ${19802L * 24 + 12})")
      }
      assert(e.getMessage.contains("straddle") ||
        e.getMessage.contains("cannot decide"))
      // dropping the whole day via the boundary DELETE stays metadata-
      // only: the sid-0 envelope proves Full under the hours head too
      val before = TxTable.snapshot(spark, t)
      spark.sql(s"DELETE FROM txev.`$t` " +
        "WHERE ts >= TIMESTAMP '2024-03-20 00:00:00' " +
        "AND ts < TIMESTAMP '2024-03-21 00:00:00'")
      val after = TxTable.snapshot(spark, t)
      assert(after.entries.map(_.rel).toSet
        .subsetOf(before.entries.map(_.rel).toSet) &&
        after.entries.forall(_.dv.isEmpty),
        "day-boundary retention must stay metadata-only across specs")
      assert(spark.table(s"txev.`$t`").count() == 10)
    }
  }

  test("a running streaming sink keeps landing valid placements across an evolution; the CDF spans the property commit silently") {
    registered {
      val t = freshDays()
      val v0 = TxTable.snapshot(spark, t).version
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      val in = MemoryStream[(Long, java.sql.Timestamp, String)]
      val q = in.toDF().toDF("id", "ts", "kind")
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft_ev_ck_").toString)
        .toTable(s"txev.`$t`")
      try {
        in.addData((400L, ts("2024-03-15 08:00:00"), "s1"))
        q.processAllAvailable()
        spark.sql(s"ALTER TABLE txev.`$t` SET TBLPROPERTIES " +
          s"('${PartitionTransforms.Prop}'='hours(ts)')")
        in.addData((401L, ts("2024-03-15 09:00:00"), "s2"))
        q.processAllAvailable()
      } finally q.stop()
      val snap = TxTable.snapshot(spark, t)
      val hist = PartitionTransforms.history(snap.props)
      // every streamed file resolves under SOME generation (the sink's
      // tagger may be the pre-evolution one — a sid is valid forever)
      assert(snap.entries.forall(e =>
        PartitionTransforms.resolve(e.rel, hist).isDefined),
        snap.entries.map(_.rel))
      assert(spark.table(s"txev.`$t`").count() == 12)
      // day filter stays exact across the mixed generations
      assert(spark.table(s"txev.`$t`")
        .filter($"ts" >= "2024-03-15 00:00:00" &&
          $"ts" < "2024-03-16 00:00:00").count() == 2)
      // the CDF spans the evolution property commit silently: exactly
      // the 2 streamed inserts, nothing for the ALTER
      val feed = TxTable.changesBetween(spark, t, v0, snap.version)
      assert(feed.filter($"_change_type" === "insert").count() == 2)
      assert(feed.count() == 2)
    }
  }
}
