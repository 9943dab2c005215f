package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PartitionTransforms, TxTable}

/** Multi-field hidden partitioning: `PARTITIONED BY (days(ts),
  * identity(region), bucket(n, key))` nests a categorical dimension under
  * the time dimension (`part-<day>/part2-<region>/bucket-<b>/`), so a
  * (day, region) slice opens exactly that cell's files — conjunctive
  * pruning across both dimensions with zero sidecar I/O. Identity string
  * values ride the path base64url-coded; the Column-side codec and the
  * executor-side JVM codec must agree byte-for-byte or the same value
  * would split across two segments. */
class PartitionMultiFieldSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txpm",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txpm")
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

  /** 24 rows: 2 UTC days x 3 regions x 4 rows. */
  private def grid = (for {
    d <- 0 until 2; r <- Seq("EU", "US", "APAC"); i <- 0 until 4
  } yield (d * 100L + i, ts(f"2024-03-${10 + d}%02d 0$i:00:00"), r))
    .toDF("id", "ts", "region")

  test("identity-string path codec: the Column expression and the JVM mirror agree byte-for-byte on hostile values; decode round-trips") {
    val hostile = Seq("", "null", "EU", "a/b", "a=b", "a b", "%2F",
      "héllo☃", "..", "__HIVE_DEFAULT_PARTITION__", "part-5",
      "x" * 200, "line1\nline2", "trailing.")
    val fromCol = hostile.toDF("s")
      .select(PartitionTransforms.idStrCol(col("s")).as("e"))
      .collect().map(_.getString(0)).toSeq
    val fromJvm = hostile.map(PartitionTransforms.encodeIdStr)
    assert(fromCol == fromJvm,
      fromCol.zip(fromJvm).filter(p => p._1 != p._2).mkString(", "))
    hostile.foreach { s =>
      assert(PartitionTransforms.decodeIdStr(
        PartitionTransforms.encodeIdStr(s)).contains(s), s)
      val enc = PartitionTransforms.encodeIdStr(s)
      assert(enc != "null" && !enc.contains('/') && !enc.contains('=') &&
        !enc.contains('%'), s"'$s' -> '$enc' is not path-safe")
    }
  }

  test("days(ts)+identity(region): files nest part-<day>/part2-<region>; a (day, region) slice opens exactly that cell; answers exact") {
    registered {
      val t = Files.createTempDirectory("graft_pm1_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpm.`$t`
        (id BIGINT, ts TIMESTAMP, region STRING)
        PARTITIONED BY (days(ts), identity(region), bucket(2, id))""")
      grid.writeTo(s"txpm.`$t`").append()
      val snap = TxTable.snapshot(spark, t)
      // every file parses (day, region) under the declared spec
      val hist = PartitionTransforms.history(snap.props)
      assert(hist.map(_.render) == IndexedSeq("days(ts),identity(region)"))
      val cells = snap.entries.flatMap(e =>
        PartitionTransforms.resolve(e.rel, hist)).map(r =>
        (r.raw(0).get.toLong,
          PartitionTransforms.decodeIdStr(r.raw(1).get).get))
      assert(cells.toSet ==
        (for (d <- Seq(19792L, 19793L); r <- Seq("EU", "US", "APAC"))
          yield (d, r)).toSet, cells.distinct.sorted.mkString(", "))
      // conjunction pruning: one (day, region) cell
      val cell = spark.table(s"txpm.`$t`")
        .filter($"ts" >= "2024-03-11 00:00:00" && $"region" === "EU")
      val cellFiles = snap.entries.count(e =>
        PartitionTransforms.resolve(e.rel, hist).exists(r =>
          r.raw(0).get.toLong == 19793L &&
            PartitionTransforms.decodeIdStr(r.raw(1).get).contains("EU")))
      assert(scannedFiles(cell) == cellFiles && cellFiles >= 1,
        s"expected the cell's $cellFiles files, " +
          s"scanned ${scannedFiles(cell)} of ${snap.entries.size}")
      assert(cell.count() == 4)
      // region-only pruning (field 1 alone): a third of the files
      val eu = spark.table(s"txpm.`$t`").filter($"region" === "EU")
      assert(scannedFiles(eu) == snap.entries.count(e =>
        PartitionTransforms.resolve(e.rel, hist).exists(r =>
          PartitionTransforms.decodeIdStr(r.raw(1).get).contains("EU"))))
      assert(eu.count() == 8)
      // IN-list pruning over the identity dimension
      val two = spark.table(s"txpm.`$t`")
        .filter($"region".isin("EU", "US"))
      assert(scannedFiles(two) == snap.entries.count(e =>
        PartitionTransforms.resolve(e.rel, hist).exists(r =>
          Seq("EU", "US").exists(v => PartitionTransforms
            .decodeIdStr(r.raw(1).get).contains(v)))))
      assert(two.count() == 16)
    }
  }

  test("identity-value DELETE is metadata-only; t#partitions renders both dimensions; NULL region lands part2-null and survives") {
    registered {
      val t = Files.createTempDirectory("graft_pm2_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpm.`$t`
        (id BIGINT, ts TIMESTAMP, region STRING)
        PARTITIONED BY (days(ts), identity(region), bucket(2, id))""")
      grid.writeTo(s"txpm.`$t`").append()
      val before = TxTable.snapshot(spark, t)
      // `region = 'APAC'` fully covers its cells' files from the
      // identity envelope alone: one manifest commit, nothing staged,
      // no deletion vectors
      spark.sql(s"DELETE FROM txpm.`$t` WHERE region = 'APAC'")
      val after = TxTable.snapshot(spark, t)
      val beforeRels = before.entries.map(_.rel).toSet
      assert(after.entries.forall(e => beforeRels(e.rel)),
        "identity-value delete must stage NOTHING new")
      assert(after.entries.forall(_.dv.isEmpty))
      assert(spark.table(s"txpm.`$t`").count() == 16)
      assert(spark.table(s"txpm.`$t`")
        .filter($"region" === "APAC").count() == 0)
      // #partitions: one row per live (day, region) cell, both rendered
      val parts = spark.table(s"txpm.`$t#partitions`")
        .select($"part", $"part_start", $"part2", $"files")
        .as[(Option[Long], String, String, Int)].collect()
      assert(parts.length == 4, parts.mkString(", "))
      assert(parts.map(p => (p._1.get, p._3)).toSet ==
        (for (d <- Seq(19792L, 19793L); r <- Seq("EU", "US"))
          yield (d, r)).toSet, parts.mkString(", "))
      assert(parts.forall(_._2.startsWith("2024-03-1")))
      // NULL region rows land part2-null, are never identity-dropped,
      // and IS NULL resolves them
      Seq((900L, ts("2024-03-10 05:00:00"),
        null.asInstanceOf[String])).toDF("id", "ts", "region")
        .writeTo(s"txpm.`$t`").append()
      val snap2 = TxTable.snapshot(spark, t)
      assert(snap2.entries.exists(_.rel.contains("/part2-null/")),
        snap2.entries.map(_.rel).mkString(", "))
      spark.sql(s"DELETE FROM txpm.`$t` WHERE region = 'EU'")
      assert(spark.table(s"txpm.`$t`").count() == 9)
      assert(spark.table(s"txpm.`$t`")
        .where($"region".isNull).count() == 1)
    }
  }

  test("identity over INT partitions by raw value; both write surfaces (DSv2 INSERT + Scala appendOnce) place identical segments") {
    registered {
      val t = Files.createTempDirectory("graft_pm3_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpm.`$t`
        (id BIGINT, shard INT, v STRING)
        PARTITIONED BY (identity(shard), bucket(2, id))""")
      val rows = (0 until 12).map(i => (i.toLong, i % 3, s"v$i"))
      rows.take(6).toDF("id", "shard", "v")
        .writeTo(s"txpm.`$t`").append()
      TxTable.appendOnce(spark, t,
        rows.drop(6).toDF("id", "shard", "v"), "id", 2,
        appId = "pm3", batchId = 1L)
      val snap = TxTable.snapshot(spark, t)
      val hist = PartitionTransforms.history(snap.props)
      val segs = snap.entries.flatMap(e =>
        PartitionTransforms.resolve(e.rel, hist)).map(_.raw(0).get)
      assert(segs.toSet == Set("0", "1", "2"), segs.distinct)
      val one = spark.table(s"txpm.`$t`").filter($"shard" === 1)
      assert(scannedFiles(one) == snap.entries.count(e =>
        PartitionTransforms.resolve(e.rel, hist)
          .exists(_.raw(0).contains("1"))))
      assert(one.count() == 4)
      // dropPartition addresses an integer identity value directly
      val n = spark.sql(s"CALL txpm.drop_partition('$t', 2)")
        .as[Int].head()
      assert(n >= 1)
      assert(spark.table(s"txpm.`$t`").count() == 8)
      assert(spark.table(s"txpm.`$t`").where($"shard" === 2).count() == 0)
    }
  }

  test("compact_partition on a multi-field table rewrites one day slice across its regions; other days untouched") {
    registered {
      val t = Files.createTempDirectory("graft_pm4_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpm.`$t`
        (id BIGINT, ts TIMESTAMP, region STRING)
        PARTITIONED BY (days(ts), identity(region), bucket(2, id))""")
      grid.writeTo(s"txpm.`$t`").append()
      grid.withColumn("id", $"id" + 1000).writeTo(s"txpm.`$t`").append()
      val before = TxTable.snapshot(spark, t)
      val hist = PartitionTransforms.history(before.props)
      def dayFiles(s: TxTable.Snapshot, d: Long) = s.entries.filter(e =>
        PartitionTransforms.resolve(e.rel, hist)
          .exists(_.raw(0).get.toLong == d))
      val d1Before = dayFiles(before, 19793L).map(_.rel).toSet
      assert(dayFiles(before, 19792L).size > 3)
      val nB = spark.sql(s"CALL txpm.compact_partition('$t', 19792)")
        .as[Int].head()
      assert(nB >= 1)
      val after = TxTable.snapshot(spark, t)
      assert(dayFiles(after, 19792L).size < dayFiles(before, 19792L).size)
      // rewritten files re-split by BOTH fields (regions stay prunable)
      assert(dayFiles(after, 19792L).forall(e =>
        PartitionTransforms.resolve(e.rel, hist)
          .exists(_.raw(1).isDefined)))
      assert(dayFiles(after, 19793L).map(_.rel).toSet == d1Before,
        "the other day's files must be untouched")
      assert(spark.table(s"txpm.`$t`").count() == 48)
    }
  }

  test("DDL guards: duplicate source columns, >3 fields, identity over unsupported types refuse; DESCRIBE reports the full layout") {
    registered {
      val base = Files.createTempDirectory("graft_pm5_").toString
      val e1 = intercept[Exception] {
        spark.sql(s"""CREATE TABLE txpm.`$base/a` (id BIGINT, ts TIMESTAMP)
          PARTITIONED BY (days(ts), months(ts), bucket(2, id))""")
      }
      assert(e1.getMessage.contains("one envelope per column"),
        e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(s"""CREATE TABLE txpm.`$base/b`
          (id BIGINT, ts TIMESTAMP, a STRING, b STRING, c STRING, d STRING)
          PARTITIONED BY (days(ts), identity(a), identity(b),
            identity(c), bucket(2, id))""")
      }
      assert(e2.getMessage.contains("at most 3"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql(s"""CREATE TABLE txpm.`$base/c` (id BIGINT, x DOUBLE)
          PARTITIONED BY (identity(x), bucket(2, id))""")
      }
      assert(e3.getMessage.contains("identity needs STRING"),
        e3.getMessage)
      val t = s"$base/t"
      spark.sql(s"""CREATE TABLE txpm.`$t`
        (id BIGINT, ts TIMESTAMP, region STRING)
        PARTITIONED BY (days(ts), identity(region), bucket(2, id))""")
      val desc = spark.sql(s"DESCRIBE TABLE EXTENDED txpm.`$t`")
        .collect().map(_.toString).mkString("\n")
      assert(desc.contains("days(ts)") && desc.contains("region"), desc)
    }
  }

  test("Long-addressed partition maintenance refuses an identity-STRING head field loudly instead of matching nothing") {
    registered {
      val t = Files.createTempDirectory("graft_pm6_").toString + "/t"
      spark.sql(s"""CREATE TABLE txpm.`$t`
        (id BIGINT, region STRING, v STRING)
        PARTITIONED BY (identity(region), bucket(2, id))""")
      (0 until 12).map(i => (i.toLong, Seq("EU", "US")(i % 2), s"v$i"))
        .toDF("id", "region", "v").writeTo(s"txpm.`$t`").append()
      // pre-fix this silently returned 0 (no string partition ever
      // yields a long envelope) — "never a silent wrong answer"
      val e1 = intercept[Exception] {
        TxTable.dropPartition(spark, t, 0L)
      }
      assert(e1.getMessage.contains("identity over a STRING") &&
        e1.getMessage.contains("DELETE WHERE"), e1.getMessage)
      val e2 = intercept[Exception] {
        TxTable.compactPartition(spark, t, 0L)
      }
      assert(e2.getMessage.contains("identity over a STRING"),
        e2.getMessage)
      assert(spark.table(s"txpm.`$t`").count() == 12)
    }
  }

  test("validate refuses partition source columns whose name carries a spec-history delimiter") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a,b",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("c|d",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("e)f",
        org.apache.spark.sql.types.StringType)))
    Seq("a,b", "c|d", "e)f").foreach { c =>
      val e = intercept[IllegalArgumentException] {
        PartitionTransforms.validate(PartitionTransforms.Spec(
          IndexedSeq(PartitionTransforms.Field("identity", c))), schema)
      }
      assert(e.getMessage.contains("delimiter"), s"$c: ${e.getMessage}")
    }
  }
}
