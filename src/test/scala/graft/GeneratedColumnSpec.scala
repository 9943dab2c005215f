package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PartitionTransforms, TxTable}

/** GENERATED ALWAYS AS columns (the Delta design on Spark's own DDL
  * plumbing): the generation expression rides the column's metadata from
  * CREATE, every writer surface computes it (SQL INSERT, Scala
  * appendOnce, MERGE inserts + updates, streaming epochs), a non-null
  * provided value must equal the computed value or the write refuses,
  * and reads serve it as a normal stored column — including as the
  * SOURCE of a hidden partition transform. */
class GeneratedColumnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txgc",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txgc")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

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

  test("predicate derivation: a filter on the RAW source column prunes by the generated column's zone maps (year over TIMESTAMP, widened one unit for tz-safety)") {
    registered {
      val t = Files.createTempDirectory("graft_gcd1_").toString + "/t"
      spark.sql(s"""CREATE TABLE txgc.`$t` (
        id BIGINT, ts TIMESTAMP,
        y INT GENERATED ALWAYS AS (year(ts)))
        PARTITIONED BY (bucket(2, id))""")
      // one append per year 2019..2024 -> per-file y is a single year
      (2019 to 2024).foreach { yr =>
        (0 until 6).map(i => (yr * 100L + i, ts(s"$yr-0${i + 1}-15 12:00:00")))
          .toDF("id", "ts").writeTo(s"txgc.`$t`").append()
      }
      // zone maps on the GENERATED column only — the source column is
      // deliberately un-ANALYZEd so pruning can only come via derivation
      TxTable.computeStats(spark, t, "y")
      val snap = TxTable.snapshot(spark, t)
      val all = spark.table(s"txgc.`$t`")
      assert(scannedFiles(all) == snap.entries.size)
      // ts >= 2023-06-01 implies y >= 2022 (year(v) − 1: the widening
      // absorbs any writer/reader session-zone disagreement)
      val filtered = spark.table(s"txgc.`$t`")
        .filter($"ts" >= "2023-06-01 00:00:00")
      val stats = TxTable.fileStats(spark, t, "y")
      val expect = snap.entries.count(e => stats.get(e.rel)
        .forall { case (_, hi) => hi == null ||
          hi.asInstanceOf[Int] >= 2022 })
      assert(expect < snap.entries.size,
        "fixture must actually have prunable years")
      assert(scannedFiles(filtered) == expect,
        s"expected $expect files (years >= 2022), " +
          s"scanned ${scannedFiles(filtered)} of ${snap.entries.size}")
      assert(filtered.count() == 7) // 2024's six rows + 2023's June row
    }
  }

  test("predicate derivation: DATE-sourced generation is exact; identity partitions over the generated column prune from the source filter alone") {
    registered {
      val t = Files.createTempDirectory("graft_gcd2_").toString + "/t"
      spark.sql(s"""CREATE TABLE txgc.`$t` (
        id BIGINT, d DATE,
        y INT GENERATED ALWAYS AS (year(d)))
        PARTITIONED BY (identity(y), bucket(2, id))""")
      (2021 to 2024).foreach { yr =>
        (0 until 4).map(i =>
          (yr * 100L + i, java.sql.Date.valueOf(s"$yr-0${i + 2}-10")))
          .toDF("id", "d").writeTo(s"txgc.`$t`").append()
      }
      val snap = TxTable.snapshot(spark, t)
      val hist = PartitionTransforms.history(snap.props)
      // files landed under part-<year>/ computed from the generated col
      val years = snap.entries.flatMap(e =>
        PartitionTransforms.resolve(e.rel, hist)).flatMap(_.raw.head)
      assert(years.map(_.toLong).distinct.sorted ==
        Seq(2021L, 2022L, 2023L, 2024L))
      // a filter ONLY on the raw DATE column prunes whole partitions:
      // DATE sources are timezone-free, so the derived bound is EXACT
      // (y >= 2023, no widening)
      val filtered = spark.table(s"txgc.`$t`")
        .filter($"d" >= "2023-01-05")
      val expect = snap.entries.count(e =>
        PartitionTransforms.resolve(e.rel, hist)
          .flatMap(_.raw.head).exists(_.toLong >= 2023L))
      assert(scannedFiles(filtered) == expect && expect < snap.entries.size,
        s"expected $expect files, scanned ${scannedFiles(filtered)}")
      assert(filtered.count() == 8)
      // non-monotone extractions must NOT derive: month(d) bounds would
      // be wrong — assert a month-generated table scans everything
      val m = Files.createTempDirectory("graft_gcd3_").toString + "/t"
      spark.sql(s"""CREATE TABLE txgc.`$m` (
        id BIGINT, d DATE, mo INT GENERATED ALWAYS AS (month(d)))
        PARTITIONED BY (bucket(2, id))""")
      Seq((1L, java.sql.Date.valueOf("2023-01-15")),
        (2L, java.sql.Date.valueOf("2024-06-15")))
        .toDF("id", "d").writeTo(s"txgc.`$m`").append()
      TxTable.computeStats(spark, m, "mo")
      val all2 = spark.table(s"txgc.`$m`").filter($"d" >= "2024-01-01")
      assert(all2.count() == 1) // correctness, not pruning
    }
  }

  private def freshGen(): String = {
    val t = Files.createTempDirectory("graft_gc_").toString + "/t"
    spark.sql(s"""CREATE TABLE txgc.`$t` (
      id BIGINT, ts TIMESTAMP,
      event_date DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
      PARTITIONED BY (bucket(4, id))""")
    t
  }

  test("SQL INSERT: omitted -> computed; matching explicit value ok; conflicting value refuses") {
    registered {
      val t = freshGen()
      // omitted via column list — the analyzer fills NULL, the writer
      // computes
      spark.sql(s"INSERT INTO txgc.`$t` (id, ts) " +
        "VALUES (1, TIMESTAMP '2024-03-10 08:30:00')")
      // explicit MATCHING value passes through
      spark.sql(s"INSERT INTO txgc.`$t` VALUES " +
        "(2, TIMESTAMP '2024-03-11 23:59:59', DATE '2024-03-11')")
      val got = spark.table(s"txgc.`$t`").orderBy($"id")
        .select($"id", $"event_date".cast("string")).as[(Long, String)]
        .collect().toSeq
      assert(got == Seq((1L, "2024-03-10"), (2L, "2024-03-11")))
      // conflicting explicit value fails the write LOUDLY
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO txgc.`$t` VALUES " +
          "(3, TIMESTAMP '2024-03-12 00:00:01', DATE '2024-03-11')")
      }
      assert(e.getMessage.contains("GENERATED") ||
        e.getCause != null &&
          e.getCause.getMessage.contains("GENERATED"),
        s"refusal must name the generated column: $e")
      assert(spark.table(s"txgc.`$t`").count() == 2,
        "nothing from the refused statement may land")
    }
  }

  test("Scala appendOnce computes and enforces the same semantics") {
    registered {
      val t = freshGen()
      // batch OMITTING the column — computed
      TxTable.appendOnce(spark, t,
        Seq((10L, ts("2024-03-15 01:00:00"))).toDF("id", "ts"),
        "id", 4, "gc-app", 1L)
      // NULL provided — computed
      TxTable.appendOnce(spark, t,
        Seq((11L, ts("2024-03-16 12:00:00"),
          Option.empty[java.sql.Date])).toDF("id", "ts", "event_date"),
        "id", 4, "gc-app", 2L)
      // conflicting provided — refused at write
      intercept[Exception] {
        TxTable.appendOnce(spark, t,
          Seq((12L, ts("2024-03-17 12:00:00"),
            Option(java.sql.Date.valueOf("2024-03-16"))))
            .toDF("id", "ts", "event_date"),
          "id", 4, "gc-app", 3L)
      }
      val got = spark.table(s"txgc.`$t`").orderBy($"id")
        .select($"event_date".cast("string")).as[String].collect().toSeq
      assert(got == Seq("2024-03-15", "2024-03-16"))
    }
  }

  test("MERGE: inserted rows compute; updating the source column recomputes the generated value") {
    registered {
      val t = freshGen()
      spark.sql(s"INSERT INTO txgc.`$t` (id, ts) " +
        "VALUES (1, TIMESTAMP '2024-03-10 08:30:00')")
      Seq((1L, ts("2024-06-01 10:00:00")), (2L, ts("2024-07-04 09:00:00")))
        .toDF("id", "ts").createOrReplaceTempView("gc_src")
      spark.sql(s"""MERGE INTO txgc.`$t` tgt USING gc_src src ON tgt.id = src.id
        WHEN MATCHED THEN UPDATE SET ts = src.ts
        WHEN NOT MATCHED THEN INSERT (id, ts) VALUES (src.id, src.ts)""")
      val got = spark.table(s"txgc.`$t`").orderBy($"id")
        .select($"id", $"event_date".cast("string")).as[(Long, String)]
        .collect().toSeq
      assert(got == Seq((1L, "2024-06-01"), (2L, "2024-07-04")),
        s"update must RECOMPUTE the generated value, got $got")
    }
  }

  test("streaming epochs compute generated columns through the DSv2 sink") {
    registered {
      val t = freshGen()
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, java.sql.Timestamp)]
      val q = in.toDF().toDF("id", "ts")
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft_gc_ck_").toString)
        .toTable(s"txgc.`$t`")
      try {
        in.addData((100L, ts("2024-05-05 05:05:05")))
        q.processAllAvailable()
      } finally q.stop()
      assert(spark.table(s"txgc.`$t`")
        .select($"event_date".cast("string")).as[String].head() ==
        "2024-05-05")
    }
  }

  test("a generated DATE column can be the hidden-partition source: placement uses the computed value") {
    registered {
      val t = Files.createTempDirectory("graft_gc_hp_").toString + "/t"
      spark.sql(s"""CREATE TABLE txgc.`$t` (
        id BIGINT, ts TIMESTAMP,
        event_date DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
        PARTITIONED BY (days(event_date), bucket(2, id))""")
      spark.sql(s"INSERT INTO txgc.`$t` (id, ts) VALUES " +
        "(1, TIMESTAMP '2024-03-10 06:00:00')," +
        "(2, TIMESTAMP '2024-03-11 18:00:00')")
      val snap = TxTable.snapshot(spark, t)
      assert(snap.entries.flatMap(e =>
        PartitionTransforms.partOfRel(e.rel)).distinct.sorted ==
        Seq(19792L, 19793L),
        s"placement must use the COMPUTED date: ${snap.entries.map(_.rel)}")
      // pruning on the generated column works like any stored column
      assert(spark.table(s"txgc.`$t`")
        .filter($"event_date" === "2024-03-11").count() == 1)
      // and a day-boundary retention delete on it is metadata-only
      val before = TxTable.snapshot(spark, t)
      spark.sql(s"DELETE FROM txgc.`$t` WHERE event_date < '2024-03-11'")
      val after = TxTable.snapshot(spark, t)
      val beforeRels = before.entries.map(_.rel).toSet
      assert(after.entries.forall(e => beforeRels(e.rel)) &&
        after.entries.forall(_.dv.isEmpty))
      assert(spark.table(s"txgc.`$t`").count() == 1)
    }
  }

  test("DDL guards: dropping/renaming/retyping the source refuses; dropping the generated column itself is allowed; time travel keeps old rows") {
    registered {
      val t = freshGen()
      spark.sql(s"INSERT INTO txgc.`$t` (id, ts) " +
        "VALUES (1, TIMESTAMP '2024-03-10 08:30:00')")
      val v1 = TxTable.snapshot(spark, t).version
      val e1 = intercept[Exception] {
        spark.sql(s"ALTER TABLE txgc.`$t` DROP COLUMN ts")
      }
      assert(e1.getMessage.contains("GENERATED"))
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE txgc.`$t` RENAME COLUMN ts TO tstamp")
      }
      assert(e2.getMessage.contains("GENERATED"))
      // widening a referenced column would drift what the expression
      // computes — refuse (id is NOT referenced, so widening id is fine)
      spark.sql(s"ALTER TABLE txgc.`$t` ALTER COLUMN id TYPE BIGINT")
      // the generated column itself can drop; inserts then stop
      // computing it and time travel still serves the old rows
      spark.sql(s"ALTER TABLE txgc.`$t` DROP COLUMN event_date")
      spark.sql(s"INSERT INTO txgc.`$t` (id, ts) " +
        "VALUES (2, TIMESTAMP '2024-03-11 09:00:00')")
      assert(!spark.table(s"txgc.`$t`").columns.contains("event_date"))
      assert(spark.table(s"txgc.`$t@v$v1`")
        .select($"event_date".cast("string")).as[String].head() ==
        "2024-03-10")
    }
  }

  test("predicate derivation survives RENAME of the generated column: bounds stay in the PHYSICAL name space") {
    registered {
      val t = Files.createTempDirectory("graft_gcd4_").toString + "/t"
      spark.sql(s"""CREATE TABLE txgc.`$t` (
        id BIGINT, ts TIMESTAMP,
        y INT GENERATED ALWAYS AS (year(ts)))
        PARTITIONED BY (bucket(2, id))""")
      (2020 to 2024).foreach { yr =>
        (0 until 4).map(i => (yr * 100L + i, ts(s"$yr-0${i + 1}-15 12:00:00")))
          .toDF("id", "ts").writeTo(s"txgc.`$t`").append()
      }
      TxTable.computeStats(spark, t, "y") // sidecar under PHYSICAL name
      // rename the GENERATED column (renaming the SOURCE refuses): the
      // zone-map sidecar, manifest schema, and prune() all stay keyed by
      // the physical name 'y' — a derivation emitting the new LOGICAL
      // name would go silently inert (or, in a rename swap, hit a
      // different column's zone maps and wrongly prune)
      spark.sql(s"ALTER TABLE txgc.`$t` RENAME COLUMN y TO yr_label")
      val snap = TxTable.snapshot(spark, t)
      val filtered = spark.table(s"txgc.`$t`")
        .filter($"ts" >= "2023-06-01 00:00:00")
      val stats = TxTable.fileStats(spark, t, "y")
      val expect = snap.entries.count(e => stats.get(e.rel)
        .forall { case (_, hi) => hi == null ||
          hi.asInstanceOf[Int] >= 2022 })
      assert(expect < snap.entries.size)
      assert(scannedFiles(filtered) == expect,
        s"post-rename derivation must still prune: expected $expect " +
          s"files, scanned ${scannedFiles(filtered)} of " +
          s"${snap.entries.size}")
      assert(filtered.count() == 4) // months run Jan-Apr: only 2024 rows
    }
  }
}
