package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** `ALTER TABLE … ALTER COLUMN … TYPE <wider>` as a METADATA-ONLY commit
  * (the public Delta type-widening feature): old narrow files are read
  * through the widened schema by the vectorized parquet reader's native
  * promotions, zero rewrites. Narrowing and lossy changes refuse; the
  * bucket key refuses (xxhash64 placement is width-sensitive); a widened
  * column's bloom sidecar is dropped pre-commit and rebuilt post-commit
  * (its hashes are width-sensitive too — stale bits would prune WRONG,
  * not over-keep); zone maps keep their values (width-coercing compares
  * stay exact). */
class TypeWideningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txw",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txw")
  }

  private def freshIntTable(): String = {
    val t = Files.createTempDirectory("graft_tw_").toString + "/t"
    val df = (1 to 64).map(i => (s"K$i", i, i.toFloat / 4,
      BigDecimal(i).setScale(2))).toDF("k", "v", "f", "d")
      .withColumn("d", col("d").cast("decimal(10,2)"))
    TxTable.init(spark, t, df, "k", 4)
    t
  }

  test("INT->BIGINT widening: metadata-only commit; old files read wide; out-of-int-range appends land") {
    registered {
      val t = freshIntTable()
      val before = TxTable.snapshot(spark, t)
      spark.sql(s"ALTER TABLE txw.`$t` ALTER COLUMN v TYPE BIGINT")
      val head = TxTable.snapshot(spark, t)
      assert(head.version == before.version + 1)
      assert(head.entries.map(_.rel).toSet ==
        before.entries.map(_.rel).toSet, "zero files rewritten")
      assert(head.schema.get("v").dataType == LongType)
      // old narrow files read through the widened schema, values exact
      val viaApi = TxTable.read(spark, t).select(sum($"v")).as[Long].head()
      assert(viaApi == (1 to 64).map(_.toLong).sum)
      val viaSql = spark.table(s"txw.`$t`")
      assert(viaSql.schema("v").dataType == LongType)
      assert(viaSql.agg(sum($"v")).as[Long].head() == viaApi)
      // a value beyond INT range appends and reads back
      TxTable.appendOnce(spark, t,
        Seq(("KBIG", 1L << 40, 0.5f, BigDecimal(1).setScale(2)))
          .toDF("k", "v", "f", "d")
          .withColumn("d", col("d").cast("decimal(10,2)")),
        "k", 4, "tw-spec", 1L)
      assert(spark.table(s"txw.`$t`").where($"k" === "KBIG")
        .select($"v").as[Long].head() == (1L << 40))
      // time travel below the widening keeps the NARROW schema
      assert(TxTable.snapshot(spark, t, Some(before.version))
        .schema.get("v").dataType == IntegerType)
      assert(TxTable.read(spark, t, Some(before.version))
        .schema("v").dataType == IntegerType)
    }
  }

  test("FLOAT->DOUBLE and DECIMAL precision growth widen; narrowing and lossy changes refuse") {
    registered {
      val t = freshIntTable()
      spark.sql(s"ALTER TABLE txw.`$t` ALTER COLUMN f TYPE DOUBLE")
      spark.sql(s"ALTER TABLE txw.`$t` ALTER COLUMN d TYPE DECIMAL(18,2)")
      val sc = TxTable.snapshot(spark, t).schema.get
      assert(sc("f").dataType == DoubleType)
      assert(sc("d").dataType == DecimalType(18, 2))
      // float values re-read exactly (float->double extension is exact)
      val f = spark.table(s"txw.`$t`").where($"k" === "K2")
        .select($"f").as[Double].head()
      assert(f == 2.0f.toDouble / 4)
      val d = spark.table(s"txw.`$t`").where($"k" === "K3")
        .select($"d").as[java.math.BigDecimal].head()
      assert(d == new java.math.BigDecimal("3.00"))
      // refusals: narrowing, lossy, scale change, unknown column
      intercept[Exception] {
        spark.sql(s"ALTER TABLE txw.`$t` ALTER COLUMN v TYPE SMALLINT")
      }
      intercept[Exception] { // BIGINT -> DOUBLE loses 64-bit exactness
        spark.sql(s"ALTER TABLE txw.`$t` ALTER COLUMN v TYPE STRING")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE txw.`$t` ALTER COLUMN d TYPE DECIMAL(18,4)")
      }
      // the bucket key refuses: xxhash64 placement is width-sensitive
      val t2 = Files.createTempDirectory("graft_tw2_").toString + "/t"
      TxTable.init(spark, t2,
        (1 to 8).map(i => (i, i.toLong)).toDF("ik", "v"), "ik", 4)
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE txw.`$t2` ALTER COLUMN ik TYPE BIGINT")
      }
      assert(e.getMessage.contains("bucket key") ||
        e.getMessage.contains("rebucket"))
    }
  }

  test("zone maps stay valid across the widening; bloom is rebuilt (no false-negative pruning)") {
    registered {
      val t = freshIntTable()
      TxTable.computeStats(spark, t, "v")
      TxTable.computeBloom(spark, t, "v")
      spark.sql(s"ALTER TABLE txw.`$t` ALTER COLUMN v TYPE BIGINT")
      // zone-map pruning still returns exactly the range (values compare
      // across widths via coercion)
      val got = TxTable.readWhere(spark, t, "v", 10L, 20L)
        .select($"v").as[Long].collect().sorted.toSeq
      assert(got == (10L to 20L))
      // the bloom was rebuilt under the wide hash domain: a point read
      // must still FIND the row (a stale narrow-hash bloom would skip
      // its file — wrong, not over-keep)
      val fs = new org.apache.hadoop.fs.Path(t).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(TxTable.bloomColumns(fs, t).contains("v"),
        "widening must rebuild the bloom it dropped")
      val hit = spark.table(s"txw.`$t`").where($"v" === 37L)
        .select($"k").as[String].collect().toSeq
      assert(hit == Seq("K37"),
        "a stale narrow-hash bloom would skip the file entirely")
    }
  }

  test("row-level ops and the change feed work over mixed-width files") {
    registered {
      val t = freshIntTable()
      spark.sql(s"ALTER TABLE txw.`$t` ALTER COLUMN v TYPE BIGINT")
      // MERGE over old narrow files through the catalog (COW rewrite
      // reads promote, the rewrite lands wide)
      Seq(("K1", 1000L), ("KN", 2000L)).toDF("k", "v2")
        .createOrReplaceTempView("tw_src")
      spark.sql(
        s"""MERGE INTO txw.`$t` tgt USING tw_src src ON tgt.k = src.k
           |WHEN MATCHED THEN UPDATE SET v = src.v2
           |WHEN NOT MATCHED THEN INSERT (k, v, f, d)
           |  VALUES (src.k, src.v2, CAST(0.0 AS DOUBLE),
           |    CAST(NULL AS DECIMAL(10,2)))
           |""".stripMargin)
      val m = spark.table(s"txw.`$t`").select($"k", $"v")
        .as[(String, Long)].collect().toMap
      assert(m("K1") == 1000L && m("KN") == 2000L && m("K2") == 2L)
      // the change feed types every frame with the head schema
      val head = TxTable.snapshot(spark, t).version
      val ch = TxTable.changesBetween(spark, t, 0L, head)
      assert(ch.schema("v").dataType == LongType)
      assert(ch.filter($"_change_type" === "insert" && $"k" === "KN")
        .count() == 1)
    }
  }
}
