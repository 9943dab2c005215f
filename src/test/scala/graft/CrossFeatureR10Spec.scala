package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Round-10 cross-feature pins: the new surfaces (type widening, branch
  * refs, autoMerge INSERT evolution) composed with the older metadata
  * layers (column mapping, dataChange=false maintenance, WAP staging) —
  * each combination's contract stated and executed, not assumed. */
class CrossFeatureR10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txcf",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txcf")
  }

  test("widening a RENAMED column: logical DDL, physical storage, per-version time travel of both layers") {
    registered {
      val t = Files.createTempDirectory("graft_cf_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 16).map(i => (s"K$i", i)).toDF("k", "amount"), "k", 4)
      spark.sql(s"ALTER TABLE txcf.`$t` RENAME COLUMN amount TO qty")
      // widen by the LOGICAL (renamed) name — the physical field stays
      // 'amount' in every file and sidecar
      spark.sql(s"ALTER TABLE txcf.`$t` ALTER COLUMN qty TYPE BIGINT")
      val head = TxTable.snapshot(spark, t)
      assert(head.schema.get.fieldNames.contains("amount"),
        "storage stays physical")
      assert(head.schema.get("amount").dataType == LongType)
      assert(spark.table(s"txcf.`$t`").schema("qty").dataType == LongType)
      // wide append under the logical name, old narrow files still read
      spark.sql(s"INSERT INTO txcf.`$t` VALUES ('KB', ${1L << 40})")
      val m = spark.table(s"txcf.`$t`").select($"k", $"qty")
        .as[(String, Long)].collect().toMap
      assert(m("KB") == (1L << 40) && m("K3") == 3L)
      // v0: narrow AND pre-rename; v1: renamed, still narrow
      assert(TxTable.read(spark, t, Some(0L)).schema("amount")
        .dataType == IntegerType)
      val v1 = spark.table(s"txcf.`$t@v1`")
      assert(v1.schema("qty").dataType == IntegerType)
    }
  }

  test("dataChange=false maintenance on main still diverges an open branch (fast-forward is strict)") {
    registered {
      val t = Files.createTempDirectory("graft_cf_br_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      TxTable.appendOnce(spark, t,
        (1 to 8).map(i => (s"A$i", i + 50L)).toDF("k", "v"),
        "k", 4, "cf-br", 1L)
      TxTable.createBranch(spark, t, "dev")
      TxTable.appendToBranch(spark, t, "dev",
        Seq(("B1", 999L)).toDF("k", "v"))
      // a compaction is dataChange=false for CHANGE FEEDS, but it is
      // still a main COMMIT: the branch's base is no longer the head,
      // and a fast-forward publish of stale file references would
      // resurrect the pre-compaction files — refuse, like Iceberg
      assert(TxTable.compact(spark, t, maxFilesPerBucket = 1) > 0)
      val e = intercept[IllegalStateException] {
        TxTable.publishBranch(spark, t, "dev")
      }
      assert(e.getMessage.contains("DIVERGED"))
      // the branch still READS exactly (its base version is pinned and
      // vacuum-protected even under the compacted head)
      TxTable.vacuum(spark, t, keepVersions = 1, orphanRetentionMs = 0L)
      val br = spark.table(s"txcf.`$t@branch.dev`")
      assert(br.count() == 25 && br.where($"k" === "B1").count() == 1)
      TxTable.dropBranch(spark, t, "dev")
    }
  }

  test("autoMerge INSERT evolution under a WAP id: schema widens on main, rows stay staged until publish") {
    registered {
      val t = Files.createTempDirectory("graft_cf_wap_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      spark.conf.set("spark.graft.sql.schema.autoMerge", "true")
      spark.conf.set("spark.graft.wap.id", "audit1")
      try {
        Seq(("W1", 100L, "gold")).toDF("k", "v", "tier")
          .createOrReplaceTempView("cf_wap_src")
        spark.sql(s"INSERT INTO txcf.`$t` SELECT k, v, tier FROM cf_wap_src")
        // the evolution is an analysis-time METADATA commit on main (the
        // new column is nullable and empty there); the DATA stays staged
        val head = TxTable.snapshot(spark, t)
        assert(head.schema.get.fieldNames.contains("tier"))
        assert(spark.table(s"txcf.`$t`").count() == 16,
          "staged rows must stay invisible on main")
        // the audit view sees head + staged rows under the wide schema
        val audit = spark.table(s"txcf.`$t@wap.audit1`")
        assert(audit.count() == 17)
        assert(audit.where($"tier" === "gold").count() == 1)
      } finally {
        spark.conf.unset("spark.graft.wap.id")
        spark.conf.unset("spark.graft.sql.schema.autoMerge")
      }
      // publish lands the staged rows; old rows project NULL
      spark.sql(s"CALL txcf.publish_staged('$t', 'audit1')")
      val m = spark.table(s"txcf.`$t`").select($"k", $"tier")
        .as[(String, Option[String])].collect().toMap
      assert(m.size == 17 && m("W1").contains("gold") && m("K3").isEmpty)
    }
  }
}
