package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** SQL schema evolution behind `spark.graft.sql.schema.autoMerge` (the
  * public Delta autoMerge shape): INSERT INTO with extra source columns
  * union-evolves the table by PRE-WIDENING it (alterTable + relation
  * reload) before Spark's own output resolution runs — so every safety
  * that resolution provides (arity, casts, constraint enforcement,
  * plain-MERGE alignment) is pinned here as still intact. */
class SchemaAutoMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withAutoMerge[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txspj",
      classOf[graft.sources.TxTableCatalog].getName)
    spark.conf.set("spark.graft.sql.schema.autoMerge", "true")
    try body
    finally {
      spark.conf.unset("spark.graft.sql.schema.autoMerge")
      spark.conf.unset("spark.sql.catalog.txspj")
    }
  }

  private def fresh(): String = {
    val t = Files.createTempDirectory("graft_am_").toString + "/t"
    TxTable.init(spark, t,
      (1 to 16).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
    t
  }

  test("INSERT INTO with an extra source column union-evolves; old rows project NULL; time travel keeps the old schema") {
    withAutoMerge {
      val t = fresh()
      val v0 = TxTable.snapshot(spark, t).version
      Seq(("Z1", 100L, "gold"), ("Z2", 200L, "silver"))
        .toDF("k", "v", "tier").createOrReplaceTempView("am_src")
      spark.sql(s"INSERT INTO txspj.`$t` SELECT k, v, tier FROM am_src")
      val head = TxTable.snapshot(spark, t)
      // two commits, like Spark's native MERGE evolution: one ADD COLUMN
      // metadata commit (analysis-time widening), then the data commit
      assert(head.version == v0 + 2, "schema commit + data commit")
      assert(head.schema.get.fieldNames.contains("tier"))
      val m = spark.table(s"txspj.`$t`").select($"k", $"v", $"tier")
        .as[(String, Long, Option[String])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(m.size == 18)
      assert(m("Z1") == ((100L, Some("gold"))))
      assert(m("K3") == ((3L, None)), "old files project the new column NULL")
      assert(!spark.read.table(s"txspj.`$t@v$v0`").columns.contains("tier"))
      // a second identical insert no longer evolves (idempotent schema)
      spark.sql(s"INSERT INTO txspj.`$t` SELECT k, v, tier FROM am_src")
      assert(TxTable.snapshot(spark, t).schema.get.fieldNames
        .count(_ == "tier") == 1)
    }
  }

  test("safety stays on under the conf: arity, casts, and CHECK constraints still enforce") {
    withAutoMerge {
      val t = fresh()
      // too FEW columns is still a loud arity error
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"INSERT INTO txspj.`$t` VALUES ('X1')")
      }
      assert(e.getMessage.toLowerCase.contains("columns"))
      // an INT literal into the BIGINT column still casts (positional)
      spark.sql(s"INSERT INTO txspj.`$t` VALUES ('X1', 17)")
      assert(spark.table(s"txspj.`$t`").where($"k" === "X1")
        .select($"v").as[Long].head() == 17L)
      // CHECK constraints still enforce per row on the v2 write
      spark.sql(s"ALTER TABLE txspj.`$t` ADD CONSTRAINT v_pos CHECK (v >= 0)")
      intercept[Exception] {
        spark.sql(s"INSERT INTO txspj.`$t` VALUES ('X2', -5)")
      }
      assert(spark.table(s"txspj.`$t`").where($"k" === "X2").count() == 0)
      // and an evolving insert still enforces the constraint on the
      // surviving columns
      intercept[Exception] {
        spark.sql(s"INSERT INTO txspj.`$t` " +
          "SELECT 'X3' AS k, CAST(-1 AS BIGINT) AS v, 'x' AS extra")
      }
    }
  }

  test("plain MERGE keeps aligned assignments while the conf is on") {
    withAutoMerge {
      val t = fresh()
      // assignment order deliberately shuffled; v arrives as INT — the
      // alignment Spark skips under ACCEPT_ANY_SCHEMA must still happen
      Seq(("K1", 111), ("KN", 999)).toDF("k", "v_new")
        .createOrReplaceTempView("am_mrg")
      spark.sql(
        s"""MERGE INTO txspj.`$t` tgt USING am_mrg src ON tgt.k = src.k
           |WHEN MATCHED THEN UPDATE SET v = src.v_new
           |WHEN NOT MATCHED THEN INSERT (v, k) VALUES (src.v_new, src.k)
           |""".stripMargin)
      val m = spark.table(s"txspj.`$t`").select($"k", $"v")
        .as[(String, Long)].collect().toMap
      assert(m.size == 17 && m("K1") == 111L && m("KN") == 999L &&
        m("K2") == 2L)
    }
  }

  test("INSERT OVERWRITE with an extra source column evolves and replaces atomically") {
    withAutoMerge {
      val t = fresh()
      Seq(("W1", 1L, 0.5), ("W2", 2L, 0.9)).toDF("k", "v", "score")
        .createOrReplaceTempView("am_ow")
      spark.sql(s"INSERT OVERWRITE txspj.`$t` SELECT k, v, score FROM am_ow")
      val got = spark.table(s"txspj.`$t`")
        .select($"k", $"v", $"score").as[(String, Long, Double)]
        .collect().toSet
      assert(got == Set(("W1", 1L, 0.5), ("W2", 2L, 0.9)))
      assert(TxTable.snapshot(spark, t).schema.get.fieldNames
        .contains("score"))
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION widens a narrow target column when the source is wider") {
    withAutoMerge {
      val t = Files.createTempDirectory("graft_am_w_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 8).map(i => (s"K$i", i)).toDF("k", "n"), "k", 4)
      assert(TxTable.snapshot(spark, t).schema.get("n").dataType ==
        org.apache.spark.sql.types.IntegerType)
      Seq(("K1", 1L << 40), ("KN", 7L)).toDF("k", "n")
        .createOrReplaceTempView("am_wide_src")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO txspj.`$t` t
           |USING am_wide_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)
      assert(TxTable.snapshot(spark, t).schema.get("n").dataType ==
        org.apache.spark.sql.types.LongType,
        "the evolution must widen INT -> BIGINT via the same alterTable")
      val m = spark.table(s"txspj.`$t`").select($"k", $"n")
        .as[(String, Long)].collect().toMap
      assert(m("K1") == (1L << 40) && m("KN") == 7L && m("K2") == 2L)
    }
  }

  test("evolution never leaks through a branch or time-travel identifier") {
    withAutoMerge {
      val t = fresh()
      TxTable.createBranch(spark, t, "dev")
      // an extra-column INSERT into the BRANCH must not widen main's
      // schema as a side effect — it keeps the stock arity refusal
      Seq(("B1", 1L, "x")).toDF("k", "v", "extra")
        .createOrReplaceTempView("am_br_src")
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"INSERT INTO txspj.`$t@branch.dev` " +
          "SELECT * FROM am_br_src")
      }
      assert(!TxTable.snapshot(spark, t).schema.get.fieldNames
        .contains("extra"), "branch insert must not evolve MAIN")
      assert(TxTable.branchSnapshot(spark, t, "dev").version == 0L,
        "nothing may land on the branch either")
      TxTable.dropBranch(spark, t, "dev")
    }
  }

  test("a table path containing a literal '@' keeps INSERT evolution: head-ness comes from resolution, not substring matching") {
    withAutoMerge {
      // POSIX allows '@' in file names; only the RESERVED suffix grammar
      // (@vN / @<tag> / @wap.x / @branch.x) may disable evolution
      val t = Files.createTempDirectory("graft_am_at_")
        .toString + "/user@org.db/t"
      TxTable.init(spark, t,
        (1 to 8).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      spark.sql(s"INSERT INTO txspj.`$t` VALUES ('X1', 99, 'wide')")
      assert(spark.table(s"txspj.`$t`").columns.contains("col3") ||
        spark.table(s"txspj.`$t`").columns.length == 3,
        "the @-containing path must auto-evolve like any other head")
      assert(spark.table(s"txspj.`$t`").count() == 9)
      // while a PINNED identifier on the same table still refuses
      Seq(("B1", 1L, "x")).toDF("k", "v", "extra")
        .createOrReplaceTempView("am_at_src")
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"INSERT INTO txspj.`$t@v0` SELECT * FROM am_at_src")
      }
    }
  }

  test("off by default: extra-column INSERT refuses with the stock arity error") {
    spark.conf.set("spark.sql.catalog.txspj",
      classOf[graft.sources.TxTableCatalog].getName)
    try {
      val t = fresh()
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"INSERT INTO txspj.`$t` VALUES ('X', 1, 'extra')")
      }
      assert(e.getMessage.contains("TOO_MANY_DATA_COLUMNS"))
    } finally spark.conf.unset("spark.sql.catalog.txspj")
  }
}
