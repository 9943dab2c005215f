package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Column DEFAULT values (the Delta default-values feature) through
  * Spark's own column-metadata convention: `ALTER TABLE ADD COLUMN …
  * DEFAULT <literal>` records CURRENT_DEFAULT (fills INSERTs that omit
  * the column, applied by stock write analysis) and EXISTS_DEFAULT
  * (fills the column when a stored file PREDATES it, applied natively by
  * the parquet readers from the requested schema's metadata). The
  * metadata persists in the manifest's schema JSON, so every version
  * carries its own defaults and survives later data commits. */
class ColumnDefaultSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txdf",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txdf")
  }

  test("ADD COLUMN DEFAULT: old files read the default; INSERTs fill or override it; time travel predates it") {
    registered {
      val t = Files.createTempDirectory("graft_df_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 8).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      val v0 = TxTable.snapshot(spark, t).version
      spark.sql(s"ALTER TABLE txdf.`$t` ADD COLUMN w INT DEFAULT 7")
      // rows committed BEFORE the column read the exists-default, not NULL
      val old = spark.table(s"txdf.`$t`").select($"k", $"w")
        .as[(String, Option[Int])].collect().toMap
      assert(old.size == 8 && old.values.forall(_.contains(7)))
      // an INSERT omitting the column gets the current default; an
      // explicit value overrides; the DEFAULT keyword resolves
      spark.sql(s"INSERT INTO txdf.`$t` (k, v) VALUES ('N1', 100)")
      spark.sql(s"INSERT INTO txdf.`$t` VALUES ('N2', 200, 9)")
      spark.sql(s"INSERT INTO txdf.`$t` VALUES ('N3', 300, DEFAULT)")
      val m = spark.table(s"txdf.`$t`").select($"k", $"w")
        .as[(String, Option[Int])].collect().toMap
      assert(m("N1").contains(7) && m("N2").contains(9) &&
        m("N3").contains(7))
      // filters over the filled default work on both file generations
      assert(spark.table(s"txdf.`$t`").where($"w" === 7).count() == 10)
      // time travel below the DDL has no column at all
      assert(!spark.read.table(s"txdf.`$t@v$v0`").columns.contains("w"))
      // the default survives later data commits (mergeSchemas keeps
      // column metadata) — append through the Scala API, then re-read
      TxTable.appendOnce(spark, t,
        Seq(("N4", 400L, 11)).toDF("k", "v", "w"), "k", 4, "df-spec", 1L)
      val after = spark.table(s"txdf.`$t`").select($"k", $"w")
        .as[(String, Option[Int])].collect().toMap
      assert(after("N4").contains(11) && after("K3").contains(7),
        "pre-DDL rows must still read the default after a data commit")
    }
  }

  test("CREATE TABLE with a DEFAULT column persists the default through the manifest schema") {
    registered {
      val t = Files.createTempDirectory("graft_df3_").toString + "/t"
      spark.sql(s"CREATE TABLE txdf.`$t` (k STRING, v BIGINT, " +
        "tier STRING DEFAULT 'basic') PARTITIONED BY (bucket(4, k))")
      spark.sql(s"INSERT INTO txdf.`$t` (k, v) VALUES ('A', 1)")
      spark.sql(s"INSERT INTO txdf.`$t` VALUES ('B', 2, 'pro')")
      val m = spark.table(s"txdf.`$t`").select($"k", $"tier")
        .as[(String, String)].collect().toMap
      assert(m == Map("A" -> "basic", "B" -> "pro"))
      spark.sql(s"DROP TABLE txdf.`$t`")
    }
  }

  test("SET DEFAULT changes only future inserts; the exists-default never rewrites history; DROP DEFAULT clears it") {
    registered {
      val t = Files.createTempDirectory("graft_df4_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 4).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      spark.sql(s"ALTER TABLE txdf.`$t` ADD COLUMN w INT DEFAULT 7")
      spark.sql(s"INSERT INTO txdf.`$t` (k, v) VALUES ('A', 1)") // w=7
      spark.sql(s"ALTER TABLE txdf.`$t` ALTER COLUMN w SET DEFAULT 99")
      spark.sql(s"INSERT INTO txdf.`$t` (k, v) VALUES ('B', 2)") // w=99
      val m1 = spark.table(s"txdf.`$t`").select($"k", $"w")
        .as[(String, Option[Int])].collect().toMap
      assert(m1("A").contains(7) && m1("B").contains(99))
      // pre-column rows STILL read the frozen exists-default, not 99
      assert(m1("K1").contains(7),
        "SET DEFAULT must never rewrite what old files read")
      spark.sql(s"ALTER TABLE txdf.`$t` ALTER COLUMN w DROP DEFAULT")
      spark.sql(s"INSERT INTO txdf.`$t` (k, v) VALUES ('C', 3)") // w=NULL
      val m2 = spark.table(s"txdf.`$t`").select($"k", $"w")
        .as[(String, Option[Int])].collect().toMap
      assert(m2("C").isEmpty && m2("K1").contains(7))
    }
  }

  test("nullability DDL: SQL SET NOT NULL is analyzer-refused; the API path validates then enforces; DROP NOT NULL relaxes") {
    registered {
      import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
      val t = Files.createTempDirectory("graft_df5_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 4).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      spark.sql(s"ALTER TABLE txdf.`$t` ADD COLUMN w INT")
      // Spark's own analyzer blocks tightening through SQL on v2 tables
      val sqlRefusal = intercept[Exception] {
        spark.sql(s"ALTER TABLE txdf.`$t` ALTER COLUMN w SET NOT NULL")
      }
      assert(sqlRefusal.getMessage.contains("non-nullable"))
      // the API path (direct alterTable) must VALIDATE before recording:
      // w holds NULL in every pre-DDL row -> refuse
      val cat = spark.sessionState.catalogManager.catalog("txdf")
        .asInstanceOf[TableCatalog]
      val ident = Identifier.of(Array.empty, t)
      val apiRefusal = intercept[Exception] {
        cat.alterTable(ident,
          TableChange.updateColumnNullability(Array("w"), false))
      }
      assert(apiRefusal.getMessage.contains("NULL"))
      // v has no NULLs -> lands; SQL INSERT of NULL then refuses
      cat.alterTable(ident,
        TableChange.updateColumnNullability(Array("v"), false))
      assert(!spark.table(s"txdf.`$t`").schema("v").nullable)
      intercept[Exception] {
        spark.sql(s"INSERT INTO txdf.`$t` VALUES ('X', NULL, 1)")
      }
      // relaxing IS allowed through SQL
      spark.sql(s"ALTER TABLE txdf.`$t` ALTER COLUMN v DROP NOT NULL")
      assert(spark.table(s"txdf.`$t`").schema("v").nullable)
      spark.sql(s"INSERT INTO txdf.`$t` VALUES ('X', NULL, 1)")
      assert(spark.table(s"txdf.`$t`").count() == 5)
    }
  }

  test("SET NOT NULL survives later data commits: a valid INSERT must not revert the recorded constraint") {
    registered {
      import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
      val t = Files.createTempDirectory("graft_df6_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 4).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      val cat = spark.sessionState.catalogManager.catalog("txdf")
        .asInstanceOf[TableCatalog]
      cat.alterTable(Identifier.of(Array.empty, t),
        TableChange.updateColumnNullability(Array("v"), false))
      assert(!spark.table(s"txdf.`$t`").schema("v").nullable)
      // the regression: mergeSchemas used to force nullable=true on
      // every field at EACH data commit, so this valid insert silently
      // evaporated the constraint
      spark.sql(s"INSERT INTO txdf.`$t` VALUES ('X', 9)")
      assert(!spark.table(s"txdf.`$t`").schema("v").nullable,
        "a successful data commit must not revert SET NOT NULL")
      intercept[Exception] {
        spark.sql(s"INSERT INTO txdf.`$t` VALUES ('Y', NULL)")
      }
      // the Scala write path enforces too: NULL row refuses the append,
      // and a union-evolving batch OMITTING the column refuses up front
      intercept[Exception] {
        TxTable.appendOnce(spark, t,
          Seq(("Z", Option.empty[Long])).toDF("k", "v"),
          "k", 4, "nn-app", 1L)
      }
      intercept[Exception] {
        TxTable.appendOnce(spark, t,
          Seq(Tuple1("W")).toDF("k"), "k", 4, "nn-app", 2L)
      }
      assert(!spark.table(s"txdf.`$t`").schema("v").nullable)
      assert(spark.table(s"txdf.`$t`")
        .filter($"v".isNull).count() == 0)
      // a fresh column added later is still born nullable (old files
      // read NULL there) — only the VALIDATED constraint is preserved
      spark.sql(s"ALTER TABLE txdf.`$t` ADD COLUMN w INT")
      spark.sql(s"INSERT INTO txdf.`$t` VALUES ('N1', 3, NULL)")
      assert(spark.table(s"txdf.`$t`").schema("w").nullable)
    }
  }

  test("defaults compose with the CDF and the catalog point paths") {
    registered {
      val t = Files.createTempDirectory("graft_df2_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 8).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      spark.sql(s"ALTER TABLE txdf.`$t` ADD COLUMN tag STRING DEFAULT 'b'")
      spark.sql(s"INSERT INTO txdf.`$t` (k, v) VALUES ('N1', 50)")
      // the change feed types frames with the head schema and fills the
      // default for pre-DDL files' rows
      val head = TxTable.snapshot(spark, t).version
      val ch = TxTable.changesBetween(spark, t, 0L, head)
      assert(ch.where($"_commit_version" === 0L)
        .select($"tag").as[String].collect().forall(_ == "b"))
      assert(ch.where($"k" === "N1").select($"tag")
        .as[String].head() == "b")
    }
  }
}
