package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Named-table catalog namespace: with the catalog's `warehouse` option
  * set, non-absolute identifiers are NAMES resolved through a
  * `_catalog/` directory of binding files — CREATE claims a binding
  * create-exclusively (the filesystem is the CAS, so racing CREATEs
  * cannot both win), DROP releases it, RENAME moves it (data untouched),
  * SHOW TABLES lists it, and the reserved suffixes (`@vN`, `#files`, …)
  * compose with names. Absolute identifiers keep the path-IS-identity
  * behavior byte for byte. */
class TxNamespaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withCatalog[T](body: String => T): T = {
    val wh = Files.createTempDirectory("graft_wh_").toString
    spark.conf.set("spark.sql.catalog.txnm",
      classOf[graft.sources.TxTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.txnm.warehouse", wh)
    // catalog instances are cached per session: force re-initialization
    // so THIS test's warehouse takes effect
    org.apache.spark.sql.GraftTestCatalogReset.reset(spark)
    try body(wh)
    finally {
      spark.conf.unset("spark.sql.catalog.txnm.warehouse")
      spark.conf.unset("spark.sql.catalog.txnm")
      org.apache.spark.sql.GraftTestCatalogReset.reset(spark)
    }
  }

  test("lifecycle: CREATE by name (default + LOCATION), INSERT, SELECT, SHOW TABLES, DESCRIBE, DROP; suffixes compose with names") {
    withCatalog { wh =>
      spark.sql("""CREATE TABLE txnm.db.orders (k BIGINT, v STRING)
        PARTITIONED BY (bucket(4, k))""")
      spark.sql("INSERT INTO txnm.db.orders VALUES (1, 'a'), (2, 'b')")
      assert(spark.table("txnm.db.orders").count() == 2)
      // the data landed under <wh>/db/orders
      assert(TxTable.isTxTable(spark, s"$wh/db/orders"))
      // explicit LOCATION
      val loc = Files.createTempDirectory("graft_nm_loc_").toString + "/x"
      spark.sql(s"""CREATE TABLE txnm.db.located (k BIGINT, v STRING)
        PARTITIONED BY (bucket(2, k)) LOCATION '$loc'""")
      spark.sql("INSERT INTO txnm.db.located VALUES (9, 'z')")
      assert(TxTable.isTxTable(spark, loc))
      assert(spark.table("txnm.db.located").count() == 1)
      // SHOW TABLES
      val shown = spark.sql("SHOW TABLES IN txnm.db")
        .select("tableName").as[String].collect().toSet
      assert(shown == Set("orders", "located"), shown)
      // name-addressed time travel + system tables
      spark.sql("INSERT INTO txnm.db.orders VALUES (3, 'c')")
      assert(spark.table("txnm.`db/orders@v1`").count() == 2)
      assert(spark.sql(
        "SELECT * FROM txnm.db.orders VERSION AS OF 1").count() == 2)
      assert(spark.table("txnm.`db/orders#files`").count() > 0)
      // DROP releases the binding AND the data
      spark.sql("DROP TABLE txnm.db.located")
      assert(!TxTable.isTxTable(spark, loc))
      assert(spark.sql("SHOW TABLES IN txnm.db")
        .select("tableName").as[String].collect().toSet == Set("orders"))
      intercept[Exception] { spark.table("txnm.db.located").count() }
    }
  }

  test("RENAME TABLE moves the binding (data untouched); renaming onto an existing name refuses; path-addressed tables keep the old contract") {
    withCatalog { wh =>
      spark.sql("""CREATE TABLE txnm.db.a (k BIGINT)
        PARTITIONED BY (bucket(2, k))""")
      spark.sql("INSERT INTO txnm.db.a VALUES (7)")
      spark.sql("""CREATE TABLE txnm.db.b (k BIGINT)
        PARTITIONED BY (bucket(2, k))""")
      spark.sql("ALTER TABLE txnm.db.a RENAME TO db.a2")
      assert(spark.table("txnm.db.a2").as[Long].collect().toSeq ==
        Seq(7L))
      intercept[Exception] { spark.table("txnm.db.a").count() }
      // the storage path did not move
      assert(TxTable.isTxTable(spark, s"$wh/db/a"))
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE txnm.db.a2 RENAME TO db.b")
      }
      assert(e.getMessage.toLowerCase.contains("already exists"),
        e.getMessage)
      // absolute identifiers stay path-addressed even with a warehouse
      val p = Files.createTempDirectory("graft_nm_p_").toString + "/t"
      TxTable.init(spark, p, Seq((1L, "x")).toDF("k", "v"), "k", 2)
      assert(spark.table(s"txnm.`$p`").count() == 1)
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE txnm.`$p` RENAME TO db.c")
      }
      assert(e2.getMessage.contains("path IS the table's identity"),
        e2.getMessage)
    }
  }

  test("namespace DDL: CREATE/SHOW/USE/DROP NAMESPACE; implicit namespaces from bindings; non-empty drop refuses") {
    withCatalog { _ =>
      spark.sql("CREATE NAMESPACE txnm.marked")
      intercept[Exception] { spark.sql("CREATE NAMESPACE txnm.marked") }
      spark.sql("""CREATE TABLE txnm.db.t1 (k BIGINT)
        PARTITIONED BY (bucket(2, k))""")
      val shown = spark.sql("SHOW NAMESPACES IN txnm")
        .select("namespace").as[String].collect().toSet
      assert(shown == Set("marked", "db"), shown)
      // USE resolves through namespaceExists
      spark.sql("USE txnm.db")
      try assert(spark.sql("SHOW TABLES").select("tableName")
        .as[String].collect().toSet == Set("t1"))
      finally spark.sql("USE spark_catalog.default")
      // a namespace holding tables refuses to drop
      val e = intercept[Exception] { spark.sql("DROP NAMESPACE txnm.db") }
      assert(e.getMessage.contains("not empty") ||
        e.getMessage.toLowerCase.contains("non-empty"), e.getMessage)
      spark.sql("DROP NAMESPACE txnm.marked")
      assert(spark.sql("SHOW NAMESPACES IN txnm")
        .select("namespace").as[String].collect().toSet == Set("db"))
    }
  }

  test("matrix: reserved suffixes and CALL procs accept NAMES everywhere paths work (round-14 ask #8)") {
    withCatalog { wh =>
      spark.sql("""CREATE TABLE txnm.db.m (k BIGINT, v STRING)
        PARTITIONED BY (bucket(4, k))""")
      spark.sql("INSERT INTO txnm.db.m VALUES (1,'a'), (2,'b'), (3,'c')")
      val path = s"$wh/db/m"
      // CALL procs resolve names — both the '/'-joined identifier
      // spelling and the dotted SQL spelling
      assert(spark.sql("CALL txnm.history('db/m')").count() >= 1)
      assert(spark.sql("CALL txnm.history('db.m')").count() >= 1)
      // absolute paths through the SAME catalog stay path-addressed
      assert(spark.sql(s"CALL txnm.history('$path')").count() >= 1)
      // row tracking enabled BY NAME, #lineage read BY NAME
      spark.sql("CALL txnm.enable_row_tracking('db.m')")
      val lin = spark.table("txnm.`db/m#lineage`")
      assert(lin.columns.contains("_row_id"))
      assert(lin.count() == 3)
      // metadata system tables by name
      assert(spark.table("txnm.`db/m#partitions`").count() > 0)
      assert(spark.table("txnm.`db/m#files`").count() > 0)
      assert(spark.table("txnm.`db/m#history`").count() >= 1)
      // the change feed by name
      assert(spark.table("txnm.`db/m#changes`").count() >= 3)
      // branch lifecycle entirely by name: fork, write to the branch
      // head, read it, main unchanged, suffix COMBOS resolve too
      spark.sql("CALL txnm.create_branch('db.m', 'x')")
      spark.sql("INSERT INTO txnm.`db/m@branch.x` VALUES (9, 'z')")
      assert(spark.table("txnm.`db/m@branch.x`").count() == 4)
      assert(spark.table("txnm.db.m").count() == 3)
      assert(spark.table("txnm.`db/m@branch.x#files`").count() > 0)
      assert(spark.table("txnm.`db/m@v1#files`").count() > 0)
      // the SQL twin of the Scala zero-read-amp delete, by name: the
      // keys_query's output COLUMNS name the equality key
      val n = spark.sql(
        "CALL txnm.delete_where_eq('db.m', 'SELECT CAST(2 AS BIGINT) AS k')")
        .as[Long].head()
      assert(n == 1L)
      assert(spark.table("txnm.db.m").select($"k").as[Long]
        .collect().toSet == Set(1L, 3L))
      // fold drives the registry tax-free again — also by name
      spark.sql("CALL txnm.fold_eq_deletes('db.m')")
      assert(TxTable.parseEqDeletes(
        TxTable.snapshot(spark, path).props).isEmpty)
      assert(spark.table("txnm.db.m").select($"k").as[Long]
        .collect().toSet == Set(1L, 3L))
      // clone entirely by NAME: `source` resolves through the
      // metastore and `target` CLAIMS a fresh binding at the CREATE
      // TABLE default location — the new name loads, lists, and
      // maintains like any created table
      spark.sql("CALL txnm.clone('db.m', 'db.mc')")
      assert(spark.table("txnm.db.mc").select($"k").as[Long]
        .collect().toSet == Set(1L, 3L))
      assert(TxTable.isTxTable(spark, s"$wh/db/mc"),
        "the claimed binding must point at the default location")
      assert(spark.sql("SHOW TABLES IN txnm.db").select("tableName")
        .as[String].collect().toSet.contains("mc"))
      assert(spark.sql("CALL txnm.localize_clone('db.mc')")
        .as[Int].head() >= 0)
      spark.sql("CALL txnm.release_clone('db/mc')") // '/' spelling too
      // re-cloning onto the SAME name refuses via the kernel, and the
      // refused CALL must not clobber the existing binding
      intercept[Exception] { spark.sql("CALL txnm.clone('db.m', 'db.mc')") }
      assert(spark.table("txnm.db.mc").count() == 2,
        "a refused re-clone must leave the existing target intact")
      // a clone whose SOURCE fails rolls back the target's freshly
      // claimed binding (no dangling name from a failed CALL)
      intercept[Exception] {
        spark.sql("CALL txnm.clone('db.nosuch', 'db.newt')")
      }
      assert(!spark.sql("SHOW TABLES IN txnm.db").select("tableName")
        .as[String].collect().toSet.contains("newt"),
        "a failed clone must release the target binding it claimed")
    }
  }

  test("concurrent CREATE collision: exactly one of two racing creates wins the binding") {
    withCatalog { _ =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = (1 to 2).map { i =>
        Future {
          scala.util.Try {
            spark.sql(s"""CREATE TABLE txnm.db.race (k BIGINT, src INT)
              PARTITIONED BY (bucket(2, k))""")
            true
          }.getOrElse(false)
        }
      }.map(f => Await.result(f, 60.seconds))
      assert(results.count(identity) == 1,
        s"exactly one CREATE must win: $results")
      // the winner's table is fully usable
      spark.sql("INSERT INTO txnm.db.race VALUES (1, 0)")
      assert(spark.table("txnm.db.race").count() == 1)
    }
  }
}
