package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-SQL surface: with the testdata views registered and
  * GraftExtensions loaded, a SQL-only session can run the same joins,
  * aggregations, and native kernels as the DataFrame API. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("registerAll: multi-table SQL analytics match the DataFrame plan") {
    Tables.registerAll(spark, dir)
    val sql = spark.sql(
      """SELECT n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
      .as[(String, Long, Double)].collect().toSeq
    val api = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("spend"))
      .orderBy($"n_name")
      .as[(String, Long, Double)].collect().toSeq
    assert(sql == api)
  }

  test("SQL range query over a registered TxTable prunes files via the zone-map rule") {
    import graft.ops.TxTable
    val table = java.nio.file.Files
      .createTempDirectory("graft_txsql_").toString + "/t"
    // time-clustered appends (the streaming landing shape): each commit
    // covers a disjoint day range, so zone maps can skip whole commits
    def batch(days: Range) = days.map(d => (s"k$d", d.toLong, d * 2L))
      .toDF("k", "day", "size")
    TxTable.init(spark, table, batch(0 until 100), "k", nBuckets = 4)
    TxTable.appendOnce(spark, table, batch(100 until 200), "k", 4, "sq", 0L)
    TxTable.appendOnce(spark, table, batch(200 until 300), "k", 4, "sq", 1L)
    TxTable.computeStats(spark, table, "day")
    TxTable.registerView(spark, table, "tx_events")
    val all = TxTable.snapshot(spark, table).entries.size
    // both bounds inside commit 1's range — a SQL-only reader must open
    // strictly fewer files than the full snapshot
    val q = spark.sql(
      "SELECT k, day, size FROM tx_events WHERE day BETWEEN 120 AND 180")
    val opened = q.queryExecution.executedPlan.collectLeaves().flatMap {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.toSeq
      case _ => Nil
    }
    assert(opened.size < all,
      s"SQL scan must prune via the sidecars: opened ${opened.size} of $all")
    // transparency: identical rows to the unpruned read + filter
    val expect = TxTable.read(spark, table)
      .filter($"day".between(120L, 180L))
      .select("k", "day", "size").as[(String, Long, Long)].collect().toSet
    assert(q.as[(String, Long, Long)].collect().toSet == expect)
    // a predicate on an UNPROFILED column prunes nothing but stays correct
    val up = spark.sql(
      "SELECT k, day, size FROM tx_events WHERE size BETWEEN 240 AND 360")
    assert(up.as[(String, Long, Long)].collect().toSet ==
      TxTable.read(spark, table).filter($"size".between(240L, 360L))
        .select("k", "day", "size").as[(String, Long, Long)].collect().toSet)
  }

  test("the prune rule reaches THROUGH a renamed view's projection: logical predicates hit physical sidecars") {
    import graft.ops.TxTable
    val table = java.nio.file.Files
      .createTempDirectory("graft_txsqlrn_").toString + "/t"
    def batch(days: Range) = days.map(d => (s"k$d", d.toLong))
      .toDF("k", "day")
    TxTable.init(spark, table, batch(0 until 100), "k", nBuckets = 4)
    TxTable.appendOnce(spark, table, batch(100 until 200), "k", 4, "rnv", 0L)
    TxTable.appendOnce(spark, table, batch(200 until 300), "k", 4, "rnv", 1L)
    TxTable.computeStats(spark, table, "day")
    // RENAME both a stats column and the bucket key: the registered view
    // now reads through a rename Project, and the rule must translate
    // the logical attribute names back to the physical sidecar keys
    TxTable.renameColumn(spark, table, "day", "event_day")
    TxTable.renameColumn(spark, table, "k", "id")
    TxTable.registerView(spark, table, "tx_renamed")
    val all = TxTable.snapshot(spark, table).entries.size
    def opened(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().flatMap {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.relation.location.inputFiles.toSeq
        case _ => Nil
      }.size
    val q = spark.sql(
      "SELECT id, event_day FROM tx_renamed " +
        "WHERE event_day BETWEEN 120 AND 180")
    assert(opened(q) < all,
      s"zone maps must prune through the rename: ${opened(q)} of $all")
    assert(q.as[(String, Long)].collect().toSet ==
      (120 to 180).map(d => (s"k$d", d.toLong)).toSet)
    // bucket pruning on the renamed key
    val pk = spark.sql("SELECT id, event_day FROM tx_renamed WHERE id = 'k7'")
    assert(opened(pk) < all,
      s"bucket identity must prune through the rename: ${opened(pk)} of $all")
    assert(pk.as[(String, Long)].collect().toSet == Set(("k7", 7L)))
  }

  test("SQL point lookup over a registered TxTable prunes to the key's buckets") {
    import graft.ops.TxTable
    val table = java.nio.file.Files
      .createTempDirectory("graft_txsqlk_").toString + "/t"
    def batch(r: Range) = r.map(d => (s"k$d", d.toLong)).toDF("k", "day")
    TxTable.init(spark, table, batch(0 until 400), "k", nBuckets = 8)
    TxTable.registerView(spark, table, "tx_keyed")
    val all = TxTable.snapshot(spark, table).entries.size
    assert(all >= 8, s"fixture sanity: $all files")
    // equality on the BUCKET KEY: the manifest's recorded identity lets
    // the rule hash the literal exactly like the writer and keep only the
    // matching buckets' files — readKeys for SQL sessions
    val q = spark.sql("SELECT k, day FROM tx_keyed WHERE k = 'k42'")
    assert(q.queryExecution.executedPlan.toString.nonEmpty) // force plan
    val opened = q.queryExecution.executedPlan.collectLeaves().flatMap {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.toSeq
      case _ => Nil
    }
    assert(opened.size < all,
      s"point lookup must bucket-prune: opened ${opened.size} of $all")
    assert(q.as[(String, Long)].collect().toSeq == Seq(("k42", 42L)))
    // IN-list prunes to the union of the probed keys' buckets and agrees
    // with the Scala readKeys surface
    val in = spark.sql(
      "SELECT k, day FROM tx_keyed WHERE k IN ('k7', 'k250')")
    assert(in.as[(String, Long)].collect().toSet ==
      TxTable.readKeys(spark, table, "k", Seq("k7", "k250"), 8)
        .select("k", "day").as[(String, Long)].collect().toSet)
    // equality on a NON-key column prunes nothing but stays correct
    assert(spark.sql("SELECT k FROM tx_keyed WHERE day = 9")
      .as[String].collect().toSeq == Seq("k9"))
  }

  test("SQL equality on a bloom-profiled NON-key column prunes files through the rule") {
    import graft.ops.TxTable
    val table = java.nio.file.Files
      .createTempDirectory("graft_txsqlb_").toString + "/t"
    // grp values are commit-localized but unclustered and NOT the bucket
    // key: only the bloom sidecar can prune this lookup
    def batch(r: Range) = scala.util.Random.shuffle(
      r.map(i => (s"k$i", s"G$i"))).toDF("k", "grp")
    TxTable.init(spark, table, batch(1 to 200), "k", nBuckets = 4)
    TxTable.appendOnce(spark, table, batch(201 to 400), "k", 4, "sb", 0L)
    TxTable.computeBloom(spark, table, "grp")
    TxTable.registerView(spark, table, "tx_bloomed")
    val all = TxTable.snapshot(spark, table).entries.size
    val q = spark.sql("SELECT k FROM tx_bloomed WHERE grp = 'G250'")
    assert(q.as[String].collect().toSeq == Seq("k250"))
    val opened = q.queryExecution.executedPlan.collectLeaves().flatMap {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.toSeq
      case _ => Nil
    }
    assert(opened.size <= all / 2,
      s"bloom must prune the first commit's files: ${opened.size} of $all")
  }

  test("native kernels compose with views in one SQL statement") {
    Tables.registerAll(spark, dir)
    val got = spark.sql(
      """SELECT vec_id, srp_signature(embedding, 64, 42) AS sig,
        |  cosine_sim(embedding, embedding) AS self_sim
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 5)
    got.foreach { case (_, _, s) => assert(math.abs(s - 1.0) < 1e-9) }
  }
}
