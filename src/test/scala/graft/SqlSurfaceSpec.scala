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
