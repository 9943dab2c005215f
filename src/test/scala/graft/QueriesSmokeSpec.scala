package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: every declared query runs on sf0.001 and returns
  * rows (t1 analog); oracle keys are a subset of query keys. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  /** Queries legitimately empty on this fixture. */
  private val mayBeEmpty = Set("customers_without_orders")

  test("oracleSql keys ⊆ queries keys; column names match between both") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      // release frames a query persisted internally (same per-query hygiene
      // as Verify/Bench) so caches never accumulate across the suite
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
  }
}
