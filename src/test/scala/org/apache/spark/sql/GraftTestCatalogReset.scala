package org.apache.spark.sql

/** Test-only bridge to the session's private CatalogManager.reset —
  * specs that re-configure a cached catalog (e.g. a different
  * `warehouse` option per test) need the cache dropped so initialize()
  * reruns with the fresh options. */
object GraftTestCatalogReset {
  def reset(spark: SparkSession): Unit =
    spark.sessionState.catalogManager.reset()
}
