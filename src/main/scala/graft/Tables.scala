package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's reader
  * rejects by default (PARQUET_TYPE_ILLEGAL). We read it as a long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to a microsecond
  * timestamp — the same ns→µs truncation DuckDB applies when casting
  * TIMESTAMP_NS to TIMESTAMP, so oracle comparisons agree. `ts div 1000` is
  * integral division: epoch-nanos (~1.7e18) exceed a double's 2^53 mantissa,
  * so a floating-point divide would corrupt timestamps.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Every testdata table name under a scale-factor directory. */
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so a pure-SQL session (the
    * `spark.sql(...)` user, plus the kernels GraftExtensions injects) can
    * drive the engine without touching the DataFrame API. Temp views are
    * lazy — registration reads no data. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
