package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * `events.ts` has shipped in two shapes across testdata generations:
  * parquet TIMESTAMP(NANOS) — which Spark's reader rejects by default
  * (PARQUET_TYPE_ILLEGAL), so we read it as a long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds
  * with integral division (`ts div 1000`; epoch-nanos ~1.7e18 exceed a
  * double's 2^53 mantissa, so a floating-point divide would corrupt
  * timestamps) — and plain TIMESTAMP(MICROS), which loads directly as a
  * timestamp (possibly NTZ when the file is not UTC-adjusted). Both shapes
  * normalize to the session-zone TimestampType; sessions run UTC, so the
  * naive value IS the instant and DuckDB's view of the same file agrees.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else df
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
