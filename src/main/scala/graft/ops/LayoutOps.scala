package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scale (SURVEY §4 posture): partitioning for
  * pruning, bucketing for shuffle-free joins, compaction for the
  * small-files problem streaming sinks create.
  *
  * At 100 TB these three decide query cost more than any operator tweak:
  * a date-partitioned table turns a time-range scan into a directory
  * listing; two tables bucketed on the join key turn a sort-merge join's
  * two shuffles into zero; and compaction keeps file counts (and thus task
  * counts and parquet footer overhead) bounded as micro-batches accumulate.
  */
object LayoutOps {

  /** Write `df` date-partitioned by the day of `tsCol` — the layout that
    * makes the Gold incremental cutoff (`Gold1.py:20-27`'s commented
    * intent) a partition-pruned scan instead of a full read. Append for
    * streaming-style landing; Overwrite for an idempotent staging refresh. */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String,
                           mode: SaveMode = SaveMode.Append): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.partitionBy("p_date").mode(mode).parquet(path)

  /** Read back with a day filter the scan can prune on. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("p_date") === lit(day).cast("date"))

  /** Read every partition at-or-after `day` — the incremental-refresh scan.
    * The predicate is on the partition column only, so it resolves at file
    * listing time (`PartitionFilters` in the scan; pinned in
    * PlanAssertionsSpec): at 100 TB the refresh reads the cutoff window's
    * directories and nothing else. */
  def readSince(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("p_date") >= lit(day).cast("date"))

  /** Save as a bucketed+sorted table: equi-joins and aggregations on `key`
    * between tables bucketed the same way need no exchange at all. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)

  /** MERGE-analog upsert: apply a batch of keyed changes (e.g. a CDC
    * micro-batch — the Debezium topic shape bronze already parses) onto a
    * parquet table, keeping the latest row per key by `orderCol`.
    *
    * Plan shape: current ∪ updates → one shuffle on the key → per-key
    * `row_number = 1` (bounded window state, no full sort), rewritten via
    * the same rename-aside swap as `compact`. A table format (Delta/
    * Iceberg) would do this as a transactional MERGE with file-level
    * pruning; the semantics — last-writer-wins per key — are identical,
    * so the format string can swap in without touching callers.
    *
    * Updates with a key absent from the table insert; ties on
    * (key, orderCol) prefer the update (updates win over current state).
    * Returns the post-upsert row count. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             key: String, orderCol: String): Long = {
    val current = spark.read.parquet(path)
    require(current.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: table ${current.columns.toSeq} vs updates ${updates.columns.toSeq}")
    val cols = current.columns.toSeq
    val tagged = current.select(cols.map(col): _*).withColumn("__src", lit(0))
      .unionByName(updates.select(cols.map(col): _*).withColumn("__src", lit(1)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col(orderCol).desc, col("__src").desc)
    val merged = tagged
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1)
      .select(cols.map(col): _*)
    val tmp = path + "__upserting"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val rows = spark.read.parquet(tmp).count()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val t = new org.apache.hadoop.fs.Path(tmp)
    val aside = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(aside, true)
    fs.rename(p, aside)
    fs.rename(t, p)
    fs.delete(aside, true)
    rows
  }

  /** Rewrite a parquet directory into `target` files — run periodically
    * behind streaming sinks whose micro-batches leave file confetti. */
  def compact(spark: SparkSession, path: String, target: Int): Long = {
    val df = spark.read.parquet(path)
    val tmp = path + "__compacting"
    df.repartition(target).write.mode(SaveMode.Overwrite).parquet(tmp)
    val rows = spark.read.parquet(tmp).count()
    // swap via rename-aside ordering: old aside → new in → delete aside.
    // A crash between any two steps leaves BOTH copies on disk (recoverable
    // by hand) — unlike delete-then-rename, which has a window where the
    // table is gone. True atomicity needs a table format's commit protocol;
    // this is the strongest ordering a plain filesystem offers.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val t = new org.apache.hadoop.fs.Path(tmp)
    val aside = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(aside, true) // stale leftover from a previous crash
    fs.rename(p, aside)
    fs.rename(t, p)
    fs.delete(aside, true)
    rows
  }
}
