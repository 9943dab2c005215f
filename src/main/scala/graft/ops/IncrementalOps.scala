package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance over a TxTable change
  * feed — the "gold table that never rescans bronze" shape. The reference
  * recomputes its gold aggregates from the full silver table every run
  * (`Gold1.py` re-reads and re-groups everything); at 100 TB that is a full
  * shuffle of history per refresh. Counts and sums are associative, so the
  * refresh can instead fold ONLY the rows landed since the last cursor into
  * the previous state:
  *
  *   state'(k) = state(k) ⊕ agg(delta rows with key k)
  *
  * Both sides are TxTables: the source feeds [[TxTable.changesSince]]
  * (I/O ∝ files added since the cursor) and the state absorbs the fold via
  * [[TxTable.upsert]] (I/O ∝ touched key buckets). A refresh therefore
  * costs O(delta + touched buckets), independent of table size.
  *
  * Contract: the source must be APPEND-ONLY between cursors (the streaming
  * ingest shape — [[TxTable.appendOnce]]); an upsert commit surfaces
  * post-merge bucket state in the feed, which would double-count here.
  * Sums run in DECIMAL(18,2) so partial-aggregation order cannot change a
  * bit (same rule as SparkEntry.moneySum). Cursor persistence is the
  * caller's (same contract as changesSince); re-running `advance` with an
  * already-consumed cursor re-folds those rows, so callers that need
  * exactly-once across crashes should stamp the cursor transactionally
  * with their own commit. */
object IncrementalOps {

  // Spark widens sum(DECIMAL(18,2)) to DECIMAL(28,2); cast back so the
  // state schema is stable across refreshes (schema enforcement would
  // otherwise reject the second advance)
  private def sumCol(c: String) =
    sum(col(c).cast("decimal(18,2)")).cast("decimal(18,2)").as(s"sum_$c")

  private def aggOf(rows: DataFrame, key: String,
                    valueCols: Seq[String]): DataFrame =
    rows.groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"), valueCols.map(sumCol): _*)

  /** Build the state table from the source's CURRENT snapshot and return
    * the cursor (source version) the state now reflects. */
  def initState(spark: SparkSession, source: String, state: String,
                key: String, valueCols: Seq[String], nBuckets: Int): Long = {
    val snap = TxTable.snapshot(spark, source)
    val base = aggOf(TxTable.read(spark, source), key, valueCols)
      .withColumn("state_version", lit(snap.version))
    TxTable.init(spark, state, base, key, nBuckets)
    snap.version
  }

  /** Fold every source commit after `cursor` into the state; returns the
    * new cursor. No-op (returns `cursor`) when nothing landed. */
  def advance(spark: SparkSession, source: String, state: String,
              key: String, valueCols: Seq[String], cursor: Long,
              nBuckets: Int): Long = {
    val (delta, hw) = TxTable.changesSince(spark, source, cursor)
    if (hw == cursor) return cursor
    val dAgg = aggOf(delta, key, valueCols)
    if (dAgg.isEmpty) return hw
    // current state of ONLY the touched buckets (manifest-pruned read);
    // union + re-aggregate folds old state and delta in one associative agg
    val touched: Set[Int] = dAgg
      .select(LayoutOps.bucketId(col(key), nBuckets)).distinct()
      .collect().map(_.getInt(0)).toSet // bounded by nBuckets
    val snap = TxTable.snapshot(spark, state)
    val touchedEntries = snap.entries.filter(e => touched(e.bucket))
    val outCols = Seq(col(key), col("n_rows")) ++
      valueCols.map(c => col(s"sum_$c"))
    val stateRows =
      if (touchedEntries.isEmpty) dAgg.select(outCols: _*).filter(lit(false))
      else snap.schema.fold(spark.read)(spark.read.schema)
        .parquet(touchedEntries.map(e => s"$state/${e.rel}"): _*)
        .select(outCols: _*)
    val merged = stateRows.unionByName(dAgg.select(outCols: _*))
      .groupBy(col(key))
      .agg(sum(col("n_rows")).as("n_rows"),
        valueCols.map(c =>
          sum(col(s"sum_$c")).cast("decimal(18,2)").as(s"sum_$c")): _*)
      .withColumn("state_version", lit(hw))
    TxTable.upsert(spark, state, merged, key, "state_version", nBuckets)
    hw
  }
}
