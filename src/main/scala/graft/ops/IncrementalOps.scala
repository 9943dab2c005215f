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
  * bit (same rule as SparkEntry.moneySum).
  *
  * Exactly-once: every state commit stamps `(appId, folded source
  * version)` into the state table's own txn header, so the cursor needs
  * no side store — [[resume]] recovers it from the state log, and a
  * replayed `advance` (crash between commit and the caller noting it, or
  * a plain double-call) detects the already-folded watermark and skips.
  * Even two maintainers racing the SAME delta are safe: the state upsert
  * carries the watermark as an idempotence token, so the loser's retry
  * sees the winner's txn in the log and aborts instead of re-applying
  * (spec-pinned). */
object IncrementalOps {

  /** Default txn app id for a state table's maintenance log. */
  def appIdFor(state: String): String = s"graft-incr:$state"

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
    * the cursor (source version) the state now reflects. The cursor is
    * also stamped into the state's txn log, so it never needs persisting
    * elsewhere. */
  def initState(spark: SparkSession, source: String, state: String,
                key: String, valueCols: Seq[String], nBuckets: Int): Long = {
    val snap = TxTable.snapshot(spark, source)
    val base = aggOf(TxTable.read(spark, source), key, valueCols)
      .withColumn("state_version", lit(snap.version))
    TxTable.init(spark, state, base, key, nBuckets,
      txn = Some((appIdFor(state), snap.version)))
    snap.version
  }

  /** The source version the state last folded, recovered from the state
    * table's own txn log — the crash-safe replacement for a caller-held
    * cursor. */
  def resume(spark: SparkSession, state: String): Option[Long] =
    TxTable.lastCommittedBatch(spark, state, appIdFor(state))

  /** Fold every source commit after `cursor` into the state; returns the
    * new cursor. No-op when nothing landed. A stale `cursor` (replay
    * after a crash, or a plain double-call) cannot double-count: the fold
    * always starts from the LATER of the caller's cursor and the state
    * log's own stamped watermark. */
  def advance(spark: SparkSession, source: String, state: String,
              key: String, valueCols: Seq[String], cursor: Long,
              nBuckets: Int): Long = {
    val from = math.max(cursor, resume(spark, state).getOrElse(cursor))
    val (delta, hw) = TxTable.changesSince(spark, source, from)
    if (hw == from) return from
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
    TxTable.upsert(spark, state, merged, key, "state_version", nBuckets,
      txn = Some((appIdFor(state), hw)))
    hw
  }

  // --- incremental DISTINCT counts (mergeable sketch state) -------------
  //
  // count-distinct is the aggregate that breaks the fold above: it is not
  // associative over raw counts (|A ∪ B| ≠ |A| + |B|). The scalable fix is
  // to keep the aggregate in a MERGEABLE sketch domain: per-key HLL
  // sketches (Spark's DataSketches hll_* family) stored as a binary state
  // column, where union (register max) IS associative — so the same
  // O(delta + touched buckets) maintenance applies to distinct users per
  // segment. Estimates are approximate (~1% at the default lgConfigK) but
  // deterministic: same rows → same sketch bytes → same estimate, and a
  // union of per-batch sketches estimates the same set as one pass
  // (spec-pinned within tolerance; exactly-once via the same watermark
  // txn stamps as advance()).

  private def sketchAggOf(rows: DataFrame, key: String,
                          distinctCol: String): DataFrame =
    rows.groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(col(distinctCol)).as("hll"))

  /** Build the distinct-count state (key, n_rows, hll sketch) from the
    * source's current snapshot; cursor semantics identical to
    * [[initState]]. */
  def initDistinctState(spark: SparkSession, source: String, state: String,
                        key: String, distinctCol: String,
                        nBuckets: Int): Long = {
    val snap = TxTable.snapshot(spark, source)
    val base = sketchAggOf(TxTable.read(spark, source), key, distinctCol)
      .withColumn("state_version", lit(snap.version))
    TxTable.init(spark, state, base, key, nBuckets,
      txn = Some((appIdFor(state), snap.version)))
    snap.version
  }

  /** Fold source commits after `cursor` into the sketch state — the
    * [[advance]] shape with hll_union_agg as the merge. Replay-safe via
    * the same stamped-watermark contract. */
  def advanceDistinct(spark: SparkSession, source: String, state: String,
                      key: String, distinctCol: String, cursor: Long,
                      nBuckets: Int): Long = {
    val from = math.max(cursor, resume(spark, state).getOrElse(cursor))
    val (delta, hw) = TxTable.changesSince(spark, source, from)
    if (hw == from) return from
    val dAgg = sketchAggOf(delta, key, distinctCol)
    if (dAgg.isEmpty) return hw
    val touched: Set[Int] = dAgg
      .select(LayoutOps.bucketId(col(key), nBuckets)).distinct()
      .collect().map(_.getInt(0)).toSet
    val snap = TxTable.snapshot(spark, state)
    val touchedEntries = snap.entries.filter(e => touched(e.bucket))
    val outCols = Seq(col(key), col("n_rows"), col("hll"))
    val stateRows =
      if (touchedEntries.isEmpty) dAgg.select(outCols: _*).filter(lit(false))
      else snap.schema.fold(spark.read)(spark.read.schema)
        .parquet(touchedEntries.map(e => s"$state/${e.rel}"): _*)
        .select(outCols: _*)
    val merged = stateRows.unionByName(dAgg.select(outCols: _*))
      .groupBy(col(key))
      .agg(sum(col("n_rows")).as("n_rows"),
        hll_union_agg(col("hll")).as("hll"))
      .withColumn("state_version", lit(hw))
    TxTable.upsert(spark, state, merged, key, "state_version", nBuckets,
      txn = Some((appIdFor(state), hw)))
    hw
  }

  /** Read the sketch state as estimates: (key, n_rows, approx_distinct).
    * The sketch never leaves the state table; consumers get numbers. */
  def distinctEstimates(spark: SparkSession, state: String,
                        key: String): DataFrame =
    TxTable.read(spark, state)
      .select(col(key), col("n_rows"),
        hll_sketch_estimate(col("hll")).as("approx_distinct"))
}
