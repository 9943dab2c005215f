package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the operator behind leakage-free feature
  * attribution: for each left row, attach the single right row with the
  * greatest `rightTime <= leftTime` for the same key (or NULLs when no
  * right row precedes it).
  *
  * Spark has no native as-of join, and the naive encoding
  * (`left.join(right, key && l.t >= r.t)` then keep the max `r.t` per left
  * row) materializes EVERY preceding right row per left row before pruning
  * — quadratic in events-per-key, the classic range-join blowup that melts
  * at scale. This implementation is the linear formulation: tag and union
  * both sides, one window pass ordered by (time, side) carrying the latest
  * right payload forward, keep the left rows. One shuffle on the key, no
  * intermediate pair explosion, spill-safe (window state is a single
  * struct, not a buffer of rows).
  *
  * Tie rule: a right row at exactly `leftTime` matches (inclusive), same
  * as SQL `ASOF JOIN ... ON l.t >= r.t`. Rows with equal (key, time) on
  * the right are an arbitrary-winner tie — deduplicate the right side
  * first if that matters for determinism.
  */
object AsOfOps {

  /** @param keys      equi-join key columns (present on both sides)
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @return all left columns plus right's non-key columns (which must not
    *         collide with left's — rename before joining)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    require(rPayload.intersect(lCols).isEmpty,
      s"right payload columns ${rPayload.intersect(lCols)} collide with left")
    val reserved = Seq("__t", "__s", "__r", "__m")
    val clashes = (lCols ++ right.columns).distinct.filter(reserved.contains)
    require(clashes.isEmpty,
      s"input columns $clashes collide with reserved as-of temp names $reserved")

    // __s orders a right row before a left row at the same timestamp so
    // the inclusive (>=) tie rule holds; __r packs the whole right payload
    // so the window carries one nullable struct, not per-column state.
    // NULL right times never match (standard ASOF semantics) — without the
    // filter they'd sort first (ascending nulls-first) and their payload
    // would be carried to left rows with no real preceding right row.
    val rNorm = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__s"),
        struct(rPayload.map(col): _*).as("__r")): _*)
    val lNorm = left
      .withColumn("__t", col(leftTime)).withColumn("__s", lit(1))
    val unioned = lNorm.unionByName(rNorm, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__s") === 1)
      .select(lCols.map(col) ++
        rPayload.map(c => col("__m").getField(c).as(c)): _*)
  }
}
