package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the other join Spark lacks natively (alongside
  * as-of, see AsOfOps): match each left row's point timestamp to the right
  * rows whose [start, end] interval contains it.
  *
  * Spark plans the direct encoding (`l.join(r, key && pt.between(s, e))`)
  * as a broadcast-nested-loop over the non-equi conjunct — every left row
  * probes every right interval of its key, O(n·m) per key and a driver OOM
  * once neither side broadcasts. The standard fix is temporal binning:
  * quantize time into fixed-width bins, emit one row per bin an interval
  * overlaps, and equi-join on (key, bin) before the exact containment
  * filter. The join becomes a hash join whose fan-out is bounded by
  * intervals-per-bin, both sides shuffle-partition cleanly, and each
  * (left, right) pair meets exactly once because a point lives in exactly
  * one bin — no post-join dedup.
  *
  * `binSeconds` trades fan-out for bucket size: it should be on the order
  * of the typical interval length (an interval spanning k bins is
  * replicated k+1 times).
  */
object RangeJoinOps {

  /** @param keys       equi key columns present on both sides
    * @param pt         left timestamp column (point)
    * @param start, end right timestamp columns (inclusive interval bounds)
    * @return left columns + right's non-key columns for each containment
    *         match (inner join: non-matching left rows drop)
    */
  def pointInIntervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                          pt: String, start: String, end: String,
                          binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    require(rPayload.intersect(lCols).isEmpty,
      s"right payload columns ${rPayload.intersect(lCols)} collide with left")

    def bin(c: String) = floor(unix_timestamp(col(c)) / binSeconds)
    val lBinned = left.withColumn("__bin", bin(pt))
    // drop inverted (end < start) and null-bounded intervals explicitly:
    // they can never contain a point, and an inverted pair would otherwise
    // make `sequence` emit a DESCENDING bin list (default step -1) — junk
    // candidate fan-out that only the containment filter saves.
    val rBinned = right.filter(col(start) <= col(end)).withColumn("__bin",
      explode(sequence(bin(start), bin(end))))
    lBinned.join(rBinned, keys :+ "__bin")
      .filter(col(pt).between(col(start), col(end)))
      .select((lCols ++ rPayload).map(col): _*)
  }
}
