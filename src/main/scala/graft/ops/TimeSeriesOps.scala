package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rolling event-time window features — the churn-model inputs the
  * reference's static per-customer aggregates cannot express (spend
  * momentum, recent-activity intensity): per key, aggregates over a
  * trailing wall-clock range ending at each event.
  *
  * Scale shape: one shuffle on the key, then a RANGE frame over the
  * sorted run — Spark's window executor keeps a sliding accumulator over
  * the frame bounds (rows enter/leave as the range slides), never a
  * buffered pair explosion, so memory is O(max events per frame), not
  * O(events²). Frame arithmetic is integer microseconds (`unix_micros`),
  * exact on any engine; money sums go through DECIMAL like every other
  * hash-compared aggregate.
  */
object TimeSeriesOps {

  /** Per event: trailing `windowDays` spend and event count for the same
    * key, inclusive of the current event. Ties on (key, time) are RANGE
    * peers — every co-timestamped event sees the same frame. */
  def rollingByTime(df: DataFrame, key: String, ts: String, value: String,
                    windowDays: Int): DataFrame = {
    require(windowDays > 0)
    val micros = windowDays.toLong * 24L * 3600L * 1000000L
    val w = Window.partitionBy(col(key))
      .orderBy(unix_micros(col(ts)))
      .rangeBetween(-micros, 0)
    df.withColumn(s"spend_${windowDays}d",
        sum(col(value).cast(DecimalType(18, 2))).over(w).cast("double"))
      .withColumn(s"n_${windowDays}d", count(lit(1)).over(w))
  }
}
