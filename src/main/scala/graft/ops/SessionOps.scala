package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sessionization over the events stream (SURVEY §2.11 extension): the
  * batch gap-based variant; the streaming `session_window` variant lives in
  * graft.stream.Pipelines.
  *
  * Shape: one shuffle on user_id (the window partition), then per-user
  * sorted scan — lag → gap flag → running sum — all within the partition.
  * Skewed power-users are the scale risk; AQE skew handling plus a bounded
  * per-user event cap are the production mitigations.
  */
object SessionOps {

  /** Assign session ids: a new session starts when the gap since the
    * previous event of the same user exceeds `gapMinutes`. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L,
          1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }

  /** Per-session rollup: bounds, event count, exact value total. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("session_value"))
}
