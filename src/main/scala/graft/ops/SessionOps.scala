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

  /** Ordered-funnel analysis: the furthest stage of `stages` each user
    * reached, where stage i+1 must happen STRICTLY AFTER the event that
    * completed stage i (the standard product-analytics funnel, equivalent
    * to the chained-min definition: t1 = min ts of stage 1, t2 = min ts of
    * stage 2 with ts > t1, ...).
    *
    * ONE shuffle (groupBy user), then a row-local state machine over the
    * user's time-sorted events — per-user cost is linear in their event
    * count, no self-joins, no per-stage rescans (the k-join formulation
    * re-shuffles the events table once per stage; this shape is why
    * funnels stay cheap at 100 TB). Ties: events sort by (ts, type), and
    * a transition requires ts strictly greater than the previous stage's
    * ts — bit-identical to the chained-min semantics any SQL engine
    * reproduces. */
  def funnelStages(events: DataFrame,
                   stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"funnel stages must be non-empty and distinct, got $stages")
    val perUser = events
      .select(col("user_id"), col("ts"), col("event_type"))
      .groupBy("user_id")
      .agg(array_sort(collect_list(
        struct(col("ts"), col("event_type").as("et")))).as("evs"))
    val init = struct(lit(0).as("stage"),
      lit(null).cast("timestamp").as("t"))
    val step = (acc: org.apache.spark.sql.Column,
                e: org.apache.spark.sql.Column) => {
      val hit = stages.zipWithIndex.foldRight(acc) { case ((st, i), els) =>
        val cond =
          if (i == 0) acc("stage") === 0 && e("et") === st
          else acc("stage") === i && e("et") === st && e("ts") > acc("t")
        when(cond, struct(lit(i + 1).as("stage"), e("ts").as("t")))
          .otherwise(els)
      }
      hit
    }
    perUser.select(col("user_id"),
      aggregate(col("evs"), init, step, a => a("stage"))
        .as("funnel_stage"))
  }

  /** Weekly cohort-retention triangle: users grouped by first-activity
    * week (vs the fixed `anchor` date), counted in each later week they
    * were active. Output: (cohort_week, week_offset, n_users).
    *
    * Shape: one distinct over (user, week) — the only corpus-sized
    * shuffle — then a user-keyed min + equi-join co-partitioned with it,
    * and a final rollup over the tiny (cohorts × offsets) grid. */
  def cohortRetention(events: DataFrame,
                      anchor: String): DataFrame = {
    val wk = floor(datediff(col("ts").cast("date"),
      lit(anchor).cast("date")) / 7).cast("int")
    val activity = events.select(col("user_id"), wk.as("week")).distinct()
    val cohort = activity.groupBy("user_id").agg(min("week").as("cohort_week"))
    activity.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order behavior transitions (the Markov edge counts behind
    * next-action models): for each user's time-ordered event sequence,
    * count consecutive (from_type → to_type) pairs. One shuffle (the
    * window partition), deterministic order by (ts, event_id). */
  def eventTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(byUser).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
  }
}
