package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold layer: batch feature engineering (`Gold1.py:17-106`).
  *
  * Differences from the reference, by design:
  *   - `now` is an injected Column (default `current_timestamp()`): the
  *     reference's wall-clock `datediff(current_timestamp(), …)`
  *     (`Gold1.py:62,100`) is non-deterministic, which breaks both the
  *     DuckDB-oracle gate and any reproducible test (SURVEY §7.4).
  *   - money sums go through DECIMAL(18,2): transaction values are 2-dp
  *     money (`Bronze1.py:30`), so the decimal sum is semantically identical
  *     to the reference's double sum but is exact and order-independent —
  *     on a 1000-executor cluster a double sum's value depends on partial
  *     aggregation order; a decimal sum does not.
  *   - `avg(resolution_time)` is an explicit `cast("double")` of the string
  *     column rather than Spark's implicit string→double coercion
  *     (SURVEY §2.10.3) — same nulls, oracle-expressible.
  *
  * Every aggregation is a `groupBy(customer_id)` hash-aggregate: Spark plans
  * partial (map-side) + final aggregation, so the shuffle carries one row
  * per customer per task, not raw events — the property that makes these
  * features scale linearly at 100 TB. The join chain's right sides are
  * post-aggregation (≤ one row per customer) and marked broadcast-able.
  */
object GoldOps {

  /** Sum a 2-dp money column exactly, returning double. */
  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** A1 (`Gold1.py:61-67`): per-customer login gap + session total. */
  def appFeatures(appUsage: DataFrame, now: Column = current_timestamp()): DataFrame =
    appUsage
      .withColumn("days_since_last_login", datediff(now, col("last_login")))
      .groupBy("customer_id")
      .agg(
        max(col("days_since_last_login")).as("login_gap_days"),
        sum(col("sessions_last_30d")).as("total_sessions_last_30d"))

  /** A2 (`Gold1.py:70-76`): declined-payment totals. The reference's
    * producer never emits `payment_decline` (SURVEY §2.10.2) so this is
    * empty there; the filter is the semantic, the event_type is a knob. */
  def paymentDeclines(transactions: DataFrame,
                      declineType: String = "payment_decline"): DataFrame =
    transactions
      .filter(col("event_type") === declineType)
      .groupBy("customer_id")
      .agg(
        moneySum(col("value")).as("total_declined_payments"),
        (moneySum(col("value")) / count(col("value"))).as("avg_payment_value"))

  /** Round-half-up to 2 dp via floor — bit-identical across engines.
    * Spark's `round()` rounds the double's shortest decimal representation
    * (152.60499999… prints as "152.605" → 152.61) while DuckDB rounds the
    * binary value (→ 152.60); this formulation is pure double arithmetic,
    * so both engines compute the same bits. Equivalent to the reference's
    * `round(x, 2)` (`Gold1.py:83`) for the positive values ARPU takes. */
  private def round2(c: Column): Column =
    floor(c * 100 + 0.5).cast("double") / 100.0

  /** A3 + J1 (`Gold1.py:79-83`): revenue and ARPU. `+ 1` is the reference's
    * div-by-zero guard. Right side of the join is post-aggregation. */
  def revenueArpu(transactions: DataFrame, appFeats: DataFrame): DataFrame =
    transactions
      .groupBy("customer_id")
      .agg(moneySum(col("value")).as("total_revenue"))
      .join(appFeats, Seq("customer_id"), "left")
      .withColumn("arpu",
        round2(col("total_revenue") / (col("total_sessions_last_30d") + lit(1))))

  /** X6 (`Gold1.py:87`): pseudo-sentiment from murmur3 of the issue text,
    * ∈ {0.0, 0.1, …, 0.9}. Spark-specific hash — queries that need a DuckDB
    * oracle pass a portable expression instead. */
  def murmurSentiment(issue: Column): Column =
    (abs(hash(issue)) % 10) / 10.0

  /** A4 (`Gold1.py:86-92`): support features. */
  def supportFeatures(tickets: DataFrame,
                      sentiment: Column => Column = murmurSentiment): DataFrame =
    tickets
      .withColumn("ticket_sentiment_score", sentiment(col("issue")))
      .groupBy("customer_id")
      .agg(
        avg(col("resolution_time").cast("double")).as("avg_resolution_time"),
        avg(col("ticket_sentiment_score")).as("avg_ticket_sentiment"))

  /** A1–A4 fused into ONE pass when every feature family derives from the
    * same unified event stream (as in the testdata mapping, and as in any
    * deployment where the four Kafka topics land in one activity table).
    *
    * The reference computes four separate `groupBy(customer_id)` tables and
    * left-joins them (`Gold1.py:61-99`) — four scans and four shuffles of
    * the same data. At 100 TB that is the dominant cost, and conditional
    * aggregation removes it: one scan, one partial+final hash-aggregate,
    * one shuffle keyed by customer. Output is row-identical to composing
    * `appFeatures`/`paymentDeclines`/`revenueArpu`/`supportFeatures`
    * (pinned by GoldOpsSpec): a `FILTER`ed aggregate over the union stream
    * equals an aggregate over the filtered branch, and all-null groups
    * yield the same NULLs a left join would.
    *
    * Input contract — one row per event, feature columns null outside
    * their family:
    *   - `customer_id`
    *   - `session_login` timestamp, non-null on session rows only
    *   - `sessions` int, non-null on session rows only
    *   - `decline_value` 2-dp money, non-null on decline rows only
    *   - `revenue_value` 2-dp money, every transaction row
    *   - `ticket_resolution`/`ticket_sentiment` double, ticket rows only
    */
  def fusedFeatures(activity: DataFrame,
                    now: Column = current_timestamp()): DataFrame =
    activity
      .groupBy("customer_id")
      .agg(
        max(datediff(now, col("session_login"))).as("login_gap_days"),
        sum(col("sessions")).as("total_sessions_last_30d"),
        moneySum(col("decline_value")).as("total_declined_payments"),
        (moneySum(col("decline_value")) / count(col("decline_value")))
          .as("avg_payment_value"),
        moneySum(col("revenue_value")).as("total_revenue"),
        avg(col("ticket_resolution")).as("avg_resolution_time"),
        avg(col("ticket_sentiment")).as("avg_ticket_sentiment"))
      .withColumn("arpu",
        round2(col("total_revenue") / (col("total_sessions_last_30d") + lit(1))))

  /** The reference's exact 14-column output schema (`Gold1.py:101-106`):
    * name AND position fidelity, so a reference consumer can switch without
    * re-mapping columns. */
  private val GoldSchema = Seq(
    "customer_id", "name", "email", "age", "gender", "signup_date",
    "signup_days_ago", "login_gap_days", "total_sessions_last_30d",
    "total_declined_payments", "avg_payment_value", "arpu",
    "avg_resolution_time", "avg_ticket_sentiment")

  /** The 14-column enrichment over the fused feature table: a single
    * broadcast-able left join instead of the reference's four. */
  def enrichOnePass(customers: DataFrame, fused: DataFrame,
                    now: Column = current_timestamp()): DataFrame =
    customers
      .join(fused, Seq("customer_id"), "left")
      .withColumn("signup_days_ago", datediff(now, col("signup_date")))
      .select(GoldSchema.head, GoldSchema.tail: _*)

  /** J2–J5 + P7 (`Gold1.py:95-106`): the 14-column enrichment.
    *
    * Left-join multiplicity is preserved: the left input's customer_id is
    * not distinct in the reference (multiple profile events per customer),
    * and each matching left row duplicates the feature columns — pinned by
    * GoldOpsSpec. All four right sides are one-row-per-customer aggregates,
    * so Spark's planner picks broadcast-hash joins when they fit (AQE
    * handles the rest at runtime); no shuffle of the big left side happens
    * more than once. */
  def enrich(customers: DataFrame, appFeats: DataFrame, declines: DataFrame,
             arpu: DataFrame, support: DataFrame,
             now: Column = current_timestamp()): DataFrame =
    customers
      .join(appFeats, Seq("customer_id"), "left")
      .join(declines, Seq("customer_id"), "left")
      .join(arpu.select("customer_id", "arpu"), Seq("customer_id"), "left")
      .join(support, Seq("customer_id"), "left")
      .withColumn("signup_days_ago", datediff(now, col("signup_date")))
      .select(GoldSchema.head, GoldSchema.tail: _*)
}
