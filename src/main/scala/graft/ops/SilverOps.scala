package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver layer: streaming cleansing, one pure transform per entity.
  *
  * Each function reproduces the reference's cleansing pipeline exactly
  * (predicates, and their order, from `Silver1.py:34-129`). They are batch
  * functions; the streaming assembly wraps them (and adds the watermark the
  * reference is missing — SURVEY §2.8 T3).
  *
  * Dedup note: `dropDuplicates(keys)` keeps an arbitrary row per key
  * (`Silver1.py:41,67,91,120`). Batch-deterministic variants for the oracle
  * gate live in SparkEntry (key-only / aggregated outputs).
  */
object SilverOps {

  /** customer_profile cleanse (`Silver1.py:34-43`):
    * to_date(signup_date) → dropna(customer_id, email) → age > 0 →
    * gender IN (Male, Female, Other) → dedup(customer_id, event_time) →
    * email NOT contains 'test' → name NOT rlike 'test|dummy|xyz'. */
  def cleanCustomer(df: DataFrame): DataFrame =
    df.withColumn("signup_date", to_date(col("signup_date")))
      .na.drop(Seq("customer_id", "email"))
      .filter(col("age") > 0)
      .filter(col("gender").isin("Male", "Female", "Other"))
      .dropDuplicates(Seq("customer_id", "event_time"))
      .filter(!col("email").contains("test"))
      .filter(!col("name").rlike("test|dummy|xyz"))

  /** app_usage cleanse (`Silver1.py:62-67`):
    * dropna(customer_id) → sessions_last_30d >= 0 →
    * dedup(customer_id, event_time). event_time is null when the producer
    * omits it (SURVEY §2.10.4) — nulls compare equal for dedup purposes. */
  def cleanAppUsage(df: DataFrame): DataFrame =
    df.na.drop(Seq("customer_id"))
      .filter(col("sessions_last_30d") >= 0)
      .dropDuplicates(Seq("customer_id", "event_time"))

  /** churn_transactions cleanse (`Silver1.py:86-91`):
    * dropna(customer_id, timestamp) → value > 0 →
    * dedup(customer_id, timestamp). */
  def cleanTransactions(df: DataFrame): DataFrame =
    df.na.drop(Seq("customer_id", "timestamp"))
      .filter(col("value") > 0)
      .dropDuplicates(Seq("customer_id", "timestamp"))

  /** support_tickets cleanse (`Silver1.py:115-120`):
    * dropna(ticket_id, customer_id) →
    * status IN (Open, In Progress, Resolved, Closed) — case-sensitive, the
    * reference's producer emits lowercase 'open' so its silver table is
    * always empty (SURVEY §2.10.1); we keep the operator as written →
    * dedup(ticket_id, updated_at). */
  def cleanSupportTickets(df: DataFrame): DataFrame =
    df.na.drop(Seq("ticket_id", "customer_id"))
      .filter(col("status").isin("Open", "In Progress", "Resolved", "Closed"))
      .dropDuplicates(Seq("ticket_id", "updated_at"))
}
