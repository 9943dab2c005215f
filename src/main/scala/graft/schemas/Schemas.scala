package graft.schemas

import org.apache.spark.sql.types._

/** Explicit schemas for the four churn-domain entities.
  *
  * The reference declares every schema explicitly and parses Kafka JSON with
  * `from_json` — no inference anywhere (reference `Bronze1.py:97-128`,
  * `Silver1.py:24-113`). Malformed / missing fields become null, which the
  * Silver cleansing predicates then reject. We keep that discipline: one
  * shared `StructType` constant per entity per layer, plus case classes for
  * typed `Dataset` use in tests.
  */
object Schemas {

  // --- bronze (as parsed off the wire, reference Bronze1.py:97-128) ---

  /** customer_profile: reference `Bronze1.py:97-105`. */
  val customerProfileBronze: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("gender", StringType),
    StructField("age", IntegerType),
    StructField("signup_date", StringType),
    StructField("event_time", TimestampType)
  ))

  /** app_usage: reference `Bronze1.py:106-110`; silver adds event_time
    * (`Silver1.py:55-60`, quirk SURVEY §2.10.4 — producer never sends it). */
  val appUsageBronze: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("last_login", StringType),
    StructField("sessions_last_30d", IntegerType)
  ))

  val appUsageSilver: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("last_login", TimestampType),
    StructField("sessions_last_30d", IntegerType),
    StructField("event_time", TimestampType)
  ))

  /** churn_transactions: reference `Bronze1.py:111-116` (timestamp as
    * string); silver parses it to TimestampType (`Silver1.py:79-84`). */
  val transactionsBronze: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("event_type", StringType),
    StructField("timestamp", StringType),
    StructField("value", DoubleType)
  ))

  val transactionsSilver: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("event_type", StringType),
    StructField("timestamp", TimestampType),
    StructField("value", DoubleType)
  ))

  /** customer_profile, Debezium-CDC variant: keeps tenure/location, drops
    * name/email (`DezbeiumPostgresCDC/Bronze.py:51-57`, SURVEY §2.10.6). */
  val customerProfileCdc: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("age", IntegerType),
    StructField("gender", StringType),
    StructField("tenure", IntegerType),
    StructField("location", StringType)
  ))

  /** support_tickets: reference `Bronze1.py:118-128` == `Silver1.py:103-113`. */
  val supportTickets: StructType = StructType(Seq(
    StructField("ticket_id", StringType),
    StructField("customer_id", StringType),
    StructField("issue", StringType),
    StructField("priority", StringType),
    StructField("status", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("assigned_to", StringType),
    StructField("resolution_time", StringType)
  ))

  // --- typed rows for Dataset-based tests / generators ---

  final case class CustomerProfile(
      customer_id: String, name: String, email: String, gender: String,
      age: java.lang.Integer, signup_date: String,
      event_time: java.sql.Timestamp)

  final case class AppUsage(
      customer_id: String, last_login: java.sql.Timestamp,
      sessions_last_30d: java.lang.Integer, event_time: java.sql.Timestamp)

  final case class Transaction(
      customer_id: String, event_type: String,
      timestamp: java.sql.Timestamp, value: java.lang.Double)

  final case class SupportTicket(
      ticket_id: String, customer_id: String, issue: String, priority: String,
      status: String, created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp, assigned_to: String,
      resolution_time: String)
}
