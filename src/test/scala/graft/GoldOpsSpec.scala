package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GoldOps
import graft.schemas.Schemas._

/** Hand-computed fixtures for the Gold feature aggregations
  * (`Gold1.py:61-106`), including the reference's quirk semantics. */
class GoldOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val now = lit("2024-01-31 00:00:00").cast("timestamp")

  test("appFeatures: login gap is max days-since, sessions sum") {
    val usage = Seq(
      AppUsage("A", ts("2024-01-01 12:00:00"), 5, null),
      AppUsage("A", ts("2024-01-10 08:00:00"), 7, null),
      AppUsage("B", ts("2024-01-30 00:00:00"), 2, null)).toDF()
    val out = GoldOps.appFeatures(usage, now).orderBy("customer_id")
      .as[(String, Int, Long)].collect()
    assert(out.toSeq == Seq(("A", 30, 12L), ("B", 1, 2L)))
  }

  test("paymentDeclines: only the decline type aggregates; empty when absent (quirk 2.10.2)") {
    val txn = Seq(
      Transaction("A", "payment_decline", ts("2024-01-02 00:00:00"), 100.0),
      Transaction("A", "payment_decline", ts("2024-01-03 00:00:00"), 50.0),
      Transaction("A", "purchase", ts("2024-01-04 00:00:00"), 999.0),
      Transaction("B", "purchase", ts("2024-01-04 00:00:00"), 10.0)).toDF()
    val out = GoldOps.paymentDeclines(txn).as[(String, Double, Double)].collect()
    assert(out.toSeq == Seq(("A", 150.0, 75.0)))
    // reference behavior: no declines at all → empty table, joins yield nulls
    assert(GoldOps.paymentDeclines(txn.filter($"event_type" =!= "payment_decline")).count() == 0)
  }

  test("revenueArpu: revenue over all types, arpu = round2(rev / (sessions+1))") {
    val txn = Seq(
      Transaction("A", "purchase", ts("2024-01-02 00:00:00"), 100.0),
      Transaction("A", "refund", ts("2024-01-03 00:00:00"), 80.5)).toDF()
    val app = GoldOps.appFeatures(
      Seq(AppUsage("A", ts("2024-01-10 00:00:00"), 12, null)).toDF(), now)
    val out = GoldOps.revenueArpu(txn, app)
      .select("customer_id", "total_revenue", "arpu")
      .as[(String, Double, Double)].collect()
    assert(out.toSeq == Seq(("A", 180.5, 13.88))) // 180.5 / 13 = 13.8846…
  }

  test("revenueArpu: missing app features → null sessions → null arpu (left join)") {
    val txn = Seq(Transaction("Z", "purchase", ts("2024-01-02 00:00:00"), 42.0)).toDF()
    val app = GoldOps.appFeatures(Seq.empty[AppUsage].toDF(), now)
    val row = GoldOps.revenueArpu(txn, app).select("arpu").collect()(0)
    assert(row.isNullAt(0))
  }

  test("supportFeatures: avg of string resolution_time via cast; null-only → null (quirk 2.10.3)") {
    val tick = Seq(
      SupportTicket("T1", "A", "App crash", "high", "Open",
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "Agent1", "100"),
      SupportTicket("T2", "A", "Login issue", "low", "Open",
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "Agent2", null),
      SupportTicket("T3", "B", "App crash", "low", "Open",
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "Agent3", null)).toDF()
    val out = GoldOps.supportFeatures(tick).orderBy("customer_id").collect()
    assert(out(0).getAs[Double]("avg_resolution_time") == 100.0) // avg ignores null
    assert(out(1).isNullAt(out(1).fieldIndex("avg_resolution_time"))) // all-null → null
    val sent = out(0).getAs[Double]("avg_ticket_sentiment")
    assert(sent >= 0.0 && sent <= 0.9) // murmur3 % 10 / 10 domain
  }

  test("enrich preserves left-join multiplicity and emits the 14 columns") {
    val custs = Seq(
      CustomerProfile("A", "Alice", "a@x.com", "Female", 30, "2024-01-01", ts("2024-01-01 00:00:00")),
      CustomerProfile("A", "Alice", "a@x.com", "Female", 30, "2024-01-01", ts("2024-01-02 00:00:00")),
      CustomerProfile("B", "Bob", "b@x.com", "Male", 40, "2024-01-15", ts("2024-01-03 00:00:00")))
      .toDF().withColumn("signup_date", to_date($"signup_date"))
    val txn = Seq(Transaction("A", "purchase", ts("2024-01-02 00:00:00"), 100.0)).toDF()
    val usage = Seq(AppUsage("A", ts("2024-01-10 00:00:00"), 3, null)).toDF()
    val app = GoldOps.appFeatures(usage, now)
    val out = GoldOps.enrich(custs, app, GoldOps.paymentDeclines(txn),
      GoldOps.revenueArpu(txn, app), GoldOps.supportFeatures(Seq.empty[SupportTicket].toDF()),
      now)
    assert(out.columns.length == 14)
    // the reference's exact schema, names AND positions (Gold1.py:101-106)
    assert(out.columns.toSeq == Seq("customer_id", "name", "email", "age",
      "gender", "signup_date", "signup_days_ago", "login_gap_days",
      "total_sessions_last_30d", "total_declined_payments",
      "avg_payment_value", "arpu", "avg_resolution_time",
      "avg_ticket_sentiment"))
    // two profile rows for A → two enriched rows with identical features
    assert(out.filter($"customer_id" === "A").count() == 2)
    assert(out.filter($"customer_id" === "A").select("arpu").distinct().count() == 1)
    // B: no txns/usage → feature columns null, signup_days_ago = 16
    val b = out.filter($"customer_id" === "B").collect()(0)
    assert(b.isNullAt(b.fieldIndex("arpu")) && b.isNullAt(b.fieldIndex("login_gap_days")))
    assert(b.getAs[Int]("signup_days_ago") == 16)
  }

  test("fused one-pass gold is row-identical to the chained four-table pipeline") {
    val dir = "/root/testdata/sf0.001"
    val chained = SparkEntry.queries("gold_enriched")(spark, dir).collect()
    val fused = SparkEntry.queries("gold_enriched_onepass")(spark, dir).collect()
    assert(chained.length == fused.length && chained.nonEmpty)
    chained.zip(fused).foreach { case (c, f) => assert(c == f) }
  }
}
