package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.ChurnDataGen
import graft.ops.SilverOps
import graft.schemas.Schemas._

/** Each Silver cleansing predicate (`Silver1.py:34-129`) on crafted rows. */
class SilverOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("cleanCustomer applies dropna, age, gender, dedup, contains, rlike") {
    val rows = Seq(
      CustomerProfile("C1", "Alice", "a@x.com", "Female", 30, "2020-01-01", t0),
      CustomerProfile("C1", "Alice", "a@x.com", "Female", 30, "2020-01-01", t0), // dup key
      CustomerProfile("C2", "Bob", null, "Male", 40, "2020-01-01", t0),          // null email
      CustomerProfile(null, "Nix", "n@x.com", "Male", 40, "2020-01-01", t0),     // null id
      CustomerProfile("C3", "Carol", "c@x.com", "unknown", 25, "2020-01-01", t0),// bad gender
      CustomerProfile("C4", "Dan", "d@x.com", "Other", 0, "2020-01-01", t0),     // age 0
      CustomerProfile("C5", "Eve", "eve@testmail.com", "Female", 22, "2020-01-01", t0), // test email
      CustomerProfile("C6", "dummy account", "f@x.com", "Male", 33, "2020-01-01", t0),  // rlike
      CustomerProfile("C7", "Grace", "g@x.com", "Other", 61, "2020-06-15", t0))
    val out = SilverOps.cleanCustomer(rows.toDF())
    assert(out.select("customer_id").as[String].collect().sorted.toSeq == Seq("C1", "C7"))
    // to_date conversion happened
    assert(out.schema("signup_date").dataType.typeName == "date")
  }

  test("cleanAppUsage: dropna id, sessions >= 0, dedup on (id, event_time) incl null key") {
    val rows = Seq(
      AppUsage("C1", t0, 5, t0),
      AppUsage("C1", t0, 5, t0),        // dup
      AppUsage("C1", t0, 7, null),      // null event_time — distinct key from t0
      AppUsage("C1", t0, 9, null),      // dup of null key (nulls equal for dedup)
      AppUsage(null, t0, 3, t0),        // null id
      AppUsage("C2", t0, -1, t0))       // negative sessions
    val out = SilverOps.cleanAppUsage(rows.toDF())
    assert(out.count() == 2) // (C1, t0) and (C1, null)
  }

  test("cleanTransactions: dropna, value > 0, dedup") {
    val rows = Seq(
      Transaction("C1", "purchase", t0, 10.0),
      Transaction("C1", "purchase", t0, 10.0),  // dup key
      Transaction("C1", "refund", null, 10.0),  // null ts
      Transaction(null, "purchase", t0, 10.0),  // null id
      Transaction("C2", "purchase", t0, 0.0),   // value not > 0
      Transaction("C3", "purchase", t0, -5.0))  // negative
    val out = SilverOps.cleanTransactions(rows.toDF())
    assert(out.select("customer_id").as[String].collect().toSeq == Seq("C1"))
  }

  test("cleanSupportTickets keeps only title-case statuses (quirk 2.10.1 as written)") {
    val rows = Seq(
      SupportTicket("T1", "C1", "App crash", "high", "Open", t0, t0, "Agent1", null),
      SupportTicket("T2", "C1", "App crash", "low", "open", t0, t0, "Agent2", null), // producer case
      SupportTicket("T3", null, "App crash", "low", "Open", t0, t0, "Agent3", null),
      SupportTicket("T1", "C1", "App crash", "high", "Open", t0, t0, "Agent1", null)) // dup
    val out = SilverOps.cleanSupportTickets(rows.toDF())
    assert(out.select("ticket_id").as[String].collect().toSeq == Seq("T1"))
  }

  test("property: cleansing is idempotent and output is a subset (generated data)") {
    val b = ChurnDataGen.generate(400)
    val df = ChurnDataGen.transactionsDF(spark, b)
    val once = SilverOps.cleanTransactions(df)
    val twice = SilverOps.cleanTransactions(once)
    assert(once.count() == twice.count())
    assert(once.count() > 0 && once.count() < df.count())
    assert(once.filter($"value" <= 0 || $"customer_id".isNull || $"timestamp".isNull).count() == 0)
  }
}
