package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.schemas.Schemas._

/** Deterministic clone of the reference's synthetic producer
  * (`Bronze1.py:23-75`): same entities, id format (`CUST%05d`), value
  * domains (event_type ∈ {purchase, refund}, value = uniform(10, 200) @2dp,
  * age ∈ [18, 80], sessions ∈ [1, 30], tickets at p=0.05), plus the dirty
  * cases FIXTURES.md §A marks ▲ (nulls, "test" emails, bad status case,
  * `payment_decline` rows, exact duplicates) so the Silver predicates and
  * Gold aggregates have something to reject/measure.
  *
  * Seeded — identical output every run; no wall-clock anywhere.
  */
object ChurnDataGen {

  private val Issues = Seq("Login issue", "Payment failure", "App crash", "Slow performance")
  private val BaseMillis = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def ts(secondsFromBase: Long): Timestamp =
    new Timestamp(BaseMillis + secondsFromBase * 1000L)

  final case class Batch(
      profiles: Seq[CustomerProfile],
      usage: Seq[AppUsage],
      transactions: Seq[Transaction],
      tickets: Seq[SupportTicket])

  /** One producer-second per iteration, like the reference's `sleep(1)`
    * loop: each tick emits one profile + usage + transaction, and a ticket
    * with p=0.05. Dirty rows are injected at fixed ticks. */
  def generate(ticks: Int, seed: Long = 42L): Batch = {
    val rng = new scala.util.Random(seed)
    val profiles = Seq.newBuilder[CustomerProfile]
    val usage = Seq.newBuilder[AppUsage]
    val txns = Seq.newBuilder[Transaction]
    val tickets = Seq.newBuilder[SupportTicket]

    for (t <- 0 until ticks) {
      val cid = f"CUST${rng.nextInt(99999) + 1}%05d"
      val evTime = ts(t)

      // customer_profile (Bronze1.py:34-44)
      val gender = rng.nextInt(10) match {
        case 0 => "Other"   // kept by the IN-list
        case 1 => "unknown" // ▲ dropped by the IN-list
        case n if n % 2 == 0 => "Male"
        case _ => "Female"
      }
      val name =
        if (t % 17 == 3) s"test user $t"          // ▲ rlike 'test|dummy|xyz'
        else s"User ${rng.nextInt(10000)}"
      val email =
        if (t % 13 == 5) null                     // ▲ dropna(email)
        else if (t % 13 == 7) s"user$t@testmail.com" // ▲ contains 'test'
        else s"user$t@example.com"
      val age = if (t % 19 == 2) -1 else 18 + rng.nextInt(63) // ▲ age > 0
      val signup = f"20${18 + rng.nextInt(6)}%02d-${1 + rng.nextInt(12)}%02d-${1 + rng.nextInt(28)}%02d"
      val prof = CustomerProfile(cid, name, email, gender, age, signup, evTime)
      profiles += prof
      if (t % 23 == 11) profiles += prof          // ▲ exact duplicate (dedup key)

      // app_usage (Bronze1.py:47-51); event_time null half the time (§2.10.4)
      val appEt = if (t % 2 == 0) null else evTime
      val sessions = if (t % 29 == 13) -5 else 1 + rng.nextInt(30) // ▲ >= 0
      val au = AppUsage(cid, new Timestamp(BaseMillis + (t % 30).toLong * 86400000L),
        sessions, appEt)
      usage += au
      if (t % 31 == 7) usage += au                // ▲ duplicate

      // churn_transactions (Bronze1.py:26-31) + ▲ payment_decline (§2.10.2)
      val eType =
        if (t % 11 == 4) "payment_decline"
        else if (rng.nextBoolean()) "purchase" else "refund"
      val value =
        if (t % 37 == 9) -3.5                     // ▲ value > 0
        else math.rint((10 + rng.nextDouble() * 190) * 100) / 100
      val txn = Transaction(cid, eType, evTime, value)
      txns += txn
      if (t % 41 == 17) txns += txn               // ▲ duplicate
      if (t % 43 == 21)
        txns += Transaction(null, eType, evTime, value) // ▲ dropna(customer_id)

      // support_tickets at p≈0.05 (Bronze1.py:54-67)
      if (rng.nextDouble() < 0.05 || t % 20 == 10) {
        val status =
          if (t % 3 == 0) "open"                  // ▲ producer case, dropped (§2.10.1)
          else Seq("Open", "In Progress", "Resolved", "Closed")(rng.nextInt(4))
        val res = if (t % 4 == 0) null else (30 + rng.nextInt(570)).toString
        tickets += SupportTicket(f"ST${rng.nextInt(99999)}%05d", cid,
          Issues(rng.nextInt(Issues.length)), Seq("low", "medium", "high")(rng.nextInt(3)),
          status, evTime, evTime, s"Agent${1 + rng.nextInt(10)}", res)
      }
    }
    Batch(profiles.result(), usage.result(), txns.result(), tickets.result())
  }

  def profilesDF(spark: SparkSession, b: Batch): DataFrame = {
    import spark.implicits._
    b.profiles.toDF()
  }
  def usageDF(spark: SparkSession, b: Batch): DataFrame = {
    import spark.implicits._
    b.usage.toDF()
  }
  def transactionsDF(spark: SparkSession, b: Batch): DataFrame = {
    import spark.implicits._
    b.transactions.toDF()
  }
  def ticketsDF(spark: SparkSession, b: Batch): DataFrame = {
    import spark.implicits._
    b.tickets.toDF()
  }

  /** Kafka-value-shaped JSON lines (key order fixed; nulls omitted like the
    * producer's json.dumps of a dict with None values — the reference sends
    * explicit nulls, so we do too). */
  def profileJson(p: CustomerProfile): String = {
    def q(s: String) = if (s == null) "null" else "\"" + s + "\""
    val et = if (p.event_time == null) "null"
      else "\"" + p.event_time.toString.replace(' ', 'T').takeWhile(_ != '.') + "\""
    s"""{"customer_id":${q(p.customer_id)},"name":${q(p.name)},"email":${q(p.email)},""" +
      s""""gender":${q(p.gender)},"age":${p.age},"signup_date":${q(p.signup_date)},""" +
      s""""event_time":$et}"""
  }
}
