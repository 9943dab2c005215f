package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.ChurnDataGen
import graft.ops.BronzeOps
import graft.schemas.Schemas

/** Wire parsing semantics (`Bronze1.py:130-145`): cast → from_json →
  * flatten; malformed → nulls; undeclared fields vanish (§2.10.6). */
class BronzeOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val topic = "cdc_dbserver1.public.customer_profile"

  test("parseTopic routes by topic and parses declared fields only") {
    val wire = Seq(
      (s"""{"customer_id":"C1","name":"A","email":"a@x.com","gender":"Female","age":30,"signup_date":"2020-01-01","event_time":"2024-01-01T00:00:00","tenure":55,"location":"X"}""", topic),
      ("""{"customer_id":"C9"}""", "churn_transactions")) // other topic
      .toDF("value", "topic")
    val out = BronzeOps.parseTopic(wire, topic, Schemas.customerProfileBronze)
    assert(out.count() == 1)
    assert(out.columns.toSeq == Schemas.customerProfileBronze.fieldNames.toSeq)
    // tenure/location were not declared → dropped
    assert(!out.columns.contains("tenure"))
    assert(out.select("age").as[Int].head() == 30)
  }

  test("malformed JSON and missing fields become nulls (dropna's food)") {
    val wire = Seq(
      ("not json at all", topic),
      ("""{"customer_id":"C2"}""", topic)).toDF("value", "topic")
    val out = BronzeOps.parseTopic(wire, topic, Schemas.customerProfileBronze).collect()
    assert(out.length == 2)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("email"))))
    assert(out.exists(r => r.isNullAt(r.fieldIndex("customer_id")))) // malformed row
  }

  test("toKafkaFrame round-trips through from_json") {
    val b = ChurnDataGen.generate(50)
    val df = ChurnDataGen.transactionsDF(spark, b)
    val framed = BronzeOps.toKafkaFrame(df, "customer_id")
    assert(framed.columns.toSeq == Seq("key", "value"))
    val back = BronzeOps.parseValue(framed, Schemas.transactionsSilver)
    // round trip preserves every row's fields (compare as sorted tuples)
    val a = df.as[Schemas.Transaction].collect().map(t => (t.customer_id, t.event_type, Option(t.timestamp).map(_.getTime), t.value)).sortBy(_.toString)
    val c = back.as[Schemas.Transaction].collect().map(t => (t.customer_id, t.event_type, Option(t.timestamp).map(_.getTime), t.value)).sortBy(_.toString)
    assert(a.toSeq == c.toSeq)
  }

  test("generator emits the dirty cases the predicates need") {
    val b = ChurnDataGen.generate(300)
    val p = ChurnDataGen.profilesDF(spark, b)
    assert(p.filter($"email".isNull).count() > 0)
    assert(p.filter($"email".contains("test")).count() > 0)
    assert(p.filter($"gender" === "unknown").count() > 0)
    assert(p.filter($"age" <= 0).count() > 0)
    val t = ChurnDataGen.transactionsDF(spark, b)
    assert(t.filter($"event_type" === "payment_decline").count() > 0)
    assert(t.filter($"value" <= 0).count() > 0)
    // determinism: same seed → same data
    val b2 = ChurnDataGen.generate(300)
    assert(b2.transactions == b.transactions && b2.profiles == b.profiles)
  }
}
