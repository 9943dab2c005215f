package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.QualityModel

/** Trained text-quality classifier: separation between the reference
  * slice and the rest, probability domain, and fit determinism. */
class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")

  test("scores are probabilities and separate reference from non-reference") {
    val labeled = docs.withColumn("label", QualityModel.referenceLabel)
    val model = QualityModel.fit(labeled)
    val scored = QualityModel.score(model, docs)
      .select($"lang", $"quality_probability")
    val bad = scored
      .filter($"quality_probability" < 0 || $"quality_probability" > 1)
    assert(bad.count() == 0)
    val byLang = scored.groupBy("lang")
      .agg(avg($"quality_probability").as("m"))
      .as[(String, Double)].collect().toMap
    // the en slice must score higher than every non-reference language
    val others = byLang.filterNot(_._1 == "en").values
    assert(others.forall(_ < byLang("en")),
      s"reference slice must separate: $byLang")
  }

  test("fit is deterministic: two trainings score identically") {
    val labeled = docs.withColumn("label", QualityModel.referenceLabel)
    def scores(): Map[Long, Double] = {
      val m = QualityModel.fit(labeled)
      QualityModel.score(m, docs)
        .select($"doc_id", $"quality_probability")
        .as[(Long, Double)].collect().toMap
    }
    assert(scores() == scores())
  }
}
