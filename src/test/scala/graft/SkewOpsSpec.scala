package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SkewOps

/** Salted join/aggregate must be row-identical to the unsalted plan. */
class SkewOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events = Tables.load(spark, "/root/testdata/sf0.001", "events")
  private def customer = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    .select($"c_custkey".as("user_id"), $"c_name", $"c_acctbal")

  test("saltedLeftJoin ≡ plain left join (incl. unmatched-left rows)") {
    val plain = events.join(customer, Seq("user_id"), "left")
    val salted = SkewOps.saltedLeftJoin(events, customer, "user_id",
      discriminator = $"event_id", buckets = 8)
    assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted.select(plain.columns.map(col): _*)).count() == 0)
    assert(salted.select(plain.columns.map(col): _*).exceptAll(plain).count() == 0)
  }

  test("saltedCount ≡ plain groupBy count") {
    val plain = events.groupBy($"user_id").agg(count(lit(1)).as("n"))
    val salted = SkewOps.saltedCount(events, "user_id", $"event_id", 8)
    assert(plain.exceptAll(salted).count() == 0 &&
      salted.exceptAll(plain).count() == 0)
  }

  test("AQE splits a skewed sort-merge join on its own (skew=true)") {
    // Manual salting (above) is the deliberate mitigation; this pins the
    // DEFAULT path: at 100× scale a hot key must trigger AQE's runtime
    // skew split even when nobody salted. Thresholds are lowered so the
    // test-sized shuffle exhibits the same decision a 256 MB-partition
    // production shuffle would.
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying 75% of the rows, the rest spread over 1000
      val left = spark.range(200000).select(
        when($"id" < 150000, lit(7L)).otherwise($"id" % 1000).as("k"),
        $"id".as("payload"))
      val right = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, Seq("k"))
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("skewed LSH: dominant near-dup cluster triggers AQE skew split, matches brute force") {
    // DedupOps.embeddingLshPairs claims hot buckets (dense regions all
    // hashing to the same (band, bkey)) are AQE skew-split like any other
    // equi-join; this pins it. One cluster of 1000 near-identical vectors
    // (~10× the sf0.001 embeddings fixture) dominates every band's bucket
    // while 500 background vectors spread thin — the banded self-join must
    // (a) complete with the skew split visible in the final plan and
    // (b) return exactly the brute-force pairs on the cluster slice.
    val conf = Seq(
      "spark.sql.shuffle.partitions" -> "64", // thin median, fat hot buckets
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dims = 16
      val nCluster = 1000
      val nBackground = 500
      val rnd = new scala.util.Random(7)
      val base = Array.fill(dims)(rnd.nextGaussian().toFloat)
      val rows: Seq[(Long, Array[Float])] =
        (0 until nCluster).map { i =>
          // 1e-4 jitter: cosine to base ≈ 1, SRP sign flips essentially never
          (i.toLong, base.map(_ + (rnd.nextGaussian() * 1e-4).toFloat))
        } ++ (0 until nBackground).map { i =>
          ((nCluster + i).toLong, Array.fill(dims)(rnd.nextGaussian().toFloat))
        }
      val vectors = rows.toDF("vec_id", "embedding")
      val pairs = graft.ops.DedupOps.embeddingLshPairs(
        vectors, threshold = 0.9, nPlanes = 64, bands = 8)
      val agg = pairs.agg(
        count(lit(1)).as("n"),
        min($"sim").as("min_sim"),
        count(when($"id_a" < nCluster && $"id_b" < nCluster, 1)).as("n_cluster"))
      val (n, minSim, nCluster2) = {
        val r = agg.collect().head
        (r.getLong(0), r.getDouble(1), r.getLong(2))
      }
      // (a) the hot buckets were runtime-split, and the job finished
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not skew-split the hot LSH bucket:\n${plan.take(4000)}")
      // (b) cluster slice matches the brute-force verifier exactly
      val brute = graft.ops.SimilarityOps.nearDupPairs(
        rows.take(nCluster).toDF("vec_id", "embedding"), threshold = 0.9).count()
      assert(brute == nCluster.toLong * (nCluster - 1) / 2)
      assert(nCluster2 == brute,
        s"LSH found $nCluster2 cluster pairs, brute force found $brute")
      assert(minSim >= 0.9, "no pair below the verify threshold may survive")
      assert(n >= brute) // background pairs (if any) are extra, never missing
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
