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

  test("span dedup: a boilerplate gram repeated 100k× is AQE-skew-split, results exact") {
    // duplicatedSpans/exciseDuplicatedSpans claim the hashed groupBy+join
    // formulation survives the hot-gram input the old gram-text window
    // could not (a cookie banner / license header appearing everywhere —
    // the exact thing this operator exists to find): partial aggregation
    // folds the hot key map-side and the position re-join is an equi-join
    // AQE skew-splits. This pins both the plan shape and the results.
    val conf = Seq(
      "spark.sql.shuffle.partitions" -> "64",
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
      val nDocs = 100000
      // every doc opens with the same 4-token boilerplate, then one unique
      // token: with k=4 the pos-0 gram occurs nDocs times (ONE key), the
      // pos-1 gram is globally unique — maximal skew on the gram join
      val docs = spark.range(nDocs).select(
        $"id".as("doc_id"),
        concat(lit("b0 b1 b2 b3 x"), $"id").as("text"))
      // collect the operator outputs directly: the skew assertion must read
      // the executed plan of the SAME query that ran (a derived .agg would
      // execute its own plan, and a global aggregate consuming the join
      // also suppresses the skew rewrite — see OptimizeSkewedJoin's
      // requirement validation)
      val spans = graft.ops.DedupOps.duplicatedSpans(docs, k = 4)
      val sRows = spans.collect()
      assert(sRows.length == nDocs &&
        sRows.forall(r => r.getInt(1) == 0 && r.getInt(2) == 3 &&
          r.getLong(3) == 1L),
        "every doc must report exactly the boilerplate span 0..3")
      val sPlan = spans.queryExecution.executedPlan.toString
      assert(sPlan.contains("skew=true"),
        s"spans: AQE did not skew-split the hot-gram join:\n${sPlan.take(4000)}")
      // no window may run partitioned by the gram key in the hashed path
      assert(!sPlan.contains("windowspecdefinition(gh") &&
        !sPlan.contains("windowspecdefinition(g#"),
        "hashed span path must not window over the gram key")
      val excised = graft.ops.DedupOps.exciseDuplicatedSpans(docs, k = 4)
      val eRows = excised.collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      // doc 0 is the global first occurrence (survives whole); every other
      // doc loses exactly the 4 boilerplate tokens
      assert(eRows.length == nDocs)
      assert(eRows.map(_._2).sum == 4L * (nDocs - 1))
      assert(eRows.count(_._2 == 0L) == 1 && eRows.find(_._2 == 0L).get._1 == 0L,
        "only doc 0 may be untouched")
      val ePlan = excised.queryExecution.executedPlan.toString
      assert(ePlan.contains("skew=true"),
        s"excise: AQE did not skew-split the hot-gram join:\n${ePlan.take(4000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("thinned over-budget LSH bucket keeps EVERY member connected — including ids above every hub id") {
    // The probe budget thins the build side of a hot (band, bucket) to
    // ~maxBucket hash-chosen hubs. With the original `l.vec_id <
    // r.vec_id` condition a member whose id exceeds every hub id would
    // pair with NOTHING (its only candidates sit on the thinned side
    // with smaller ids), silently dropping it from the dedup connected
    // components. The thinned path must therefore join `=!=` and
    // canonicalize pairs — this pins that every cluster member, in
    // particular the max-id one, survives into the pair set.
    val dims = 16
    val n = 64
    val rnd = new scala.util.Random(11)
    val base = Array.fill(dims)(rnd.nextGaussian().toFloat)
    val vectors = (0 until n).map { i =>
      (i.toLong, base.map(_ + (rnd.nextGaussian() * 1e-4).toFloat))
    }.toDF("vec_id", "embedding")
    // maxBucket = 8 << 64: every (band, bucket) of the single cluster is
    // over budget, so the thinned plan is ACTIVE (nVectors hint absent)
    val pairs = graft.ops.DedupOps.embeddingLshPairs(
      vectors, threshold = 0.9, nPlanes = 64, bands = 8, maxBucket = 8)
      .collect()
    val seen = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(seen == (0L until n.toLong).toSet,
      s"thinning dropped members: missing ${(0L until n.toLong).toSet -- seen}")
    // canonical orientation: every pair is (least, greatest), no dupes
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      pairs.length)
  }
}
