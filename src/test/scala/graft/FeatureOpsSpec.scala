package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{FeatureOps, HistoryOps, TextOps}

/** Feature engineering + history operators: chunking, quality gating,
  * SCD-2 runs, deterministic scaling, NTILE bucketing, embedding pooling. */
class FeatureOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("chunkDocuments: stride windows cover every token, last chunk short") {
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkDocuments(doc, chunkSize = 4, stride = 3)
      .orderBy($"chunk_id")
      .as[(Long, Long, String, Int)].collect()
    // starts 0,3,6,9 over 10 tokens
    assert(chunks.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(chunks.map(_._4).toSeq == Seq(4, 4, 4, 1))
    assert(chunks(0)._3 == "t1 t2 t3 t4")
    assert(chunks(1)._3 == "t4 t5 t6 t7") // overlap of 1 token
    assert(chunks(3)._3 == "t10")
    // every token appears in at least one chunk
    val covered = chunks.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("madOutliers: robust flag survives the outlier it detects") {
    // group a: median 11, MAD 2 → cutoff 3·1.4826·2 ≈ 8.9; 100.0 (Δ=89)
    // flags, 13.0 (Δ=2) does not. A mean/stddev z-score would have been
    // dragged far right by the 100 — the point of the robust screen.
    val df = Seq(
      ("a", 1L, 9.0), ("a", 2L, 10.0), ("a", 3L, 11.0),
      ("a", 4L, 13.0), ("a", 5L, 100.0),
      ("b", 6L, 5.0), ("b", 7L, 5.0), ("b", 8L, 5.0)
    ).toDF("grp", "id", "value")
    val out = FeatureOps.madOutliers(df, "grp", "value")
      .select($"id", $"is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(5L), "the 100.0 point must flag")
    assert(!out(1L) && !out(2L) && !out(3L) && !out(4L))
    // group b: MAD 0 → only exact deviation flags; all-equal group clean
    assert(!out(6L) && !out(7L) && !out(8L))
  }

  test("chunkDocuments: window count formula and full coverage across shapes") {
    for ((n, cs, st) <- Seq((1, 4, 3), (3, 4, 3), (4, 4, 3), (5, 4, 3),
        (10, 4, 4), (17, 5, 2), (100, 64, 48), (96, 64, 48))) {
      val doc = Seq((1L, (1 to n).map(i => s"w$i").mkString(" ")))
        .toDF("doc_id", "text")
      val chunks = TextOps.chunkDocuments(doc, cs, st)
        .orderBy($"chunk_id").as[(Long, Long, String, Int)].collect()
      val expected = (n - 1) / st + 1
      assert(chunks.length == expected, s"(n=$n cs=$cs st=$st)")
      assert(chunks.map(_._2).toSeq == (0 until expected).map(_.toLong),
        s"chunk ids not ordinal (n=$n cs=$cs st=$st)")
      assert(chunks.forall(_._4 <= cs))
      val covered = chunks.flatMap(_._3.split(" ")).toSet
      assert(covered == (1 to n).map(i => s"w$i").toSet,
        s"coverage gap (n=$n cs=$cs st=$st)")
    }
  }

  test("chunkDocuments: doc shorter than one chunk yields exactly one chunk") {
    val doc = Seq((1L, "a b c")).toDF("doc_id", "text")
    val chunks = TextOps.chunkDocuments(doc, chunkSize = 64, stride = 48)
      .as[(Long, Long, String, Int)].collect()
    assert(chunks.length == 1 && chunks(0)._3 == "a b c" && chunks(0)._4 == 3)
  }

  test("qualityFilter: each rule fires on its designed offender") {
    val good = "the quick brown fox jumps over the lazy dog and it runs on for a while with many fine words"
    val docs = Seq(
      1L -> good,
      2L -> "too short",                                  // too_few_words
      3L -> ("pneumonoultramicroscopics " * 12).trim,     // word_len (long words)
      4L -> ("a b " * 10 + "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"), // symbol_ratio
      5L -> ("the 123 456 789 012 345 678 901 234 567 890 on it " * 2).trim, // digit_ratio
      6L -> ("zzz qqq vvv kkk jjj xxx www yyy uuu mmm nnn ppp " * 2).trim,   // low_stopword
      7L -> ("the cat sat here " * 12).trim               // repetitive
    ).toDF("doc_id", "text")
    val out = TextOps.qualityFilter(docs)
      .select($"doc_id", $"keep", $"drop_reasons")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1, s"good doc dropped: ${out(1L)._2}")
    assert(out(2L)._2.contains("too_few_words"))
    assert(out(3L)._2.contains("word_len"))
    assert(out(4L)._2.contains("symbol_ratio"))
    assert(out(5L)._2.contains("digit_ratio"))
    assert(out(6L)._2.contains("low_stopword"))
    assert(out(7L)._2.contains("repetitive"))
    assert(!out(7L)._1)
  }

  test("scd2: no-op updates collapse; intervals chain; current row open") {
    val updates = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "free"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "free"),  // no-op
      (1L, ts("2024-01-03 00:00:00"), 3L, "pro"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "pro"),   // no-op
      (1L, ts("2024-01-05 00:00:00"), 5L, "free"),
      (2L, ts("2024-01-01 00:00:00"), 6L, "pro")
    ).toDF("user_id", "ts", "event_id", "plan")
    val hist = HistoryOps.scd2(updates, "user_id", "ts", "event_id", "plan")
      .select($"user_id", $"plan", $"valid_from", $"valid_to", $"version",
        $"is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Int, Boolean)]
      .collect().sortBy(r => (r._1, r._5))
    assert(hist.map(r => (r._1, r._2, r._5)).toSeq ==
      Seq((1L, "free", 1), (1L, "pro", 2), (1L, "free", 3), (2L, "pro", 1)))
    // interval chaining: each valid_to equals the next version's valid_from
    assert(hist(0)._4.contains(ts("2024-01-03 00:00:00")))
    assert(hist(1)._4.contains(ts("2024-01-05 00:00:00")))
    assert(hist(2)._4.isEmpty && hist(2)._6)
    assert(hist(3)._4.isEmpty && hist(3)._6)
    assert(hist.count(_._6) == 2) // exactly one current row per key
  }

  test("scd2: null attribute values are runs, not first-row markers") {
    val updates = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some("a")),
      (1L, ts("2024-01-02 00:00:00"), 2L, None),      // a -> null: change
      (1L, ts("2024-01-03 00:00:00"), 3L, None),      // null -> null: no-op
      (1L, ts("2024-01-04 00:00:00"), 4L, Some("a"))  // null -> a: change
    ).toDF("user_id", "ts", "event_id", "plan")
    val hist = HistoryOps.scd2(updates, "user_id", "ts", "event_id", "plan")
    assert(hist.count() == 3)
    assert(hist.orderBy($"version").select($"plan")
      .as[Option[String]].collect().toSeq == Seq(Some("a"), None, Some("a")))
  }

  test("scaleByGroup matches directly computed stats and is partition-stable") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 40.0),
      ("b", 5L, 5.0), ("b", 6L, 15.0)
    ).toDF("g", "id", "v")
    val out = FeatureOps.scaleByGroup(df, "g", "v")
      .select($"id", $"z_score", $"min_max")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // group a: mean 25, var_samp 500/3*... = (3000 - 2500)/3 -> sd = sqrt(500/3)
    val sdA = math.sqrt((1000.0 + 4900.0 - 100.0 * 100.0 / 4) / 3) // sum sq = 3000
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(1L)._1 == r6((10.0 - 25.0) / math.sqrt((3000.0 - 2500.0) / 3)))
    assert(out(1L)._2 == 0.0 && out(4L)._2 == 1.0)
    assert(out(2L)._2 == r6(10.0 / 30.0))
    // repartitioned input yields identical features (decimal-exact moments)
    val out2 = FeatureOps.scaleByGroup(df.repartition(7), "g", "v")
      .select($"id", $"z_score", $"min_max")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out2 == out)
  }

  test("ntileBuckets: deterministic deciles, ties broken by tiebreak") {
    val df = (1 to 20).map(i => (i.toLong, "s", (i % 5).toDouble))
      .toDF("id", "seg", "v")
    val out = FeatureOps.ntileBuckets(df, "seg", "v", "id", 10)
      .select($"id", $"bucket").as[(Long, Int)].collect().toMap
    assert(out.values.toSet == (1 to 10).toSet)
    assert(out.values.groupBy(identity).values.forall(_.size == 2))
    // rerun is byte-identical (total order)
    val again = FeatureOps.ntileBuckets(df.repartition(5), "seg", "v", "id", 10)
      .select($"id", $"bucket").as[(Long, Int)].collect().toMap
    assert(again == out)
  }

  test("meanPoolEmbeddings: exact means per (group, dim)") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)),
      (1, Array(10.0f, 0.0f))
    ).toDF("label", "embedding")
    val out = FeatureOps.meanPoolEmbeddings(df, "label")
      .as[(Int, Int, Double)].collect().toSet
    assert(out == Set((0, 1, 2.0), (0, 2, 4.0), (1, 1, 10.0), (1, 2, 0.0)))
  }

  test("winsorize: tails clipped to group cuts, interior untouched, partition-stable") {
    val df = (1 to 100).map(i => ("g", i.toLong, i.toDouble))
      .toDF("seg", "id", "v")
    val out = FeatureOps.winsorize(df, "seg", "v", 0.05, 0.95)
      .select($"id", $"v_winsorized").as[(Long, Double)].collect().toMap
    // interpolated percentiles over 1..100: p05 = 1 + 0.05*99 = 5.95,
    // p95 = 1 + 0.95*99 = 95.05
    assert(out(1L) == 5.95 && out(3L) == 5.95 && out(5L) == 5.95)
    assert(out(100L) == 95.05 && out(97L) == 95.05 && out(96L) == 95.05)
    assert(out(6L) == 6.0 && out(50L) == 50.0 && out(95L) == 95.0)
    val again = FeatureOps.winsorize(df.repartition(7), "seg", "v", 0.05, 0.95)
      .select($"id", $"v_winsorized").as[(Long, Double)].collect().toMap
    assert(again == out)
  }

  test("imputeMean: nulls get the group mean + flag; non-nulls untouched") {
    val df = Seq(("a", 1L, Some(2.0)), ("a", 2L, None), ("a", 3L, Some(4.0)),
        ("b", 4L, Some(10.0)), ("b", 5L, None))
      .toDF("seg", "id", "v")
    val out = FeatureOps.imputeMean(df, "seg", "v")
      .select($"id", $"was_missing", $"v_imputed")
      .as[(Long, Boolean, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2L) == ((true, 3.0)))   // mean of {2, 4}
    assert(out(5L) == ((true, 10.0)))  // mean of {10}
    assert(out(1L) == ((false, 2.0)) && out(3L) == ((false, 4.0))
      && out(4L) == ((false, 10.0)))
  }

  test("ntileApproxBuckets: agrees with exact NTILE at high accuracy") {
    // 250 distinct values per group (37 is invertible mod 501)
    val df = (1 to 500)
      .map(i => (if (i % 2 == 0) "x" else "y", i.toLong, (i * 37 % 501).toDouble))
      .toDF("seg", "id", "v")
    val exact = FeatureOps.ntileBuckets(df, "seg", "v", "id", 10)
      .select($"id", $"bucket").as[(Long, Int)].collect().toMap
    val approx = FeatureOps.ntileApproxBuckets(df, "seg", "v", 10)
      .select($"id", $"bucket").as[(Long, Int)].collect().toMap
    assert(approx.values.forall(b => b >= 1 && b <= 10))
    // accuracy (10000) >> group size (250): GK rank error < 1, so the cut
    // points are exact data values; only exact boundary rows may shift one
    assert(exact.forall { case (id, b) => math.abs(approx(id) - b) <= 1 })
    val disagree = exact.count { case (id, b) => approx(id) != b }
    assert(disagree <= exact.size / 10, s"disagree=$disagree")
  }

  test("robustScale: (x-median)/IQR per group; constant group divides by 1") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 5.0),
      ("c", 7.0), ("c", 7.0), ("c", 7.0))
      .toDF("k", "v")
    val out = FeatureOps.robustScale(df, "k", "v")
      .select($"k", $"v", $"med6", $"iqr6", $"robust_z")
      .as[(String, Double, Double, Double, Double)].collect().toSet
    // g: med 3, q1 2, q3 4 → iqr 2 → z = (v-3)/2
    // c: med 7, iqr 0 → degenerate → z = (v-7)/1 = 0
    assert(out == Set(
      ("g", 1.0, 3.0, 2.0, -1.0), ("g", 2.0, 3.0, 2.0, -0.5),
      ("g", 3.0, 3.0, 2.0, 0.0), ("g", 4.0, 3.0, 2.0, 0.5),
      ("g", 5.0, 3.0, 2.0, 1.0), ("c", 7.0, 7.0, 0.0, 0.0)))
  }

  test("psiDrift: hand-computed two-bucket drift, out-of-range values clamp") {
    val ref = Seq(0.0, 1.0, 2.0, 3.0).toDF("v") // mn=0 mx=3, width 1.5
    val cur = Seq(0.0, 0.0, 0.0, 5.0).toDF("v") // 5.0 clamps into bucket 1
    val out = FeatureOps.psiDrift(ref, cur, "v", nBuckets = 2)
      .orderBy($"bucket")
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    // ref buckets: {0,1}→0, {2,3}→1 (3/1.5=2 clamps); p = (.5,.5)
    // cur buckets: {0,0,0}→0, {5}→1; q = (.75,.25)
    // contrib0 = (.5-.75)·ln(.5/.75) = 0.101366…; contrib1 = .25·ln2
    assert(out == Seq(
      (0, 2L, 3L, 0.5, 0.75, 0.101366),
      (1, 2L, 1L, 0.5, 0.25, 0.173287)))
  }

  test("psiDrift: identical distributions score zero; nulls are ignored") {
    val ref = Seq[java.lang.Double](1.0, 2.0, 3.0, null).toDF("v")
    val cur = Seq[java.lang.Double](1.0, 2.0, 3.0).toDF("v")
    val psi = FeatureOps.psiDrift(ref, cur, "v", nBuckets = 3)
      .agg(sum($"psi_contrib")).as[Double].head()
    assert(psi == 0.0)
  }

  test("embeddingDrift: identical slices give cosine 1.0; an offset slice moves the centroid") {
    import org.apache.spark.sql.functions._
    val vecs = (1 to 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => (i * (d + 1) % 7).toFloat / 7f)))
      .toDF("vec_id", "embedding")
    val same = FeatureOps.embeddingDrift(
      vecs.select($"embedding"), vecs.select($"embedding"))
      .select($"centroid_cos", $"n_ref", $"n_cur")
      .as[(Double, Long, Long)].head()
    assert(same == ((1.0, 40L, 40L)), s"identical slices must be cos 1: $same")
    // a constant positive offset on every component moves the centroid
    // off the original direction (cos < 1) — the drift the monitor exists
    // to catch
    val shifted = vecs.select(transform($"embedding",
      c => c + lit(3.0f)).as("embedding"))
    val drift = FeatureOps.embeddingDrift(vecs.select($"embedding"), shifted)
      .select($"centroid_cos").as[Double].head()
    assert(drift < 1.0 && drift > 0.0, s"offset slice must drift: $drift")
    // determinism under repartitioning (decimal sums are order-free)
    val re = FeatureOps.embeddingDrift(
      vecs.repartition(7).select($"embedding"),
      shifted.repartition(3))
      .select($"centroid_cos").as[Double].head()
    assert(re == drift)
  }

  test("capPerGroup: at most cap per group, longest-first priority, map-side WindowGroupLimit shape") {
    import org.apache.spark.sql.functions._
    val docs = (1 to 100).map(i =>
      (i.toLong, s"src${i % 3}", (i * 37 % 50 + 1).toLong))
      .toDF("doc_id", "source", "n_chars")
    val capped = graft.ops.SampleOps.capPerGroup(docs, "source", "n_chars",
      "doc_id", cap = 5)
    val kept = capped.filter($"cap_keep")
    assert(kept.groupBy($"source").count().filter($"count" > 5).count() == 0)
    // priority: every kept doc is at least as long as every dropped one
    // of its source
    val minKept = kept.groupBy($"source").agg(min($"n_chars").as("mk"))
    val maxDrop = capped.filter(!$"cap_keep").groupBy($"source")
      .agg(max($"n_chars").as("md"))
    assert(minKept.join(maxDrop, "source").filter($"mk" < $"md")
      .count() == 0)
    // the rank filter rides the partial WindowGroupLimit (map tasks trim
    // to the cap BEFORE the exchange — the 100 TB shape)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected the WindowGroupLimit push:\n$plan")
  }

  test("serializeSessions: one deterministic example per user, stable under repartitioning") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 11L, "view"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 10L, "click"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 9L, "signup"),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 08:00:00"), 20L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.PackOps.serializeSessions(ev, "user_id", "ts",
      "event_id", "event_type")
    val u1 = out.filter($"user_id" === 1L)
      .select($"example", $"n_events").as[(String, Int)].head()
    // total order: ts first, id breaks the tie
    assert(u1 == (("signup@9|click@10|view@11", 3)))
    val md5s = out.select($"user_id", $"example_md5")
      .as[(Long, String)].collect().toMap
    val re = graft.ops.PackOps.serializeSessions(ev.repartition(5),
      "user_id", "ts", "event_id", "event_type")
      .select($"user_id", $"example_md5").as[(Long, String)].collect().toMap
    assert(re == md5s, "serialization must not depend on partitioning")
  }
}
