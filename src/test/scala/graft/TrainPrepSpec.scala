package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PackOps, SampleOps, TextOps}

/** Training-data prep operators: deterministic sampling/splitting,
  * token-budget packing, PII redaction. */
class TrainPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")

  test("hashBucket is stable, in range, and salt-independent draws differ") {
    val b = docs.select(SampleOps.hashBucket($"doc_id", "s1").as("b"))
    assert(b.filter($"b" < 0 || $"b" >= 100).count() == 0)
    val twice = docs.select($"doc_id",
      SampleOps.hashBucket($"doc_id", "s1").as("b1"),
      SampleOps.hashBucket($"doc_id", "s1").as("b2"),
      SampleOps.hashBucket($"doc_id", "s2").as("other"))
    assert(twice.filter($"b1" =!= $"b2").count() == 0)
    assert(twice.filter($"b1" =!= $"other").count() > 0)
  }

  test("hashBucket distributes ~uniformly over 100 buckets") {
    val n = 20000
    val counts = spark.range(n)
      .select(SampleOps.hashBucket($"id", "uniformity").as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(counts.size == 100, s"only ${counts.size} buckets hit")
    val expected = n / 100.0
    // every bucket within ±35% of expectation (~6 sigma for binomial n=20k)
    counts.foreach { case (b, c) =>
      assert(math.abs(c - expected) / expected < 0.35,
        s"bucket $b skewed: $c vs ~$expected") }
  }

  test("trainHoldoutSplit: disjoint, exhaustive, ~holdoutPct, re-run stable") {
    val s1 = SampleOps.trainHoldoutSplit(docs, $"doc_id", 20, "seed")
    val n = docs.count().toDouble
    val hold = s1.filter($"split" === "holdout").count().toDouble
    assert(s1.count() == n.toLong)
    assert(math.abs(hold / n - 0.20) < 0.08, s"holdout rate ${hold / n}")
    // same rows land in holdout on a fresh plan (pure function of the key)
    val again = SampleOps.trainHoldoutSplit(docs, $"doc_id", 20, "seed")
      .filter($"split" === "holdout").select("doc_id").as[Long].collect().toSet
    val first = s1.filter($"split" === "holdout")
      .select("doc_id").as[Long].collect().toSet
    assert(first == again)
  }

  test("stratifiedSample applies per-stratum rates") {
    val kept = SampleOps.stratifiedSample(docs, $"doc_id", $"lang",
      Map("en" -> 0), defaultPct = 100, salt = "x")
    assert(kept.filter($"lang" === "en").count() == 0)
    val others = docs.filter($"lang" =!= "en").count()
    assert(kept.count() == others) // non-en strata fully kept
  }

  test("weightedSample: heavy weights overrepresented, partition-stable") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // 200 keys, 20 "heavy" (weight 50x): with k=40 of 200 drawn by
    // priority ln(u)/w, heavy keys should be drawn far above their 10%
    // population share
    val rows = spark.range(200).toDF("id")
      .withColumn("w", when(col("id") < 20, 50.0).otherwise(1.0))
    val picked = SampleOps.weightedSample(rows, col("id"), col("w"),
        lit("all"), k = 40, salt = "ws")
      .select("id").as[Long].collect().toSet
    assert(picked.size == 40)
    val heavy = picked.count(_ < 20)
    assert(heavy >= 15, s"heavy keys picked $heavy/20 (expected near-all)")
    // identical selection from a differently-partitioned input
    val again = SampleOps.weightedSample(rows.repartition(13), col("id"),
        col("w"), lit("all"), k = 40, salt = "ws")
      .select("id").as[Long].collect().toSet
    assert(again == picked)
    // zero/null weights never selected
    val withBad = rows.withColumn("w",
      when(col("id") === 5, 0.0).otherwise(col("w")))
    assert(!SampleOps.weightedSample(withBad, col("id"), col("w"),
      lit("all"), k = 200, salt = "ws")
      .select("id").as[Long].collect().contains(5L))
  }

  test("weightedSample: global (literal-stratum) call keeps the bounded-heap window path") {
    import org.apache.spark.sql.functions.{col, lit}
    val rows = spark.range(5000).toDF("id").withColumn("w", lit(1.0))
      .repartition(8)
    // a lit(...) stratum used to constant-fold the partition spec away —
    // an unpartitioned WindowExec holding the whole corpus in ONE
    // partition. The non-foldable guard keeps the spec alive, so the plan
    // stays a partial WindowGroupLimit bounded heap for BOTH the global
    // and the stratified call.
    val global = SampleOps.weightedSample(rows, col("id"), col("w"),
      lit("all"), k = 10, salt = "g")
    val gp = global.queryExecution.executedPlan.toString
    assert(gp.contains("WindowGroupLimit") && gp.contains("Partial"),
      s"global weightedSample lost the partial WindowGroupLimit:\n$gp")
    assert(global.count() == 10)
    val strat = SampleOps.weightedSample(
      rows.withColumn("s", (col("id") % 4).cast("string")),
      col("id"), col("w"), col("s"), k = 10, salt = "g")
    val sp = strat.queryExecution.executedPlan.toString
    assert(sp.contains("WindowGroupLimit") && sp.contains("Partial"),
      s"stratified weightedSample lost the partial WindowGroupLimit:\n$sp")
    assert(strat.count() == 40)
  }

  test("packByBudget: every doc exactly once, packs fill to budget+<1 doc") {
    val packed = PackOps.packByBudget(docs, TextOps.tokenCount($"text"),
      budget = 200L, buckets = 4)
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    val stats = PackOps.packStats(packed)
      .join(packed.groupBy("bucket", "pack_seq")
        .agg(max($"n_tokens").as("max_doc")), Seq("bucket", "pack_seq"))
    // overshoot bound: pack_tokens < budget + its largest doc
    assert(stats.filter($"pack_tokens" >= lit(200L) + $"max_doc").count() == 0)
    // packs are contiguous per bucket: seq 0..max with no holes
    val holes = stats.groupBy("bucket")
      .agg(countDistinct($"pack_seq").as("n"), max($"pack_seq").as("mx"))
      .filter($"n" =!= $"mx" + 1)
    assert(holes.count() == 0)
  }

  test("rollingByTime: trailing window includes exactly the in-range events") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 00:00:00"), 10.0),
      (2L, "u1", ts("2024-01-05 00:00:00"), 20.0), // 1 still in 7d window
      (3L, "u1", ts("2024-01-09 00:00:00"), 40.0), // 1 aged out, 2 remains
      (4L, "u2", ts("2024-01-05 00:00:00"), 7.0)   // other key isolated
    ).toDF("event_id", "user_id", "ts", "value")
    val out = graft.ops.TimeSeriesOps
      .rollingByTime(ev, "user_id", "ts", "value", windowDays = 7)
      .select("event_id", "spend_7d", "n_7d")
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 10.0, 1L), (2L, 30.0, 2L), (3L, 60.0, 2L), (4L, 7.0, 1L)))
  }

  test("tfidfTopTerms: rare terms outrank ubiquitous ones; everywhere-terms score 0") {
    val df = Seq(
      (1L, "common rare common common"),
      (2L, "common common"),
      (3L, "common unique")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(df, k = 2).orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term", "tfidf")
      .as[(Long, Int, String, Double)].collect()
    // 'common' is in every doc → idf = ln(1) = 0 → ranks below any rare term
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.head._3 == "rare" && doc1.head._4 > 0)
    assert(doc1(1)._3 == "common" && doc1(1)._4 == 0.0)
    val doc3 = out.filter(_._1 == 3L)
    assert(doc3.head._3 == "unique" && doc3.head._4 > 0)
    // tf weighting: doc1's 'rare' (tf=1) vs doc3's 'unique' (tf=1), same df → equal scores
    assert(math.abs(doc1.head._4 - doc3.head._4) < 1e-12)
  }

  test("bm25TopDocs: tf saturation + idf ordering; non-matching docs absent") {
    val df = Seq(
      (1L, "spark spark join x"), // both terms, tf(spark)=2
      (2L, "spark y z"),          // one term
      (3L, "a b c d")             // no query terms
    ).toDF("doc_id", "text")
    val out = TextOps.bm25TopDocs(df, Seq("spark", "join"), k = 10)
      .select("doc_id", "score", "n_terms")
      .as[(Long, Double, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // ranked, doc3 filtered out
    assert(out(0)._2 > out(1)._2)
    assert(out(0)._3 == 2L && out(1)._3 == 1L)
    // replay doc2's score by hand: one term, tf=1, dl=3, N=3, avgdl=11/3
    val avgdl = 11.0 / 3
    val idfSpark = math.log((3.0 - 2 + 0.5) / (2 + 0.5) + 1.0)
    val tfn = (1 * (1.2 + 1.0)) / (1 + 1.2 * (1.0 - 0.75 + (0.75 * 3) / avgdl))
    assert(math.abs(out(1)._2 - idfSpark * tfn) < 1e-12)
  }

  test("bm25TopDocs: bit-identical scores under any input partitioning") {
    val base = docs.limit(200)
    val a = TextOps.bm25TopDocs(base, Seq("spark", "join", "the"), k = 50)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val b = TextOps.bm25TopDocs(base.repartition(13),
        Seq("spark", "join", "the"), k = 50)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    // literal-ordered per-term combine → exact equality, not approximate
    assert(a == b)
  }

  test("bm25 inverted index: indexed query is bit-identical to the corpus-scan path") {
    val base = docs.limit(300)
    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_")
      .toString + "/idx"
    TextOps.buildBm25Index(base, idx, nBuckets = 8)
    val terms = Seq("spark", "join", "the")
    val scan = TextOps.bm25TopDocs(base, terms, k = 20)
      .select("doc_id", "rank", "score", "n_terms")
      .as[(Long, Int, Double, Long)].collect().toSeq
    val indexed = TextOps.bm25FromIndex(spark, idx, terms, k = 20)
      .select("doc_id", "rank", "score", "n_terms")
      .as[(Long, Int, Double, Long)].collect().toSeq
    // shared scoring tail + exact (nDocs, avgdl) globals → EXACT equality
    assert(indexed == scan)
    // and the read path is key-pruned: the postings read opens only the
    // query terms' bucket files, a strict subset of the index
    val nb = graft.ops.TxTable.snapshot(spark, idx).bucketing.get._2
    val pruned = graft.ops.TxTable
      .readKeys(spark, idx, "term", terms, nb).inputFiles.length
    val all = graft.ops.TxTable.read(spark, idx).inputFiles.length
    assert(pruned < all, s"pruned=$pruned all=$all")
  }

  test("bm25 index: incremental append equals from-scratch; replay is a no-op") {
    val base = docs.limit(300)
    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_")
      .toString + "/idx"
    val old = base.filter(pmod($"doc_id", lit(5)) =!= 0)
    val batch = base.filter(pmod($"doc_id", lit(5)) === 0)
    TextOps.buildBm25Index(old, idx, nBuckets = 8)
    assert(TextOps.appendToBm25Index(spark, idx, batch, "bm25-test", 0L))
    val terms = Seq("spark", "join", "the")
    val expect = TextOps.bm25TopDocs(base, terms, k = 20)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val got = TextOps.bm25FromIndex(spark, idx, terms, k = 20)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(got == expect)
    // torn-batch replay: same (appId, batchId) commits nothing, results hold
    assert(!TextOps.appendToBm25Index(spark, idx, batch, "bm25-test", 0L))
    val again = TextOps.bm25FromIndex(spark, idx, terms, k = 20)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(again == expect)
  }

  test("positional index: phrase search counts exact adjacencies; BM25 unchanged") {
    val df = Seq(
      (1L, "the data stream runs the data stream"), // 'the data stream' ×2
      (2L, "stream data then data stream here now"), // ×1 (only 'data stream')
      (3L, "data and stream apart from each other")  // ×0
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_pos_")
      .toString + "/idx"
    TextOps.buildBm25Index(df, idx, nBuckets = 4, positions = true)
    val two = TextOps.phraseSearchFromIndex(spark, idx, Seq("data", "stream"))
      .as[(Long, Long)].collect().toMap
    assert(two == Map(1L -> 2L, 2L -> 1L), s"got $two")
    val three = TextOps
      .phraseSearchFromIndex(spark, idx, Seq("the", "data", "stream"))
      .as[(Long, Long)].collect().toMap
    assert(three == Map(1L -> 2L), s"got $three")
    // tf = |positions|, so BM25 over the positional index matches the scan
    val scan = TextOps.bm25TopDocs(df, Seq("data", "stream"), k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val indexed = TextOps.bm25FromIndex(spark, idx, Seq("data", "stream"), k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(indexed == scan)
  }

  test("query-set BM25 agrees with the single-query path on a shared query") {
    val base = docs.limit(300)
    val terms = Seq("spark", "join", "the")
    val single = TextOps.bm25TopDocs(base, terms, k = 20)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val qs = TextOps.bm25TopDocsForQueries(base,
        Seq((1L, terms.mkString(" "))).toDF("query_id", "query_text"), k = 20)
      .select("doc_id", "score6").as[(Long, Double)].collect().toMap
    // same k and the same scoring formula; the query-set path pre-rounds
    // each per-term score to 6 dp before the (order-independent) integer
    // sum, so totals differ from the exact-double chain by < |terms|*5e-7
    // — rankings may flip only inside that band, so demand near-total
    // overlap and tight score agreement on the intersection
    val common = single.keySet & qs.keySet
    assert(common.size >= 18, s"only ${common.size}/20 docs shared")
    common.foreach { id =>
      assert(math.abs(single(id) - qs(id)) <= 2e-6,
        s"doc $id: single=${single(id)} queryset=${qs(id)}")
    }
  }

  test("qualityFilter carry: pass-through columns ride along, verdicts unchanged") {
    val base = TextOps.qualityFilter(docs)
    val carried = TextOps.qualityFilter(docs, carry = Seq("text", "lang"))
    assert(carried.columns.toSet == base.columns.toSet ++ Set("text", "lang"))
    val a = base.select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val b = carried.select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(a == b, "carrying columns must not change any verdict")
    // carried values are the original ones
    val langs = carried.select("doc_id", "lang").as[(Long, String)].collect().toMap
    val orig = docs.select("doc_id", "lang").as[(Long, String)].collect().toMap
    assert(langs == orig)
  }

  test("BPE: argmax merge order on the classic fixture; encode replays merges exactly") {
    import graft.ops.BpeOps
    // word freqs: low x3, lower x2, newest x4, widest x1
    // pair counts: we:6 (2 from lower + 4 from newest) is the unique max
    val df = Seq((1L, "low low low lower lower newest newest newest newest widest"))
      .toDF("doc_id", "text")
    val merges = BpeOps.bpeTrain(df, numMerges = 3)
    assert(merges.head == ("w", "e"), s"first merge should be (w,e): $merges")
    assert(merges.length == 3)
    // deterministic: retraining yields the identical merge list
    assert(BpeOps.bpeTrain(df, numMerges = 3) == merges)
    // encode: concatenating a word's tokens restores the word; merged
    // symbols appear as single tokens
    val toks = df.select(BpeOps.bpeEncode($"text", merges).as("t"))
      .as[Seq[String]].head()
    assert(toks.nonEmpty && toks.contains("we"))
    val restored = toks.mkString("")
    assert(restored == "lowlowlowlowerlowernewestnewestnewestnewestwidest")
    // greedy left-to-right within a word: with merges (w,e) the word
    // "wewe" becomes [we, we]
    val g = Seq((1L, "wewe")).toDF("doc_id", "text")
      .select(BpeOps.bpeEncode($"text", Seq(("w", "e"))).as("t"))
      .as[Seq[String]].head()
    assert(g == Seq("we", "we"))
    // empty merge budget: plain characters
    val none = df.select(BpeOps.bpeEncode($"text", Nil).as("t"))
      .as[Seq[String]].head()
    assert(none.forall(_.length == 1))
  }

  test("bpeEncode: process-wide memo is keyed by merge table, not poisoned across tables") {
    import graft.ops.BpeOps
    // the word→tokens memo is shared across task threads (one encode per
    // distinct word per executor); interleaving two different merge tables
    // over the SAME words must still produce each table's own encoding —
    // a miskeyed or shared-entry memo would serve table A's tokens to
    // table B. Run under real task parallelism to exercise the concurrent
    // computeIfAbsent path.
    val words = (0 until 2000).map(i => (i.toLong, s"wewe$i lower$i low"))
    val df = spark.createDataFrame(words).toDF("doc_id", "text")
      .repartition(8)
    val mA = Seq(("w", "e"))
    val mB = Seq(("l", "o"), ("lo", "w"))
    (1 to 2).foreach { _ =>
      val a = df.select(BpeOps.bpeEncode($"text", mA).as("t"))
        .as[Seq[String]].collect()
      assert(a.forall(t => t.contains("we") && !t.contains("low")))
      val b = df.select(BpeOps.bpeEncode($"text", mB).as("t"))
        .as[Seq[String]].collect()
      assert(b.forall(t => t.contains("low") && !t.contains("we")))
    }
  }

  test("charBigramLM: reference-like text scores lower NLL than gibberish; short text null") {
    val lm = TextOps.trainCharBigramLM(docs.filter($"lang" === "en"))
    assert(lm.vocab > 0 && lm.bigrams.nonEmpty)
    // context totals must equal the bigram counts grouped by first char
    assert(lm.contexts.values.sum == lm.bigrams.values.sum)
    val probe = Seq(
      (1L, "the fast join table scan merge sort"), // in-distribution words
      (2L, "qqxjzv kkwpqz vvxqjj zzqkwx"),         // out-of-distribution
      (3L, "a")                                    // too short to score
    ).toDF("doc_id", "text")
    val out = probe.select($"doc_id",
        TextOps.lmNegLogLik($"text", lm).as("nll"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).get < out(2L).get,
      s"reference-like ${out(1L)} should beat gibberish ${out(2L)}")
    assert(out(3L).isEmpty, "sub-2-char text must score NULL")
    // corpus-level sanity: mean en NLL below mean zh NLL under an en model
    val scored = docs.select($"lang",
      TextOps.lmNegLogLik($"text", lm).as("nll"))
    val byLang = scored.groupBy("lang").agg(avg($"nll").as("m"))
      .as[(String, Double)].collect().toMap
    assert(byLang("en") < byLang("zh"),
      s"en ${byLang("en")} should score below zh ${byLang("zh")}")
  }

  test("lmScore LUT fast path is bit-identical to the map-literal definition") {
    val lm = TextOps.trainCharBigramLM(docs.filter($"lang" === "en"))
    val slow = docs.select($"doc_id",
        TextOps.lmNegLogLik($"text", lm).as("nll"))
      .as[(Long, Option[Double])].collect().toMap
    val fast = TextOps.lmScore(docs, lm)
      .select($"doc_id", $"nll")
      .as[(Long, Option[Double])].collect().toMap
    assert(fast == slow, "dense-LUT scoring must not change a single bit")
  }

  test("tfidfTopTerms: staged nDocsKnown skips the corpus-count job, same result") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val df = Seq(
      (1L, "common rare common"),
      (2L, "common other"),
      (3L, "common unique")
    ).toDF("doc_id", "text")
    // results must be identical either way (|docs| = 3)
    val viaCount = TextOps.tfidfTopTerms(df, k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term", "tf", "df", "tfidf")
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    val viaKnown = TextOps.tfidfTopTerms(df, k = 2, nDocsKnown = Some(3L))
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term", "tf", "df", "tfidf")
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(viaKnown == viaCount)
    // job accounting: constructing the plan with a staged count submits NO
    // Spark job; without it the IDF denominator costs an eager count() job
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      TextOps.tfidfTopTerms(df, k = 2, nDocsKnown = Some(3L))
      Thread.sleep(500) // listener bus is async; give a phantom job time to show
      assert(jobs.get() == 0,
        "plan construction with a staged corpus count must not run a job")
      TextOps.tfidfTopTerms(df, k = 2)
      val deadline = System.currentTimeMillis() + 5000
      while (jobs.get() == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(jobs.get() >= 1,
        "without nDocsKnown the IDF denominator pays a count job")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("redactPii scrubs emails, IPs, and phones; counts audit them") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "server at 192.168.0.17 responded"),
      (3L, "call +1555-000-1234 today"),
      (4L, "clean text with no pii at all"),
      (5L, "a@b.co and 10.0.0.1 and +123456789")
    ).toDF("id", "text")
    val (ne, ni, np) = TextOps.piiCounts($"text")
    val out = df.select($"id", TextOps.redactPii($"text").as("r"),
        ne.as("e"), ni.as("i"), np.as("p"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "mail [EMAIL] now")
    assert(out(1).getString(1) == "server at [IP] responded")
    assert(out(2).getString(1) == "call [PHONE] today")
    assert(out(3).getString(1) == "clean text with no pii at all")
    assert(out(4).getString(1) == "[EMAIL] and [IP] and [PHONE]")
    assert(out.map(r => (r.getInt(2), r.getInt(3), r.getInt(4))).toSeq ==
      Seq((1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0), (1, 1, 1)))
  }

  test("mixtureWeights: binding stratum keeps 1.0, others realize the target mix") {
    import graft.ops.SampleOps
    val docs = Seq(
      ("en", 120L), ("en", 80L),   // weight 200
      ("zh", 50L),                 // weight 50
      ("es", 30L),                 // weight 30 → binding: 30/0.25 = 120
      ("fr", 10L)                  // no target → excluded
    ).toDF("lang", "n_chars")
    val out = SampleOps.mixtureWeights(docs, $"lang", $"n_chars",
        Map("en" -> 0.5, "zh" -> 0.25, "es" -> 0.25))
      .select($"stratum", $"stratum_weight", $"sample_frac")
      .as[(String, Double, Double)].collect()
      .map { case (s, w, f) => s -> (w, f) }.toMap
    assert(out.keySet == Set("en", "zh", "es"))
    assert(out("es")._2 == 1.0, "binding stratum must not downsample")
    assert(out("en")._2 == 0.3 && out("zh")._2 == 0.6)
    // realized shares hit the targets exactly: frac × weight / mix_total
    val mixTotal = 120.0
    val shares = out.map { case (s, (w, f)) => s -> f * w / mixTotal }
    assert(shares == Map("en" -> 0.5, "zh" -> 0.25, "es" -> 0.25), s"$shares")
  }

  test("shardAssign: exhaustive, balanced, partition-stable, salt redraws") {
    import graft.ops.SampleOps
    val ids = spark.range(4000).toDF("id")
    val out = SampleOps.shardAssign(ids, $"id", nShards = 8, salt = "s1")
    assert(out.count() == 4000, "every row keeps exactly one shard")
    // shard_id consistent with its own shuffle_key, and in range
    assert(out.filter($"shard_id" =!= pmod($"shuffle_key", lit(8L))).count() == 0)
    // balance: no shard more than 2x the ideal 500
    val sizes = out.groupBy("shard_id").count().as[(Long, Long)].collect().toMap
    assert(sizes.size == 8 && sizes.values.forall(n => n > 250 && n < 1000),
      s"shard skew: $sizes")
    // pure function of (salt, key): immune to physical partitioning
    val re = SampleOps.shardAssign(ids.repartition(13), $"id", 8, salt = "s1")
      .select("id", "shard_id", "shuffle_key").as[(Long, Long, Long)]
      .collect().toSet
    assert(re == out.select("id", "shard_id", "shuffle_key")
      .as[(Long, Long, Long)].collect().toSet)
    // a different salt draws a (near-)independent permutation
    val moved = SampleOps.shardAssign(ids, $"id", 8, salt = "s2")
      .select("id", "shard_id").as[(Long, Long)].collect().toMap
    val same = out.select("id", "shard_id").as[(Long, Long)].collect()
      .count { case (id, sh) => moved(id) == sh }
    assert(same < 1000, s"re-salt left $same of 4000 rows in place")
  }
}
