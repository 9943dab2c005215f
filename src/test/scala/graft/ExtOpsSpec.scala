package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, MultimodalOps, SessionOps, SimilarityOps, TextOps}

/** Extension operators: recall/precision of the probabilistic dedup + ANN
  * methods against exact baselines on the real sf0.001 tables, plus the
  * deterministic kernels. */
class ExtOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")
  private def emb = Tables.load(spark, dir, "embeddings")

  test("minhash LSH finds the exact-Jaccard near-dups (recall) without junk (precision)") {
    val exact = DedupOps.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mh = DedupOps.minhashNearDups(docs, threshold = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain injected near-dups")
    val recall = (mh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
    val precision = if (mh.isEmpty) 1.0 else (mh & exact).size.toDouble / mh.size
    assert(precision >= 0.8, s"precision $precision")
  }

  test("minhash estimate tracks exact jaccard within 0.2") {
    val exact = DedupOps.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
      .select($"doc_a", $"doc_b", $"jaccard")
    val est = DedupOps.minhashNearDups(docs, threshold = 0.3)
    val joined = exact.join(est, Seq("doc_a", "doc_b"))
      .select(abs($"jaccard" - $"est_jaccard").as("err"))
      .agg(max($"err")).as[Double].head()
    assert(joined < 0.2, s"max |est - exact| = $joined")
  }

  test("simhash: identical docs distance 0; near-dups mostly low distance") {
    val fps = DedupOps.simhash(docs.select($"doc_id", $"text"))
    assert(fps.count() == docs.count())
    val dup = DedupOps.simhashNearDups(docs, maxDist = 3)
    assert(dup.count() > 0)
    assert(dup.filter($"hamming" > 3).count() == 0)
  }

  test("IVF top-k recall vs brute force") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityOps.ivfTopK(emb, queries, 5, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall (probing 4/16 cells)")
  }

  test("k-means IVF recall vs brute force meets or beats the id-centroid IVF") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityOps.ivfTopKKmeans(emb, queries, 5, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"k-means IVF recall $recall (probing 4/16 cells)")
  }

  test("scalar quantization: codes in range, reconstruction within half a step") {
    val stats = SimilarityOps.quantizationStats(emb)
    assert(stats.length == 64)
    val coded = emb.select($"vec_id", $"embedding",
      SimilarityOps.quantizeExpr($"embedding", stats).as("codes"),
      SimilarityOps.dequantizeExpr(
        SimilarityOps.quantizeExpr($"embedding", stats), stats).as("recon"))
    // every code in [0, 255]
    val bad = coded.select(explode($"codes").as("c"))
      .filter($"c" < 0 || $"c" > 255).count()
    assert(bad == 0)
    // |x - recon(x)| <= span/510 + eps per dim (half a quantization step)
    val maxStep = stats.map { case (mn, mx) => (mx - mn) / 510.0 }.max
    val worst = coded
      .select(explode(zip_with($"embedding".cast("array<double>"), $"recon",
        (x, r) => abs(x - r))).as("err"))
      .agg(max($"err")).as[Double].head()
    assert(worst <= maxStep + 1e-12, s"recon err $worst > half-step $maxStep")
  }

  test("quantized ANN: high recall vs the exact float top-k") {
    val stats = SimilarityOps.quantizationStats(emb)
    val queries = emb.filter($"vec_id" < 10)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = SimilarityOps.quantizedTopK(emb, queries, 5, stats)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (quant & exact).size.toDouble / exact.size
    // 8-bit codes perturb cosine by ~1e-3 — neighbor sets should barely move
    assert(recall >= 0.85, s"quantized recall $recall")
  }

  test("PQ: codes in range; ADC shortlist + exact re-rank recovers the true top-k") {
    import org.apache.spark.sql.expressions.Window
    val cbs = SimilarityOps.pqCodebooks(emb, m = 8, k = 16)
    assert(cbs.length == 8 && cbs.forall(_.length == 16)
      && cbs.forall(_.forall(_.length == 8)))
    val codes = emb.select(SimilarityOps.pqEncode($"embedding", cbs).as("c"))
    assert(codes.select(explode($"c").as("j"))
      .filter($"j" < 0 || $"j" >= 16).count() == 0)
    val queries = emb.filter($"vec_id" < 10)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // production shape: coarse ADC shortlist (cheap, compressed index),
    // exact re-rank of the shortlist with real vectors (tiny float read)
    val shortlist = SimilarityOps.pqTopK(emb, queries, 25, cbs)
      .select($"query_id", $"neighbor_id")
    val reranked = shortlist
      .join(emb.select($"vec_id".as("neighbor_id"), $"embedding".as("nv")),
        Seq("neighbor_id"))
      .join(emb.select($"vec_id".as("query_id"), $"embedding".as("qv")),
        Seq("query_id"))
      .select($"query_id", $"neighbor_id",
        SimilarityOps.cosine($"nv", $"qv").as("sim"))
      .withColumn("rank", row_number().over(Window.partitionBy($"query_id")
        .orderBy($"sim".desc, $"neighbor_id")))
      .filter($"rank" <= 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (reranked & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ shortlist+rerank recall $recall")
    // raw ADC ordering alone is coarser but must still beat random
    val adcOnly = SimilarityOps.pqTopK(emb, queries, 5, cbs)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adcRecall = (adcOnly & exact).size.toDouble / exact.size
    assert(adcRecall >= 0.15, s"raw ADC recall $adcRecall")
    // learned codebooks (per-subspace seeded k-means) must quantize at
    // least as well as the deterministic first-k-by-id stand-in. Two pins:
    // (a) mean squared reconstruction error — the direct codebook-quality
    // metric — may not regress over the whole corpus;
    // (b) raw ADC recall on a NEUTRAL query slice may not regress. The
    // vec_id<10 queries above are useless for this comparison: they sit
    // INSIDE the deterministic codebook's seed vectors (ids 0..15), which
    // encodes exactly them near-losslessly — a fixture artifact, not
    // codebook quality.
    val cbsKm = SimilarityOps.pqCodebooksKmeans(emb, m = 8, k = 16)
    assert(cbsKm.length == 8 && cbsKm.forall(_.forall(_.length == 8)))
    val vecs = emb.select($"embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    def mse(cb: Array[Array[Array[Double]]]): Double = {
      val mm = cb.length; val dsub = cb.head.head.length
      vecs.map { v =>
        (0 until mm).map { s =>
          val sub = v.slice(s * dsub, (s + 1) * dsub)
          cb(s).map(cw =>
            sub.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum / vecs.length
    }
    val (mseKm, mseDet) = (mse(cbsKm), mse(cbs))
    assert(mseKm <= mseDet,
      s"k-means codebooks reconstruct worse: $mseKm > $mseDet")
    val qNeutral = emb.filter($"vec_id" >= 100 && $"vec_id" < 110)
    val exactN = SimilarityOps.bruteForceTopK(emb, qNeutral, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val detN = SimilarityOps.pqTopK(emb, qNeutral, 5, cbs)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val kmN = SimilarityOps.pqTopK(emb, qNeutral, 5, cbsKm)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val detRecallN = (detN & exactN).size.toDouble / exactN.size
    val kmRecallN = (kmN & exactN).size.toDouble / exactN.size
    assert(kmRecallN >= detRecallN,
      s"k-means codebook recall $kmRecallN < deterministic $detRecallN")
  }

  test("semanticDedup: within-cell keep-first flags; boundary misses are contract") {
    // dims=4, two orthogonal centroids (the first nCells=2 vectors by id)
    val fixture = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),   // centroid / cell 0
      (1L, Array(0f, 1f, 0f, 0f)),   // centroid / cell 1
      (2L, Array(2f, 0.1f, 0f, 0f)), // cell 0, near-parallel to 0 -> dup
      (3L, Array(0f, 3f, 0.1f, 0f)), // cell 1, near-parallel to 1 -> dup
      (4L, Array(0.71f, 0.70f, 0f, 0f)), // cell 0 (barely)
      (5L, Array(0.70f, 0.71f, 0f, 0f)), // cell 1 (barely)
      (6L, Array(0f, 0f, 1f, 0f))    // cell 0 or 1 by tiebreak, no mate close
    ).toDF("vec_id", "embedding")
    val got = DedupOps.semanticDedup(fixture, nCells = 2, threshold = 0.9)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 7, "flag-don't-drop: every vector reports")
    // keep-first: the centroids themselves (lowest ids) are never dups
    assert(!got(0L)._2 && !got(1L)._2)
    // within-cell near-parallels flag against their lower-id mates
    assert(got(2L) == ((0L, true)) && got(3L) == ((1L, true)))
    // vectors 4 and 5 have cosine ~0.9998 — but they straddle the cell
    // boundary (4 -> cell 0, 5 -> cell 1), so NEITHER is flagged: the
    // recall-at-boundaries tradeoff every cluster/LSH method shares,
    // pinned here as contract
    assert(got(4L)._1 == 0L && got(5L)._1 == 1L, s"cells: $got")
    assert(!got(4L)._2 && !got(5L)._2)
    assert(!got(6L)._2, "orthogonal outlier must survive")
  }

  test("semanticDedupKmeans: flags are sound (global lower-id witness) and deterministic") {
    val model = SimilarityOps.fitIvfKmeans(emb, nCells = 8)
    def run() = DedupOps.semanticDedupKmeans(emb, model, threshold = 0.3)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val a = run()
    assert(a == run(), "staged-model dedup must be deterministic")
    assert(a.map(_._1).distinct.size == a.size, "one row per vector")
    // soundness: a flagged vector must have SOME lower-id vector at
    // cosine >= threshold (cellmate pairs are a subset of all pairs) —
    // verified against a driver-side exact cosine over the fixture
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      var dp = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        dp += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i); i += 1
      }
      dp / (math.sqrt(nx) * math.sqrt(ny))
    }
    val flagged = a.filter(_._3).map(_._1)
    flagged.foreach { id =>
      assert(vecs.keys.exists(o => o < id && cos(vecs(o), vecs(id)) >= 0.3),
        s"vec $id flagged without any lower-id witness")
    }
  }

  test("connectedComponents: chains collapse transitively to the min label") {
    // two components: a diameter-4 chain (forces multiple propagation
    // rounds) and a triangle; 99 is disconnected (absent from pairs)
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), // chain
      (2L, 5L), (5L, 7L), (2L, 7L)                    // triangle
    ).toDF("doc_a", "doc_b")
    val out = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      14L -> 10L, 2L -> 2L, 5L -> 2L, 7L -> 2L))
    assert(!out.contains(99L)) // only nodes present in pairs
  }

  test("connectedComponents: refuses to return partially-propagated labels") {
    // diameter-4 chain with a 1-round budget: labels cannot reach the far
    // end — silently returning them would dedup against WRONG groups
    val pairs = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      DedupOps.connectedComponents(pairs, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("incremental minhash ≡ whole-corpus pairs restricted to batch × corpus") {
    // the staged-index path must find exactly the pairs the audit path
    // finds between the batch and the corpus — same bands, same verify
    val corpus = docs.filter(pmod($"doc_id", lit(5)) =!= 0)
    val batch = docs.filter(pmod($"doc_id", lit(5)) === 0)
    val idx = DedupOps.minhashBandIndex(corpus, portable = true)
    val incr = DedupOps.minhashNearDupsIncremental(batch, idx,
        threshold = 0.3, portable = true)
      .as[(Long, Long, Double)].collect().toSet
    val full = DedupOps.minhashNearDups(docs, threshold = 0.3, portable = true)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b, j) => if (a % 5 == 0) (a, b, j) else (b, a, j) }.toSet
    assert(incr == full)
  }

  test("misra-gries: exact when capacity >= vocab, guarantees in the lossy regime") {
    import graft.functions.SketchFunctions.misra_gries_topk
    val toks = docs.select(explode(split(lower($"text"), "\\s+")).as("token"))
    val exact = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    // exact regime: capacity above vocabulary → identical to GROUP BY,
    // stable under repartitioning (merge path exercised)
    for (t <- Seq(toks, toks.repartition(13))) {
      val mg = t.agg(misra_gries_topk($"token", 256).as("s"))
        .select(explode($"s").as("e")).select($"e.item", $"e.est")
        .as[(String, Long)].collect().toMap
      assert(mg == exact)
    }
    // lossy regime: capacity 4 over a skewed stream — the majority item
    // must survive with a lower-bound count within n/(capacity+1) of truth
    val n = 1000
    val skewed = spark.range(n)
      .select(when($"id" % 2 === 0, "hot")
        .otherwise(concat(lit("t"), ($"id" % 97).cast("string"))).as("token"))
    val mg = skewed.agg(misra_gries_topk($"token", 4).as("s"))
      .select(explode($"s").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toMap
    assert(mg.contains("hot"), s"majority item evicted: $mg")
    assert(mg("hot") <= n / 2, "count must be a lower bound")
    assert(mg("hot") >= n / 2 - n / 5, s"lower bound too loose: ${mg("hot")}")
    assert(mg.size <= 4)
  }

  test("misra-gries: survives items past the 64 KB writeUTF ceiling") {
    import graft.functions.SketchFunctions.misra_gries_topk
    // a 70 KB unbroken "token" — the raw-web-text pathology. writeUTF-based
    // serialization throws UTFDataFormatException at shuffle time for any
    // item whose modified-UTF-8 form exceeds 65,535 bytes; length-prefixed
    // raw UTF-8 must carry it through the partial/merge path intact.
    val blob = "x" * 70000
    val toks = spark.range(20)
      .select(when($"id" % 4 === 0, blob).otherwise(concat(lit("t"),
        ($"id" % 5).cast("string"))).as("token"))
      .repartition(7) // force a partial → shuffle → merge round-trip
    val mg = toks.agg(misra_gries_topk($"token", 64).as("s"))
      .select(explode($"s").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toMap
    val exact = toks.groupBy("token").count().as[(String, Long)].collect().toMap
    assert(mg == exact)
    assert(mg(blob) == 5L)
  }

  test("misra-gries: long items (user ids), exact and lossy regimes") {
    import graft.functions.SketchFunctions.misra_gries_topk
    // exact regime over bigint ids: identical to GROUP BY, merge-stable
    val ids = spark.range(500).select(($"id" % 37).as("user_id"))
      .repartition(11)
    val mg = ids.agg(misra_gries_topk($"user_id", 64).as("s"))
      .select(explode($"s").as("e")).select($"e.item", $"e.est")
      .as[(Long, Long)].collect().toMap
    val exact = ids.groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(mg == exact)
    // output item type follows the child type through to the schema
    val itemType = ids.agg(misra_gries_topk($"user_id", 64).as("s"))
      .select(explode($"s").as("e")).select($"e.item").schema.head.dataType
    assert(itemType == org.apache.spark.sql.types.LongType)
    // lossy regime: the majority id survives with a lower-bound count
    val n = 1000
    val skewed = spark.range(n)
      .select(when($"id" % 2 === 0, 7L).otherwise($"id" % 97 + 100).as("user_id"))
    val lossy = skewed.agg(misra_gries_topk($"user_id", 4).as("s"))
      .select(explode($"s").as("e")).select($"e.item", $"e.est")
      .as[(Long, Long)].collect().toMap
    assert(lossy.contains(7L), s"majority id evicted: $lossy")
    assert(lossy(7L) <= n / 2 && lossy(7L) >= n / 2 - n / 5)
  }

  test("misra_gries_topk is callable from SQL via GraftExtensions") {
    docs.select(explode(split(lower($"text"), "\\s+")).as("token"))
      .createOrReplaceTempView("mg_toks")
    val viaSql = spark.sql(
      "SELECT misra_gries_topk(token, 256) AS s FROM mg_toks")
      .select(explode($"s").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toMap
    val exact = docs.select(explode(split(lower($"text"), "\\s+")).as("token"))
      .groupBy("token").count().as[(String, Long)].collect().toMap
    assert(viaSql == exact)
  }

  test("sketch kernels are callable from SQL and match the DataFrame API") {
    emb.createOrReplaceTempView("sql_emb")
    // srp_signature: SQL call == SketchFunctions call
    val viaSql = spark.sql(
      "SELECT vec_id, srp_signature(embedding, 64, 42) AS sig FROM sql_emb")
      .as[(Long, Long)].collect().toMap
    val viaApi = emb.select($"vec_id",
        graft.functions.SketchFunctions.srp_signature($"embedding", 64, 42L))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaApi)
    // simhash64 + minhash_signature over token hashes
    docs.select($"doc_id",
        expr("transform(split(lower(text), '\\\\s+'), t -> xxhash64(t))")
          .as("hs"))
      .createOrReplaceTempView("sql_toks")
    val sh = spark.sql(
      "SELECT doc_id, simhash64(hs), minhash_signature(hs, 16) FROM sql_toks")
      .as[(Long, Long, Seq[Long])].collect()
    assert(sh.nonEmpty && sh.forall(_._3.length == 16))
    val shApi = docs.select($"doc_id",
        graft.functions.SketchFunctions.simhash64(
          expr("transform(split(lower(text), '\\\\s+'), t -> xxhash64(t))")))
      .as[(Long, Long)].collect().toMap
    sh.foreach { case (id, s, _) => assert(shApi(id) == s) }
  }

  test("centroid broadcast fallback matches the literal-inline path") {
    // force the fallback with a 1-float inline budget; results must be
    // row-identical to the codegen'd literal projection (same argmax, same
    // lowest-cell-id tiebreak, same probe ranking)
    val cents = emb.orderBy($"vec_id").limit(8)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val inline = SimilarityOps.assignCells(emb, cents)
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    val fallback = SimilarityOps.assignCells(emb, cents, maxInlineFloats = 1)
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    assert(fallback == inline)
    val queries = emb.filter($"vec_id" < 10)
    val pInline = SimilarityOps.probeCells(queries, cents, nProbe = 3)
      .select("query_id", "cell_id").as[(Long, Long)].collect().toSet
    val pFallback = SimilarityOps.probeCells(queries, cents, nProbe = 3,
        maxInlineFloats = 1)
      .select("query_id", "cell_id").as[(Long, Long)].collect().toSet
    assert(pFallback == pInline)
  }

  test("banded embedding LSH: verified subset of brute force, with usable recall") {
    val exact = SimilarityOps.nearDupPairs(emb, 0.3)
      .select($"id_a", $"id_b", $"sim").as[(Long, Long, Double)].collect()
    val exactPairs = exact.map(t => (t._1, t._2)).toSet
    val lsh = DedupOps.embeddingLshPairs(emb, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exactPairs.nonEmpty, "fixture should contain near-dup pairs")
    // precision is 1.0 by construction: every candidate is exact-cosine verified
    assert((lsh -- exactPairs).isEmpty, "LSH emitted a pair brute force rejects")
    // high-similarity pairs (the true near-dups) must be found reliably;
    // theory at sim 0.8, 8 bands x 8 bits: 1-(1-p^8)^8 ~ 0.75, p = 1-acos(s)/pi
    val hot = exact.filter(_._3 >= 0.8).map(t => (t._1, t._2)).toSet
    if (hot.nonEmpty) {
      val recall = (lsh & hot).size.toDouble / hot.size
      assert(recall >= 0.5, s"high-sim recall $recall over ${hot.size} pairs")
    }
  }

  test("duplicatedSpans: any-alignment cross-doc repeats and internal repeats merge into maximal spans") {
    // A and B share a 9-token run at DIFFERENT offsets (0 vs 2) — the
    // disjoint-segment grid would straddle it; sliding 8-grams must not
    val shared = "a b c d e f g h i"
    val fixture = Seq(
      (1L, s"$shared j"),                    // run at offset 0
      (2L, s"x y $shared z"),                // same run at offset 2
      (3L, "p q r s t u v w p q r s t u v w"), // internal 8-token repeat
      (4L, "lone doc with no repeats at all here ok")).toDF("doc_id", "text")
    val got = DedupOps.duplicatedSpans(fixture, k = 8)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == Set(
      (1L, 0, 8, 2L),   // grams at pos 0,1 duplicated -> one span 0..8
      (2L, 2, 10, 2L),  // same grams at pos 2,3 -> span 2..10
      (3L, 0, 7, 1L),   // internal repeat: gram 0 == gram 8
      (3L, 8, 15, 1L)))
    // doc 4 reports nothing; docs shorter than k produce no grams
    val short = Seq((9L, "too short")).toDF("doc_id", "text")
    assert(DedupOps.duplicatedSpans(short, k = 8).isEmpty)
  }

  test("exciseDuplicatedSpans: first occurrence survives, later copies cut, untouched docs intact") {
    val shared = "a b c d e f g h i"
    val fixture = Seq(
      (1L, s"$shared j"),
      (2L, s"x y $shared z"),
      (3L, "lone doc with no repeats at all here ok")).toDF("doc_id", "text")
    val got = DedupOps.exciseDuplicatedSpans(fixture, k = 8)
      .as[(Long, Int, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 is the first occurrence -> untouched
    assert(got(1L) == ((10, 0L, s"$shared j")))
    // doc 2's copy spans tokens 2..10 -> excised, frame tokens survive
    assert(got(2L) == ((12, 9L, "x y z")))
    // doc 3 has no repeats -> byte-identical rebuild
    assert(got(3L) == ((9, 0L, "lone doc with no repeats at all here ok")))
  }

  test("span ops agree with an independent local reimplementation on random repeat-heavy corpora") {
    val k = 4
    def localSpans(docs: Seq[(Long, String)]): Set[(Long, Int, Int, Long)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").toSeq }
      val grams = for {
        (id, w) <- toks; if w.length >= k
        i <- 0 to w.length - k
      } yield (id, i, w.slice(i, i + k).mkString(" "))
      val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val runs = grams.filter(g => counts(g._3) > 1).groupBy(_._1)
      runs.flatMap { case (id, ps) =>
        ps.map(_._2).sorted.foldLeft(List.empty[List[Int]]) {
          case (h :: t, p) if h.head == p - 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }.map(r => (id, r.min, r.max + k - 1, r.size.toLong))
      }.toSet
    }
    def localExcise(docs: Seq[(Long, String)]): Map[Long, (Int, Long, String)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").toSeq }
      val grams = for {
        (id, w) <- toks; if w.length >= k
        i <- 0 to w.length - k
      } yield (id, i, w.slice(i, i + k).mkString(" "))
      val redundant = grams.groupBy(_._3).values.flatMap(
        _.sortBy(g => (g._1, g._2)).drop(1)).toSeq
      val runsByDoc = redundant.groupBy(_._1).view.mapValues {
        ps => ps.map(_._2).sorted.foldLeft(List.empty[List[Int]]) {
          case (h :: t, p) if h.head == p - 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }.map(r => (r.min, r.max + k - 1))
      }.toMap
      toks.map { case (id, w) =>
        val cover = runsByDoc.getOrElse(id, Nil)
        val kept = w.zipWithIndex.collect {
          case (t, i) if !cover.exists(c => i >= c._1 && i <= c._2) => t }
        id -> ((w.length, (w.length - kept.length).toLong, kept.mkString(" ")))
      }.toMap
    }
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val vocab = Seq("ga", "bu", "zo", "meu", "ho", "da")
      val docs: Seq[(Long, String)] = (0 until 30).map { i =>
        val n = rnd.nextInt(40)
        (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val gotSpans = DedupOps.duplicatedSpans(df, k)
        .as[(Long, Int, Int, Long)].collect().toSet
      assert(gotSpans == localSpans(docs), s"spans diverged on trial $trial")
      val gotExcise = DedupOps.exciseDuplicatedSpans(df, k)
        .as[(Long, Int, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(gotExcise == localExcise(docs), s"excise diverged on trial $trial")
      // the text-keyed audit siblings must agree with the hashed scale path
      val exactSpans = DedupOps.duplicatedSpansExact(df, k)
        .as[(Long, Int, Int, Long)].collect().toSet
      assert(exactSpans == gotSpans, s"exact spans sibling diverged on $trial")
      val exactExcise = DedupOps.exciseDuplicatedSpansExact(df, k)
        .as[(Long, Int, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(exactExcise == gotExcise, s"exact excise sibling diverged on $trial")
      // incremental excision against the staged gram index must equal the
      // batch slice of full excision over corpus ∪ batch (corpus doc ids
      // sit below batch ids, so "in the index" == "occurred earlier")
      val corpusDf = df.filter($"doc_id" < 15)
      val batchDf = df.filter($"doc_id" >= 15)
      val incr = DedupOps.exciseAgainstIndex(batchDf,
          DedupOps.spanGramIndex(corpusDf, k), k)
        .as[(Long, Int, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val fullBatchSlice = gotExcise.filter(_._1 >= 15L)
      assert(incr == fullBatchSlice,
        s"incremental excision diverged from the full-run slice on $trial")
    }
  }

  test("exciseAgainstIndex replay defense: self-hits excluded, batch re-derives its own excision") {
    // the torn-batch scenario the landing job documents: a micro-batch's
    // post-excision grams reached the span index, the checkpoint did not
    // commit, and the SAME batch replays against an index that now
    // contains its own output. With the (doc_id, gh) index the probe
    // excludes same-doc hits, so the replay derives the first attempt's
    // excision exactly instead of excising the batch to nothing.
    val k = 8
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bTail = "lambda mu nu xi omicron pi rho sigma"
    val batch = Seq((1L, a), (2L, s"$a $bTail")).toDF("doc_id", "text")
    val first = DedupOps.exciseDuplicatedSpans(batch, k)
      .as[(Long, Int, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(first(2L)._2 > 0 && first(2L)._3 == bTail,
      s"fixture sanity: doc 2's copied prefix must be cut, got $first")
    // index state after the torn first attempt: grams of the FINAL texts
    val finalTexts = Seq((1L, a), (2L, bTail)).toDF("doc_id", "text")
    val index = DedupOps.spanGramIndex(finalTexts, k)
    val replay = DedupOps.exciseAgainstIndex(batch, index, k)
      .as[(Long, Int, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(replay == first,
      s"replay must re-derive the first attempt's excision:\n$replay\nvs\n$first")
    // negative control: a legacy gh-only index has no owner column, so
    // the batch's own grams excise it to nothing — the reason the index
    // carries doc_id
    val legacy = DedupOps.exciseAgainstIndex(batch, index.select($"gh"), k)
      .as[(Long, Int, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(legacy(1L)._3.isEmpty && legacy(2L)._3.isEmpty,
      s"legacy index should self-excise (documents the defense): $legacy")
  }

  test("exciseAgainstIndex: null owners in a mixed legacy index still count as foreign hits") {
    // a span-index directory that accreted legacy gh-only files BEFORE the
    // (doc_id, gh) upgrade resolves legacy rows with doc_id = null under
    // the new schema. A null-unsafe owner comparison (doc_id =!= __isrc)
    // evaluates to null there and silently drops every pre-upgrade gram
    // from matching — cross-batch excision would quietly lose the
    // pre-upgrade corpus. The null-safe probe treats an unknown owner as
    // a foreign-document hit (the corpus saw that substring first).
    val k = 8
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bTail = "lambda mu nu xi omicron pi rho sigma"
    val batch = Seq((10L, s"$a $bTail")).toDF("doc_id", "text")
    val legacyRows = DedupOps
      .spanGramIndex(Seq((1L, a)).toDF("doc_id", "text"), k)
      .select(lit(null).cast("long").as("doc_id"), $"gh")
    val out = DedupOps.exciseAgainstIndex(batch, legacyRows, k)
      .as[(Long, Int, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(10L)._2 > 0 && out(10L)._3 == bTail,
      s"null-owner index grams must still excise the copied prefix: $out")
  }

  test("componentSplit: no near-dup pair straddles the holdout boundary") {
    import graft.ops.SampleOps
    val subset = docs.filter($"doc_id" < 1000)
    val pairs = DedupOps.ngramJaccardPairs(subset, n = 3, threshold = 0.3)
      .select($"doc_a", $"doc_b")
    val split = DedupOps.componentSplit(subset, pairs, holdoutPct = 20,
        salt = "lf")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val ps = pairs.as[(Long, Long)].collect()
    assert(ps.nonEmpty, "fixture must contain near-dup pairs")
    assert(ps.forall { case (a, b) => split(a) == split(b) },
      "a near-dup pair crossed the split — evaluation leak")
    assert(split.values.toSet == Set("train", "holdout"),
      "both sides must be populated")
    // the doc-keyed split WOULD leak on this fixture — the failure mode
    // the component key exists to prevent (deterministic: if the fixture
    // ever stops leaking naively, strengthen it, don't weaken this pin)
    val naive = SampleOps.trainHoldoutSplit(subset, $"doc_id", 20, "lf")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(ps.exists { case (a, b) => naive(a) != naive(b) },
      "fixture sanity: the doc-keyed split should cross at least one pair")
  }

  test("componentSplit pins nothing in the session cache") {
    // connectedComponents' contract hands the caller a persisted frame to
    // unpersist; componentSplit embeds the labels in a LAZY result a
    // caller may hold indefinitely, so it must resolve that handle itself
    // (materialize + unpersist) — repeated calls in a long-running session
    // must not accrete pinned cache entries.
    spark.catalog.clearCache()
    val subset = docs.filter($"doc_id" < 1000)
    // literal pairs (ngramJaccardPairs has its OWN documented cache
    // contract — using it here would blame its persist on componentSplit)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val split = DedupOps.componentSplit(subset, pairs, holdoutPct = 20,
      salt = "leak")
    assert(split.count() > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "componentSplit leaked a cached frame into the session cache")
  }

  test("mixturePipeline: duplicate-heavy stratum planned on UNIQUE mass; resample tracks the corrected plan") {
    import graft.ops.SampleOps
    // two strata with EQUAL raw char mass; 'b' is half exact duplicates.
    // Planned on raw mass a 50/50 target keeps both whole (the naive
    // plan); planned on unique mass 'b' binds the mix (2000 unique chars
    // against the 0.5 share → mix_total 4000) and 'a' downsamples to
    // exactly 0.5 — the correction is the difference, spec-pinned.
    val a = (0 until 40).map(i =>
      (i.toLong, s"alpha document $i " + ("x " * 40), "en", "a", 100L))
    val bu = (0 until 20).map(i =>
      ((100 + i).toLong, s"beta document $i " + ("y " * 40), "en", "b", 100L))
    val bd = (0 until 20).map(i => // exact copies of bu's texts
      ((200 + i).toLong, s"beta document $i " + ("y " * 40), "en", "b", 100L))
    val corpus = (a ++ bu ++ bd)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val targets = Map("a" -> 0.5, "b" -> 0.5)
    // fixture sanity: the NAIVE (raw-mass) plan keeps both strata whole —
    // the duplicate inflation the correction exists to cancel
    val naive = SampleOps.mixtureWeights(corpus, $"source", $"n_chars", targets)
      .select($"stratum", $"sample_frac").as[(String, Double)].collect().toMap
    assert(naive == Map("a" -> 1.0, "b" -> 1.0), s"naive plan: $naive")
    val mixed = SampleOps.mixturePipeline(corpus, "source", $"doc_id",
      $"n_chars", targets, salt = "s")
    val kept = mixed.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // binding stratum (b, on unique mass) rides whole through the resample
    assert(kept("b") == 40L, s"binding stratum must keep 1.0: $kept")
    // 'a' downsamples at EXACTLY the corrected frac (0.5): the kept set is
    // the deterministic md5 micro-bucket rule, recomputed independently
    val expectedA = corpus.filter($"source" === "a").filter(
      pmod(conv(substring(md5(concat_ws("|", lit("s"),
        $"doc_id".cast("string"))), 1, 15), 16, 10).cast("long"),
        lit(1000000L)) < 500000L).count()
    assert(kept("a") == expectedA,
      s"corrected frac 0.5 must select the md5 rule's rows: $kept vs $expectedA")
    assert(kept("a") < 40L, "correction must actually downsample 'a'")
  }

  test("mixtureResample: binding stratum kept whole, keep rates track the plan") {
    import graft.ops.SampleOps
    val targets = Map("en" -> 0.4, "es" -> 0.2, "fr" -> 0.15,
      "de" -> 0.15, "zh" -> 0.1)
    val plan = SampleOps.mixtureWeights(docs, $"lang", $"n_chars", targets)
    val fracs = plan.select($"stratum", $"sample_frac")
      .as[(String, Double)].collect().toMap
    assert(fracs.values.exists(_ == 1.0), "a binding stratum must keep 1.0")
    val before = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val mixed = SampleOps.mixtureResample(docs, $"lang", $"doc_id", plan)
    val after = mixed.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    fracs.foreach { case (lang, f) =>
      val kept = after.getOrElse(lang, 0L).toDouble / before(lang)
      if (f == 1.0) assert(kept == 1.0, s"binding stratum $lang lost docs")
      else assert(math.abs(kept - f) < 0.15,
        s"$lang kept $kept of docs vs planned $f")
    }
    // re-runs select the same rows (pure function of corpus, plan, salt)
    val again = SampleOps.mixtureResample(docs, $"lang", $"doc_id", plan)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == mixed.select($"doc_id").as[Long].collect().toSet)
  }

  test("sampled k-means fits: deterministic rows, bounded build, recall holds on the fixture") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // IVF: the half-corpus hash-sample fit is bit-reproducible (same rows
    // every run by construction) and its index still clears the same
    // recall floor the full fit is pinned to
    val m1 = SimilarityOps.fitIvfKmeans(emb, 16, samplePct = 50)
    val m2 = SimilarityOps.fitIvfKmeans(emb, 16, samplePct = 50)
    assert(m1.clusterCenters.map(_.toArray.toSeq).toSeq ==
      m2.clusterCenters.map(_.toArray.toSeq).toSeq,
      "sampled IVF fit must be deterministic")
    val approx = SimilarityOps.ivfTopKWithModel(emb, queries, 5, m1, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"sampled-fit IVF recall $recall")
    // PQ: sampled codebooks reproduce exactly and ADC ordering still
    // beats the raw-ADC floor the full-fit codebooks are pinned to
    val cb1 = SimilarityOps.pqCodebooksKmeans(emb, m = 8, k = 16, samplePct = 50)
    val cb2 = SimilarityOps.pqCodebooksKmeans(emb, m = 8, k = 16, samplePct = 50)
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.map(_.map(_.toSeq).toSeq).toSeq,
      "sampled PQ codebooks must be deterministic")
    val adc = SimilarityOps.pqTopK(emb, queries, 5, cb1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adcRecall = (adc & exact).size.toDouble / exact.size
    assert(adcRecall >= 0.15, s"sampled-fit ADC recall $adcRecall")
  }

  test("cell-pruned semantic decontamination: sound vs exact, full coverage, useful recall") {
    val corpus = emb.filter($"vec_id" % 10 =!= 7)
    val bench = emb.filter($"vec_id" % 10 === 7)
    val exact = DedupOps.decontaminateSemantic(corpus, bench, 0.35)
      .select($"vec_id", $"max_sim6", $"contaminated")
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val cells = DedupOps.decontaminateSemanticCells(corpus, bench, 0.35,
        nCells = 16, nProbe = 6)
      .select($"vec_id", $"max_sim6", $"contaminated")
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // flag-don't-drop coverage: every corpus vector appears in both
    assert(cells.keySet == exact.keySet,
      s"coverage hole: ${exact.keySet.diff(cells.keySet).take(5)}")
    // soundness by construction: the pruned max is over a SUBSET of the
    // benchmark, so it lower-bounds the exact max and never flags a
    // vector the exact pass wouldn't
    assert(cells.forall { case (id, (s6, c)) =>
      s6 <= exact(id)._1 && (!c || exact(id)._2) },
      "pruned max exceeded exact max or flagged a non-contaminated vector")
    // recall on the shipped fixture (deterministic): the probed cells
    // must find the dominant share of true contamination
    val truePos = exact.count(_._2._2)
    val found = cells.count { case (id, (_, c)) => c && exact(id)._2 }
    assert(truePos > 0, "fixture sanity: exact pass must flag something")
    assert(found.toDouble / truePos >= 0.7,
      s"cell-pruned recall too low: $found/$truePos")
  }

  test("recallAtK: identity recall 1, disjoint recall 0, lost queries still surface") {
    val exact = SimilarityOps.bruteForceTopK(emb, emb.filter($"vec_id" < 5), 3)
    val self = SimilarityOps.recallAtK(exact, exact, 3)
      .select($"query_id", $"hits", $"n_exact", $"recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(self.length == 5, s"every query must appear, got ${self.length}")
    assert(self.forall { case (_, h, n, r) => h == n && r == 1.0 },
      s"identity recall must be 1.0: ${self.toSeq}")
    // an approx index that returned nothing (or garbage) for every query:
    // queries surface with recall 0 instead of vanishing from the report
    val garbage = exact.withColumn("neighbor_id", col("neighbor_id") + 1000000L)
    val zero = SimilarityOps.recallAtK(exact, garbage, 3)
      .select($"query_id", $"hits", $"recall")
      .as[(Long, Long, Double)].collect()
    assert(zero.length == 5 && zero.forall { case (_, h, r) => h == 0L && r == 0.0 },
      s"disjoint recall must be 0.0 for every query: ${zero.toSeq}")
    // the one-pass multi-index report agrees with the per-leg operator
    val report = SimilarityOps.recallReport(exact,
        Seq("self" -> exact, "none" -> garbage), 3)
      .select($"method", $"query_id", $"recall")
      .as[(String, Long, Double)].collect()
    assert(report.length == 10, s"5 queries x 2 methods, got ${report.length}")
    assert(report.forall { case (m, _, r) =>
      (m == "self" && r == 1.0) || (m == "none" && r == 0.0) },
      s"report diverged from per-leg recall: ${report.toSeq}")
  }

  test("IVF-PQ: residual coding beats flat PQ at equal code bytes; learned variant well-formed") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
    val cents = emb.orderBy($"vec_id").limit(16)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val detCbs = SimilarityOps.ivfpqCodebooks(emb, cents, m = 8, kCodes = 16)
    // the degenerate-codebook regression: centroid vectors' residuals are
    // zero; the training slice must exclude them or every reconstruction
    // collapses onto its centroid
    assert(detCbs.flatten.exists(_.exists(_ != 0.0)),
      "residual codebooks must not be all-zero")
    val ivfpq = SimilarityOps.ivfpqTopKWith(emb, queries, k = 5, cents,
      detCbs, nProbe = 4)
    val flat = SimilarityOps.pqTopK(emb, queries, k = 5,
      SimilarityOps.pqCodebooks(emb, m = 8, k = 16))
    // same m=8, kCodes=16 → identical code bytes per vector; residual
    // coding spends them on what the centroid didn't explain
    val rep = SimilarityOps.recallReport(exact,
        Seq("ivfpq" -> ivfpq, "pq" -> flat), k = 5)
      .groupBy($"method").agg(avg($"recall").as("r"))
      .as[(String, Double)].collect().toMap
    assert(rep("ivfpq") >= rep("pq"),
      s"residual coding must not lose recall at equal code bytes: $rep")
    // learned variant (k-means cells + k-means residual codebooks): full
    // result surface, every query served
    val km = SimilarityOps.fitIvfKmeans(emb, nCells = 16)
    val kmCents = km.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray.map(_.toFloat)) }
    val learned = SimilarityOps.ivfpqTopKWith(emb, queries, k = 5, kmCents,
      SimilarityOps.ivfpqCodebooksKmeans(emb, kmCents, m = 8, kCodes = 16),
      nProbe = 4)
      .select($"query_id", $"rank").as[(Long, Int)].collect()
    assert(learned.length == 50, s"10 queries x top-5, got ${learned.length}")
    assert(learned.groupBy(_._1)
      .forall(_._2.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
  }

  test("LSH kNN join: well-formed ranks, exact sims, high-sim neighbors found") {
    val knn = SimilarityOps.knnJoinLsh(emb, k = 3)
      .select($"query_id", $"rank", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(knn.nonEmpty, "fixture should produce kNN rows")
    // per query: ranks contiguous from 1, sims non-increasing, no dup neighbor
    knn.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"query $q ranks not contiguous")
      assert(sorted.map(_._3).distinct.length == sorted.length,
        s"query $q repeated a neighbor")
      sorted.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0)._4 >= w(1)._4,
          s"query $q sims not non-increasing")
      }
    }
    // reported sims are the exact cosine, not an estimate
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    knn.take(50).foreach { case (q, _, n, sim) =>
      val expect = SimilarityOps.cosineLocal(vecs(q).toSeq, vecs(n))
      assert(math.abs(sim - expect) < 1e-12, s"sim mismatch for ($q,$n)")
    }
    // every strong near-dup pair must surface as a neighbor of its partner
    // (same 8x8 banding theory as the pairs test: recall ~0.75 at sim 0.8)
    val hot = SimilarityOps.nearDupPairs(emb, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    if (hot.nonEmpty) {
      val got = knn.map(r => (r._1, r._3)).toSet
      val found = hot.count(p => got((p._1, p._2)) || got((p._2, p._1)))
      val recall = found.toDouble / hot.length
      assert(recall >= 0.5, s"high-sim kNN recall $recall over ${hot.length}")
    }
  }

  test("contrastive pairs: deterministic draws, no self-negatives, positives beat negatives on average") {
    val n = emb.count()
    val pairs = SimilarityOps.contrastivePairs(emb, n, nNeg = 2)
      .as[(Long, String, Long)].collect()
    val (pos, neg) = pairs.partition(_._2 == "pos")
    assert(neg.length == n * 2, "every anchor draws exactly nNeg negatives")
    assert(neg.forall(p => p._1 != p._3), "a negative must never be the anchor")
    assert(neg.forall(p => p._3 >= 0 && p._3 < n), "draws stay in the id space")
    // positives are nearest neighbors: mean cosine must exceed the
    // negatives' mean (random draws) by a clear margin
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    def meanSim(ps: Array[(Long, String, Long)]) =
      ps.map(p => SimilarityOps.cosineLocal(vecs(p._1).toSeq, vecs(p._3)))
        .sum / ps.length
    assert(pos.nonEmpty && meanSim(pos) > meanSim(neg) + 0.1,
      s"pos ${meanSim(pos)} vs neg ${meanSim(neg)}")
    // pure function of the corpus: a second invocation is identical
    val again = SimilarityOps.contrastivePairs(emb, n, nNeg = 2)
      .as[(Long, String, Long)].collect()
    assert(pairs.toSet == again.toSet)
  }

  test("srp signature: native kernel matches a scala re-computation") {
    import graft.functions.SrpCoef
    val rows = emb.limit(20).select($"vec_id", $"embedding",
      graft.functions.SketchFunctions.srp_signature($"embedding", 64, 42L).as("sig"))
      .as[(Long, Array[Float], Long)].collect()
    rows.foreach { case (_, v, sig) =>
      var expect = 0L
      for (p <- 0 until 64) {
        var acc = 0.0
        for (d <- v.indices) acc += v(d).toDouble * SrpCoef.coef(p, d, 42L)
        if (acc > 0) expect |= (1L << p)
      }
      assert(sig == expect)
    }
  }

  test("native CosineSimilarity agrees with the HOF kernel to float precision") {
    // zip_with multiplies in the array element type (float), so the HOF
    // kernel carries ~1e-8 relative error; the native kernel computes
    // products in double (matching the oracle formulation exactly).
    val both = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(2000)
      .select(
        SimilarityOps.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        SimilarityOps.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(both.filter(abs($"native" - $"hof") > 1e-6).count() == 0)
  }

  test("cosine_sim registers for SQL and rejects wrong types") {
    graft.functions.VectorFunctions.register(spark)
    emb.limit(5).createOrReplaceTempView("emb_sql_t")
    val r = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS s FROM emb_sql_t")
      .as[Double].collect()
    assert(r.forall(s => math.abs(s - 1.0) < 1e-12)) // self-similarity = 1
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(vec_id, embedding) FROM emb_sql_t").collect()
    }
    assert(err.getMessage.contains("cosine_sim") || err.getMessage.contains("DATATYPE"))
  }

  test("cosine kernel: hand-checked values") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val sims = df.select(SimilarityOps.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(math.abs(sims(1)) < 1e-12)
    assert(math.abs(sims(2) - math.sqrt(0.5)) < 1e-12)
  }

  test("text kernels: counts, ratios, langid, fingerprint reflow-stability") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "el perro de la casa y los gatos por que"),
      (3L, "zzz qqq vvv"),
      (4L, "the  quick   brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextOps.tokenCount($"text").as("n"),
      TextOps.langId($"text").as("lang"),
      TextOps.fingerprint($"text").as("fp")).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n") == 9)
    assert(out(0).getAs[String]("lang") == "en")
    assert(out(1).getAs[String]("lang") == "es")
    assert(out(2).getAs[String]("lang") == "und")
    // fingerprint survives whitespace reflow
    assert(out(0).getAs[String]("fp") == out(3).getAs[String]("fp"))
    // bpe-ish subtokens: punctuation splits
    val sub = Seq((1L, "don't stop, now!")).toDF("doc_id", "text")
      .select(TextOps.bpeishTokenCount($"text")).as[Int].head()
    assert(sub == 7) // don ' t stop , now !
  }

  test("winnow fingerprint is stable under a small tail edit") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val df = Seq((1L, base + "tail one"), (2L, base + "tail two")).toDF("doc_id", "text")
    val fps = df.select(TextOps.winnowFingerprint($"text", 8)).as[Long].collect()
    assert(fps(0) == fps(1)) // min window-hash lands in the shared prefix
  }

  test("funnelStages: strict ordered chain; equal-ts and out-of-order excluded") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full funnel in order → 3
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (2L, t("2024-01-01 10:01:00"), 1L, "click"),
      (3L, t("2024-01-01 10:02:00"), 1L, "purchase"),
      // user 2: purchase BEFORE the click chain → stops at 2
      (4L, t("2024-01-01 09:00:00"), 2L, "purchase"),
      (5L, t("2024-01-01 10:00:00"), 2L, "view"),
      (6L, t("2024-01-01 11:00:00"), 2L, "click"),
      // user 3: click at the SAME ts as the view — strict > keeps stage 1
      (7L, t("2024-01-01 10:00:00"), 3L, "view"),
      (8L, t("2024-01-01 10:00:00"), 3L, "click"),
      // user 4: never viewed → 0
      (9L, t("2024-01-01 10:00:00"), 4L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = SessionOps.funnelStages(ev, Seq("view", "click", "purchase"))
      .select("user_id", "funnel_stage")
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0), s"got $out")
  }

  test("cohortRetention counts returning users per (cohort week, offset)") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-02 10:00:00"), 1L, "view"), // u1 cohort week 0
      (2L, t("2024-01-09 10:00:00"), 1L, "view"), // u1 returns week 1
      (3L, t("2024-01-10 10:00:00"), 2L, "view")  // u2 cohort week 1
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = SessionOps.cohortRetention(ev, "2024-01-01")
      .select("cohort_week", "week_offset", "n_users")
      .as[(Int, Int, Long)].collect().toSet
    assert(out == Set((0, 0, 1L), (0, 1, 1L), (1, 0, 1L)), s"got $out")
  }

  test("eventTransitions counts consecutive pairs in (ts, event_id) order") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (2L, t("2024-01-01 10:01:00"), 1L, "click"),
      (3L, t("2024-01-01 10:02:00"), 1L, "click"),
      (4L, t("2024-01-01 10:00:00"), 2L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = SessionOps.eventTransitions(ev)
      .select("from_type", "to_type", "n")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("view", "click", 1L), ("click", "click", 1L)),
      s"got $out")
  }

  test("sessionize splits on gap > 30min and rolls up exactly") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "view", 1.0),
      (2L, ts("2024-01-01 00:10:00"), 10L, "click", 2.0),
      (3L, ts("2024-01-01 01:00:00"), 10L, "view", 4.0),   // 50min gap → new session
      (4L, ts("2024-01-01 00:00:00"), 11L, "view", 8.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = SessionOps.sessionStats(ev).orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "session_value")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((10L, 1L, 2L, 3.0), (10L, 2L, 1L, 4.0), (11L, 1L, 1L, 8.0)))
  }

  test("multimodal: stub decode is deterministic; frame sampling arithmetic") {
    val media = MultimodalOps.asMediaTable(docs)
    val f1 = MultimodalOps.decodeFeatures(media).collect().sortBy(_.doc_id)
    val f2 = MultimodalOps.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(m => m.n_bytes > 0 && m.feature_norm > 0))
    // every third doc is video; frames sampled at stride 30
    val feats = MultimodalOps.decodeFeatures(media)
    val frames = MultimodalOps.sampleFrames(feats, stride = 30)
    val perDoc = frames.groupBy("doc_id").count()
      .join(feats.toDF().select($"doc_id", $"n_frames"), "doc_id")
      .withColumn("expected", ceil($"n_frames" / 30.0))
      .filter($"count" =!= $"expected")
    assert(perDoc.count() == 0)
  }

  test("HLL daily sketches union to within 5% of the exact global distinct") {
    val ev = Tables.load(spark, dir, "events")
    val exact = ev.select(countDistinct($"user_id")).as[Long].head()
    val approx = ev
      .groupBy(to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sketch"))
      .agg(hll_sketch_estimate(hll_union_agg($"sketch")))
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"HLL union estimate $approx vs exact $exact")
  }

  test("approx quantiles track the exact percentiles within rank-error bounds") {
    // The scale path (ext_value_quantiles_approx) must stay close to the
    // audit path (value_quantiles): GK sketch at accuracy=10000 guarantees
    // rank error <= n/10000; on the fixture's value distribution that
    // translates to a tight value band. Compare per event_type.
    val events = Tables.load(spark, dir, "events")
    val exact = SparkEntry.queries("value_quantiles")(spark, dir)
      .select($"event_type", $"p50", $"p90", $"p99")
    val approx = SparkEntry.queries("ext_value_quantiles_approx")(spark, dir)
      .select($"event_type", $"p50".as("a50"), $"p90".as("a90"), $"p99".as("a99"))
    val joined = exact.join(approx, "event_type").collect()
    assert(joined.length >= 3, "expect one row per event_type")
    // The GK guarantee is on RANK, not value: the returned value's
    // empirical quantile must sit within eps of the requested q (value
    // distance is unbounded in a sparse tail, where adjacent order
    // statistics can be far apart). eps = sketch rank error (1e-4) +
    // one-sample discretization (1/n per group) + slack.
    val byType = events.select($"event_type", $"value")
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted }
    joined.foreach { r =>
      val et = r.getString(0)
      val vs = byType(et)
      val eps = 1e-4 + 2.0 / vs.length + 0.005
      def rankOf(v: Double): Double = {
        val le = vs.count(_ <= v)
        le.toDouble / vs.length
      }
      def chk(q: Double, a: Double, name: String): Unit = {
        val rf = rankOf(a)
        assert(rf >= q - eps && rf <= q + eps,
          s"$et $name: approx=$a sits at empirical quantile $rf, want $q±$eps")
      }
      chk(0.5, r.getDouble(4), "p50")
      chk(0.9, r.getDouble(5), "p90")
      chk(0.99, r.getDouble(6), "p99")
      // and the approx value must be an actual sample of the group
      Seq(r.getDouble(4), r.getDouble(5), r.getDouble(6))
        .foreach(a => assert(vs.contains(a), s"$et: $a is not a data value"))
    }
  }

  test("approx_count_distinct lands within 10% of exact") {
    val ev = Tables.load(spark, dir, "events")
    val both = ev.groupBy($"event_type").agg(
      approx_count_distinct($"user_id").as("approx"),
      countDistinct($"user_id").as("exact"))
      .select($"approx".cast("double"), $"exact".cast("double"))
      .as[(Double, Double)].collect()
    both.foreach { case (a, e) =>
      assert(math.abs(a - e) / e <= 0.10, s"approx $a vs exact $e") }
  }

  test("exactDedup keeps exactly the first row per key") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      ("k1", ts("2024-01-01 00:00:01"), "second"),
      ("k1", ts("2024-01-01 00:00:00"), "first"),
      ("k2", ts("2024-01-01 00:00:00"), "only")).toDF("k", "ts", "tag")
    val out = DedupOps.exactDedup(df, Seq("k"), Seq(col("ts")))
      .select("k", "tag").as[(String, String)].collect().toSet
    assert(out == Set(("k1", "first"), ("k2", "only")))
  }

  test("segment dedup: global first occurrence wins, docs rebuilt in order") {
    val tiny = Seq(
      (1L, "a b c d e f g h i j"),  // two segments, both first occurrences
      (2L, "a b c d e x y z w v"),  // first segment repeats doc 1's
      (3L, "f g h i j")             // whole doc repeats doc 1's 2nd segment
    ).toDF("doc_id", "text")
    val out = DedupOps.segmentDedup(tiny, width = 5).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 2L, "a b c d e f g h i j")))
    assert(out(1) == ((2L, 2L, 1L, "x y z w v")))
    assert(out(2) == ((3L, 1L, 0L, "")))
  }

  test("segment dedup invariants on the real corpus: survivors = distinct segments") {
    val out = DedupOps.segmentDedup(docs, width = 5)
    assert(out.count() == docs.count(), "every doc survives with bookkeeping")
    assert(out.filter($"n_kept" > $"n_segments").count() == 0)
    // each distinct segment survives exactly once corpus-wide
    val distinctSegs = docs
      .select(explode(org.apache.spark.sql.functions.transform(
        sequence(lit(0),
          floor((size(split($"text", "\\s+")) - 1) / lit(5)).cast("int")),
        i => array_join(slice(split($"text", "\\s+"), i * 5 + 1, lit(5)), " "))))
      .distinct().count()
    val totalKept = out.agg(sum($"n_kept")).as[Long].head()
    assert(totalKept == distinctSegs,
      s"kept $totalKept segments vs $distinctSegs distinct")
  }

  test("decontamination: shared 5-grams flag a doc; clean docs pass") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated words nothing shared here at all")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "quick brown fox jumps over a fence")).toDF("doc_id", "text")
    val out = DedupOps.decontaminate(corpus, bench, n = 5).orderBy($"doc_id")
      .as[(Long, Long, Boolean)].collect()
    // exactly one shared 5-gram: "quick brown fox jumps over"
    assert(out(0) == ((1L, 1L, true)))
    assert(out(1) == ((2L, 0L, false)))
  }

  test("bloom decontamination: superset of exact, no false negatives, bounded FPs") {
    val corpus = docs.filter(pmod($"doc_id", lit(10)) =!= 7)
    val bench = docs.filter(pmod($"doc_id", lit(10)) === 7)
    val exact = DedupOps.decontaminate(corpus, bench, n = 5)
    val bloom = DedupOps.decontaminateBloom(corpus, bench, n = 5)
    val exactHits = exact.filter($"contaminated")
      .select("doc_id").as[Long].collect().toSet
    val bloomHits = bloom.filter($"contaminated")
      .select("doc_id").as[Long].collect().toSet
    assert(exactHits.nonEmpty, "fixture should contain planted near-dups")
    assert(exactHits.subsetOf(bloomHits),
      s"bloom missed ${exactHits -- bloomHits} — one-sided error violated")
    val nCorpus = corpus.count()
    assert((bloomHits -- exactHits).size <= nCorpus / 20 + 2,
      s"false-positive docs ${(bloomHits -- exactHits).size} of $nCorpus")
    // per-doc: the bloom gram-hit count never undercounts the exact one
    val under = exact.select($"doc_id", $"n_gram_hits".as("e"))
      .join(bloom.select($"doc_id", $"n_gram_hits".as("b")), Seq("doc_id"))
      .filter($"b" < $"e").count()
    assert(under == 0, "bloom undercounted grams for some doc")
  }

  test("canonical election: longest member per component, singletons self-canonical") {
    val meta = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 5L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = DedupOps.canonicalDocs(meta, pairs).orderBy($"doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 3L, false),  // component of {1,2,3}, labeled by min id 1
      (2L, 1L, 3L, true),   // longest member (30 chars) is canonical
      (3L, 1L, 3L, false),
      (4L, 4L, 1L, true)))  // singleton: its own canonical
  }

  test("canonical election on the real corpus: exactly one canonical per component") {
    val pairs = DedupOps.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
      .select($"doc_a", $"doc_b")
    val out = DedupOps.canonicalDocs(docs, pairs)
    assert(out.count() == docs.count())
    val bad = out.groupBy($"component")
      .agg(sum(when($"is_canonical", 1L).otherwise(0L)).as("n_canon"))
      .filter($"n_canon" =!= 1L).count()
    assert(bad == 0, "every component must elect exactly one canonical")
  }

  test("repetition signals: hand-computed n-gram mode fractions") {
    val fixture = Seq(
      (1L, "a a a b"),        // top word a=3/4; bigrams [a a, a a, a b] → 2/3;
                              // trigrams [a a a, a a b] → 1/2; distinct 2 → dup 0.5
      (2L, "x"),              // single word: bigram/trigram fracs are 0.0
      (3L, "p q r s t"),      // all distinct: dup 0, top word 1/5
      (4L, "   ")             // whitespace-only: 0 words → all-zero
                              // fractions and keep (never NULLs from 0/0)
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(fixture).orderBy($"doc_id")
      .select($"doc_id", $"n_words", $"dup_word_frac", $"top_word_frac",
        $"top_bigram_frac", $"top_trigram_frac", $"keep")
      .as[(Long, Int, Double, Double, Double, Double, Boolean)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 4, 0.5, 0.75, 2.0 / 3, 0.5, false),
      (2L, 1, 0.0, 1.0, 0.0, 0.0, false),
      (3L, 5, 0.0, 0.2, 0.25, 1.0 / 3, false), // trigram 1/3 > 0.15 gate
      (4L, 0, 0.0, 0.0, 0.0, 0.0, true)))
  }

  test("repetition signals on the real corpus: bounded, complete, discriminating") {
    val out = TextOps.repetitionSignals(docs).cache()
    try {
      assert(out.count() == docs.count())
      val bad = out.filter(
        $"dup_word_frac" < 0 || $"dup_word_frac" > 1 ||
          $"top_word_frac" <= 0 || $"top_word_frac" > 1 ||
          $"top_bigram_frac" < 0 || $"top_bigram_frac" > 1 ||
          $"top_trigram_frac" < 0 || $"top_trigram_frac" > 1 ||
          // mode fraction can never be below uniform 1/n
          $"top_word_frac" * $"n_words" < 1.0).count()
      assert(bad == 0)
      // the word-soup corpus is duplicate-heavy at the word level but below
      // the conventional n-gram gates (top word ≤ 0.25 here) — so defaults
      // keep everything, and a tightened gate splits the corpus
      val dupMax = out.agg(max($"dup_word_frac")).as[Double].head()
      assert(dupMax > 0.5, s"repetitive docs exist by construction ($dupMax)")
      assert(out.filter($"keep").count() == out.count(), "defaults keep all")
      val tight = TextOps.repetitionSignals(docs, maxTopWordFrac = 0.1)
      val keptTight = tight.filter($"keep").count()
      assert(keptTight > 0 && keptTight < out.count(),
        s"a 0.1 top-word gate must split the corpus (kept $keptTight)")
    } finally { out.unpersist(); () }
  }
}
