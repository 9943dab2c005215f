package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression pins: the scale properties the library claims
  * (broadcast enrichment joins, parquet pushdown, bounded-heap top-k, no
  * nested-loop rewrites for as-of/range joins) must be visible in the plan,
  * not just in comments. Plans are inspected pre-execution via explain on
  * sf0.001 — shapes, not timings. */
class PlanAssertionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    // plan pins assert the COLD shape; another suite's persisted frame
    // (e.g. ml_churn_scores' gold cache) must not substitute an
    // InMemoryRelation into the plan under test — suite order is arbitrary
    spark.sharedState.cacheManager.clearCache()
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
  }

  test("type widening keeps the vectorized columnar scan over mixed-width files") {
    // the widened table mixes INT-era and BIGINT-era parquet: the
    // vectorized reader's native promotion must serve BOTH without
    // dropping to a row-based scan (the whole point of metadata-only
    // widening — a row-based fallback would tax every post-DDL read)
    spark.sharedState.cacheManager.clearCache()
    val df = SparkEntry.queries("ext_type_widening")(spark, dir)
    df.collect() // AQE finalizes the plan only on execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ColumnarToRow"),
      s"widened scan must stay columnar/vectorized:\n$p")
  }

  test("schema evolution: old files project the new columns without a rewrite or a sort") {
    val p = plan("ext_schema_evolution")
    // one aggregate over one catalog scan — no join, no extra exchange
    // beyond the group-by shuffle
    assert(!p.contains("Join"), s"evolved read must not join:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"group-by shuffle only (AQE may add one), got:\n$p")
  }

  test("gold_enriched: every enrichment join is broadcast-hash") {
    val p = plan("gold_enriched")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5,
      s"expected >=5 broadcast joins (4 enrichment + arpu), got:\n$p")
    assert(!p.contains("SortMergeJoin"), "enrichment should not sort-merge")
  }

  test("gold_enriched_onepass: exactly one aggregate shuffle, one broadcast join") {
    val p = plan("gold_enriched_onepass")
    // one partial+final pair over the fused conditional aggregate
    assert("HashAggregate".r.findAllIn(p).size == 2, s"plan:\n$p")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("pricing_summary: shipdate filter reaches the parquet scan") {
    val p = plan("pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
  }

  test("topk_orders_per_customer: partial WindowGroupLimit before the exchange") {
    val p = plan("topk_orders_per_customer")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"bounded-heap top-k missing:\n$p")
  }

  test("theta interval join auto-rewrites to the binned hash join") {
    val p = plan("ext_range_join_auto")
    assert(p.contains("__graft_bin"), s"IntervalJoinRule did not fire:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"still a nested loop:\n$p")
  }

  test("as-of and range joins plan as hash joins, never nested loops") {
    for (q <- Seq("ext_asof_attribution", "ext_range_join_sessions")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q degenerated to a nested loop:\n$p")
    }
  }

  test("silver cleansing pushes its predicates into the scan") {
    val p = plan("silver_clean_customer")
    assert(p.contains("PushedFilters:") && p.contains("IsNotNull"),
      s"no pushdown visible:\n$p")
  }

  test("gold_incremental scan prunes to the cutoff partitions") {
    val p = plan("gold_incremental")
    assert(p.contains("PartitionFilters") && p.contains("p_date"),
      s"no partition pruning visible:\n$p")
    assert("PartitionFilters: \\[[^\\]]*p_date[^\\]]*>=".r.findFirstIn(p).isDefined,
      s"cutoff predicate not in PartitionFilters:\n$p")
  }

  test("IVF assignment is one projection: no exchange, join, or window") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = emb.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val p = graft.ops.SimilarityOps.assignCells(emb, cents)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("Exchange") && !p.contains("Join") && !p.contains("Window"),
      s"assignment must stay row-local:\n$p")
  }

  test("embedding LSH candidates come from a band-bucket equi-join") {
    val p = plan("ext_dedup_embedding_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"LSH degenerated to a nested loop:\n$p")
  }

  test("cube: Expand feeds ONE aggregate pipeline, dim join stays broadcast") {
    val p = plan("cube_revenue")
    assert(p.contains("Expand"), s"cube must plan via Expand:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"customer dim should broadcast:\n$p")
    // Expand multiplies rows by grouping-set count, but partial aggregation
    // still combines map-side: exactly one agg exchange (plus output sort)
    val nAggExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(nAggExchanges == 1, s"expected 1 agg exchange, got $nAggExchanges:\n$p")
  }

  test("full-outer reconcile: hash join, never a nested loop") {
    val p = plan("reconcile_full_outer")
    assert(p.contains("FullOuter"), s"expected a full-outer join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"full outer degenerated to a nested loop:\n$p")
  }

  test("kNN join: band-bucket equi-join candidates, bounded-heap top-k") {
    val p = plan("ext_knn_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"kNN join degenerated to a nested loop:\n$p")
    // per-query top-k must pre-reduce map-side: partial WindowGroupLimit
    // keeps <= k rows per query per partition ahead of the rank exchange
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"expected partial WindowGroupLimit:\n$p")
  }

  test("span dedup family: gram shuffles are hash-keyed, never gram text") {
    for (q <- Seq("ext_dedup_spans", "ext_dedup_excise",
        "ext_dedup_excise_incr")) {
      val p = plan(q)
      // the skew fix's whole point: no exchange may partition by the raw
      // gram string (50-100 bytes/row and hot-key-prone) — only the 8-byte
      // xxhash64 key or doc_id
      assert(!p.contains("hashpartitioning(g#"),
        s"$q shuffles raw gram text:\n$p")
      assert(p.contains("xxhash64"), s"$q lost its hashed gram key:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q went all-pairs:\n$p")
    }
  }

  test("semantic dedup: cell equi-join only — no all-pairs, no nested loop") {
    val p = plan("ext_dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"within-cell pruning degenerated to all-pairs:\n$p")
  }

  test("semantic decontamination: benchmark broadcast, map-side max, one corpus stream") {
    val p = plan("ext_decontaminate_semantic")
    // corpus × benchmark is deliberately a broadcast nested loop (the
    // benchmark is the tiny side) — it must be BROADCAST, never a
    // shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"benchmark side must broadcast:\n$p")
    // per-vector max combines map-side before the exchange
    assert(p.contains("partial_max"), s"max not partially aggregated:\n$p")
  }

  test("sampling queries never read the text column (pruned scan)") {
    for (q <- Seq("ext_sample_split", "ext_sample_stratified")) {
      val p = plan(q)
      val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toSeq
      assert(readSchemas.nonEmpty && readSchemas.forall(!_.contains("text")),
        s"$q reads text it never uses:\n$p")
    }
  }

  test("packing reads only doc_id and text; one exchange on the lane key") {
    val p = plan("ext_pack_documents")
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toSeq
    assert(readSchemas.nonEmpty &&
      readSchemas.forall(s => !s.contains("lang") && !s.contains("source")),
      s"unpruned scan:\n$p")
  }

  test("tfidf: broadcast df dim + partial WindowGroupLimit top-k") {
    val p = plan("ext_text_tfidf")
    assert(p.contains("BroadcastHashJoin"), s"df dim not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"top-k not bounded-heap:\n$p")
  }

  test("bm25: postings filtered before the shuffle, stats broadcast, TakeOrdered top-k") {
    val p = plan("ext_text_bm25")
    // query-term IN-filter must sit below the first exchange (row-local),
    // so the shuffle carries only matching postings
    val firstEx = p.indexOf("Exchange")
    val inFilter = p.indexOf("term")
    assert(firstEx >= 0 && inFilter >= 0, s"missing shuffle or term filter:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"df stats not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k not a bounded heap:\n$p")
    // staged N/avgdl: no scalar subquery or extra agg for corpus stats
    assert(!p.contains("Subquery"), s"corpus stats not staged:\n$p")
  }

  test("lm threshold sweep: one corpus scan, one global aggregate, stack reshape") {
    val p = plan("ext_lm_threshold_sweep")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"sweep must read the corpus exactly once:\n$p")
    assert("HashAggregate".r.findAllIn(p).size == 2,
      s"all thresholds must ride ONE partial+final aggregate:\n$p")
    assert(p.contains("Generate"), s"long-form reshape must be a stack:\n$p")
  }

  test("bm25 rank window keeps its non-foldable partition key") {
    // ext_text_bm25 drops the rank column (the window prunes away there);
    // rank consumers (hybrid fusion) see this plan, where the constant
    // partition key must SURVIVE optimization — it is non-foldable by
    // construction, so WindowExec never takes its empty-partition-spec
    // ("No Partition Defined") warning path
    spark.sharedState.cacheManager.clearCache()
    val p = ops.TextOps.bm25TopDocs(
        Tables.load(spark, dir, "documents"),
        Seq("spark", "stream"), k = 5)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // the pmod key is extracted into a `_w0` projection; a Window node with
    // a populated partition-spec group renders THREE bracket groups
    // (functions, partitionSpec, orderSpec) — an empty spec renders two
    val windowed = """Window \[[^\]]*\], \[(\w+#\d+L?)\], \[""".r
    assert(windowed.findFirstIn(p).isDefined,
      s"rank window lost its non-foldable partition key:\n$p")
  }

  test("bm25 queryset: one corpus scan, broadcast term fan-out, bounded per-query top-k") {
    // AQE's explain shows the pre-reuse plan (stage dedup happens at
    // runtime); compiling with AQE off exposes the static ReuseExchange
    // decision this pin is about — the tf and df consumers must share one
    // postings scan + shuffle
    val pNoAqe = {
      spark.sharedState.cacheManager.clearCache()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try SparkEntry.queries("ext_bm25_queryset")(spark, dir)
        .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    assert("documents\\.parquet".r.findAllIn(pNoAqe).size == 1 &&
      pNoAqe.contains("ReusedExchange"),
      s"query-set retrieval must share one corpus scan:\n$pNoAqe")
    val p = plan("ext_bm25_queryset")
    // query terms / df stats / query fan-out all ride broadcast joins —
    // nothing corpus-sized is shuffled except the (doc, term) tf aggregate
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"term filter + df + query fan-out must broadcast:\n$p")
    // per-query top-k prunes map-side before the rank exchange
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"per-query top-k not bounded-heap:\n$p")
    // staged N/avgdl: no scalar subquery jobs inside the query
    assert(!p.contains("Subquery"), s"corpus stats not staged:\n$p")
  }

  test("lm scoring / quantization: single fused scan — no joins, only the output-sort exchange") {
    for (q <- Seq("ext_text_lm_score", "ext_embed_quantize")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: model/calibration must ride as literals, not joins:\n$p")
      // the only exchange is the rangepartitioning for the final ORDER BY
      assert("Exchange".r.findAllIn(p).size <= 1,
        s"$q: scoring must not shuffle:\n$p")
    }
  }

  test("pq ADC: broadcast query LUTs, bounded-heap top-k, no codebook join") {
    val p = plan("ext_ann_pq")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query LUTs must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"top-k not a partial bounded heap:\n$p")
    // codebooks and codeword norms are literals/closures — exactly one
    // join in the whole plan (corpus x broadcast queries)
    assert("Join".r.findAllIn(p).size == 1, s"unexpected extra join:\n$p")
  }

  test("bpe tokenize: join-free scan; text never reaches the sort") {
    val p = plan("ext_bpe_tokens")
    assert(!p.contains("Join"), s"merge table must ride in the closure:\n$p")
    // the output sort carries only (doc_id, n_chars, counts) — the token
    // arrays and text reduce to ints below the exchange
    val sortIdx = p.indexOf("Sort ")
    assert(sortIdx >= 0 && !p.substring(0, sortIdx).contains("text#"),
      s"text column should not survive into the sort:\n$p")
  }

  test("incremental dedup: staged-index join is hash-equi, never a nested loop") {
    val p = plan("ext_dedup_minhash_incr")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"index join degraded to a product:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no equi join in:\n$p")
  }

  test("heavy hitters: map-side partial sketch, exchange carries one summary per partition") {
    // the point of the Misra-Gries aggregate: partial ObjectHashAggregate
    // before the exchange (O(capacity) summary per task), final after — the
    // shuffle must never carry one row per (token) like a groupBy would
    for (q <- Seq("ext_heavy_tokens", "ext_heavy_users")) {
      val p = plan(q)
      assert("ObjectHashAggregate".r.findAllIn(p).size == 2,
        s"$q: expected partial+final object hash aggregate, got:\n$p")
      assert(p.contains("misra_gries_topk"), s"$q plan lost the sketch:\n$p")
    }
    // the long-item variant reads nothing but the id column
    assert(plan("ext_heavy_users").contains("ReadSchema: struct<user_id:bigint>"))
  }

  test("ANN brute force: scan reads only the projected embedding columns") {
    val p = plan("ext_ann_topk")
    // ReadSchema on the corpus side must not include the label column
    assert(!p.contains("label"), s"unpruned scan:\n$p")
  }

  test("chunking and quality filter never shuffle by key (row-local ops)") {
    // the ops themselves (not the orderBy-wrapped queries): any exchange
    // present may only be OpsUtil.spread's round-robin fan-out — a hash or
    // range partitioning would mean the kernel stopped being row-local
    val docs = Tables.load(spark, dir, "documents")
    for (df <- Seq(graft.ops.TextOps.chunkDocuments(docs),
                   graft.ops.TextOps.qualityFilter(docs))) {
      val p = df.queryExecution
        .explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
        s"row-local op gained a keyed shuffle:\n$p")
      assert(!p.contains("HashAggregate") && !p.contains("Window "),
        s"row-local op gained an aggregate/window:\n$p")
    }
  }

  test("meanPoolEmbeddings: partial agg collapses the explode before one exchange") {
    val emb = Tables.load(spark, dir, "embeddings")
    val p = graft.ops.FeatureOps.meanPoolEmbeddings(emb, "label")
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one keyed exchange:\n$p")
    assert("HashAggregate".r.findAllIn(p).size == 2,
      s"expected partial+final aggregate pair:\n$p")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // at 100 TB a selective dim predicate should become a row-level filter
    // on the fact scan BEFORE the shuffle — Spark's InjectRuntimeFilter
    // does this with a bloom filter; pin that it actually fires for the
    // enrichment-join shape when the join is too big to broadcast
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val cust = Tables.load(spark, dir, "customer")
        .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      val orders = Tables.load(spark, dir, "orders")
      val j = orders.join(cust,
        orders("o_custkey") === cust("c_custkey"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("scaleByGroup: stats join is broadcast, stream is never hash-shuffled") {
    val ev = Tables.load(spark, dir, "events")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
    val p = graft.ops.FeatureOps.scaleByGroup(ev, "event_type", "value")
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("BroadcastHashJoin"), s"stats dim not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"stream got sort-merge shuffled:\n$p")
  }

  test("decontamination: benchmark gram set broadcasts onto the corpus probe") {
    val p = plan("ext_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"gram probe should be a map-side broadcast join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decontamination must never go all-pairs:\n$p")
  }

  test("segment dedup: one global window pass, no all-pairs anywhere") {
    val p = plan("ext_segment_dedup")
    // exactly one Window operator: the global first-occurrence row_number
    // keyed on the segment; rebuild is a hash aggregate, not another sort
    assert("Window \\[row_number".r.findAllIn(p).size == 1, s"plan:\n$p")
    // rn=1 prunes map-side: partial WindowGroupLimit keeps one row per
    // segment BEFORE the exchange, so the shuffle carries distinct-segment
    // cardinality, not corpus cardinality
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"bounded-heap first-occurrence prune missing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"segment dedup must stay equi-keyed:\n$p")
  }

  test("canonical election: both window columns share one component shuffle") {
    val p = plan("ext_dedup_canonical")
    assert("hashpartitioning\\(component".r.findAllIn(p).size == 1,
      s"rank and member-count must reuse one partitioning on component:\n$p")
  }

  test("ext_corpus_health: one corpus scan feeds the two-level aggregation") {
    val p = plan("ext_corpus_health")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"health report must read the corpus once:\n$p")
    assert(!p.contains("Join"), s"no join belongs in the health rollup:\n$p")
  }

  test("ext_feature_psi: bulk rows never shuffle — only broadcast stats and bucket agg") {
    val p = plan("ext_feature_psi")
    // every hash exchange must carry the |buckets|-row bucket counts (the
    // static plan re-derives them for the totals branch; AQE reuses at
    // runtime) — never the bulk event rows; stats join via broadcast only
    val keys = "Exchange hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.nonEmpty && keys.forall(_.startsWith("bucket")),
      s"only the bucket-count exchange belongs, got $keys:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"stats must broadcast, never sort-merge:\n$p")
  }

  test("ext_quality_repetition: zero shuffle — row-local folds end to end") {
    val p = plan("ext_quality_repetition")
    assert(!p.contains("Exchange hashpartitioning"),
      s"repetition signals are row-local; no hash exchange belongs:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"no join/window belongs in a per-row fold:\n$p")
  }

  test("ext_spj_join: the join subtree runs on the storage layout — no exchange") {
    val p = plan("ext_spj_join")
    assert(p.contains("SortMergeJoin"), s"plan:\n$p")
    // nothing BELOW the join may shuffle: both scans arrive co-partitioned
    // by the commit log's bucket identity (the substring after the join
    // line is exactly its subtree in tree-rendered plans)
    val below = p.substring(p.indexOf("SortMergeJoin"))
    assert(!below.contains("Exchange"),
      s"storage-partitioned join must not shuffle its inputs:\n$p")
    // the only hash exchange in the whole plan is the final ≤|priorities|-
    // row aggregation
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the aggregation exchange:\n$p")
  }

  test("ext_metadata_agg: plans as a local scan — no data files, no jobs") {
    val p = plan("ext_metadata_agg")
    assert(p.contains("LocalTableScan"),
      s"metadata aggregate must answer from the manifest:\n$p")
    assert(!p.contains("BatchScan"),
      s"no data scan belongs under a metadata-only aggregate:\n$p")
  }

  test("ext_text_tfidf: the full-vocabulary df join is never hint-forced to broadcast") {
    // dfreq is one row per distinct corpus term — a multi-GB frame at
    // 100 TB. The join must be AQE's choice, not a broadcast() hint: with
    // the broadcast threshold disabled the plan must fall back to a
    // term-keyed shuffled join (a hint would ignore the threshold and
    // force the driver-OOM plan)
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try {
      val p = plan("ext_text_tfidf")
      assert(!p.contains("BroadcastHashJoin"),
        s"dfreq join is hint-forced to broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected the term-keyed shuffled join fallback:\n$p")
    } finally spark.conf.set(k, prev)
  }
}
