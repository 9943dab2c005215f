package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text analysis for training-data pipelines (SURVEY §2.11): token counting,
  * quality scoring, language ID, fingerprinting.
  *
  * Everything is a per-row projection (no shuffle at all) built from
  * codegen'd `functions._` — the whole stage runs as one fused pass over the
  * scan, which is exactly what you want for a 100 TB quality sweep.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish sub-token count: word pieces + standalone punctuation, the
    * classic pre-tokenizer regex shape. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation characters to all characters. */
  def punctRatio(text: Column): Column =
    // nullif guard: an empty document must score null (and fail a gate on
    // the word count), not throw ANSI DIVIDE_BY_ZERO — a landing job hits
    // the empty case whenever span excision consumes a whole doc
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", "")))
      .cast("double") / nullif(length(text), lit(0))

  private[graft] val Stopwords = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "for", "on", "with", "as", "at", "by")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks)
  }

  /** Mean token length — short-token soup and no-space blobs both flag. */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text)

  /** Heuristic quality score in [0, 1]: integer-arithmetic pieces combined
    * in fixed double ops so it is deterministic and oracle-expressible.
    * Signals (à la C4/Gopher rules): reasonable length, some stopwords,
    * not punctuation soup, sane mean token length. */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(50, 10000), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) > 0.05, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val tokOk = when(meanTokenLen(text).between(2.0, 12.0), 1.0).otherwise(0.0)
    (lenOk + stopOk + punctOk + tokOk) / 4.0
  }

  /** Per-language marker-word profiles for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: a real profile table would be a broadcast
    * dimension; the operator shape (score-per-language → argmax) is what
    * scales. */
  private[graft] val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "por"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "nicht"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "wo3", "zai4", "you3"))

  /** Language-ID: count marker hits per language, take the argmax
    * (deterministic first-wins tiebreak in declaration order); no marker at
    * all → "und" (undetermined). Pure integer comparisons → portable. */
  def langId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val scores = LangMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s > 0 && s === best, lang).otherwise(els)
    }
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * engine-portable (unlike murmur3) and stable under reflow. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  // --- PII redaction ----------------------------------------------------

  /** RE2-compatible patterns (identical semantics in Java regex and the
    * DuckDB oracle's RE2): kept deliberately simple — production scrubbing
    * layers more patterns the same way. Order matters: emails first (an
    * address contains dots a later rule might nibble), then IPs, then
    * phone-shaped digit runs. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val PhoneRe = "\\+?\\d[\\d-]{7,14}\\d"

  /** Scrub emails/IPs/phone-shaped tokens to typed placeholder tags —
    * the pre-training PII pass. Pure row-local projection, three chained
    * codegen'd regex replaces, zero shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Per-doc counts of each PII class (the audit side of the scrub). */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailRe), lit(0))),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))))

  /** Winnowing-style robust fingerprint: minimum of the rolling window-hash
    * set — survives small edits anywhere outside the minimizing window.
    * Rolling-hashes the window's token hashes directly instead of
    * materializing each 8-gram string. */
  def winnowFingerprint(text: Column, window: Int = 8): Column =
    array_min(DedupOps.gramHashes(DedupOps.tokenHashes(
      split(lower(text), "\\s+")), window))

  /** Hot-path winnowing over a whole table: tokens and token hashes bound
    * behind projections so nothing re-evaluates inside the rolling loop.
    * `portable = true` swaps the token hash for the md5-derived family
    * (DedupOps.tokenHashes) so the result is DuckDB-oracle-checkable. */
  def winnowFingerprints(docs: DataFrame, window: Int = 8,
                         portable: Boolean = false): DataFrame =
    OpsUtil.spread(docs)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), DedupOps.tokenHashes(col("w"), portable).as("th"))
      .select(col("doc_id"),
        array_min(DedupOps.gramHashes(col("th"), window)).as("winnow_fp"))

  /** Fixed-size token-window chunking with stride — the LLM context-window
    * splitter: emit windows of `chunkSize` whitespace tokens starting every
    * `stride` tokens (overlap = chunkSize − stride; the final window may be
    * short). Purely row-local: tokenize once behind a projection, explode
    * the start offsets, slice in place — linear in corpus size with ZERO
    * shuffle, which is the only shape a 100 TB chunking sweep can afford.
    * chunk_id is the window ordinal (start ÷ stride), so (doc_id, chunk_id)
    * is a stable global key for downstream packing / embedding. */
  def chunkDocuments(docs: DataFrame, chunkSize: Int = 128,
                     stride: Int = 96): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    OpsUtil.spread(docs)
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("toks")) - 1, lit(0)), lit(stride))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        array_join(slice(col("toks"), col("col") + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        size(slice(col("toks"), col("col") + 1, lit(chunkSize)))
          .as("n_chunk_tokens"))
  }

  /** C4/Gopher-style document quality filter: per-doc rule columns plus a
    * `keep` verdict and a stable comma-joined `drop_reasons` audit string.
    * Every signal is a row-local projection over one bound token array —
    * zero shuffle, one fused pass (same posture as [[profile]]).
    *
    * Rules (names appear in drop_reasons in this order):
    *   null_text — NULL document: every metric is NULL so every other rule
    *     would silently skip and the degenerate doc would pass the gate;
    *     this explicit rule drops it with a reason;
    *   too_few_words / too_many_words — word-count bounds;
    *   word_len — mean word length outside [minMeanLen, maxMeanLen];
    *   symbol_ratio — punctuation-to-char ratio above max;
    *   digit_ratio — digit-to-char ratio above max;
    *   low_stopword — stopword fraction below min (non-linguistic soup);
    *   repetitive — duplicate-trigram fraction above max (boilerplate /
    *     template spam; 1 − distinct/total over the doc's word trigrams). */
  def qualityFilter(docs: DataFrame,
                    minWords: Int = 10, maxWords: Int = 5000,
                    minMeanLen: Double = 2.0, maxMeanLen: Double = 12.0,
                    maxSymbolRatio: Double = 0.2, maxDigitRatio: Double = 0.3,
                    minStopwordRatio: Double = 0.02,
                    maxDupTrigramRatio: Double = 0.3,
                    carry: Seq[String] = Nil): DataFrame = {
    val toks = col("__toks")
    val n = size(toks)
    val nWords = n.as("n_words")
    val meanLen = (length(regexp_replace(col("text"), "\\s+", ""))
      .cast("double") / n).as("mean_word_len")
    val symRatio = punctRatio(col("text")).as("symbol_ratio")
    val digRatio = ((length(col("text"))
      - length(regexp_replace(col("text"), "[0-9]", "")))
      .cast("double") / nullif(length(col("text")), lit(0)))
      .as("digit_ratio")
    val stopRatio = (size(filter(col("__ltoks"),
      t => t.isin(Stopwords: _*))).cast("double") / n).as("stopword_ratio")
    // duplicate-trigram fraction: grams built by slicing the bound token
    // array in place (no explode — the array never leaves the row)
    val grams = transform(sequence(lit(1), greatest(n - 2, lit(1))),
      i => array_join(slice(toks, i, lit(3)), " "))
    val dupRatio = when(n >= 3,
        lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams))
      .otherwise(0.0).as("dup_trigram_ratio")
    // `carry`: pass-through columns for downstream pipeline stages (LM
    // gate, dedup hash) — composing via carry keeps the whole prep
    // pipeline join-free, which is the point at 100 TB
    val carryNames = carry.filterNot(_ == "doc_id").distinct
    val scored = OpsUtil.spread(docs)
      .select(Seq(col("doc_id"), col("text"),
        split(col("text"), "\\s+").as("__toks"),
        split(lower(col("text")), "\\s+").as("__ltoks"))
        ++ carryNames.filterNot(_ == "text").map(col): _*)
      .select(Seq(col("doc_id"), nWords, meanLen, symRatio, digRatio,
        stopRatio, dupRatio) ++ carryNames.map(col): _*)
    // concat_ws skips NULLs in both Spark and DuckDB, so each rule emits
    // its name or NULL and the audit string needs no array filtering
    val reasons = concat_ws(",",
      // n_words is NULL exactly when text is NULL (size(split(NULL)) = NULL)
      when(col("n_words").isNull, "null_text"),
      when(col("n_words") < minWords, "too_few_words"),
      when(col("n_words") > maxWords, "too_many_words"),
      when(!col("mean_word_len").between(minMeanLen, maxMeanLen), "word_len"),
      when(col("symbol_ratio") > maxSymbolRatio, "symbol_ratio"),
      when(col("digit_ratio") > maxDigitRatio, "digit_ratio"),
      when(col("stopword_ratio") < minStopwordRatio, "low_stopword"),
      when(col("dup_trigram_ratio") > maxDupTrigramRatio, "repetitive"))
    scored.withColumn("drop_reasons", reasons)
      .withColumn("keep", col("drop_reasons") === "")
  }

  /** Deterministic, engine-portable stand-in for a text-embedding model
    * call: dim i = (md5-derived hash of (text, i) mod 1000) / 999 ∈ [0, 1].
    * The real encoder is an external model service; what the engine owns —
    * and what this exercises — is the Spark-side contract: a row-local
    * projection producing `array<double>`, feeding pooling / ANN / LSH
    * downstream. Swap the expression for a model-serving UDF at the same
    * call site in production. */
  def stubEmbedding(text: Column, dims: Int = 8): Column =
    transform(sequence(lit(0), lit(dims - 1)), i =>
      pmod(conv(substring(md5(concat_ws("|", text, i.cast("string"))), 1, 15),
        16, 10).cast("long"), lit(1000L)).cast("double") / 999.0)

  /** TF-IDF top-k terms per document — corpus-level relevance weighting,
    * shaped for scale: the (doc, term) counts shuffle once with map-side
    * partial aggregation, the document-frequency table joins back onto
    * them UNHINTED — `dfreq` is one row per distinct corpus term, which
    * at web scale is a multi-GB frame no driver should be forced to
    * broadcast, so the join strategy is left to AQE (broadcast at small
    * vocabularies, term-keyed shuffled join at 100 TB — and `tf` already
    * exchanges on `term` for the df aggregation, so AQE reuses that
    * partitioning for the sort-merge side). The per-doc top-k is the
    * `row_number ≤ k` pattern Spark runs as a partial `WindowGroupLimit`
    * bounded heap. `nDocs` is index-style metadata (one count job at
    * build, like an ANN centroid fit) — pipelines that already know the
    * corpus size pass it via `nDocsKnown` and skip that job entirely (a
    * landing job's row count is free metadata).
    * Deterministic tiebreak: equal scores order by term. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5,
                    nDocsKnown: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = nDocsKnown.getOrElse(docs.count())
    val terms = OpsUtil.spread(docs)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("term"))
      .withColumn("tfidf", col("tf") * log(lit(nDocs.toDouble) / col("df")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** BM25 ranked retrieval: score every document against a small literal
    * query-term set and keep the global top-k (Robertson/Spärck Jones
    * weighting with the Lucene `ln(1 + (N - df + .5)/(df + .5))` idf).
    *
    * Scale shape — the corpus-search primitive at 100 TB:
    *   - tokenize once per row; the posting explode is filtered to the
    *     query terms BEFORE the (doc, term) shuffle, so the exchange
    *     carries only matching postings, never the full inverted index;
    *   - doc length rides the groupBy key (functionally dependent on
    *     doc_id — zero extra shuffle width);
    *   - `df` (≤ |queryTerms| rows) and `avgdl` (1 row) broadcast back;
    *   - per-document scores combine via per-term conditional aggregates
    *     summed in FIXED literal order, so the result is bit-deterministic
    *     under any partitioning (a plain sum(double) would fold in shuffle
    *     order);
    *   - the global top-k is `ORDER BY ... LIMIT k` → TakeOrderedAndProject
    *     (per-partition bounded heaps, no full sort).
    * `nDocsKnown` / `avgdlKnown`: corpus size and mean doc length are
    * index-build metadata (a landing job's manifest statistics) — pass them
    * to skip the two scalar jobs entirely. */
  def bm25TopDocs(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
                  k1: Double = 1.2, b: Double = 0.75,
                  nDocsKnown: Option[Long] = None,
                  avgdlKnown: Option[Double] = None): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopDocs needs at least one query term")
    require(queryTerms.distinct.size == queryTerms.size,
      s"bm25TopDocs query terms must be distinct, got $queryTerms")
    val nDocs = nDocsKnown.getOrElse(docs.count())
    val toks = OpsUtil.spread(docs)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
    // exact mean doc length: integer sum / integer count, one double divide
    val avgdl = avgdlKnown.getOrElse {
      val r = toks.agg(sum(size(col("toks"))).as("s")).head()
      r.getLong(0).toDouble / nDocs
    }
    val postings = toks
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = postings.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    scoreBm25Postings(tf, queryTerms, k, k1, b, nDocs, avgdl)
  }

  /** Score pre-filtered postings `(doc_id, dl, term, tf)` — one row per
    * (doc, query term) the doc contains — and keep the global top-k. The
    * shared tail of [[bm25TopDocs]] (postings built by a filtered corpus
    * explode) and [[bm25FromIndex]] (postings read key-pruned from a
    * persistent inverted index): both produce BIT-IDENTICAL rankings
    * because the math lives only here. `df` is derived from the postings
    * themselves (count of docs per term — exact whether the postings came
    * from a corpus scan or a term-pruned index read). */
  private def scoreBm25Postings(tf: DataFrame, queryTerms: Seq[String],
                                k: Int, k1: Double, b: Double,
                                nDocs: Long, avgdl: Double): DataFrame = {
    // the tf >= 1 filter is vacuous (count ≥ 1 by construction) but
    // load-bearing: it forces this branch to reference the tf VALUE, so the
    // optimizer cannot specialize its copy of the tf subplan to a keys-only
    // aggregate — both consumers stay plan-identical below the exchange and
    // ReuseExchange collapses them to ONE postings scan + shuffle
    val dfreq = tf.filter(col("tf") >= 1)
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)
      + 1.0)
    val tfNorm = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / avgdl))
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .withColumn("s", idf * tfNorm)
    // (doc_id, term) is unique post-tf, so each conditional agg folds exactly
    // one value; the final + chain is literal-ordered → bit-deterministic.
    // Aggregates alias by term INDEX (terms may contain '.'/'`', which would
    // misparse as nested-field references in col()).
    val perTerm = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("s"))).as(s"__s_$i") }
    val total = queryTerms.indices.map(i => coalesce(col(s"__s_$i"), lit(0.0d)))
      .reduce(_ + _)
    // the top-k boundary breaks on the ROUNDED score (the granularity any
    // cross-engine comparison happens at) + doc_id, so a last-ulp ln
    // divergence between engines can never flip which doc makes the cut
    scored.groupBy("doc_id")
      .agg(perTerm.head, perTerm.tail :+ count(lit(1)).as("n_terms"): _*)
      .select(col("doc_id"), total.as("score"), col("n_terms"))
      .orderBy(floor(col("score") * 1e6 + 0.5).desc, col("doc_id"))
      .limit(k)
      // rank over the ≤ k surviving rows; the partition key is constant
      // (pmod(hash, 1) = 0) but NON-foldable, so Catalyst cannot constant-
      // fold it away and WindowExec sees a real partition spec — no
      // "No Partition Defined" warning, still one ≤ k-row partition
      .withColumn("rank", row_number().over(
        Window.partitionBy(pmod(xxhash64(col("doc_id")), lit(1L)))
          .orderBy(floor(col("score") * 1e6 + 0.5).desc, col("doc_id"))))
      .select(col("doc_id"), col("rank"), col("score"), col("n_terms"))
  }

  // --- persistent inverted index (TxTable-backed BM25) ------------------

  /** Build a persistent BM25 inverted index over `docs` at `indexPath`:
    * postings `(term, doc_id, dl, tf)` land as a [[TxTable]] BUCKETED BY
    * TERM, plus a one-row `<indexPath>_globals` parquet recording the
    * corpus statistics (`n_docs`, `sum_dl`) the scorer needs.
    *
    * This is the other half of the retrieval trade [[bm25TopDocs]] makes:
    * the scan path re-tokenizes the corpus per query batch (right when
    * queries are rare or the corpus changes faster than it is queried);
    * the index pays ONE corpus explode + shuffle up front, after which a
    * query's I/O is proportional to its terms' bucket files — not corpus
    * size ([[TxTable.readKeys]] manifest pruning). At 100 TB that is the
    * difference between a query costing a full scan and costing a few
    * postings buckets, and the TxTable layer gives the index atomic
    * commits, compaction, and exactly-once incremental appends
    * ([[appendToBm25Index]]) for free. */
  def buildBm25Index(docs: DataFrame, indexPath: String,
                     nBuckets: Int = 16,
                     positions: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val toks = OpsUtil.spread(docs)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
    TxTable.init(spark, indexPath, bm25Postings(toks, positions),
      "term", nBuckets)
    // globals from the same tokenization, one tiny scalar job; split()
    // yields ≥ 1 token for every non-null text, so n_docs counts docs with
    // a tokenizable text — exactly the docs the postings cover
    val g = toks.filter(col("toks").isNotNull)
      .agg(count(lit(1)).as("n_docs"), sum(size(col("toks"))).as("sum_dl"))
    g.coalesce(1).write.mode("overwrite").parquet(indexPath + "_globals")
  }

  /** Postings rows for one tokenized frame. With `positions` the index is
    * POSITIONAL (Lucene's proximity option): each posting carries the
    * sorted 0-based token offsets of the term in the doc, enabling
    * [[phraseSearchFromIndex]]; tf = size(positions) either way, so the
    * BM25 read path is schema-agnostic. */
  private def bm25Postings(toks: DataFrame,
                           positions: Boolean = false): DataFrame =
    if (!positions)
      toks.select(col("doc_id"), size(col("toks")).as("dl"),
          explode(col("toks")).as("term"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    else
      toks.select(col("doc_id"), size(col("toks")).as("dl"),
          posexplode(col("toks")).as(Seq("pos", "term")))
        .groupBy("term", "doc_id", "dl")
        .agg(count(lit(1)).as("tf"),
          array_sort(collect_list(col("pos"))).as("positions"))

  /** Exactly-once incremental index maintenance — the landing-job side of
    * [[buildBm25Index]]: tokenize ONLY the arriving batch, append its
    * postings via [[TxTable.appendIndexOnce]] (keyed by `(appId, batchId)`,
    * so a torn batch replays to a no-op; the FIRST batch bootstraps the
    * index with the txn recorded in version 0; auto-compaction bounds
    * file counts), then refresh the globals sidecar. Batch cost is
    * O(batch postings), never a corpus re-scan. Caller contract: batch
    * doc_ids are new to the index (admission dedup runs upstream).
    * Returns true when the batch committed, false on a detected replay. */
  def appendToBm25Index(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, newDocs: DataFrame,
                        appId: String, batchId: Long,
                        nBucketsIfNew: Int = 16,
                        positionsIfNew: Boolean = false): Boolean = {
    val exists = TxTable.isTxTable(spark, indexPath)
    val nBuckets =
      if (exists)
        TxTable.snapshot(spark, indexPath).bucketing match {
          case Some(("term", n)) => n
          case Some((k, _)) => throw new IllegalStateException(
            s"$indexPath is bucketed by '$k', not 'term'")
          case None => nBucketsIfNew
        }
      else nBucketsIfNew
    // an existing index dictates its own shape: appends must carry
    // positions iff the index does, or the schemas would diverge
    val positional =
      if (exists) TxTable.read(spark, indexPath)
        .schema.fieldNames.contains("positions")
      else positionsIfNew
    val toks = OpsUtil.spread(newDocs)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
    val committed = TxTable.appendIndexOnce(spark, indexPath,
      bm25Postings(toks, positional), "term", nBuckets, appId, batchId)
    // refresh on commit, and also when the sidecar is missing — heals the
    // torn window where a crash landed between the postings commit and
    // the globals write (the replayed batch commits nothing but must
    // still leave the index queryable)
    val gPath = new org.apache.hadoop.fs.Path(indexPath + "_globals")
    val gFs = gPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (committed || !gFs.exists(gPath)) refreshBm25Globals(spark, indexPath)
    committed
  }

  /** Recompute the `<indexPath>_globals` sidecar from the index itself:
    * every doc appears in the postings (split() emits ≥ 1 token per doc),
    * so one per-doc rollup recovers `(n_docs, sum_dl)` exactly. A
    * maintenance call (runs after each incremental append) — one index
    * scan, never a corpus scan. */
  def refreshBm25Globals(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String): Unit = {
    val perDoc = TxTable.read(spark, indexPath)
      .groupBy("doc_id").agg(first(col("dl")).as("dl"))
    val g = perDoc.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    g.coalesce(1).write.mode("overwrite").parquet(indexPath + "_globals")
  }

  /** BM25 top-k answered FROM the persistent index — bit-identical to
    * [[bm25TopDocs]] over the same corpus (the scoring math is the shared
    * [[scoreBm25Postings]]), but the corpus is never touched: the postings
    * read opens only the query terms' bucket files (manifest pruning — at
    * any corpus size the I/O is a few buckets), `df` falls out of the
    * pruned postings themselves, and `(n_docs, avgdl)` come from the
    * one-row globals sidecar. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession,
                    indexPath: String, queryTerms: Seq[String],
                    k: Int = 10, k1: Double = 1.2,
                    b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25FromIndex needs at least one query term")
    require(queryTerms.distinct.size == queryTerms.size,
      s"bm25FromIndex query terms must be distinct, got $queryTerms")
    val (key, nBuckets) = TxTable.snapshot(spark, indexPath).bucketing
      .getOrElse(throw new IllegalStateException(
        s"$indexPath is not a bucketed BM25 index"))
    require(key == "term", s"$indexPath is bucketed by '$key', not 'term'")
    val g = spark.read.parquet(indexPath + "_globals").head()
    val nDocs = g.getAs[Long]("n_docs")
    val avgdl = g.getAs[Long]("sum_dl").toDouble / nDocs
    val tf = TxTable.readKeys(spark, indexPath, "term", queryTerms, nBuckets)
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    scoreBm25Postings(tf, queryTerms, k, k1, b, nDocs, avgdl)
  }

  /** Exact phrase search over a POSITIONAL index ([[buildBm25Index]] with
    * `positions = true`): the docs containing `phrase`'s terms
    * CONSECUTIVELY, with occurrence counts — the proximity query a
    * bag-of-words scorer cannot answer.
    *
    * Scale shape: each term's postings read is key-pruned (only the
    * phrase terms' bucket files open); leg i shifts its position array by
    * −i row-locally, so after an ≤|phrase|-way doc_id equi-join of the
    * pruned frames, a phrase occurrence is exactly a shared value across
    * all shifted arrays — `n_occurrences = |∩ legs|`, computed per row.
    * The corpus text is never touched and nothing scans beyond the
    * phrase terms' postings. A term repeated in the phrase reuses the
    * one pruned read with a different shift. */
  def phraseSearchFromIndex(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String,
                            phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    val (key, nBuckets) = TxTable.snapshot(spark, indexPath).bucketing
      .getOrElse(throw new IllegalStateException(
        s"$indexPath is not a bucketed index"))
    require(key == "term", s"$indexPath is bucketed by '$key', not 'term'")
    val posts = TxTable.readKeys(spark, indexPath, "term", phrase.distinct,
        nBuckets)
      .select(col("term"), col("doc_id"), col("positions"))
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      posts.filter(col("term") === t)
        .select(col("doc_id"),
          transform(col("positions"), p => p - i).as(s"__p_$i"))
    }
    val joined = legs.reduce((a, b) => a.join(b, Seq("doc_id")))
    val inter = (1 until phrase.size).foldLeft(col("__p_0")) { (acc, i) =>
      array_intersect(acc, col(s"__p_$i")) }
    joined.select(col("doc_id"), size(inter).cast("long").as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
  }

  /** Query-SET BM25 retrieval: rank the corpus against a whole TABLE of
    * queries — the shape retrieval-based data curation actually needs
    * (DPR-style hard-negative mining, eval-suite sweeps, dedup-by-query),
    * where thousands of queries must share ONE corpus scan instead of
    * re-running [[bm25TopDocs]] per query. Queries: (query_id, query_text);
    * output: (query_id, rank, doc_id, score6, n_terms), rank 1..k per
    * query by descending score.
    *
    * Scale shape — one corpus scan, no per-term plan width:
    *   - the distinct term set across ALL queries broadcasts as the postings
    *     pre-filter (map-side semi-join BEFORE the (doc, term) shuffle —
    *     same property as the literal-term path, but data-driven);
    *   - per-(doc, term) tf is the only corpus-sized shuffle; df broadcasts
    *     back (≤ |distinct query terms| rows);
    *   - the query fan-out is a broadcast join postings×(query terms), so a
    *     term shared by many queries replicates only matching postings;
    *   - per-(query, doc) scores sum FIXED-POINT longs (each per-term score
    *     pre-rounded to 6 dp as `floor(s·10⁶ + 0.5)`): integer addition is
    *     associative, so the total is bit-deterministic under ANY shuffle
    *     order or engine — no literal-ordered column chain needed, which is
    *     what frees the plan from per-term width (the single-query path's
    *     cap);
    *   - per-query top-k is a rank-filter window → partial WindowGroupLimit
    *     prunes map-side; no global sort.
    * The 6 dp fixed-point sum differs from the exact-double sum by < n·5e-7
    * — inside the tolerance any cross-engine ln comparison already needs.
    *
    * `broadcastQueries` (default true) covers the dominant case — up to
    * ~10⁶ (query, term) rows ride comfortably in a broadcast. For an
    * extreme query set (mining negatives for a whole corpus of queries),
    * pass false: the plan degrades to shuffled equi-joins on `term`. In
    * that mode each join's inputs carry a derived companion key (the
    * [[graft.ops.DedupOps.duplicatedSpans]] `__ghx` trick): grouping /
    * joining by (term, hash-of-term) leaves every output partitioned by a
    * key the NEXT term-keyed join cannot reuse, so EnsureRequirements
    * plants bare exchanges adjacent to every join — the only shape AQE's
    * OptimizeSkewedJoin rewrites when a stopword-grade term goes hot
    * (stress-pinned in ScaleStressSpec). One extra exchange per join vs
    * the chained shape — the price of splittability. */
  def bm25TopDocsForQueries(docs: DataFrame, queries: DataFrame, k: Int = 10,
                            k1: Double = 1.2, b: Double = 0.75,
                            nDocsKnown: Option[Long] = None,
                            avgdlKnown: Option[Double] = None,
                            broadcastQueries: Boolean = true): DataFrame = {
    val nDocs = nDocsKnown.getOrElse(docs.count())
    val toks = OpsUtil.spread(docs)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
    val avgdl = avgdlKnown.getOrElse {
      val r = toks.agg(sum(size(col("toks"))).as("s")).head()
      r.getLong(0).toDouble / nDocs
    }
    // per-query DISTINCT terms (BM25 scores a term once per query); the
    // global distinct term set is the data-driven postings pre-filter
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(split(lower(col("query_text")), "\\s+")))
        .as("term"))
    // __tx / __tx2 are derived functions of term (see the scaladoc): they
    // only exist to deny partitioning reuse between consecutive term-keyed
    // joins in the shuffled fallback; term-level semantics are unchanged
    val tx = xxhash64(col("term"))
    val allTerms =
      if (broadcastQueries) qterms.select(col("term")).distinct()
      else qterms.select(col("term"), tx.as("__tx")).distinct()
        .select(col("term"))
    val postings = toks
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .join(if (broadcastQueries) broadcast(allTerms) else allTerms,
        Seq("term"))
    val tf = postings.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    // vacuous tf >= 1 filter for the same ReuseExchange reason as in
    // [[bm25TopDocs]]: one postings scan + shuffle feeds both tf and df
    val dfreq =
      if (broadcastQueries)
        tf.filter(col("tf") >= 1)
          .groupBy("term").agg(count(lit(1)).as("df"))
      else tf.filter(col("tf") >= 1)
        .select(col("term"), tx.as("__tx"), xxhash64(tx).as("__tx2"))
        .groupBy(col("term"), col("__tx"), col("__tx2"))
        .agg(count(lit(1)).as("df"))
        .select(col("term"), col("__tx"), col("df"))
    val idf = log((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)
      + 1.0)
    val tfNorm = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / avgdl))
    val scored =
      (if (broadcastQueries) tf.join(broadcast(dfreq), Seq("term"))
       else tf.withColumn("__tx", tx).join(dfreq, Seq("term", "__tx"))
         .drop("__tx"))
      .withColumn("s6", floor((idf * tfNorm) * 1e6 + 0.5).cast("long"))
    val perQueryDoc = scored
      .join(if (broadcastQueries) broadcast(qterms) else qterms, Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s6")).as("s6sum"), count(lit(1)).as("n_terms"))
    perQueryDoc
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("s6sum").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (col("s6sum").cast("double") / 1e6).as("score6"), col("n_terms"))
  }

  /** LM-gate threshold sweep — the tuning artifact behind
    * [[graft.stream.Pipelines.prepIngest]]'s `maxNll`: for each candidate
    * threshold, how many documents pass the perplexity gate and what
    * fraction of the corpus that is. Choosing the gate IS a
    * threshold-vs-yield trade, and a production pipeline re-runs this
    * sweep whenever the reference slice or the corpus mix drifts.
    *
    * ONE aggregation scan: every threshold is a conditional sum inside a
    * single global aggregate (map-side combined), then a driver-side
    * `stack` reshapes the 1-row wide result to long form — no
    * per-threshold rescans, no extra shuffle at any corpus size.
    * Comparisons use the 6 dp rounded nll (the cross-engine granularity)
    * and exactly-representable thresholds, so the report oracle-replays
    * bit-for-bit. */
  def lmThresholdSweep(docs: DataFrame, lm: CharBigramLM,
                       thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    require(thresholds == thresholds.sorted && thresholds.distinct == thresholds,
      s"thresholds must be sorted and distinct, got $thresholds")
    val scored = lmScore(docs, lm)
      .select((floor(col("nll") * 1e6 + 0.5).cast("double") / 1e6).as("nll6"))
    val aggs = count(lit(1)).as("n_docs") +:
      thresholds.zipWithIndex.map { case (t, i) =>
        sum(when(col("nll6") <= t, 1L).otherwise(0L)).as(s"__p$i") }
    val stackArgs = thresholds.zipWithIndex
      .map { case (t, i) => s"CAST($t AS DOUBLE), __p$i" }.mkString(", ")
    scored.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${thresholds.size}, $stackArgs)" +
        " as (threshold, n_pass)"), col("n_docs"))
      .withColumn("pass_rate6",
        floor(col("n_pass") / col("n_docs") * 1e6 + 0.5).cast("double") / 1e6)
      .select(col("threshold"), col("n_pass"), col("n_docs"),
        col("pass_rate6"))
  }

  /** Character-bigram language model with add-one smoothing — the CCNet
    * quality-filter shape: train on a trusted reference slice, score every
    * candidate document by average negative log-likelihood (nats/bigram);
    * low = reference-like, high = gibberish/off-distribution. A production
    * pipeline swaps in a KenLM-style model; the engine-side contract — a
    * broadcastable model scored as a row-local fold — is identical.
    *
    * @param bigrams  reference bigram counts
    * @param contexts per-first-char totals (sum of bigram counts by context)
    * @param vocab    |distinct reference characters| (smoothing denominator)
    */
  case class CharBigramLM(bigrams: Map[String, Long],
                          contexts: Map[String, Long], vocab: Int)

  /** Train the bigram LM: one partial-aggregated (bigram, count) shuffle
    * over the reference slice; the model (≤ |charset|² rows — hundreds) is
    * driver-side index metadata like ANN centroids. Context totals derive
    * from the bigram counts (no second pass); vocabulary is one distinct
    * over single characters. */
  def trainCharBigramLM(ref: DataFrame, textCol: String = "text"): CharBigramLM = {
    val bgRows = ref
      .select(explode(transform(sequence(lit(1), length(col(textCol)) - 1),
        i => col(textCol).substr(i, lit(2)))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("n"))
      .collect()
    val bgs = bgRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val ctx = bgs.toSeq.groupBy(_._1.substring(0, 1))
      .map { case (c, xs) => c -> xs.map(_._2).sum }
    val vocab = ref.select(explode(split(col(textCol), "")).as("c"))
      .distinct().count().toInt
    CharBigramLM(bgs, ctx, vocab)
  }

  /** Row-local LM scoring: average `-ln((count(bg)+1) / (count(ctx)+V))`
    * over the document's bigrams, folded left-to-right (deterministic).
    * The model rides the plan as literal maps — zero joins, zero shuffle:
    * at 100 TB the quality sweep stays a single fused scan. NULL for
    * docs with fewer than two characters.
    *
    * This is the semantic definition; prefer [[lmScore]] on the hot path —
    * `element_at` on a MAP literal is a linear scan (|model| string
    * compares per bigram) and `substr(i, 2)` re-seeks the string per
    * position, which measured ~8 s over sf0.1's 5k docs. */
  def lmNegLogLik(text: Column, lm: CharBigramLM): Column = {
    val bgMap = map_from_arrays(
      typedlit(lm.bigrams.keys.toArray),
      typedlit(lm.bigrams.values.toArray))
    val ctxMap = map_from_arrays(
      typedlit(lm.contexts.keys.toArray),
      typedlit(lm.contexts.values.toArray))
    val v = lit(lm.vocab.toDouble)
    val n = length(text) - 1
    val total = aggregate(sequence(lit(1), n), lit(0.0d), (acc, i) => {
      val bg = text.substr(i, lit(2))
      val bc = coalesce(element_at(bgMap, bg), lit(0L)).cast("double")
      val cc = coalesce(element_at(ctxMap, bg.substr(lit(1), lit(1))),
        lit(0L)).cast("double")
      acc - log((bc + 1.0) / (cc + v))
    })
    // guard BEFORE building the sequence: sequence(1, n<1) would descend
    when(n >= 1, total / n.cast("double"))
  }

  /** Hot-path LM scoring, bit-identical to [[lmNegLogLik]] (spec-pinned):
    * the model becomes two dense count LUTs (`c1*128 + c2` / `c1`) and the
    * scoring runs as the native codegen'd kernel
    * [[graft.functions.CharBigramNll]] — one pass over the UTF-8 bytes
    * with primitive lookups, no higher-order functions, no boxing.
    * ASCII-keyed models only (checked; non-ASCII models fall back to the
    * map-literal definition); non-ASCII characters in SCORED text take
    * the same miss path (count 0) on both routes, so results never
    * diverge. */
  def lmScore(docs: DataFrame, lm: CharBigramLM, textCol: String = "text",
              outCol: String = "nll"): DataFrame = {
    val asciiModel = lm.bigrams.keys.forall(bg => bg.forall(_ < 128)) &&
      lm.contexts.keys.forall(c => c.forall(_ < 128))
    if (!asciiModel)
      return docs.withColumn(outCol, lmNegLogLik(col(textCol), lm))
    val bgArr = new Array[Long](128 * 128)
    lm.bigrams.foreach { case (bg, n) =>
      if (bg.length == 2) bgArr(bg(0) * 128 + bg(1)) = n }
    val ctxArr = new Array[Long](128)
    lm.contexts.foreach { case (c, n) => ctxArr(c(0)) = n }
    docs.withColumn(outCol, graft.functions.TextFunctions
      .char_bigram_nll(col(textCol), bgArr, ctxArr, lm.vocab))
  }

  /** One-pass document profile used by the `text_stats` query.
    *
    * The Column helpers above each embed their own `split` — fine for a
    * single predicate, wasteful stacked: Catalyst doesn't CSE across
    * expression trees, so ten columns would re-split the text ~ten times.
    * Here the token arrays and scalar lengths are bound once behind
    * projections and every stat reads the bound attributes. */
  /** Max multiplicity of any element in `arr` — computed row-locally as the
    * longest run of the SORTED array (one `aggregate` fold, no shuffle, no
    * per-row hashmap allocation). 0 for an empty array. */
  private def maxMultiplicity(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
        lit(0).as("best")),
      (a, x) => {
        val run = when(x <=> a.getField("prev"), a.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(a.getField("best"), run).as("best"))
      },
      a => a.getField("best"))

  /** Word n-grams of `arr` joined with single spaces; empty array when the
    * document is shorter than `n` words (guarded — `sequence(0, -1)` would
    * count DOWN, not return empty). */
  private def wordNgrams(arr: Column, n: Int): Column =
    when(size(arr) >= n,
      transform(sequence(lit(0), size(arr) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(arr, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Gopher-style intra-document repetition signals (Rae et al. 2021, public
    * literature): the fraction of a document covered by its most frequent
    * word / bigram / trigram, and the overall duplicate-word fraction.
    * Documents dominated by a few repeated n-grams are boilerplate or
    * generator loops and get down-weighted or dropped before LM training.
    *
    * Every signal is a row-local fold over the token array (sort + one
    * `aggregate` pass per n-gram order) — zero shuffle, embarrassingly
    * parallel, the right shape for a 100 TB quality sweep. `keep` applies
    * conventional gates (most-common-word ≤ 30% of tokens, top bigram
    * ≤ 20%, top trigram ≤ 15% — thresholds are parameters).
    */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
                        maxTopWordFrac: Double = 0.30,
                        maxTopBigramFrac: Double = 0.20,
                        maxTopTrigramFrac: Double = 0.15): DataFrame = {
    val ws = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    // every fraction is guarded to n_words >= its n-gram order: an empty /
    // whitespace-only document emits a well-defined (0-words, all-zero
    // fractions, keep) row instead of NULLs from 0/0 division — nothing
    // repeats in an empty document, and NULL fractions would silently
    // fall out of downstream threshold gates
    def topFrac(n: Int): Column = {
      val denom = col("n_words") - (n - 1)
      if (n == 1) when(col("n_words") >= 1,
        maxMultiplicity(col("__ws")).cast("double") / col("n_words"))
        .otherwise(lit(0.0))
      else when(col("n_words") >= n,
        maxMultiplicity(wordNgrams(col("__ws"), n)).cast("double") / denom)
        .otherwise(lit(0.0))
    }
    OpsUtil.spread(docs)
      .select(col("doc_id"), ws.as("__ws"))
      .select(col("doc_id"), col("__ws"), size(col("__ws")).as("n_words"))
      .select(col("doc_id"), col("n_words"),
        when(col("n_words") >= 1,
          (col("n_words") - size(array_distinct(col("__ws")))).cast("double")
            / col("n_words")).otherwise(lit(0.0)).as("dup_word_frac"),
        topFrac(1).as("top_word_frac"),
        topFrac(2).as("top_bigram_frac"),
        topFrac(3).as("top_trigram_frac"))
      .withColumn("keep",
        col("top_word_frac") <= maxTopWordFrac &&
          col("top_bigram_frac") <= maxTopBigramFrac &&
          col("top_trigram_frac") <= maxTopTrigramFrac)
  }

  def profile(docs: DataFrame): DataFrame = {
    val toks = col("ltoks")
    val markerScores = LangMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms: _*)))
    }
    val best = markerScores.map(_._2).reduce((a, b) => greatest(a, b))
    val lang = markerScores.foldRight(lit("und")) { case ((l, s), els) =>
      when(s > 0 && s === best, l).otherwise(els)
    }
    val stopRatio =
      size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks)
    OpsUtil.spread(docs)
      .select(col("doc_id"), col("text"),
        split(col("text"), "\\s+").as("wtoks"),
        split(lower(col("text")), "\\s+").as("ltoks"))
      .select(col("doc_id"), col("text"),
        size(col("wtoks")).as("n_tokens"),
        bpeishTokenCount(col("text")).as("n_subtokens"),
        length(col("text")).as("n_chars"),
        punctRatio(col("text")).as("punct_ratio"),
        stopRatio.as("stopword_ratio"),
        (length(regexp_replace(col("text"), "\\s+", ""))
          .cast("double") / size(col("wtoks"))).as("mean_token_len"),
        lang.as("lang_pred"),
        fingerprint(col("text")).as("fingerprint"))
      .select(col("doc_id"), col("n_tokens"), col("n_subtokens"), col("n_chars"),
        col("punct_ratio"), col("stopword_ratio"), col("mean_token_len"),
        ((when(col("n_chars").between(50, 10000), 1.0).otherwise(0.0)
          + when(col("stopword_ratio") > 0.05, 1.0).otherwise(0.0)
          + when(col("punct_ratio") < 0.2, 1.0).otherwise(0.0)
          + when(col("mean_token_len").between(2.0, 12.0), 1.0).otherwise(0.0))
          / 4.0).as("quality"),
        col("lang_pred"), col("fingerprint"))
  }
}
