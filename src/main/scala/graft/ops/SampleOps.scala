package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and train/holdout splitting for training-data
  * pipelines.
  *
  * At 100 TB you never `rand()`-sample a corpus: re-runs must select the
  * SAME rows (resumable jobs, reproducible ablations, leak-free holdouts
  * that stay held out across pipeline versions), and the decision must be
  * a pure row-local function — no global state, no shuffle, no dependence
  * on partitioning. Everything here keys off an md5-derived bucket of a
  * stable row key: engine-portable (DuckDB-oracle-checked), salt-seeded,
  * and O(1) per row inside whole-stage codegen.
  */
object SampleOps {

  /** PER-SOURCE document caps — the CommonCrawl-style host/domain
    * capping step: within each `group`, keep at most `cap` documents by
    * a deterministic priority (longest first via `lengthCol`, `idCol`
    * ascending as the total tiebreak) and flag the rest dropped. One
    * hash shuffle on the group key; the rank-≤-cap filter rides Spark's
    * WindowGroupLimit partial push, so each map task keeps only its top
    * `cap` per group before the exchange — the shape that makes capping
    * a 100 TB crawl affordable. Returns the input plus `cap_keep`. */
  def capPerGroup(docs: DataFrame, group: String, lengthCol: String,
                  idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
      .orderBy(col(lengthCol).desc, col(idCol).asc)
    docs.withColumn("__rk", row_number().over(w))
      .withColumn("cap_keep", col("__rk") <= cap)
      .drop("__rk")
  }


  /** Deterministic bucket in [0, 100) from a stable key: first 15 hex
    * digits of md5("salt|key") as int64, mod 100. Changing `salt` draws an
    * independent sample; the same (salt, key) always lands in the same
    * bucket, on any engine. */
  def hashBucket(key: Column, salt: String = ""): Column =
    pmod(conv(substring(md5(concat_ws("|", lit(salt), key.cast("string"))),
      1, 15), 16, 10).cast("long"), lit(100L))

  /** Keep ~pct% of rows, deterministically. */
  def sampleFraction(df: DataFrame, key: Column, pct: Int,
                     salt: String = ""): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(hashBucket(key, salt) < pct)
  }

  /** Tag every row `train` or `holdout` (~holdoutPct%). The split is a
    * pure function of the key: a document can never migrate between splits
    * across runs or cluster layouts — the property that keeps a holdout
    * honest for the lifetime of a training corpus. */
  def trainHoldoutSplit(df: DataFrame, key: Column, holdoutPct: Int,
                        salt: String = ""): DataFrame = {
    require(holdoutPct >= 0 && holdoutPct <= 100)
    df.withColumn("split",
      when(hashBucket(key, salt) < holdoutPct, "holdout").otherwise("train"))
  }

  /** Deterministic weighted sample without replacement (Efraimidis–
    * Spirakis A-ES): each row draws u ∈ (0,1) as a pure md5 hash of
    * (salt, key) and scores priority = ln(u)/w; the k highest-priority
    * rows per stratum are the sample. Inclusion probability rises with
    * weight (the quality-weighted corpus-sampling op), yet re-runs select
    * the SAME rows on any engine or partitioning — same reproducibility
    * contract as [[hashBucket]]. Rows with null or non-positive weight
    * are excluded.
    *
    * Scale shape: scoring is row-local; selection is the `row_number ≤ k`
    * pattern Spark plans as a partial WindowGroupLimit bounded heap, so
    * the exchange carries ≤ k rows per input partition per stratum. The
    * partition spec composes a non-foldable always-zero guard
    * (`pmod(xxhash64(key), 1)`) with the stratum: a caller passing a
    * LITERAL stratum (a global weighted sample) would otherwise have the
    * constant folded away, degrading to an unpartitioned window — one
    * partition holding the whole corpus. The guard keeps WindowExec on
    * the partitioned, WindowGroupLimit-capped path in both cases without
    * changing which rows group together. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     stratum: Column, k: Int, salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    // 15 hex digits → v ∈ [0, 16^15); (v + 0.5) / 16^15 ∈ (0,1). 16^15 =
    // 2^60 is exactly representable as a double; v > 2^53 rounds in the
    // cast, identically on any IEEE-754 engine.
    val v = conv(substring(md5(concat_ws("|", lit(salt), key.cast("string"))),
      1, 15), 16, 10).cast("long").cast("double")
    val u = (v + 0.5) / 1.152921504606846976e18
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__pri", log(u) / weight)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(stratum, pmod(xxhash64(key), lit(1L)))
          .orderBy(col("__pri").desc, key)))
      .filter(col("__rk") <= k)
      .drop("__pri", "__rk")
  }

  /** Per-stratum sampling rates (e.g. downsample dominant languages,
    * keep the tail): rows in a stratum absent from `pcts` keep
    * `defaultPct`. Still row-local — the stratum column is just another
    * input to the decision, not a grouping. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       pcts: Map[String, Int], defaultPct: Int = 100,
                       salt: String = ""): DataFrame = {
    val pctCol = pcts.foldLeft(lit(defaultPct)) { case (els, (s, p)) =>
      when(stratum === s, p).otherwise(els)
    }
    df.filter(hashBucket(key, salt) < pctCol)
  }

  /** Corpus mixture weighting — the data-mixing step of a training
    * pipeline: given target mix shares per stratum (e.g. 40% en, 20% zh …
    * by token mass), compute the per-stratum sampling fraction that
    * realizes the LARGEST corpus achieving those shares without
    * upsampling. The binding stratum (smallest weight/target ratio) keeps
    * fraction 1.0; every other stratum downsamples to match. Feed the
    * fractions to [[stratifiedSample]] (as pcts) or a per-row
    * `hashBucket < frac*100` filter for the actual draw.
    *
    * Scale shape: one partial-aggregated groupBy to |strata| rows, then
    * the cap (a 1-row aggregate of that tiny frame) broadcast back — the
    * corpus itself is scanned exactly once, and nothing larger than
    * |strata| rows ever sits on one node. Strata without a target share
    * are excluded from the mix (and the output). */
  def mixtureWeights(df: DataFrame, stratum: Column, weight: Column,
                     targets: Map[String, Double]): DataFrame =
    mixtureWeightsFromStats(
      df.select(stratum.as("stratum"), weight.cast("double").as("w"))
        .groupBy("stratum")
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("stratum_weight")),
      targets)

  /** [[mixtureWeights]]' planning half over PRE-AGGREGATED per-stratum
    * stats `(stratum, n_docs, stratum_weight)` — the entry point when the
    * mass estimate comes from somewhere other than a raw row sum, e.g.
    * the unique-mass correction in [[mixturePipeline]] (a 40%-duplicate
    * source carries 40% less unique mass than its row count claims). The
    * stats frame is |strata| rows; everything here is driver-scale. */
  def mixtureWeightsFromStats(stats: DataFrame,
                              targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "every target share must be positive")
    val tCol = targets.foldLeft(lit(null).cast("double")) {
      case (els, (s, t)) => when(col("stratum") === s, t).otherwise(els)
    }
    val per = stats
      .withColumn("target_share", tCol)
      .filter(col("target_share").isNotNull)
    val cap = per.agg(
      min(col("stratum_weight") / col("target_share")).as("mix_total"))
    per.crossJoin(broadcast(cap))
      .withColumn("sample_frac", least(lit(1.0),
        floor(col("target_share") * col("mix_total") / col("stratum_weight")
          * 1000000 + 0.5) / 1000000.0))
      .select(col("stratum"), col("n_docs"), col("stratum_weight"),
        col("target_share"), col("mix_total"), col("sample_frac"))
  }

  /** The END-TO-END mixture-planning pipeline — the full plan-then-apply
    * loop a curation run executes, composed from its three oracle-gated
    * pieces: per-stratum duplication rates
    * ([[DedupOps.dedupRates]]) correct each stratum's mass down to its
    * UNIQUE mass (duplicates inflate raw row/char counts but add no
    * information to a training mix), the corrected stats feed
    * [[mixtureWeightsFromStats]], and the resulting plan resamples the
    * corpus through [[mixtureResample]]'s row-local md5 predicate.
    *
    * Determinism for oracle parity: the correction multiplies each
    * stratum's EXACT integer-summed raw mass by the exact rational
    * `(n_docs − n_dups) / n_docs` ONCE per stratum — never a sum of
    * inexact per-row products — so the corrected weight is a single
    * IEEE-rounded operation any engine reproduces bit-identically.
    *
    * Scale shape: dedupRates is one md5-keyed shuffle + a |strata|
    * rollup; the raw-mass aggregate is one partial-aggregated groupBy;
    * the plan is |strata| rows broadcast into the row-local resample
    * predicate — the corpus is scanned twice (fingerprint + resample),
    * shuffled once. */
  def mixturePipeline(docs: DataFrame, stratum: String, key: Column,
                      weight: Column, targets: Map[String, Double],
                      salt: String = "mixp"): DataFrame = {
    val rates = DedupOps.dedupRates(docs, stratum)
      .select(col(stratum).as("stratum"), col("n_docs"), col("n_dups"))
    val raw = docs
      .select(col(stratum).as("stratum"), weight.cast("double").as("w"))
      .groupBy("stratum").agg(sum(col("w")).as("raw_weight"))
    val stats = raw.join(rates, Seq("stratum"))
      .select(col("stratum"), col("n_docs"),
        (col("raw_weight") * (col("n_docs") - col("n_dups"))
          / col("n_docs")).as("stratum_weight"))
    val plan = mixtureWeightsFromStats(stats, targets)
    mixtureResample(docs, col(stratum), key, plan, salt)
  }

  /** APPLY a mixture plan — the step that turns [[mixtureWeights]]'
    * target fractions into an actual resampled corpus: each row keeps iff
    * its md5 micro-bucket (1e-6 granularity, matching `sample_frac`'s own
    * quantization) falls under its stratum's fraction. Same determinism
    * contract as [[hashBucket]] at finer resolution: row-local,
    * engine-portable, re-runs select the SAME rows, so the mixed corpus
    * is a pure function of (corpus, plan, salt). Strata absent from the
    * plan drop entirely (they had no target share). The plan is one row
    * per stratum — broadcast; the filter is exact integer math, so the
    * whole resample is one broadcast join + a codegen'd row-local
    * predicate, no shuffle at any corpus size. */
  def mixtureResample(df: DataFrame, stratum: Column, key: Column,
                      plan: DataFrame, salt: String = "mix"): DataFrame = {
    val cols = df.columns.toSeq
    val p = broadcast(plan.select(col("stratum").as("__mix_stratum"),
      floor(col("sample_frac") * 1e6 + 0.5).cast("long").as("__mix_keep")))
    val h6 = pmod(conv(substring(md5(concat_ws("|", lit(salt),
      key.cast("string"))), 1, 15), 16, 10).cast("long"), lit(1000000L))
    df.withColumn("__mix_stratum", stratum)
      .join(p, Seq("__mix_stratum"))
      .filter(h6 < col("__mix_keep"))
      .select(cols.map(col): _*)
  }

  /** Deterministic corpus shuffle-and-shard — the last step before
    * training: assign every row a shard and a within-shard order, both
    * pure md5 functions of (salt, key), so the "random" order is
    * reproducible on any engine and partitioning (same contract as
    * [[hashBucket]]) and adjacent source documents land far apart.
    *
    * `shard_id` = hash mod nShards; `shuffle_key` = the raw 60-bit hash —
    * a training writer does `.repartition(nShards, shard_id)` then sorts
    * each shard by `shuffle_key` (`sortWithinPartitions`): one bounded
    * shuffle and a per-shard sort, never a global ORDER BY through one
    * range partitioner. Re-salting redraws the whole permutation. */
  def shardAssign(df: DataFrame, key: Column, nShards: Int,
                  salt: String = ""): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = conv(substring(md5(concat_ws("|", lit(salt), key.cast("string"))),
      1, 15), 16, 10).cast("long")
    df.withColumn("shard_id", pmod(h, lit(nShards.toLong)))
      .withColumn("shuffle_key", h)
  }
}
