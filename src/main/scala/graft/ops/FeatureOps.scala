package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Feature engineering for training pipelines: deterministic per-group
  * scaling (z-score, min-max), rank bucketing, and group-wise embedding
  * mean-pooling.
  *
  * Determinism note: every cross-row sum here goes through DECIMAL — double
  * addition is order-dependent under Spark's nondeterministic partial
  * aggregation, decimal addition is exact and associative, so the same
  * input yields the same feature on any partitioning AND is reproducible
  * against any other engine computing the same exact sum (double partial
  * aggregation would differ run-to-run in the last ulps).
  */
object FeatureOps {

  /** floor-based half-up rounding at 6 dp — bit-identical across engines
    * (Spark round() on doubles uses shortest-repr semantics DuckDB lacks). */
  private def round6(c: Column): Column =
    floor(c * 1000000 + 0.5).cast("double") / 1000000.0

  /** Per-group z-score + min-max scaling of a value column.
    *
    * Two-pass shape chosen for scale: a partial-aggregated groupBy computes
    * per-group (Σx, Σx², n, min, max) — the shuffle carries |groups| rows —
    * and the stats broadcast-join back onto the stream. The window-function
    * alternative (`avg(x) over (partition by g)`) would hash-partition the
    * FULL table by group and buffer each group's rows; with few large
    * groups (event types!) that is one reducer per group at 100 TB.
    *
    * Variance uses the decimal-exact moments: var = (Σx² − (Σx)²/n)/(n−1);
    * both moments are exact decimals, so the double arithmetic on top is
    * reproducible on any engine and partitioning. */
  def scaleByGroup(df: DataFrame, group: String, value: String): DataFrame = {
    val dec = col(value).cast("decimal(18,2)")
    // count(col) — not count(*): sum/min/max skip nulls, so n must count
    // only non-null values or a nullable column silently biases mean/var
    val stats = df.groupBy(col(group))
      .agg(sum(dec).as("__s1"), sum(dec * dec).as("__s2"),
        count(col(value)).as("__n"),
        min(col(value)).as("__min"), max(col(value)).as("__max"))
      .select(col(group),
        (col("__s1").cast("double") / col("__n")).as("__mean"),
        ((col("__s2").cast("double")
          - col("__s1").cast("double") * col("__s1").cast("double") / col("__n"))
          / (col("__n") - 1)).as("__var"),
        col("__min"), col("__max"))
    df.join(broadcast(stats), Seq(group))
      .withColumn("z_score", round6((col(value) - col("__mean"))
        / sqrt(col("__var"))))
      .withColumn("min_max", round6((col(value) - col("__min"))
        / (col("__max") - col("__min"))))
      .drop("__mean", "__var", "__min", "__max")
  }

  /** Exact rank bucketing: NTILE(k) of `value` within each `group` (ties
    * broken by `tiebreak` for a total — hence deterministic — order).
    *
    * NTILE is inherently a per-group global sort; with few large groups the
    * window shuffle is one reducer per group, so this is the AUDIT path.
    * The 100×-scale sibling is bucketing by approx_percentile cut points
    * (mergeable t-digest, bounded memory) — same pattern as
    * value_quantiles / ext_value_quantiles_approx. */
  def ntileBuckets(df: DataFrame, group: String, value: String,
                   tiebreak: String, k: Int): DataFrame =
    df.withColumn("bucket", ntile(k).over(
      Window.partitionBy(col(group))
        .orderBy(col(value).asc, col(tiebreak).asc)))

  /** Per-group winsorization: clip `value` to its group's [lo, hi]
    * percentiles — the outlier-capping step before scaling/training.
    * Exact `percentile` is the AUDIT path (it buffers each group's values
    * reduce-side — see the value_quantiles discussion); the 100×-scale
    * variant swaps the cut-point aggregate for `approx_percentile` with
    * everything else unchanged ([[ntileApproxBuckets]] shows the pattern).
    * Cut points are a |groups|-row broadcast, the stream is never
    * window-shuffled. */
  def winsorize(df: DataFrame, group: String, value: String,
                lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1")
    val cuts = df.groupBy(col(group)).agg(
      expr(s"percentile($value, $lo)").as("__lo"),
      expr(s"percentile($value, $hi)").as("__hi"))
    df.join(broadcast(cuts), Seq(group))
      .withColumn(s"${value}_winsorized",
        least(greatest(col(value), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Robust per-group outlier detection: flag rows where
    * |x − median| > k · 1.4826 · MAD (MAD = median absolute deviation;
    * 1.4826 rescales MAD to σ under normality) — the outlier screen that,
    * unlike z-scores, a few extreme rows cannot drag along with them.
    *
    * Shape: two grouped exact-percentile aggregates (median, then MAD
    * against the broadcast medians) + one |groups|-row broadcast join for
    * the row-local verdict — no window, no per-group sort of the data.
    * The stats are rounded to 6 dp before the comparison, so the verdict
    * is reproducible across engines (the flag compares doubles built from
    * identical literals on identical inputs). Exact percentile holds a
    * group's values in memory — the scale path swaps in
    * `approx_percentile` exactly as [[ntileBucketsApprox]] does. */
  def madOutliers(df: DataFrame, group: String, value: String,
                  k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(group))
      .agg(expr(s"percentile($value, 0.5)").as("__med"))
    val stats = df.join(broadcast(med), Seq(group))
      .groupBy(col(group)).agg(
        first(col("__med")).as("__med"),
        expr(s"percentile(abs($value - __med), 0.5)").as("__mad"))
    df.join(broadcast(stats), Seq(group))
      .withColumn("med6", floor(col("__med") * 1e6 + 0.5) / 1e6)
      .withColumn("mad6", floor(col("__mad") * 1e6 + 0.5) / 1e6)
      .withColumn("is_outlier",
        abs(col(value) - col("med6")) > lit(k) * lit(1.4826) * col("mad6"))
      .drop("__med", "__mad")
  }

  /** Per-group mean imputation: fill null `value`s with the group mean
    * (decimal-exact, partitioning-independent — same moment machinery as
    * [[scaleByGroup]]) and flag the filled rows. |groups|-row broadcast
    * join, no window. */
  def imputeMean(df: DataFrame, group: String, value: String): DataFrame = {
    val stats = df.groupBy(col(group)).agg(
      (sum(col(value).cast("decimal(18,2)")).cast("double")
        / count(col(value))).as("__mean"))
    df.join(broadcast(stats), Seq(group))
      .withColumn("was_missing", col(value).isNull)
      .withColumn(s"${value}_imputed", coalesce(col(value), col("__mean")))
      .drop("__mean")
  }

  /** Scale sibling of [[ntileBuckets]]: bucket by `approx_percentile` cut
    * points instead of a per-group global sort. The cut-point aggregate is
    * mergeable and bounded-memory (GK sketch), the assignment is a
    * row-local comparison against the broadcast cut array — so this runs
    * at any scale, trading exact equal-sized buckets for rank-error-bounded
    * ones (agreement with exact NTILE pinned in spec). */
  def ntileApproxBuckets(df: DataFrame, group: String, value: String,
                         k: Int, accuracy: Int = 10000): DataFrame = {
    val qs = (1 until k).map(_.toDouble / k)
    val cuts = df.groupBy(col(group)).agg(
      expr(s"approx_percentile($value, array(${qs.mkString(",")}), $accuracy)")
        .as("__cuts"))
    df.join(broadcast(cuts), Seq(group))
      // bucket = 1 + number of cut points strictly below the value
      .withColumn("bucket",
        (size(filter(col("__cuts"), c => c < col(value))) + 1))
      .drop("__cuts")
  }

  /** Group-wise mean-pooled embedding, long format: one (group, dim, mean)
    * row per dimension — the doc-level-embedding-from-chunk-embeddings /
    * class-centroid op.
    *
    * Shape: posexplode fans each vector into (group, dim, component) rows,
    * but map-side partial aggregation collapses them before the exchange —
    * the shuffle carries |groups| × dims rows, not corpus × dims. Components
    * sum as DECIMAL(18,9) (floats are exact there), so the pooled mean is
    * partitioning-independent and oracle-checkable; means round at 6 dp. */
  def meanPoolEmbeddings(vectors: DataFrame, group: String): DataFrame =
    OpsUtil.spread(vectors)
      .select(col(group), posexplode(col("embedding")))
      .select(col(group), (col("pos") + 1).as("dim"),
        // float → double is exact; double → decimal(18,9) rounds the same
        // way on both engines — make the hop explicit
        col("col").cast("double").cast("decimal(18,9)").as("__c"))
      .groupBy(col(group), col("dim"))
      .agg((sum(col("__c")).cast("double") / count(lit(1))).as("mean_raw"))
      .select(col(group), col("dim"), round6(col("mean_raw")).as("mean_val"))

  /** EMBEDDING-SPACE drift between a reference and a current corpus
    * slice — the vector sibling of [[psiDrift]]: cosine similarity of the
    * two slices' mean embeddings, plus their L2 norms. A feed whose
    * semantic mix shifts (new domain, new language, encoder change)
    * moves the centroid long before any scalar feature flags.
    *
    * Scale shape: ONE pass per side — posexplode → per-dimension decimal
    * sums (order-independent, engine-exact), |dims| rows a side; the
    * cosine is a |dims|-row join computed in exact decimal off the
    * 6 dp-rounded means, so the result replays bit-equal on any engine.
    * At 100 TB the cost is the two scans; everything after is metadata-
    * sized. */
  def embeddingDrift(ref: DataFrame, cur: DataFrame): DataFrame = {
    def centroid(df: DataFrame, side: String): DataFrame =
      OpsUtil.spread(df)
        .select(posexplode(col("embedding")))
        .select((col("pos") + 1).as("dim"),
          col("col").cast("double").cast("decimal(18,9)").as("__c"))
        .groupBy(col("dim"))
        .agg(round6((sum(col("__c")).cast("double") / count(lit(1))))
          .cast("decimal(18,6)").as(s"m_$side"),
          count(lit(1)).as(s"n_$side"))
    centroid(ref, "ref").join(centroid(cur, "cur"), Seq("dim"))
      .agg(
        first(col("n_ref")).as("n_ref"), first(col("n_cur")).as("n_cur"),
        // 6 dp × 6 dp products are exact in decimal(38,12); their sums
        // stay exact, so dot/norms are order-independent
        sum((col("m_ref") * col("m_cur")).cast("decimal(38,12)"))
          .as("__dot"),
        sum((col("m_ref") * col("m_ref")).cast("decimal(38,12)"))
          .as("__na"),
        sum((col("m_cur") * col("m_cur")).cast("decimal(38,12)"))
          .as("__nb"))
      .select(col("n_ref"), col("n_cur"),
        round6(col("__dot").cast("double") /
          (sqrt(col("__na").cast("double")) *
            sqrt(col("__nb").cast("double")))).as("centroid_cos"),
        round6(sqrt(col("__na").cast("double"))).as("l2_ref"),
        round6(sqrt(col("__nb").cast("double"))).as("l2_cur"))
  }

  /** Per-group robust scaling: (x − median) / IQR — the outlier-insensitive
    * sibling of [[scaleByGroup]]'s z-score (a handful of corrupt values move
    * mean/stddev arbitrarily far; they barely move the quartiles). Same
    * two-pass scale shape as [[madOutliers]]: one grouped exact-percentile
    * aggregate (|groups| rows), broadcast back onto the stream. Quartile
    * stats round at 6 dp before use so the scaled value replays bit-equal
    * on any engine; a degenerate group (IQR 0) divides by 1 instead. */
  def robustScale(df: DataFrame, group: String, value: String): DataFrame = {
    val stats = df.groupBy(col(group)).agg(
      expr(s"percentile($value, 0.5)").as("__med"),
      expr(s"percentile($value, 0.75) - percentile($value, 0.25)").as("__iqr"))
    df.join(broadcast(stats), Seq(group))
      .withColumn("med6", floor(col("__med") * 1e6 + 0.5) / 1e6)
      .withColumn("iqr6", floor(col("__iqr") * 1e6 + 0.5) / 1e6)
      .withColumn("robust_z", round6((col(value) - col("med6")) /
        when(col("iqr6") =!= 0.0, col("iqr6")).otherwise(lit(1.0))))
      .drop("__med", "__iqr")
  }

  /** Population Stability Index between a reference and a current sample of
    * `value` — the drift monitor a feature pipeline runs between training
    * and serving windows. Equal-width buckets over the REFERENCE range
    * (current-window values outside it clamp into the end buckets, the
    * standard PSI convention); per-bucket contribution is
    * (p̂ − q̂)·ln(p̂/q̂) with both fractions floored at `eps` so an empty
    * bucket contributes a large-but-finite score instead of ∞. PSI ≥ 0.2 is
    * the conventional "investigate" gate; the caller sums `psi_contrib`.
    *
    * Scale shape: one 1-row min/max aggregate broadcast onto the union of
    * both sides, one |buckets|-row groupBy with map-side partial
    * aggregation, and a 1-row totals broadcast — the bulk data is scanned
    * once per side and never shuffled by anything wider than the bucket id.
    * Contributions round at 6 dp (the ln parity guard). */
  def psiDrift(ref: DataFrame, cur: DataFrame, value: String,
               nBuckets: Int = 10, eps: Double = 1e-6): DataFrame = {
    val v = col(value)
    val stats = ref.filter(v.isNotNull)
      .agg(min(v).as("__mn"), max(v).as("__mx"))
    val tagged = ref.filter(v.isNotNull)
      .select(v.cast("double").as("__v"), lit("ref").as("__side"))
      .unionByName(cur.filter(v.isNotNull)
        .select(v.cast("double").as("__v"), lit("cur").as("__side")))
    val width = when(col("__mx") > col("__mn"),
      (col("__mx") - col("__mn")) / lit(nBuckets)).otherwise(lit(1.0))
    val bucket = least(greatest(
      floor((col("__v") - col("__mn")) / width).cast("int"), lit(0)),
      lit(nBuckets - 1))
    val counts = tagged.crossJoin(broadcast(stats))
      .select(bucket.as("bucket"), col("__side"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__side") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("__side") === "cur", 1L).otherwise(0L)).as("n_cur"))
    val totals = counts.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val pRef = col("n_ref").cast("double") / col("__tr")
    val pCur = col("n_cur").cast("double") / col("__tc")
    val pR = greatest(pRef, lit(eps))
    val pC = greatest(pCur, lit(eps))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        pRef.as("p_ref"), pCur.as("p_cur"),
        round6((pR - pC) * log(pR / pC)).as("psi_contrib"))
  }
}
