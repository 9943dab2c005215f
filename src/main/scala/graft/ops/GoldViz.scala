package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold consumption edge — the engine-side analog of the reference's
  * dashboard feed (`GoldDataVisualiztion1.py:9-99`, `Gold1.py:129-133`).
  *
  * The reference `toPandas()`s FIVE whole tables to the driver and plots
  * them — unbounded driver memory the moment gold outgrows one machine.
  * The scale-safe consumption edge keeps reduction server-side:
  *   - `featureSummary`: per-feature distribution stats in ONE global
  *     aggregate — O(features) rows cross the driver boundary, not
  *     O(customers);
  *   - `boundedSample`: a deterministic hash-ordered cap applied BEFORE
  *     collect/export, so a dashboard scatter gets a stable representative
  *     slice no matter the corpus size;
  *   - `exportCsv`: the five reference frames, sampled then exported.
  */
object GoldViz {

  /** The numeric gold features the dashboard plots. */
  val Features: Seq[String] = Seq(
    "signup_days_ago", "login_gap_days", "total_sessions_last_30d",
    "total_declined_payments", "avg_payment_value", "arpu",
    "avg_resolution_time", "avg_ticket_sentiment")

  /** One row per feature: non-null count, min/max, quartiles. Single
    * global hash-aggregate (partial + final — one exchange of one row per
    * task), then a row-local explode to the per-feature layout. Exact and
    * order-independent: count/min/max trivially; `percentile` sorts its
    * input so partition order never shows. */
  def featureSummary(gold: DataFrame, feats: Seq[String] = Features): DataFrame = {
    val aggs = feats.flatMap { f =>
      Seq(
        count(col(f)).as(s"${f}__n"),
        min(col(f)).cast("double").as(s"${f}__min"),
        max(col(f)).cast("double").as(s"${f}__max"),
        percentile(col(f).cast("double"), lit(0.25)).as(s"${f}__p25"),
        percentile(col(f).cast("double"), lit(0.5)).as(s"${f}__p50"),
        percentile(col(f).cast("double"), lit(0.75)).as(s"${f}__p75"))
    }
    gold.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(feats.map(f => struct(
        lit(f).as("feature"),
        col(s"${f}__n").as("n"),
        col(s"${f}__min").as("fmin"),
        col(s"${f}__max").as("fmax"),
        col(s"${f}__p25").as("p25"),
        col(s"${f}__p50").as("p50"),
        col(s"${f}__p75").as("p75"))): _*)).as("s"))
      .select("s.*")
  }

  /** Scale sibling of [[featureSummary]]: same shape, quartiles via
    * `approx_percentile` (GK sketch, mergeable, bounded memory). The exact
    * form buffers every row's value in the final reduce — O(rows) memory on
    * one task, a scale-killer at 100 TB; the sketch holds O(accuracy) per
    * partition and merges map-side. accuracy=10000 bounds rank error at
    * 1/10000 of the row count. Exact stays as the audit path; agreement is
    * pinned in GoldVizSpec. Estimates aren't SQL-portable → no_oracle, like
    * the other sketch queries. */
  def featureSummaryApprox(gold: DataFrame, feats: Seq[String] = Features,
                           accuracy: Int = 10000): DataFrame = {
    val aggs = feats.flatMap { f =>
      Seq(
        count(col(f)).as(s"${f}__n"),
        min(col(f)).cast("double").as(s"${f}__min"),
        max(col(f)).cast("double").as(s"${f}__max"),
        percentile_approx(col(f).cast("double"), lit(0.25), lit(accuracy))
          .as(s"${f}__p25"),
        percentile_approx(col(f).cast("double"), lit(0.5), lit(accuracy))
          .as(s"${f}__p50"),
        percentile_approx(col(f).cast("double"), lit(0.75), lit(accuracy))
          .as(s"${f}__p75"))
    }
    gold.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(feats.map(f => struct(
        lit(f).as("feature"),
        col(s"${f}__n").as("n"),
        col(s"${f}__min").as("fmin"),
        col(s"${f}__max").as("fmax"),
        col(s"${f}__p25").as("p25"),
        col(s"${f}__p50").as("p50"),
        col(s"${f}__p75").as("p75"))): _*)).as("s"))
      .select("s.*")
  }

  /** The five frames the reference dashboard reads
    * (`GoldDataVisualiztion1.py:9-14`), as named projections. */
  def vizFrames(app: DataFrame, declines: DataFrame, arpu: DataFrame,
                support: DataFrame, enriched: DataFrame): Map[String, DataFrame] = Map(
    "app_features" -> app.select(
      "customer_id", "login_gap_days", "total_sessions_last_30d"),
    "payment_declines" -> declines.select(
      "customer_id", "total_declined_payments", "avg_payment_value"),
    "arpu" -> arpu.select("customer_id", "total_revenue", "arpu"),
    "support_features" -> support.select(
      "customer_id", "avg_resolution_time", "avg_ticket_sentiment"),
    "enriched" -> enriched)

  /** Deterministic bounded sample: hash-order by key, take `cap`. The
    * TopK (`WindowGroupLimit`-style sort-limit) runs distributed; only cap
    * rows ever reach the driver side of the export. */
  def boundedSample(df: DataFrame, cap: Int, key: String = "customer_id"): DataFrame =
    df.orderBy(xxhash64(col(key)), col(key)).limit(cap)

  /** Dashboard hand-off: each frame sampled server-side, one CSV dir per
    * frame (header row for the pandas/plotly consumer). */
  def exportCsv(frames: Map[String, DataFrame], out: String,
                cap: Int = 10000, key: String = "customer_id"): Unit =
    frames.foreach { case (name, df) =>
      boundedSample(df, cap, key).coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(s"$out/$name")
    }
}
