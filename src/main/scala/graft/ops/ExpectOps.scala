package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the landing-time contract check a
  * production pipeline runs before publishing a batch (the reference trusts
  * its Kafka payloads implicitly; `Silver1.py:14-21` just drops nulls — this
  * is the generalization: measure, compare to a threshold, report).
  *
  * Design: every expectation is a pair (aggregate metric, closed pass
  * interval). `report` evaluates ALL expectations in ONE aggregation over
  * the frame — map-side partial aggregation, a single |checks|-column row on
  * the driver-side of the exchange, then an explode to |checks| report rows.
  * Cost is one scan regardless of how many expectations are attached; at
  * 100 TB that is the difference between a usable gate and a 10-pass audit.
  *
  * Determinism contract (the whole report is externally replayable): metrics
  * are restricted to order-independent aggregates — counts, count-distinct,
  * min/max, and means of exact {0,1} indicators (integer sums are exact in
  * doubles up to 2^53, so partial-aggregation order cannot change the
  * result). A mean over arbitrary doubles would be shuffle-order-dependent;
  * route such metrics through DECIMAL like SparkEntry.moneySum does.
  *
  * Multiple count-distinct metrics in one pass use Spark's Expand-based
  * rewrite (rows replicate ×|distinct groups| before the partial agg) — still
  * one scan, with map-side partials per group. */
object ExpectOps {

  /** One expectation: `name` labels the report row, `metric` is an aggregate
    * expression yielding DOUBLE, and the check passes iff the metric lands in
    * [lo, hi]. */
  final case class Expectation(name: String, metric: Column,
                               lo: Double = Double.NegativeInfinity,
                               hi: Double = Double.PositiveInfinity)

  /** Fraction of rows where `c` is non-null (Deequ "Completeness"). */
  def completeness(c: String, atLeast: Double): Expectation =
    Expectation(s"completeness($c)",
      avg(col(c).isNotNull.cast("double")), lo = atLeast, hi = 1.0)

  /** Distinct ratio of non-null values of `c`: 1.0 = unique key. */
  def uniqueness(c: String, atLeast: Double): Expectation =
    Expectation(s"uniqueness($c)",
      count_distinct(col(c)).cast("double") / count(col(c)), lo = atLeast,
      hi = 1.0)

  /** Minimum of `c` at least `lo` (e.g. non-negative amounts). */
  def minAtLeast(c: String, lo: Double): Expectation =
    Expectation(s"min($c)", min(col(c)).cast("double"), lo = lo)

  /** Maximum of `c` at most `hi` (outlier ceiling). */
  def maxAtMost(c: String, hi: Double): Expectation =
    Expectation(s"max($c)", max(col(c)).cast("double"), hi = hi)

  /** Fraction of rows satisfying an arbitrary row predicate (Deequ
    * "Compliance") — e.g. membership in a value whitelist. */
  def compliance(name: String, predicate: Column,
                 atLeast: Double): Expectation =
    Expectation(s"compliance($name)",
      avg(coalesce(predicate, lit(false)).cast("double")), lo = atLeast,
      hi = 1.0)

  /** Row count within [lo, hi] (freshness/volume guard). */
  def sizeBetween(lo: Double, hi: Double = Double.PositiveInfinity): Expectation =
    Expectation("size", count(lit(1)).cast("double"), lo = lo, hi = hi)

  /** Evaluate every expectation in one aggregation pass; returns one row per
    * expectation: (check, metric, passed). A null metric (e.g. min over an
    * all-null column) fails its check — degenerate inputs must not slip
    * through the gate the way an all-null column would slip through a bare
    * threshold comparison. */
  def report(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "at least one expectation required")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate expectation names: ${checks.map(_.name)}")
    val aggs = checks.map(c => c.metric.cast("double").as(c.name))
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.map { c =>
      val m = col(s"`${c.name}`")
      struct(lit(c.name).as("check"), m.as("metric"),
        coalesce(m >= c.lo && m <= c.hi, lit(false)).as("passed"))
    }
    agged.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }
}
