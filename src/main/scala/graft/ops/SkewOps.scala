package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY "salting for skew").
  *
  * At 100 TB a handful of hot keys (one power user, one null-ish default)
  * can pin an entire shuffle partition to a single task. AQE's skew-join
  * splitting handles sort-merge joins after the fact; salting fixes the
  * layout up front and also covers the cases AQE doesn't (aggregation-free
  * broadcast paths are unaffected; this targets shuffle joins).
  *
  * Approach: split each big-side row into one of `buckets` sub-keys using a
  * deterministic hash of a discriminator column (no `rand()` — reruns and
  * retried tasks must route identically), and replicate each small-side row
  * `buckets` times. Join output is row-identical to the unsalted join —
  * pinned by SkewOpsSpec.
  */
object SkewOps {

  /** Left join `big` (skewed) with `small` on `key`, spreading each hot key
    * over `buckets` shuffle partitions. `discriminator` is any big-side
    * column with per-row variety (an id, an event time). */
  def saltedLeftJoin(big: DataFrame, small: DataFrame, key: String,
                     discriminator: Column, buckets: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(buckets.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), "left").drop("__salt")
  }

  /** Two-stage aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final on key. Spark's own partial aggregation
    * already bounds shuffle rows per map task; the explicit salt stage
    * additionally spreads the REDUCE side of a hot key over `buckets`
    * tasks — use when one key dominates the reduce (e.g. a null bucket). */
  def saltedCount(df: DataFrame, key: String, discriminator: Column,
                  buckets: Int = 8): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(discriminator), lit(buckets.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
