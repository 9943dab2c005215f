package graft

import org.apache.spark.sql.SparkSession

/** Shared engine tuning for every driver main (Bench / Verify / Explain /
  * Profile): one place, one recipe, so the measured session and the
  * correctness session run identical configs.
  *
  *   - `spark.shuffle.sort.bypassMergeThreshold = 1` (guide §2.2): always
  *     use the sort-based shuffle writer (one data file + one index per map
  *     task). The bypass writer opens R partition files with R write buffers
  *     per map task; at `local[32]` with `shuffle.partitions = 32` that is
  *     32 files × 32 tasks = 1024 file creates per tiny shuffle — measured
  *     at ~300 ms of executor time PER TASK on ext_embed_meanpool
  *     (stage run time 11.1 s → 0.78 s with the sort writer; this single
  *     constant was the round-15 "32 cores slower than 8 cores" inversion).
  *     Production shuffles run with R > 200 where bypass is already
  *     disabled, so the setting is scale-neutral: it changes nothing for a
  *     production-sized job.
  *
  * Measured and deliberately NOT set:
  *   - `spark.sql.files.minPartitionNum = 1` (size-based split planning)
  *     removed the 31-empty-splits-per-single-row-group-scan overhead
  *     (−0.6 s over 20 fixture-heavy queries) but serialized multi-file
  *     TxTable reads — many small bucket files bin-packed into one split
  *     read their file-open latency sequentially (TxTable-family subset
  *     20.2 s vs 11.8 s at the default). Net loss; the default floor
  *     (= default parallelism) stays.
  *
  * Env overrides (measurement experiments, not a tuning surface):
  * `SPARK_GRAFT_MIN_PARTITION_NUM`, `SPARK_GRAFT_BYPASS_THRESHOLD`.
  */
object Sessions {
  def tuned(b: SparkSession.Builder): SparkSession.Builder = {
    val b1 = b.config("spark.shuffle.sort.bypassMergeThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
    sys.env.get("SPARK_GRAFT_MIN_PARTITION_NUM")
      .fold(b1)(v => b1.config("spark.sql.files.minPartitionNum", v))
  }
}
