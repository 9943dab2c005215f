package graft

import org.apache.spark.sql.SparkSession

/** Shared engine tuning for every driver main (Bench / Verify / Explain /
  * Profile): one place, one recipe, so the measured session and the
  * correctness session run identical configs.
  *
  * Both settings are SCALE-NEUTRAL — they change nothing a production-sized
  * job would do, they only stop local/small-input runs from paying per-task
  * costs that exist solely because the inputs are tiny:
  *
  *   - `spark.sql.files.minPartitionNum = 1` (guide §6): split planning
  *     becomes purely size-based (`maxPartitionBytes` / `openCostInBytes`).
  *     The default floor (= default parallelism) slices a single-row-group
  *     parquet file into `cores` byte-range splits of which exactly ONE
  *     contains the row-group midpoint and reads data — the other 31 tasks
  *     open the footer, find nothing, and exit. At 100 TB files exceed
  *     maxPartitionBytes and the floor never binds, so production plans are
  *     byte-identical. Row-local kernels keep their parallelism through
  *     [[graft.ops.OpsUtil.spread]]'s explicit repartition, which does not
  *     depend on scan split count.
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
  *     disabled, so the setting changes nothing at scale.
  *
  * Env overrides (measurement experiments, not a tuning surface):
  * `SPARK_GRAFT_MIN_PARTITION_NUM`, `SPARK_GRAFT_BYPASS_THRESHOLD`.
  */
object Sessions {
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.files.minPartitionNum",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_NUM", "1"))
    .config("spark.shuffle.sort.bypassMergeThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
}
