package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared operator plumbing. */
object OpsUtil {

  /** Spread a CPU-bound row-local stage across the cluster.
    *
    * Scans of small/single-row-group files yield fewer input partitions than
    * there are cores, which serializes per-row kernels (minhash, simhash,
    * winnowing, media decode) onto a handful of tasks regardless of cluster
    * size. When — and only when — the incoming partition count is below the
    * default parallelism, round-robin repartition before the kernel. At real
    * scale (TB-range inputs → thousands of scan splits) the condition is
    * false and this is a no-op, so the guard never adds a shuffle of bulk
    * data; on under-split inputs the shuffle it adds is by definition small.
    */
  def spread(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism)
    else df
  }
}
