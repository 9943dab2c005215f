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
    if (df.isStreaming) return df // no partition probe on streaming plans
    val spark = df.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty) {
      // non-file relation (in-memory fixtures): the RDD partition probe is
      // the only option — it forces physical planning, which is why this
      // branch must stay off large mid-pipeline frames (scan-stage only)
      if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism)
      else df
    } else if (files.length >= parallelism) df // enough natural splits
    else {
      // derive the scan's natural split count from the file listing alone
      // (metadata only — no plan compilation): files can only split finer
      // than one-per-file when they exceed maxPartitionBytes
      val hconf = spark.sparkContext.hadoopConfiguration
      val maxBytes = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
      val totalBytes = files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        try p.getFileSystem(hconf).getFileStatus(p).getLen
        catch { case _: Throwable => 0L }
      }.sum
      val naturalSplits = math.max(files.length.toLong,
        (totalBytes + maxBytes - 1) / maxBytes)
      if (naturalSplits < parallelism) df.repartition(parallelism) else df
    }
  }
}
