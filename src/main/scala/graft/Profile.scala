package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Job-level profiler for one query (guide §1: find where the time goes
  * before touching anything): runs the named query once untimed (codegen
  * warm), then N timed passes, printing every Spark job's description and
  * wall time plus the gaps (driver-side work: planning, log walks, commit
  * protocol) — the local-mode stand-in for the Spark UI's job table.
  *
  * Usage: runMain graft.Profile <sfDir> <query> [nRuns]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val nRuns = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.prestage(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[profile] prestage failed: ${e.getMessage}")
    }
    val fn = SparkEntry.queries(qname)
    def clearCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    // warm pass (codegen + footers), untimed
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    clearCaches()

    case class Job(id: Int, desc: String, start: Long, var end: Long)
    val jobs = mutable.ArrayBuffer[Job]()
    val byId = mutable.HashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val j = Job(js.jobId, desc, js.time, -1L)
        jobs.synchronized { jobs += j; byId(js.jobId) = j }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized { byId.get(je.jobId).foreach(_.end = je.time) }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to nRuns).foreach { i =>
      jobs.synchronized { jobs.clear(); byId.clear() }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      clearCaches()
      Thread.sleep(200) // let late listener events drain
      val snap = jobs.synchronized { jobs.toVector.sortBy(_.start) }
      println(f"[profile] === $qname run $i: wall $wall%.3f s, ${snap.size} jobs ===")
      var prevEnd = -1L
      snap.foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1000.0 else Double.NaN
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1000.0 else 0.0
        if (prevEnd > 0 && gap > 0.05)
          println(f"[profile]   (driver gap $gap%7.3f s)")
        println(f"[profile]   job ${j.id}%4d $dur%7.3f s  ${j.desc.take(110)}")
        prevEnd = math.max(prevEnd, if (j.end > 0) j.end else j.start)
      }
      val jobSum = snap.collect { case j if j.end > 0 => (j.end - j.start) / 1000.0 }.sum
      println(f"[profile] job time sum $jobSum%.3f s of $wall%.3f s wall")
      val sc = graft.ops.TxTable.snapshotCalls.getAndSet(0L)
      val sn = graft.ops.TxTable.snapshotNanos.getAndSet(0L) / 1e9
      if (sc > 0) println(f"[profile] snapshot() calls $sc%d, time $sn%.3f s")
    }
    spark.stop()
  }
}
