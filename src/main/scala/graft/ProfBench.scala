package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Profiling harness (guide §1): runs selected SparkEntry queries with a
  * job listener attached and prints, for each run, every Spark job's wall
  * time plus the DRIVER-SIDE GAP that preceded it (time between the
  * previous job's end and this job's start — file ops, planning,
  * collects, stream bookkeeping). Attribution only; Bench stays the
  * timed contract.
  */
object ProfBench {
  private case class JobRec(id: Int, desc: String, start: Long, var end: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val r = JobRec(js.jobId, d, js.time)
        jobs.put(js.jobId, r); order.add(r)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.end = je.time
      }
    })
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
      SparkEntry.prewarm(spark, sfDir)
    } catch { case t: Throwable => System.err.println(s"[prof] PREWARM FAILED: $t") }
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val runs = sys.env.get("SPARK_GRAFT_PROF_RUNS").flatMap(_.toIntOption).getOrElse(2)
    for (name <- names; run <- 1 to runs) {
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val totalMs = (System.nanoTime() - t0) / 1e6
      // the listener bus delivers asynchronously: drain it before
      // summarizing, or tail JobEnd events are missed (dur -1) and the
      // attribution this tool exists for is skewed. Poll until every
      // recorded job has an end, bounded at 2s.
      locally {
        import scala.jdk.CollectionConverters._
        val deadline = System.currentTimeMillis() + 2000
        while (order.asScala.exists(_.end == 0L) &&
               System.currentTimeMillis() < deadline)
          Thread.sleep(20)
      }
      val recs = {
        import scala.jdk.CollectionConverters._
        order.asScala.toSeq.sortBy(_.start)
      }
      println(f"%n=== $name run $run: total ${totalMs}%.0f ms, ${recs.size} jobs ===")
      var prevEnd = 0L
      var jobSum = 0L; var gapSum = 0L
      for (r <- recs) {
        val dur = if (r.end > 0) r.end - r.start else -1L
        val gap = if (prevEnd > 0) r.start - prevEnd else 0L
        if (dur >= 0) jobSum += dur
        gapSum += math.max(gap, 0L)
        if (run == runs)  // only print detail on the last (warm) run
          println(f"  job ${r.id}%4d ${dur}%6d ms  gap ${gap}%6d ms  ${r.desc.take(110)}")
        prevEnd = math.max(prevEnd, r.end)
      }
      println(f"  [sum] jobs ${jobSum} ms, inter-job driver gaps ${gapSum} ms, wall ${totalMs}%.0f ms")
    }
    spark.stop()
  }
}
