package graft

import org.apache.spark.sql.SparkSession

/** Plan-hygiene inspector: prints the formatted physical plan of one or
  * all SparkEntry queries. Used to audit shuffle counts, pushed filters,
  * broadcast choices, and WholeStageCodegen spans per round (the prompt's
  * ".explain and iterate" loop).
  *
  *   sbt "runMain graft.PlanDump q12_knn_l2 /root/testdata/sf0.001"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // keep dedup pipelines lazy so their full plan (not a checkpointed
    // Scan ExistingRDD stub) is what gets printed
    System.setProperty("graft.dedup.lazyPlans", "true")
    val which = if (args.nonEmpty) args(0) else "all"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (which == "all") SparkEntry.queries.keys.toSeq.sorted else Seq(which)
    // --exec: run the query first and print the FINAL adaptive plan —
    // AQE decisions (ReusedExchange stage-cache hits, runtime join
    // demotions, coalesced partitions) only exist post-execution
    val exec = args.contains("--exec")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (exec) { df.count(); println(df.queryExecution.executedPlan.toString) }
        else df.explain("formatted")
      } catch { case e: Throwable => println(s"  failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
