package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Layout-tier scale smoke: the z-order data-skipping claim (q87/q88)
  * measured at 10M rows instead of the 60k-row fixture. Generates a
  * 3-integer-dim fact table distributed, writes it three ways — 2-dim
  * z-ordered, 3-dim z-ordered, hash-scattered — and runs the q87/q88
  * range aggregates against each, reporting the fraction of rows the
  * parquet reader MATERIALIZES (row-group min/max skipping) and wall
  * time. This is the "would it hold at 1000×" evidence for the layout
  * triad: the skip ratio should hold or improve as row groups per file
  * grow, because group min/max spans shrink relative to the domain.
  *
  *   sbt "runMain graft.LayoutScaleSmoke 10000000 32"   # nRows files
  */
object LayoutScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val files = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false") // stable scan metrics
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.ZOrder

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // three independent-ish integer dims with distinct domains (the
    // uncorrelated worst case for single-column sorting) + a payload
    val (aMax, bMax, cMax) = (1L << 20, 1L << 16, 1L << 12)
    val rows = spark.range(n).select(
      pmod(xxhash64(col("id") * 31 + 1), lit(aMax)).as("a"),
      pmod(xxhash64(col("id") * 31 + 2), lit(bMax)).as("b"),
      pmod(xxhash64(col("id") * 31 + 3), lit(cMax)).as("c"),
      (col("id") % 97).cast("double").as("v"))

    val base = TempDirs.create("graft_layout_smoke_")
    val key2 = ZOrder.zorderKey(col("a"), lit(0L), lit(aMax - 1),
      col("b"), lit(0L), lit(bMax - 1), bits = 16)
    val key3 = ZOrder.zorderKeyN(Seq(
      (col("a"), lit(0L), lit(aMax - 1)),
      (col("b"), lit(0L), lit(bMax - 1)),
      (col("c"), lit(0L), lit(cMax - 1))), bits = 16)
    val (_, wz2) = timed { ZOrder.zorderWrite(rows, key2, s"$base/z2", files) }
    val (_, wz3) = timed { ZOrder.zorderWrite(rows, key3, s"$base/z3", files) }
    val (_, wn) = timed {
      rows.repartition(files).write.mode("overwrite").parquet(s"$base/n")
    }
    println(f"[layout-smoke] n=$n files=$files write: z2=$wz2%.1fs z3=$wz3%.1fs scattered=$wn%.1fs")

    // the q87/q88 predicate shape: lower eighth of each keyed dimension
    def scan(path: String, dims: Int): (Long, Long, Double) = {
      var q = spark.read.parquet(path)
        .filter(col("a") < aMax / 8 && col("b") < bMax / 8)
      if (dims == 3) q = q.filter(col("c") < cMax / 8)
      val agg = q.agg(count(lit(1)).as("nr"), sum(col("v")).as("sv"))
      val (row, sec) = timed { agg.collect()(0) }
      val scanned = agg.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s }.head.metrics("numOutputRows").value
      (row.getLong(0), scanned, sec)
    }
    for ((label, path, dims) <- Seq(
        ("2-dim pred on z2", s"$base/z2", 2),
        ("2-dim pred on scattered", s"$base/n", 2),
        ("3-dim pred on z3", s"$base/z3", 3),
        ("3-dim pred on scattered", s"$base/n", 3))) {
      val (hits, scanned, sec) = scan(path, dims)
      println(f"[layout-smoke] $label%-24s hits=$hits%9d materialized=$scanned%9d " +
        f"(${100.0 * scanned / n}%5.1f%% of $n) ${sec}%6.2fs")
    }
    spark.stop()
  }
}
