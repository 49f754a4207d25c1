package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ExactKnn, RabitqIndex, RabitqQuery}

/** ANN early-stop scale smoke: the q92 ball-pruning claim measured on a
  * CLUSTERED corpus at 1M vectors instead of the 60k uniform fixture.
  * Generates k well-separated Gaussian clusters distributed (seeded per
  * row — no driver materialization), builds the index, and reports the
  * surviving (query, cluster) fraction from `prunedPairs` plus wall time
  * of the pruned exact search vs brute force, asserting exact equality
  * of the two answers. The 100 TB shape: pruning decisions touch only
  * numClusters rows of metadata per query; the scan cost then scales
  * with the surviving fraction, which DROPS as real corpora cluster
  * (uniform data is the adversarial floor, covered in the spec).
  *
  *   sbt "runMain graft.BallSmoke 1000000 64 32"   # nRows dim clusters
  */
object BallSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // k separated cluster centers (driver-side, tiny), members generated
    // executor-side from the row id — same recipe as the q92 spec at 500×
    val centers = {
      val rnd = new scala.util.Random(7)
      Array.fill(k)(Array.fill(dim)(rnd.nextGaussian().toFloat * 10f))
    }
    val bCenters = spark.sparkContext.broadcast(centers)
    val mkVec = udf { (id: Long) =>
      val rnd = new scala.util.Random(id * 2654435761L + 13)
      val c = bCenters.value((id % k).toInt)
      c.map(v => v + rnd.nextGaussian().toFloat * 0.3f).toSeq
    }
    val pts = spark.range(n).select(col("id").as("vec_id"), mkVec(col("id")).as("embedding"))
      .repartition(cpus.toInt).persist()
    println(s"[ball-smoke] corpus n=${pts.count()} dim=$dim clusters=$k")

    val ((model, index), tBuild) = timed(RabitqIndex.build(spark, pts, k, seed = 11L))
    val idx = index.persist()
    idx.count()
    val stats = RabitqQuery.clusterStats(idx).persist()
    val assigned = pts.join(idx.select("vec_id", "cluster_id"), Seq("vec_id")).persist()
    assigned.count()
    println(f"[ball-smoke] index build $tBuild%.1fs")

    val nQ = 200
    val q = ExactKnn.queriesFromEmbeddings(pts, nQ).persist()
    q.count()
    val pairs = RabitqQuery.prunedPairs(spark, model, stats, q, 10)
    val nPairs = pairs.count()
    val frac = nPairs.toDouble / (nQ.toDouble * k)
    println(f"[ball-smoke] surviving (query, cluster) pairs: $nPairs of ${nQ * k} (${frac * 100}%.1f%%)")

    val (pruned, tPruned) = timed {
      RabitqQuery.ballPrunedTopK(spark, model, stats, assigned, q, 10)
        .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    }
    val (brute, tBrute) = timed {
      ExactKnn.l2TopK(pts, q, 10)
        .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    }
    require(pruned == brute, "ball-pruned answer diverged from brute force")
    println(f"[ball-smoke] pruned exact search $tPruned%.2fs vs brute force $tBrute%.2fs — answers identical")
    spark.stop()
  }
}
