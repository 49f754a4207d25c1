package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.VectorOps

/** Driver-memory serving tier: the RaBitQ index and base vectors held in
  * RAM, queried without launching a Spark job — parity with the
  * reference's in-process service (`/root/reference/crates/service/src/
  * main.rs:68-96`, which likewise holds the whole index in memory). The
  * Spark path stays the engine for batch/index-scale work; this tier
  * exists so single-query HTTP latency is microseconds of arithmetic
  * instead of a job-scheduling round-trip.
  *
  * SIZE BOUND: `fromIndex` collects index AND base to the driver — a
  * RAM-sized-index contract identical to the reference service's. At
  * index sizes beyond driver memory, serve through the Spark path
  * (`RabitqQuery.topKFromDisk` + partition pruning) instead.
  *
  * RESULT PARITY: every arithmetic step replicates the Spark plan
  * bit-for-bit — `computeProbes` is shared code, the rough estimate
  * mirrors the column expression's double promotions exactly, shortlist
  * and final selection order by (score, vec_id) like TopKAgg — so
  * hot-tier results are byte-identical to `RabitqQuery.topK` at the
  * same parameters (asserted by spec).
  */
final class HotTier private (
    model: RabitqModel,
    slotOf: Map[Int, Int],                   // cluster_id -> dense slot
    vecIds: Array[Array[Long]],              // per slot
    codes: Array[Array[Array[Long]]],        // per slot, per vector
    factorIp: Array[Array[Float]],
    factorPpc: Array[Array[Float]],
    errorBound: Array[Array[Float]],
    cds: Array[Array[Float]],
    baseVecs: java.util.HashMap[java.lang.Long, Array[Float]]) {

  /** Single-query top-k: (neighbor_id, dist) sorted by (dist, id). */
  def query(vec: Array[Float], nprobe: Int, topk: Int, rerank: Int): Array[(Long, Double)] = {
    val probes = RabitqQuery.computeProbes(model, 0L, vec, nprobe)
    // rough estimates over probed clusters (same double-promotion order
    // as the fromProbes column expression)
    val cand = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    probes.foreach { p =>
      slotOf.get(p.cluster_id).foreach { s =>
        val n = vecIds(s).length
        val sqrtG = math.sqrt(p.centroid_d2.toDouble)
        var i = 0
        while (i < n) {
          val ad = VectorOps.asymDot(codes(s)(i), p.planes)
          val rough = cds(s)(i).toDouble + p.centroid_d2.toDouble +
            p.lb.toDouble * factorPpc(s)(i).toDouble +
            (2.0 * ad.toDouble - p.sum_q.toDouble) * factorIp(s)(i).toDouble * p.delta.toDouble -
            errorBound(s)(i).toDouble * sqrtG
          cand += ((rough, vecIds(s)(i)))
          i += 1
        }
      }
    }
    val shortlist = cand.sortBy(identity).take(rerank)
    shortlist.map { case (_, id) =>
      val dist = math.sqrt(VectorOps.l2sq(vec, baseVecs.get(id)))
      (dist, id)
    }.sortBy(identity).take(topk).map { case (d, id) => (id, d) }.toArray
  }
}

object HotTier {

  /** Collect the (RAM-sized, by contract) index + base into driver arrays
    * grouped by cluster.
    */
  def fromIndex(spark: SparkSession, model: RabitqModel, index: DataFrame,
                base: DataFrame): HotTier = {
    val rows = index.select("vec_id", "cluster_id", "code", "factor_ip",
      "factor_ppc", "error_bound", "cds").collect()
    val byCluster = rows.groupBy(_.getInt(1)).toArray.sortBy(_._1)
    val slotOf = byCluster.map(_._1).zipWithIndex.toMap
    val vecIds = byCluster.map(_._2.map(_.getLong(0)))
    val codes = byCluster.map(_._2.map(_.getSeq[Long](2).toArray))
    val fip = byCluster.map(_._2.map(_.getFloat(3)))
    val fppc = byCluster.map(_._2.map(_.getFloat(4)))
    val err = byCluster.map(_._2.map(_.getFloat(5)))
    val cds = byCluster.map(_._2.map(_.getFloat(6)))
    val baseVecs = new java.util.HashMap[java.lang.Long, Array[Float]]()
    base.select("vec_id", "embedding").collect().foreach { r =>
      baseVecs.put(r.getLong(0), r.getSeq[Float](1).toArray)
    }
    new HotTier(model, slotOf, vecIds, codes, fip, fppc, err, cds, baseVecs)
  }
}
