package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Batch approximate query over a RaBitQ index — the whole probe →
  * estimate → rerank → top-k pipeline (SURVEY.md §2.3 Q1–Q14) as ONE
  * Catalyst plan per query batch, replacing the reference's serial
  * per-query loop (`/root/reference/src/rabitq.rs:268-333`).
  *
  * Scale shape:
  *  - query-side state (rotated residual quantization per probed cluster)
  *    is tiny → computed in a narrow projection and BROADCAST to the join
  *    with the index, so the big index table never shuffles;
  *  - rough estimation is a narrow select over only the probed clusters
  *    (partition-pruned when the index is read from its partitionBy layout);
  *  - candidate selection and the final top-k use the bounded map-side
  *    top-k aggregator (TopKAgg), replacing the reference's serial
  *    threshold heap (`/root/reference/src/rerank.rs:62-114`) with a
  *    parallel local-then-global top-k at identical results.
  */
object RabitqQuery {

  /** Per-(query, probed-cluster) state: cluster, centroid distance, and the
    * 4-bit-quantized residual with its bit planes (Q3–Q7).
    */
  private case class Probe(
      cluster_id: Int, g2: Float, lb: Float, delta: Float, sum_q: Int,
      planes: Array[Long])

  /** Approximate top-k.
    *
    * @param rerank number of rough-distance candidates per query to score
    *               exactly (≥ topk; larger ⇒ higher recall, more exact
    *               distances). With nprobe = numClusters and rerank ≥ n the
    *               result is EXACTLY the brute-force answer.
    * Output: (query_id, neighbor_id, dist, rank).
    */
  def topK(spark: SparkSession, model: RabitqModel, index: DataFrame, base: DataFrame,
           queries: DataFrame, nprobe: Int, topk: Int, rerank: Int): DataFrame = {
    import spark.implicits._
    val bModel = spark.sparkContext.broadcast(model)

    // Q1–Q7: pad+rotate the query, rank centroids, quantize the residual
    // per probed cluster. All per-query, executor-side, no shuffle.
    val probeUdf = udf { (qvec: Seq[Float]) =>
      val m = bModel.value
      val y = VectorOps.rotate(m.rotation, VectorOps.pad(qvec.toArray, 64))
      val dists = m.centroids.zipWithIndex.map { case (c, i) =>
        (VectorOps.l2sq(y, c), i)
      }.sortBy(identity).take(nprobe)
      dists.map { case (g2, cid) =>
        val res = VectorOps.subtract(y, m.centroids(cid))
        var lb = Float.MaxValue; var ub = Float.MinValue
        var i = 0
        while (i < res.length) {
          if (res(i) < lb) lb = res(i)
          if (res(i) > ub) ub = res(i)
          i += 1
        }
        val (codes, sumQ) = VectorOps.quantizeQuery(res, lb, ub, m.bias)
        val delta = if (ub > lb) (ub - lb) / VectorOps.QuantLevels.toFloat else 0f
        Probe(cid, g2.toFloat, lb, delta, sumQ, VectorOps.bitPlanes(codes))
      }.toSeq
    }

    val probes = queries
      .select(col("query_id"), explode(probeUdf(col("qvec"))).as("p"))
      .select(col("query_id"), col("p.*"))

    // Q8–Q9: rough lower-bound estimate for every candidate in a probed
    // cluster. Index side stays put; probe side is broadcast.
    val roughUdf = udf {
      (code: Seq[Long], planes: Seq[Long], cds: Float, g2: Float, lb: Float,
       delta: Float, sumQ: Int, fip: Float, fppc: Float, err: Float) =>
        val ad = VectorOps.asymDot(code.toArray, planes.toArray)
        VectorOps.roughDistance(cds, g2, lb, delta, sumQ, fip, fppc, err, ad)
    }

    val candidates = index
      .join(broadcast(probes), Seq("cluster_id"))
      .select(
        col("query_id"), col("vec_id"),
        roughUdf(col("code"), col("planes"), col("cds"), col("g2"), col("lb"),
                 col("delta"), col("sum_q"), col("factor_ip"),
                 col("factor_ppc"), col("error_bound")).as("rough"))

    // Q10/Q14: keep the `rerank` best rough candidates per query (map-side
    // bounded top-k), exact-distance them against the base table, final
    // top-k.
    val shortlist = TopK.perGroup(candidates, "query_id", "vec_id", "rough", rerank,
      outId = "vec_id", outScore = "rough")
      .select("query_id", "vec_id")

    val l2 = udf((a: Seq[Float], b: Seq[Float]) => math.sqrt(VectorOps.l2sq(a.toArray, b.toArray)))
    val exact = base.join(broadcast(shortlist), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        l2(col("qvec"), col("embedding")).as("dist"))

    TopK.perGroup(exact, "query_id", "vec_id", "dist", topk,
      outId = "neighbor_id", outScore = "dist")
  }
}
