package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{VectorExpressions => VE}

/** Brute-force k-nearest-neighbor over an embedding column — the exact
  * ground-truth path (SURVEY.md §7 M1; reference analog: recall truth from
  * precomputed ivecs, `/root/reference/crates/cli/src/main.rs:63-75`).
  *
  * Scale shape: queries are the SMALL side — broadcast them and stream the
  * base table once (no shuffle of base). The distance fan-out (n·q rows) is
  * immediately collapsed by the map-side top-k aggregator, so the only
  * shuffled data is ≤ k rows per (query, input partition).
  */
object ExactKnn {

  // sqrt form (not squared): matches DuckDB's list_distance bit-for-bit so
  // oracle rank comparisons can't diverge on near-ties. Distance is a
  // native codegen Expression, not a UDF — the scan stays in one
  // whole-stage-generated loop.
  private def l2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    sqrt(VE.l2sq(a, b))
  private def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    VE.cosineSim(a, b)

  /** Top-k by L2. Output: (query_id, neighbor_id, dist, rank). */
  def l2TopK(base: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = base
      .crossJoin(broadcast(queries))
      .select(
        col("query_id"),
        col("vec_id"),
        l2(col("qvec"), col("embedding")).as("dist"))
    TopK.perGroup(scored, "query_id", "vec_id", "dist", k,
      outId = "neighbor_id", outScore = "dist")
  }

  /** Top-k by cosine similarity (largest first). Output:
    * (query_id, neighbor_id, sim, rank).
    */
  def cosineTopK(base: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = base
      .crossJoin(broadcast(queries))
      .select(
        col("query_id"),
        col("vec_id"),
        (-cos(col("qvec"), col("embedding"))).as("negsim"))
    TopK.perGroup(scored, "query_id", "vec_id", "negsim", k,
      outId = "neighbor_id", outScore = "negsim")
      .withColumn("sim", -col("negsim"))
      .drop("negsim")
  }

  /** Unit-normalize an embedding column (zeros preserved). Cosine top-k
    * over raw vectors == L2 top-k over normalized vectors
    * (d² = 2 − 2·cos), which is how the L2-based RaBitQ index serves the
    * cosine metric the reference leaves unimplemented
    * (`/root/reference/README.md:17` unchecked "cosine distance").
    */
  def normalized(df: DataFrame, vecCol: String): DataFrame = {
    // pure column expressions (whole-stage codegen, no UDF). aggregate's
    // left-to-right double accumulation is bit-identical to the kernel
    // loop it replaces (VectorOps.dot), so downstream exact-rerank ranks
    // are unchanged.
    val v = col(vecCol)
    val nrm = sqrt(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    df.withColumn(vecCol,
      when(nrm === 0.0, v)
        .otherwise(transform(v, x => (x.cast("double") / nrm).cast("float"))))
  }

  /** First `n` embeddings (by vec_id) as a query set (query_id, qvec). */
  def queriesFromEmbeddings(emb: DataFrame, n: Int): DataFrame =
    emb.filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  /** recall@k of `result` vs `truth`, both (query_id, neighbor_id, rank≤k)
    * (Q16, `/root/reference/src/utils.rs:367-379`). Returns a 1-row DF.
    */
  def recall(result: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    // both sides are ≤ |queries|·k rows by contract — broadcast so the
    // comparison never falls into a sort-merge join
    val r = result.filter(col("rank") <= k).select("query_id", "neighbor_id")
    val t = truth.filter(col("rank") <= k).select("query_id", "neighbor_id")
    val hits = r.join(broadcast(t), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count("*").as("hits"))
    val nq = t.select("query_id").distinct()
    nq.join(broadcast(hits), Seq("query_id"), "left")
      .agg((sum(coalesce(col("hits"), lit(0L))) / (count("*") * k)).as("recall"))
  }
}
