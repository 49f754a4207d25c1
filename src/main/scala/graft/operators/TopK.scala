package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k-by-score aggregator.
  *
  * Spark has no native top-k aggregate; `Window.partitionBy(q).orderBy(d)`
  * shuffles EVERY candidate row to the reducer for its query. This
  * Aggregator instead keeps a bounded buffer per partition, so map-side
  * partial aggregation reduces each (query × partition) to ≤ k rows before
  * the shuffle — the pattern that survives a 100 TB scan (per-partition
  * local top-k, then a tiny global merge; same effect as the reference's
  * bounded heap `/root/reference/src/rerank.rs:93-100`, but parallel).
  *
  * Ascending by (score, id): smallest scores win, id breaks ties
  * deterministically. For "largest wins" (cosine similarity) negate the
  * score at the call site.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
  private val ord = Ordering.Tuple2[Double, Long]

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], in: (Double, Long)): Array[(Double, Long)] =
    insert(buf, in)

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    var out = a
    var i = 0
    while (i < b.length) { out = insert(out, b(i)); i += 1 }
    out
  }

  private def insert(buf: Array[(Double, Long)], in: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length < k) {
      val out = new Array[(Double, Long)](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, buf.length)
      out(buf.length) = in
      if (out.length == k) out.sorted(ord) else out
    } else if (ord.lt(in, buf(k - 1))) {
      // buf is sorted once full; replace the worst, then bubble into place
      val out = buf.clone()
      var i = k - 1
      out(i) = in
      while (i > 0 && ord.lt(out(i), out(i - 1))) {
        val t = out(i); out(i) = out(i - 1); out(i - 1) = t
        i -= 1
      }
      out
    } else buf
  }

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[Array[(Double, Long)]] = Encoders.kryo[Array[(Double, Long)]]
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
}

object TopK {
  /** Reduce `df(groupCol, idCol, scoreCol)` to the k smallest scores per
    * group. Output: (groupCol, id: long, score: double, rank: long) sorted
    * within group, rank 1-based.
    */
  def perGroup(df: DataFrame, groupCol: String, idCol: String, scoreCol: String, k: Int,
               outId: String = "id", outScore: String = "score"): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    df.groupBy(col(groupCol))
      .agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long")).as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(
        col(groupCol),
        col("pair._2").as(outId),
        col("pair._1").as(outScore),
        (col("pos") + lit(1)).cast("long").as("rank"))
  }
}
