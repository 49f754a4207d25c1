package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter aggregation keys: salt → two-phase
  * aggregate. At 100 TB a single hot key (one viral document id, one
  * degenerate cluster) can pin a reducer; salting splits each key across
  * `buckets` partial aggregates, then recombines — correct for any
  * algebraic aggregate (sum/count/min/max) because the phases compose.
  *
  * AQE's skew-join handling covers joins; this covers groupBy, which AQE
  * does not rebalance.
  */
object Salting {

  /** Two-phase salted aggregation. `aggs` maps output column name →
    * (phase-1 aggregate over rows, phase-2 recombine over partials).
    *
    * CONTRACT / limitation: the salt is a content hash (see below), so a
    * hot key whose rows are bit-for-bit IDENTICAL across every column all
    * hash to one salt bucket and the skew remains. That shape is already
    * degenerate upstream (fully duplicate rows at hot-key volume); if it
    * is a real workload, run exact dedup-with-count first (one narrow
    * groupBy on the full row producing (row, n)) and aggregate the
    * weighted distinct rows — the distinct frame has no identical rows,
    * so the content salt then spreads them. Rows that differ in ANY
    * column spread across buckets as intended.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], buckets: Int,
                aggs: Map[String, (Column, Column)]): DataFrame = {
    // salt must be a pure function of row CONTENT: the salt is the phase-1
    // shuffle key, and with a nondeterministic salt (partition id, rand,
    // monotonic id) a re-executed map task after a fetch failure would
    // re-salt rows differently, double-counting or dropping them in
    // reducers that already pulled the old output. Hashing every column
    // spreads a hot key across buckets whenever its rows differ anywhere.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(buckets.toLong)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (p1, _)) => p1.as(n) }.toSeq: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head._2._2.as(aggs.head._1),
        aggs.tail.map { case (n, (_, p2)) => p2.as(n) }.toSeq: _*)
  }

  /** Convenience: salted sum + count (the common skewed rollup). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     buckets: Int = 16): DataFrame =
    saltedAgg(df, keyCols, buckets, Map(
      "total" -> (sum(col(valueCol)), sum(col("total"))),
      "n" -> (count(lit(1)), sum(col("n")).cast("long"))))
}
