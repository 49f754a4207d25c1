package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the same key
  * and the greatest right timestamp ≤ the left timestamp (the standard
  * time-series point-in-time lookup, which Spark has no native operator
  * for — composed per the custom-operator ladder's option (a)).
  *
  * Shape: equi-join on the key (Catalyst picks broadcast or sort-merge),
  * range predicate on the timestamps, then argmax per left row via
  * `max_by` with an explicit (ts, tiebreak) struct — a single aggregation
  * with map-side partials, NOT a window sort. Skewed keys (one user with
  * millions of right rows) hit the usual groupBy mitigations (salting).
  */
object AsofJoin {

  /** @param tieBreak right-side column disambiguating equal timestamps
    *                 (greatest wins) — required for determinism.
    * Output: left columns + the matched right columns (null if no match —
    *         left outer semantics).
    */
  def asof(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
           leftTs: String, rightTs: String, tieBreak: String): DataFrame = {
    val rightCols = right.columns
    val matched = left
      .join(right, col(leftKey) === col(rightKey) && col(rightTs) <= col(leftTs))
      .groupBy(left.columns.map(col): _*)
      .agg(max_by(
        struct(rightCols.map(col): _*),
        struct(col(rightTs), col(tieBreak))).as("__m"))
      .select((left.columns.map(col) :+ col("__m.*")): _*)
    val unmatched = left.join(right, col(leftKey) === col(rightKey) && col(rightTs) <= col(leftTs), "left_anti")
      .select((left.columns.map(col) ++ rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    matched.unionByName(unmatched)
  }
}
