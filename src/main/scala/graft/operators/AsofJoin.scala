package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the single right row with the same key
  * and the greatest right timestamp ≤ the left timestamp (the standard
  * time-series point-in-time lookup, which Spark has no native operator
  * for — composed per the custom-operator ladder's option (a)).
  *
  * Shape: the single-pass union-and-window form. Both sides are tagged
  * and unioned, clustered by key, sorted by (ts, side, tieBreak), and the
  * latest right payload is propagated forward with `last(..., ignoreNulls)`
  * over an unbounded-preceding frame. ONE shuffle + ONE sort, and — unlike
  * the equi-join + range-filter shape — no per-key fan-out: a hot key with
  * |L| events and |R| orders costs O(|L|+|R|) rows, not O(|L|·|R|).
  * Duplicate left rows survive unchanged (each is its own union row; no
  * grouping on left columns).
  */
object AsofJoin {

  /** @param tieBreak right-side column disambiguating equal timestamps
    *                 (greatest wins) — required for determinism.
    * Output: left columns + the matched right columns (null if no match —
    *         left outer semantics).
    */
  def asof(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
           leftTs: String, rightTs: String, tieBreak: String): DataFrame = {
    val leftCols = left.columns
    val rightCols = right.columns
    // common sort timestamp type (timestamps and dates compare after cast)
    val tsType = left.schema(leftTs).dataType

    // tagged union: side 0 = right (must sort BEFORE left at equal ts —
    // rightTs <= leftTs is inclusive), side 1 = left. Right rows carry
    // their full payload in a struct; left rows carry theirs.
    // a null right timestamp must never match (join-predicate semantics:
    // NULL <= ts is not true); unfiltered it would sort before everything
    // and become the "earliest" payload for the whole key. Likewise a null
    // right KEY can never equal any left key — but Window.partitionBy
    // groups all NULL keys into one partition, so unfiltered it would
    // match null-key left rows (NULL = NULL, which an equi-join rejects)
    val r = right.filter(col(rightTs).isNotNull && col(rightKey).isNotNull).select(
      col(rightKey).as("__key"),
      col(rightTs).cast(tsType).as("__ts"),
      lit(0).as("__side"),
      col(tieBreak).as("__tb"),
      struct(rightCols.toIndexedSeq.map(col): _*).as("__rpay"),
      lit(null).cast(left.select(struct(leftCols.toIndexedSeq.map(col): _*)).schema.head.dataType).as("__lpay"))
    val l = left.select(
      col(leftKey).as("__key"),
      col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(right.schema(tieBreak).dataType).as("__tb"),
      lit(null).cast(right.select(struct(rightCols.toIndexedSeq.map(col): _*)).schema.head.dataType).as("__rpay"),
      struct(leftCols.toIndexedSeq.map(col): _*).as("__lpay"))

    // within a key: rights ascending by (ts, tieBreak), each left row after
    // every right row with __ts <= its ts; last non-null right payload at a
    // left row == the as-of match. Ties among left rows are harmless (they
    // read the same prefix of rights). NULLS FIRST on the tie-break so a
    // null tieBreak LOSES a timestamp tie to any non-null one, matching
    // max_by(struct(ts, tb)) semantics where NULL orders smallest.
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(c => col(s"__lpay.$c")) ++
        rightCols.map(c => col(s"__match.$c"))).toIndexedSeq: _*)
  }
}
