package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization + time-window aggregation over `events` (north-star
  * extension; the reference has no streaming/state surface — README.md:18
  * leaves mutation unimplemented).
  *
  * Scale shape: everything is one shuffle on user_id (the session window);
  * per-user event counts are bounded, so no skew salting needed until a
  * user exceeds partition memory — at which point split by (user_id,
  * day) first.
  */
object Sessionize {

  /** Assign session ids: a new session starts when the gap to the previous
    * event of the same user exceeds `gapMinutes`. Output adds
    * (session_seq: long — 1-based per user).
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    // microsecond arithmetic: event timestamps carry sub-second precision,
    // unix_timestamp() would truncate and misclassify gaps at the boundary
    val isNew = when(prevTs.isNull
      .or(graft.functions.TimeNorm.tsMicros(col("ts")) -
        graft.functions.TimeNorm.tsMicros(prevTs) > gapMinutes * 60L * 1000000L), 1L)
      .otherwise(0L)
    events
      .withColumn("is_new", isNew)
      .withColumn("session_seq",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("is_new")
  }

  /** Per-session stats: events, span microseconds, total value (exact
    * decimal accumulation, cast back to double).
    */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (graft.functions.TimeNorm.tsMicros(max(col("ts"))) -
          graft.functions.TimeNorm.tsMicros(min(col("ts"))))
          .cast("long").as("span_us"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("total_value"))

  /** Invariant gates for a STREAMED closed-session set against this batch
    * sessionizer's output (q89): the stream's emitted set is boundary-
    * nondeterministic (a user's final session may or may not close via
    * event-time timeout), so instead of row equality the gates check the
    * session algebra — definitely-closed ⊆ streamed ⊆ all batch sessions,
    * streamed non-empty — in ONE tagged-union shuffle: tag bit 1 = batch
    * row, bit 2 = definitely-closed (not the user's last session), bit 4 =
    * streamed; `bit_or` per session key, violations counted in a single
    * aggregate. Sessions are unique per (user_id, session_seq), so set
    * semantics suffice. Both inputs must carry (user_id, session_seq,
    * n_events, span_us).
    */
  def sessionGates(batch: DataFrame, streamed: DataFrame): DataFrame = {
    val keys = Seq("user_id", "session_seq", "n_events", "span_us").map(col)
    val w = Window.partitionBy(col("user_id"))
    val b = batch
      .withColumn("tag",
        when(col("session_seq") < max(col("session_seq")).over(w), 3).otherwise(1))
      .select(keys :+ col("tag"): _*)
    val s = streamed.select(keys :+ lit(4).as("tag"): _*)
    b.unionAll(s)
      .groupBy(keys: _*).agg(bit_or(col("tag")).as("t"))
      .agg(
        // coalesce: zero groups (both inputs empty) would make the sums
        // NULL — subset checks are then vacuously true, non-empty false
        coalesce(sum(when((col("t").bitwiseAND(2) > 0) && col("t").bitwiseAND(4) === 0, 1)
          .otherwise(0)) === 0, lit(true)).cast("long").as("closed_ok"),
        coalesce(sum(when((col("t").bitwiseAND(4) > 0) && col("t").bitwiseAND(1) === 0, 1)
          .otherwise(0)) === 0, lit(true)).cast("long").as("bounded_ok"),
        coalesce(sum(when(col("t").bitwiseAND(4) > 0, 1).otherwise(0)) > 0,
          lit(false)).cast("long").as("nonempty_ok"))
  }

  /** Tumbling-window aggregation by event_type (batch form of the
    * Structured Streaming query in graft.streaming.EventsStream).
    */
  def windowedCounts(events: DataFrame, minutes: Int): DataFrame =
    events
      .groupBy(
        window(col("ts"), s"$minutes minutes").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
}
