package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization + time-window aggregation over `events` (north-star
  * extension; the reference has no streaming/state surface — README.md:18
  * leaves mutation unimplemented).
  *
  * Scale shape: everything is one shuffle on user_id (the session window);
  * per-user event counts are bounded for organic traffic. For a hot user
  * (a bot) whose events exceed partition memory, `sessionizeBucketed`
  * computes the SAME result with every window bounded by (user_id,
  * time-bucket) — see its doc for the exact stitch.
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

  /** Hot-user-safe sessionization: identical output to `sessionize`, but
    * no window ever spans more than one (user_id, time-bucket) — so a bot
    * user with 10⁸ events can't blow a single partition; its events spread
    * across buckets and only a per-BUCKET summary row (not the events)
    * flows through the per-user stitch window.
    *
    * Exact stitch: within each bucket, local session starts are computed
    * with an ordinary lag window (the first event's status is unknowable
    * locally). A per-(user, bucket) summary — first/last event µs + local
    * start count — then resolves, in a window over the user's few summary
    * rows ordered by bucket, (a) whether the bucket's first event starts a
    * new session (gap to the previous non-empty bucket's last event) and
    * (b) the session-seq offset (cumulative starts in prior buckets).
    * Joining that back on (user_id, bucket) makes every event's seq
    * `offset + first_is_new + local_starts_up_to_here`, which equals the
    * single-window numbering for any bucket size.
    */
  def sessionizeBucketed(events: DataFrame, gapMinutes: Int,
                         bucketMinutes: Int = 1440): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val bUs = bucketMinutes * 60L * 1000000L
    val us = graft.functions.TimeNorm.tsMicros(col("ts"))
    val ev = events
      .withColumn("_us", us)
      .withColumn("_bkt", floor(col("_us") / bUs).cast("long"))
    val wl = Window.partitionBy(col("user_id"), col("_bkt"))
      .orderBy(col("_us"), col("event_id"))
    val prev = lag(col("_us"), 1).over(wl)
    val local = ev
      .withColumn("_new_in",
        when(prev.isNotNull && (col("_us") - prev > gapUs), 1L).otherwise(0L))
      .withColumn("_local_seq",
        sum(col("_new_in")).over(wl.rowsBetween(Window.unboundedPreceding, 0)))
    val ws = Window.partitionBy(col("user_id")).orderBy(col("_bkt"))
    val summ = local.groupBy(col("user_id"), col("_bkt"))
      .agg(min(col("_us")).as("_first_us"), max(col("_us")).as("_last_us"),
        max(col("_local_seq")).as("_starts_local"))
      .withColumn("_prev_last", lag(col("_last_us"), 1).over(ws))
      .withColumn("_first_new",
        (col("_prev_last").isNull || col("_first_us") - col("_prev_last") > gapUs)
          .cast("long"))
      .withColumn("_seq_off", coalesce(
        sum(col("_starts_local") + col("_first_new"))
          .over(ws.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("user_id"), col("_bkt"), col("_first_new"), col("_seq_off"))
    local.join(summ, Seq("user_id", "_bkt"))
      .withColumn("session_seq",
        col("_seq_off") + col("_first_new") + col("_local_seq"))
      .drop("_us", "_bkt", "_new_in", "_local_seq", "_first_new", "_seq_off")
  }

  private def statsAgg(sessionized: DataFrame): DataFrame =
    sessionized
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (graft.functions.TimeNorm.tsMicros(max(col("ts"))) -
          graft.functions.TimeNorm.tsMicros(min(col("ts"))))
          .cast("long").as("span_us"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("total_value"))

  /** Per-session stats: events, span microseconds, total value (exact
    * decimal accumulation, cast back to double).
    */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    statsAgg(sessionize(events, gapMinutes))

  /** `sessionStats` over the hot-user-safe bucketed sessionizer —
    * identical output, bounded partitions.
    */
  def sessionStatsBucketed(events: DataFrame, gapMinutes: Int,
                           bucketMinutes: Int = 1440): DataFrame =
    statsAgg(sessionizeBucketed(events, gapMinutes, bucketMinutes))

  /** Invariant gates for a STREAMED closed-session set against this batch
    * sessionizer's output (q89): the stream's emitted set is boundary-
    * nondeterministic (a user's final session may or may not close via
    * event-time timeout), so instead of row equality the gates check the
    * session algebra — definitely-closed ⊆ streamed ⊆ all batch sessions,
    * streamed non-empty — in ONE tagged-union shuffle: tag bit 1 = batch
    * row, bit 2 = definitely-closed (not the user's last session), bit 4 =
    * streamed; `bit_or` per session key, violations counted in a single
    * aggregate. Sessions are unique per (user_id, session_seq), so set
    * semantics suffice.
    *
    * `value_ok` covers total_value: the stream folds doubles in event
    * order while batch accumulates decimal, so per-key tolerance
    * (|Δ| ≤ 1e-6) rather than hash equality — a tolerance carried INSIDE
    * the same shuffle, not a rounded value in the group key, because two
    * nearly-equal doubles can straddle any rounding quantum and flake.
    * Both inputs must carry (user_id, session_seq, n_events, span_us,
    * total_value).
    */
  def sessionGates(batch: DataFrame, streamed: DataFrame): DataFrame = {
    val keys = Seq("user_id", "session_seq", "n_events", "span_us").map(col)
    val w = Window.partitionBy(col("user_id"))
    val b = batch
      .withColumn("tag",
        when(col("session_seq") < max(col("session_seq")).over(w), 3).otherwise(1))
      .select(keys ++ Seq(col("tag"), col("total_value")): _*)
    val s = streamed.select(keys ++ Seq(lit(4).as("tag"), col("total_value")): _*)
    b.union(s)
      .groupBy(keys: _*).agg(
        bit_or(col("tag")).as("t"),
        max(when(col("tag") =!= 4, col("total_value"))).as("bval"),
        max(when(col("tag") === 4, col("total_value"))).as("sval"))
      .agg(
        // coalesce: zero groups (both inputs empty) would make the sums
        // NULL — subset checks are then vacuously true, non-empty false
        coalesce(sum(when((col("t").bitwiseAND(2) > 0) && col("t").bitwiseAND(4) === 0, 1)
          .otherwise(0)) === 0, lit(true)).cast("long").as("closed_ok"),
        coalesce(sum(when((col("t").bitwiseAND(4) > 0) && col("t").bitwiseAND(1) === 0, 1)
          .otherwise(0)) === 0, lit(true)).cast("long").as("bounded_ok"),
        coalesce(sum(when(col("t").bitwiseAND(4) > 0, 1).otherwise(0)) > 0,
          lit(false)).cast("long").as("nonempty_ok"),
        // sessions present on BOTH sides must agree on total_value within
        // tolerance; a wrong-value/right-key stream turns this 0
        coalesce(sum(when((col("t").bitwiseAND(4) > 0) && (col("t").bitwiseAND(1) > 0) &&
          abs(col("sval") - col("bval")) > 1e-6, 1)
          .otherwise(0)) === 0, lit(true)).cast("long").as("value_ok"))
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
