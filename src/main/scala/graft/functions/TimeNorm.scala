package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timestamp-encoding compatibility layer for the `events.ts` column.
  *
  * The driver's fixtures have shipped the same logical instants under three
  * physical parquet encodings over time:
  *
  *   - TIMESTAMP(NANOS) — unreadable as a Spark timestamp, surfaced as a
  *     raw nanosecond LongType via `spark.sql.legacy.parquet.nanosAsLong`;
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) — TimestampNTZType;
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=true) — TimestampType.
  *
  * Every ingest path (batch loader, file streams) normalizes through here
  * ONCE, to session-zone TimestampType, so downstream operators
  * (sessionization, windowed aggregation, as-of joins) never see the
  * physical unit. Sessions are pinned to UTC throughout the engine, so the
  * NTZ→TIMESTAMP cast is value-preserving and matches DuckDB's reading of
  * the same file.
  *
  * This is pure extension-tier robustness: the reference never parses
  * timestamps at all (its only inputs are fvecs/ivecs,
  * `/root/reference/src/utils.rs:280-330`) — but any real user hits schema
  * drift like this, and round 11 proved hard-coding one unit breaks
  * silently when the fixture changes.
  */
object TimeNorm {

  /** Plausible epoch-nanos range for fixture instants: [2000-01-01,
    * 2100-01-01). An int64 column carrying epoch-days/millis/micros would
    * fall far outside it (days ≈ 2e4, millis ≈ 1e12, micros ≈ 1e15 vs
    * nanos ≈ 1e18), so a unit drift fails loudly instead of collapsing
    * every instant near 1970.
    */
  private val NanosLo = 946684800L * 1000000000L   // 2000-01-01T00:00:00Z
  private val NanosHi = 4102444800L * 1000000000L  // 2100-01-01T00:00:00Z

  /** Normalize column `c` of `df` to session-zone TimestampType from any
    * of the physical encodings the fixtures could plausibly ship. Whole-µs
    * instants in every encoding, so the nanos→µs division is lossless.
    */
  def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema(c).dataType match {
      case LongType =>
        // raw nanos (nanosAsLong read of TIMESTAMP(NANOS), or a plain
        // int64 column carrying epoch-nanos). Guard the unit: any value
        // outside the plausible nanos range means the int64 is actually
        // days/millis/micros and must not be silently misread.
        val guarded = when(
          col(c).isNull.or(col(c).between(NanosLo, NanosHi - 1)),
          expr(s"timestamp_micros($c div 1000)"))
          .otherwise(raise_error(concat(
            lit(s"int64 column '$c' is not epoch-nanos (value "), col(c).cast("string"),
            lit(" outside [2000,2100)); refusing to normalize — check the fixture's unit"))))
        df.withColumn(c, guarded)
      case _: DateType =>
        // date columns (o_orderdate/l_shipdate) may drift to plain DATE —
        // midnight-UTC instants, value-preserving under a UTC session
        df.withColumn(c, col(c).cast(TimestampType))
      case _: TimestampNTZType =>
        df.withColumn(c, col(c).cast(TimestampType))
      case _: TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"unsupported physical encoding for timestamp column '$c': $other " +
            "(expected LongType nanos, DATE, TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  /** Epoch microseconds of a TIMESTAMP or TIMESTAMP_NTZ column (the
    * session is pinned UTC, so the NTZ cast is value-preserving). Use this
    * instead of bare `unix_micros`, which rejects NTZ input.
    */
  def tsMicros(c: Column): Column = unix_micros(c.cast(TimestampType))
}
