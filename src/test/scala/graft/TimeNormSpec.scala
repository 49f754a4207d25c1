package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Sessionize
import graft.streaming.EventsStream

/** Timestamp-encoding robustness: the SAME logical events table written
  * under all three physical `ts` encodings the driver's fixtures have
  * shipped (raw nanos long, TIMESTAMP_NTZ micros, plain TIMESTAMP) must
  * produce IDENTICAL results through every events-consuming path — the
  * hourly aggregate (q10), sessionization (q11), and the streaming window
  * drive (q25). Round 11 broke twice on exactly this fixture drift; this
  * spec turns the next drift into a red test instead of a silent hole.
  */
class TimeNormSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = ()

  // ~200 events over 3 users / 4 types with sub-second precision and
  // multi-hour gaps, so sessionization boundaries and hourly windows are
  // both exercised. Whole-µs instants (every real encoding is ≥ µs).
  private def baseMicros(s: SparkSession): DataFrame = {
    import s.implicits._
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    (0 until 200).map { i =>
      val user = i % 3
      // user-dependent stride mixes gaps: ~7 min, ~40 min, ~90 min
      val stride = Seq(7L * 60, 40L * 60, 90L * 60)(user)
      val us = base + i * stride * 1000000L + i * 123456L // sub-second part
      (i.toLong, us, user.toLong, s"type_${i % 4}", i * 0.75, s"""{"k":$i}""")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
  }

  /** Write the same rows with `ts` in one physical encoding; returns dir. */
  private def writeEncoded(enc: String): String = {
    val dir = TempDirs.create(s"graft_tsenc_${enc}_")
    val df = baseMicros(spark)
    val ts = enc match {
      case "nanos_long" => (col("ts_us") * 1000L).as("ts") // raw epoch-nanos int64
      case "ntz"        => timestamp_micros(col("ts_us")).cast(TimestampNTZType).as("ts")
      case "tstz"       => timestamp_micros(col("ts_us")).as("ts")
    }
    df.select(col("event_id"), ts, col("user_id"), col("event_type"),
      col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private val encodings = Seq("nanos_long", "ntz", "tstz")

  private def load(dir: String): DataFrame =
    graft.functions.TimeNorm.normalizeTs(spark.read.parquet(dir))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("normalizeTs yields session-zone TIMESTAMP with identical values for all encodings") {
    val loaded = encodings.map(e => e -> load(writeEncoded(e))).toMap
    loaded.foreach { case (e, df) =>
      assert(df.schema("ts").dataType == TimestampType, s"encoding $e")
    }
    val asMicros = loaded.view.mapValues(df =>
      rows(df.select(col("event_id"), unix_micros(col("ts"))))).toMap
    assert(asMicros("nanos_long") == asMicros("ntz"))
    assert(asMicros("ntz") == asMicros("tstz"))
  }

  test("normalizeTs handles non-default column names (the date-column path)") {
    import spark.implicits._
    // the nanos branch builds SQL from the column name — a non-"ts" name
    // must survive it (o_orderdate/l_shipdate normalize through T too)
    val us = 1704067200123456L
    val nanos = Seq(us * 1000L).toDF("o_orderdate")
    val ntz = Seq(us).toDF("v")
      .select(timestamp_micros(col("v")).cast(TimestampNTZType).as("o_orderdate"))
    val got = Seq(nanos, ntz).map { df =>
      val n = graft.functions.TimeNorm.normalizeTs(df, "o_orderdate")
      assert(n.schema("o_orderdate").dataType == TimestampType)
      n.select(unix_micros(col("o_orderdate"))).head().getLong(0)
    }
    assert(got == Seq(us, us))
  }

  test("normalizeTs rejects an unknown physical encoding loudly") {
    val bad = baseMicros(spark).withColumn("ts", col("ts_us").cast("string"))
    val e = intercept[IllegalArgumentException] {
      graft.functions.TimeNorm.normalizeTs(bad)
    }
    assert(e.getMessage.contains("unsupported physical encoding"))
  }

  test("normalizeTs accepts plain DATE (the plausible o_orderdate/l_shipdate drift)") {
    import spark.implicits._
    // standard TPC-H parquet encodes date columns as DATE; normalize must
    // passthrough-cast, not hard-fail every orders/lineitem query
    val d = Seq(java.sql.Date.valueOf("1995-03-15")).toDF("o_orderdate")
    val n = graft.functions.TimeNorm.normalizeTs(d, "o_orderdate")
    assert(n.schema("o_orderdate").dataType == TimestampType)
    // midnight UTC under the UTC-pinned session
    assert(n.select(unix_micros(col("o_orderdate"))).head().getLong(0)
      == 795225600000000L)
    // and the year/datediff-style consumers see the right calendar day
    assert(n.select(year(col("o_orderdate"))).head().getInt(0) == 1995)
  }

  test("normalizeTs refuses an int64 column whose unit is not nanos") {
    import spark.implicits._
    // epoch-MICROS in an int64 column: silently reading it as nanos would
    // collapse every instant to ~1970 — must raise instead
    val micros = Seq(1704067200123456L).toDF("ts")
    val e = intercept[Exception] {
      graft.functions.TimeNorm.normalizeTs(micros).collect()
    }
    // the raised error may surface wrapped (task failure) — walk the chain
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("not epoch-nanos"), s"got: $chain")
    // genuine nanos in the plausible range still convert
    val nanos = Seq(1704067200123456L * 1000L).toDF("ts")
    assert(graft.functions.TimeNorm.normalizeTs(nanos)
      .select(unix_micros(col("ts"))).head().getLong(0) == 1704067200123456L)
  }

  test("streaming probe fails loudly on a mixed-encoding directory") {
    // one dir containing the SAME rows under two physical encodings: a
    // file stream has one fixed schema, so this must fail at probe time
    // with a clear message, not mid-stream with an obscure schema error
    val dir = TempDirs.create("graft_tsenc_mixed_")
    val df = baseMicros(spark)
    df.select(col("event_id"), (col("ts_us") * 1000L).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(dir)
    df.select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      EventsStream.tsReadType(spark, dir)
    }
    assert(e.getMessage.contains("mixed physical encodings"))
    // a uniform dir still probes fine
    assert(EventsStream.tsReadType(spark, writeEncoded("tstz")) == TimestampType)
  }

  test("hourly aggregate (q10 logic) identical across encodings") {
    val results = encodings.map { e =>
      rows(load(writeEncoded(e))
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value")))
    }
    assert(results(0).nonEmpty && results(0).size > 4)
    assert(results.distinct.size == 1, "hourly agg differs across ts encodings")
  }

  test("sessionization (q11 logic) identical across encodings") {
    val results = encodings.map { e =>
      rows(Sessionize.sessionStats(load(writeEncoded(e)), gapMinutes = 30))
    }
    // user 1 (40-min stride) splits every event; user 0 (7-min) never splits
    assert(results(0).size > 10)
    assert(results.distinct.size == 1, "session stats differ across ts encodings")
  }

  test("streaming windowed counts (q25 logic) identical across encodings and to batch") {
    val results = encodings.zipWithIndex.map { case (e, i) =>
      val dir = writeEncoded(e)
      rows(EventsStream.runOnce(spark, dir, minutes = 60, s"tsenc_win_$i")
        .select(col("win_start"), col("event_type"), col("n"), col("total_value")))
    }
    assert(results(0).nonEmpty)
    assert(results.distinct.size == 1, "stream windows differ across ts encodings")
    // and the stream agrees with a batch plan over the same data (decimal
    // accumulation on both sides, mirroring EventsStream exactly)
    val batch = rows(load(writeEncoded("ntz"))
      .groupBy(window(col("ts"), "60 minutes").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value")))
    assert(batch == results(1), "stream result differs from batch windowed counts")
  }
}
