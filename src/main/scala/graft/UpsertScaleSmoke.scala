package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CDC-upsert scale smoke: drive `UpsertStream.runFileSource` (parquet
  * chunk files → readStream → mapGroupsWithState with the RocksDB state
  * store → foreachBatch parquet changelog sink) at 1M change events over
  * 100k keys × 4 event types — far beyond the spec fixtures — compact
  * the changelog distributed, and verify it equals the batch
  * latest-by-key (`Curation.latestByKey`) by count + order-independent
  * XOR checksum. No driver materialization anywhere: inputs are written
  * distributed, the changelog goes to a parquet sink, and the comparison
  * is two aggregates — the as-of drive's (StreamScaleSmoke) evidence
  * standard applied to the upsert drive.
  *
  *   sbt "runMain graft.UpsertScaleSmoke 1000000 100000 8"
  */
object UpsertScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nEvents = if (args.length > 0) args(0).toLong else 1000000L
    val nKeys = if (args.length > 1) args(1).toLong else 100000L
    val chunks = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic change events, generated distributed: keys and
    // timestamps hash-scattered, event_id = the unique change sequence
    // number (the tie-break that makes the winner deterministic)
    val events = spark.range(nEvents).select(
      pmod(xxhash64(col("id")), lit(nKeys)).as("user_id"),
      concat(lit("t"), pmod(xxhash64(col("id") * 7), lit(4L))).as("event_type"),
      timestamp_micros(pmod(xxhash64(col("id") * 31), lit(1000000000000L))).as("ts"),
      col("id").as("event_id"),
      (pmod(xxhash64(col("id") * 131), lit(1000000L)).cast("double") / 1000.0)
        .as("value"))
      .repartition(cpus.toInt).persist()
    events.count() // materialize so the stream timing measures the drive

    val dir = java.nio.file.Files.createTempDirectory("upsert_scale").toString
    val t0 = System.nanoTime()
    val changelog = graft.streaming.UpsertStream.runFileSource(spark, events,
      dir = dir, chunks = chunks, stateParts = cpus.toInt, parquetSink = true)
    // compact the changelog: per key, the row with the greatest
    // (ts_us, event_id) — winners are monotone per key, so this equals
    // the batch latest-by-key regardless of how files were batched
    val compacted = changelog
      .groupBy(col("user_id"), col("event_type"))
      .agg(max_by(struct(col("last_event_id"), col("last_value")),
        struct(col("ts_us"), col("last_event_id"))).as("w"))
      .select(col("user_id"), col("event_type"),
        col("w.last_event_id").as("last_event_id"),
        col("w.last_value").as("last_value"))

    // order-independent equality: count + XOR of a row hash (bit_xor,
    // not sum — summing ~400k random 64-bit hashes overflows Long under
    // ANSI mode), computed distributed on both sides
    def sig(df: org.apache.spark.sql.DataFrame) = df.agg(
      count(lit(1)).as("n"),
      bit_xor(xxhash64(col("user_id"), col("event_type"),
        col("last_event_id"), col("last_value"))).as("h")).head()
    val sStream = sig(compacted)
    val streamSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val batch = operators.Curation.latestByKey(events,
      Seq(col("user_id"), col("event_type")), col("ts"), col("event_id"),
      Seq("last_event_id" -> col("event_id"), "last_value" -> col("value")))
    val sBatch = sig(batch)
    val batchSec = (System.nanoTime() - t1) / 1e9

    val matches = sStream.getLong(0) == sBatch.getLong(0) &&
      sStream.getLong(1) == sBatch.getLong(1)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    println(s"""{"upsert_scale_smoke":{"n_events":$nEvents,"n_keys":$nKeys,""" +
      s""""chunks":$chunks,"stream_sec":$streamSec,""" +
      s""""stream_events_per_sec":${(nEvents / streamSec).toLong},""" +
      s""""batch_sec":$batchSec,"keys_out":${sStream.getLong(0)},""" +
      s""""equals_batch":$matches}}""")
    spark.stop()
    if (!matches) sys.exit(1)
  }
}
