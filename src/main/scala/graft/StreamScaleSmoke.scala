package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming scale smoke: drive the as-of join's FILE-SOURCE path
  * (parquet chunk files → readStream → flatMapGroupsWithState with the
  * RocksDB state store → parquet sink) at 1M left events / 200k rights
  * over 50k keys — far beyond the spec fixtures — and verify the
  * emitted rows equal the batch as-of join by distributed count +
  * order-independent checksum (no driver materialization anywhere:
  * inputs are written distributed, output goes to a parquet sink, and
  * the comparison is two aggregates).
  *
  *   sbt "runMain graft.StreamScaleSmoke 1000000 200000 50000 8"
  */
object StreamScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nLeft = if (args.length > 0) args(0).toLong else 1000000L
    val nRight = if (args.length > 1) args(1).toLong else 200000L
    val nKeys = if (args.length > 2) args(2).toLong else 50000L
    val chunks = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic event-time data, generated distributed: timestamps
    // hash-scattered over ~11.5 days, keys hash-assigned
    def gen(n: Long, idOffset: Long) = spark.range(n).select(
      pmod(xxhash64(col("id") + idOffset), lit(nKeys)).as("key"),
      timestamp_micros(pmod(xxhash64(col("id") * 31 + idOffset), lit(1000000000000L)))
        .as("ts"),
      (col("id") + idOffset).as("id"))
      .repartition(cpus.toInt).persist()
    val left = gen(nLeft, 0L)
    val right = gen(nRight, 1000000000L)
    left.count(); right.count()

    val dir = java.nio.file.Files.createTempDirectory("stream_scale").toString
    val t0 = System.nanoTime()
    val streamed = graft.streaming.AsofStream.runFileSource(spark, left, right,
      ("key", "ts", "id"), ("key", "ts", "id"), dir,
      chunks = chunks, stateParts = cpus.toInt, parquetSink = true)
    val streamSec = (System.nanoTime() - t0) / 1e9

    // order-independent equality: count + XOR of a row hash, computed
    // distributed on both sides (bit_xor, not sum — summing ~1M random
    // 64-bit hashes overflows Long under ANSI mode)
    def sig(df: org.apache.spark.sql.DataFrame) = df.agg(
      count(lit(1)).as("n"),
      bit_xor(xxhash64(col("key"), col("left_id"), col("right_id"))).as("h")).head()
    val sStream = sig(streamed
      .select(col("key"), col("left_id"),
        coalesce(col("right_id"), lit(-1L)).as("right_id")))

    val t1 = System.nanoTime()
    val batch = operators.AsofJoin.asof(
      left.toDF("key", "ts", "lid"), right.toDF("rkey", "rts", "rid"),
      "key", "rkey", "ts", "rts", "rid")
    val sBatch = sig(batch
      .select(col("key"), col("lid").as("left_id"),
        coalesce(col("rid"), lit(-1L)).as("right_id")))
    val batchSec = (System.nanoTime() - t1) / 1e9

    val matches = sStream.getLong(0) == sBatch.getLong(0) &&
      sStream.getLong(1) == sBatch.getLong(1)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    println(s"""{"stream_scale_smoke":{"n_left":$nLeft,"n_right":$nRight,"n_keys":$nKeys,""" +
      s""""chunks":$chunks,"stream_sec":$streamSec,""" +
      s""""stream_rows_per_sec":${(nLeft / streamSec).toLong},""" +
      s""""batch_sec":$batchSec,"rows_out":${sStream.getLong(0)},""" +
      s""""equals_batch":$matches}}""")
    spark.stop()
    if (!matches) sys.exit(1)
  }
}
