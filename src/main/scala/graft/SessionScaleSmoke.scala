package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stateful-sessionization scale smoke (q89's 100 TB/day claim at depth):
  * drive 1M events / 100k users through SessionStream's
  * flatMapGroupsWithState path with the RocksDB state store, replaying
  * event-time-ordered chunk files ONE PER MICRO-BATCH so the watermark
  * advances between batches, sessions close via event-time TIMEOUT
  * mid-stream, and the same users reappear afterwards (the tombstone
  * seq-resume path) — none of which the single-batch fixture drive
  * exercises. Output goes to a parquet sink; the equality evidence is the
  * distributed `Sessionize.sessionGates` invariants (definitely-closed ⊆
  * streamed ⊆ batch, non-empty, total_value within 1e-6), no driver
  * materialization anywhere.
  *
  * Data shape: each user fires a 2-event burst (5 min apart) every 4
  * hours, 5 rounds — with the 30-min gap every round is its own session,
  * and the 4 h round spacing exceeds the 2 h watermark delay + gap, so
  * each round's sessions TIME OUT while later rounds stream in.
  *
  *   sbt "runMain graft.SessionScaleSmoke 1000000 100000"
  */
object SessionScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val nUsers = if (args.length > 1) args(1).toLong else 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val stateParts = 8
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Sessionize

    val rounds = 5
    val perRound = math.max(1L, n / (nUsers * rounds)) // events per session
    val baseUs = 1704067200000000L // 2024-01-01 UTC
    val roundUs = 4L * 3600L * 1000000L
    // slot = which of the user's events this is; same-(user, round) jitter
    // keeps a session's events together, j spaces them 5 min apart
    val user = pmod(col("id"), lit(nUsers))
    val slot = floor(col("id") / nUsers).cast("long")
    val round = floor(slot / perRound).cast("long")
    val j = pmod(slot, lit(perRound))
    // ~1/3 of (user, round) pairs SKIP: a skipping user's previous session
    // has no successor event in the next round, so it can only close via
    // event-time TIMEOUT — and the user's later reappearance must resume
    // the batch-global seq numbering (the tombstone path; without it the
    // resumed session collides on (user, seq) and bounded_ok trips)
    val events = spark.range(nUsers * rounds * perRound)
      .filter(pmod(xxhash64(user, round, lit(7L)), lit(3L)) =!= 0L)
      .select(
        col("id").as("event_id"),
        timestamp_micros(
          lit(baseUs) + round * roundUs +
            pmod(xxhash64(user, round), lit(10L * 60L * 1000000L)) +
            j * (5L * 60L * 1000000L)).as("ts"),
        user.as("user_id"),
        (pmod(col("id"), lit(997L)) * 0.25).as("value"),
        round.as("round"))
      .persist()
    val nEvents = events.count()

    // chunk files = rounds, written in event-time order with strictly
    // increasing mtimes (FileStreamSource replays in mtime order; part
    // files sharing a coarse-granularity mtime would replay arbitrarily)
    val dir = java.nio.file.Files.createTempDirectory("session_scale").toString
    val inDir = s"$dir/in"
    val inDirFile = new java.io.File(inDir)
    val stamped = scala.collection.mutable.Set.empty[String]
    val mtime0 = System.currentTimeMillis() - (rounds + 2L) * 60000L
    def stampNewFiles(stampMs: Long): Unit =
      Option(inDirFile.listFiles).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && !stamped.contains(f.getName))
        .foreach { f => f.setLastModified(stampMs); stamped += f.getName }
    (0 until rounds).foreach { r =>
      events.filter(col("round") === r.toLong)
        .drop("round")
        .coalesce(2).write.mode("append").parquet(inDir)
      stampNewFiles(mtime0 + r * 60000L)
    }

    val defaultParts = spark.sessionState.conf.numShufflePartitions
    val defaultStore = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val defaultChangelog = spark.conf.getOption(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    val (streamSec, stateRows, nBatches) = try {
      val t0 = System.nanoTime()
      val q = graft.streaming.SessionStream
        .sessionizeStream(spark, inDir, gapMinutes = 30, maxFilesPerTrigger = Some(1))
        .writeStream.outputMode("append")
        .format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      q.processAllAvailable()
      val progress = q.recentProgress
      val rows = progress.reverseIterator
        .flatMap(p => p.stateOperators.headOption.map(_.numRowsTotal))
        .find(_ > 0).getOrElse(-1L)
      q.stop()
      ((System.nanoTime() - t0) / 1e9, rows, progress.length)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", defaultParts.toString)
      defaultStore match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      defaultChangelog match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      }
    }

    val streamed = spark.read.parquet(s"$dir/out")
    val batch = Sessionize.sessionStats(events.select(
      col("event_id"), col("ts"), col("user_id"), col("value")), 30).persist()
    val g = Sessionize.sessionGates(batch, streamed).head()
    val gatesOk = (0 until 4).forall(g.getLong(_) == 1L)
    // every DEFINITELY-closed session (non-last per user) must have been
    // emitted — closed_ok checks membership; this checks the volume is
    // non-degenerate and that timed-out sessions (skippers with no
    // successor event) are included
    val streamedSessions = streamed.count()
    val batchSessions = batch.count()
    val batchUsers = batch.select(col("user_id")).distinct().count()
    val minExpected = batchSessions - batchUsers
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    println(s"""{"session_scale_smoke":{"n_events":$nEvents,"n_users":$nUsers,"rounds":$rounds,""" +
      s""""stream_sec":$streamSec,"events_per_sec":${(nEvents / streamSec).toLong},""" +
      s""""micro_batches":$nBatches,"state_rows_final":$stateRows,""" +
      s""""streamed_sessions":$streamedSessions,"batch_sessions":$batchSessions,""" +
      s""""min_expected":$minExpected,"gates_ok":$gatesOk}}""")
    spark.stop()
    if (!gatesOk || streamedSessions < minExpected) sys.exit(1)
  }
}
