package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.RabitqIndex

/** Exactly-once parquet APPEND for foreachBatch sinks.
  *
  * Structured Streaming replays a micro-batch after a partial write
  * failure or a driver restart mid-batch, and a blind
  * `write.mode("append")` then double-appends the batch — duplicate
  * vec_ids the query path would silently serve twice. This helper makes
  * the append idempotent per (queryName, batchId):
  *
  *  1. a committed batch leaves a MARKER file
  *     (`$commitRoot/_commits/$queryName/$batchId`) — a replayed batch
  *     that finds its marker is a no-op;
  *  2. the batch is first written `mode("overwrite")` to a
  *     batchId-derived STAGING dir — a retried write replaces any
  *     partial attempt instead of appending to it;
  *  3. staged files are MOVED into the target layout under DETERMINISTIC
  *     per-batch names (`$queryName-$batchId-00000.parquet`, …), after
  *     sweeping any same-prefix files a crashed earlier attempt left —
  *     so a crash at ANY point (mid-write, mid-move, before the marker)
  *     replays to exactly one copy.
  *
  * An in-progress sentinel (created before the first write, removed at
  * commit) confines the target-tree sweep to genuine retry-after-crash
  * attempts — the common path never walks the layout. On an object
  * store the same protocol runs against a transaction log (the
  * Delta/Iceberg commit shape) instead of directory listings, with
  * steps 1–3 unchanged.
  */
object IdempotentSink {

  def appendBatch(df: DataFrame, targetDir: String, commitRoot: String,
                  queryName: String, batchId: Long,
                  partitionCols: Seq[String] = Nil): Unit = {
    val marker = new java.io.File(s"$commitRoot/_commits/$queryName/$batchId")
    if (marker.exists) return
    val prefix = s"$queryName-$batchId"
    // in-progress sentinel: created before any write, removed with the
    // commit — its presence on entry means a PRIOR attempt crashed
    // somewhere, so only then pay the target-tree sweep (a partitioned
    // index target can hold thousands of cluster dirs; the common
    // first-attempt path must not walk them every batch)
    val inprog = new java.io.File(s"$commitRoot/_commits/$queryName/$batchId.inprogress")
    val retry = inprog.exists
    inprog.getParentFile.mkdirs()
    inprog.createNewFile()
    val staging = new java.io.File(s"$commitRoot/_staging/$prefix")
    val w0 = df.write.mode("overwrite")
    val w = if (partitionCols.nonEmpty) w0.partitionBy(partitionCols: _*) else w0
    w.parquet(staging.toString)
    if (retry) sweepPrefix(new java.io.File(targetDir), prefix)
    RabitqIndex.promoteStaged(staging, new java.io.File(targetDir), Some(prefix))
    org.apache.commons.io.FileUtils.deleteDirectory(staging)
    marker.createNewFile()
    inprog.delete()
    ()
  }

  /** Remove every `$prefix-*` data file a crashed earlier attempt of the
    * SAME batch may have left anywhere in the target tree (attempts can
    * differ in file count, so name-overwrite alone is not enough).
    */
  private def sweepPrefix(dir: java.io.File, prefix: String): Unit = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
    kids.filter(_.isDirectory).foreach(sweepPrefix(_, prefix))
    kids.filter(f => f.isFile && f.getName.startsWith(prefix + "-"))
      .foreach(_.delete())
  }
}
