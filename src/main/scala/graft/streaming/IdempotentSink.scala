package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.{LayoutCommit, LayoutFs, RabitqIndex}

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
  * attempts — the common path never walks the layout.
  *
  * APPEND vs MAINTENANCE is mechanical, not a scheduling convention:
  * the promote+commit step (metadata-cheap file moves) runs under the
  * layout's `_maintenance.lock` lease, with the target RE-RESOLVED
  * inside it — if a compaction swapped the generation while the batch
  * was staging, the promote simply lands in the new active generation
  * (the staged rows were never in the old one, so the rewrite neither
  * carried nor lost them). The expensive staged Spark write stays
  * OUTSIDE the lease. The converse hole — a batch that PROMOTED but
  * crashed before its marker, then a compaction folds its rows into
  * consolidated files (prefix names lost) and the replay re-appends a
  * second copy — is closed from the maintenance side:
  * [[settleInProgress]] sweeps promoted-but-unmarked batches out of the
  * layout before any rewrite reads it (the replay re-stages them in
  * full, so nothing is lost). Commit primitives are `LayoutCommit`'s —
  * see its filesystem contract before deploying on an object store.
  */
object IdempotentSink {

  /** @return true iff THIS call ran the staged write and committed the
    *         batch; false when a prior attempt's marker made it a no-op
    *         (callers that observe metrics on `df` branch on this — an
    *         `Observation` on a plan that never ran blocks forever).
    */
  def appendBatch(df: DataFrame, targetDir: => String, commitRoot: String,
                  queryName: String, batchId: Long,
                  partitionCols: Seq[String] = Nil,
                  leaseWaitMs: Long = 10L * 60 * 1000,
                  onStaged: () => Unit = () => ()): Boolean = {
    val marker = s"$commitRoot/_commits/$queryName/$batchId"
    val inprog = s"$commitRoot/_commits/$queryName/$batchId.inprogress"
    if (LayoutFs.exists(marker)) {
      // committed on a prior attempt — and a crash between that commit
      // and its sentinel delete must not strand the sentinel forever
      // (every later inspection would read the batch as a crashed
      // attempt, and vacuum deliberately preserves _commits)
      LayoutFs.delete(inprog)
      return false
    }
    val prefix = s"$queryName-$batchId"
    // in-progress sentinel: created before any write, removed with the
    // commit — its presence on entry means a PRIOR attempt crashed
    // somewhere, so only then pay the target-tree sweep (a partitioned
    // index target can hold thousands of cluster dirs; the common
    // first-attempt path must not walk them every batch)
    val retry = LayoutFs.exists(inprog)
    LayoutFs.mkdirs(s"$commitRoot/_commits/$queryName")
    LayoutCommit.exclusiveCreate(inprog)
    val staging = s"$commitRoot/_staging/$prefix"
    df.sparkSession.sparkContext.setJobDescription(s"sink: stage $prefix")
    val w0 = df.write.mode("overwrite")
    val w = if (partitionCols.nonEmpty) w0.partitionBy(partitionCols: _*) else w0
    w.parquet(staging)
    onStaged() // test seam: a maintenance pass fired between stage and promote
    // promote + commit under the layout lease: serialized against every
    // maintenance mutator, target re-resolved while nothing can swap it
    RabitqIndex.withLayoutLock(commitRoot, waitMs = leaseWaitMs) {
      // finish a predecessor's crashed-but-COMMITTED rebalance swap
      // BEFORE resolving the target — the same first step every
      // maintenance entry point takes, and load-bearing here: after a
      // stale-lease break an appender can win the race to a layout
      // whose `_rebalance_staging/_COMMIT` exists but whose renames
      // never ran, and a batch promoted into a SPLIT cluster's
      // about-to-be-replaced dir would be dropped wholesale by the
      // roll-forward while its commit marker makes the replay a no-op
      // — silent data loss. Rolling forward first means the promote
      // lands in the post-swap layout (and, on the conversion path,
      // `targetDir` — by-name — re-resolves to the published
      // generation). Cost on the common path: one existence probe.
      RabitqIndex.completeRebalanceSwap(commitRoot)
      val target = targetDir
      // the target dir must exist even if every row of every batch was
      // filtered out — a downstream read of the sink must see an (empty)
      // directory, not path-not-found
      LayoutFs.mkdirs(target)
      if (retry) sweepPrefix(target, prefix)
      RabitqIndex.promoteStaged(staging, target, Some(prefix))
      LayoutFs.deleteRecursively(staging)
      LayoutCommit.exclusiveCreate(marker)
      LayoutFs.delete(inprog)
    }
    true
  }

  /** Remove every `$prefix-*` data file a crashed earlier attempt of the
    * SAME batch may have left anywhere in the target tree (attempts can
    * differ in file count, so name-overwrite alone is not enough).
    */
  private def sweepPrefix(dir: String, prefix: String): Unit = {
    val kids = LayoutFs.list(dir)
    kids.filter(_.isDir).foreach(k => sweepPrefix(k.path, prefix))
    kids.filter(f => !f.isDir && f.name.startsWith(prefix + "-"))
      .foreach(f => LayoutFs.delete(f.path))
  }

  /** Maintenance-side half of the append-vs-maintenance closure: sweep
    * every PROMOTED-BUT-UNCOMMITTED batch (in-progress sentinel present,
    * no commit marker) out of `targetDirs` before a rewrite reads the
    * layout. Caller must hold the layout lease — under it, no live
    * appender can be mid-promote, so a sentinel-without-marker is either
    * a crashed attempt (its replay re-stages the whole batch) or a live
    * batch still staging (nothing promoted yet — the sweep finds only
    * files a CRASHED earlier attempt of it promoted, which that live
    * attempt re-promotes in full). Either way: swept rows always come
    * back exactly once, and the rewrite never folds rows a replay would
    * duplicate.
    */
  private[graft] def settleInProgress(commitRoot: String,
                                      targetDirs: Seq[String]): Unit = {
    val qs = LayoutFs.list(s"$commitRoot/_commits").filter(_.isDir)
    for {
      q <- qs
      f <- LayoutFs.list(q.path)
      if !f.isDir && f.name.endsWith(".inprogress")
      batchId = f.name.stripSuffix(".inprogress")
      if !LayoutFs.exists(s"${q.path}/$batchId")
      t <- targetDirs
    } sweepPrefix(t, s"${q.name}-$batchId")
  }
}
