package graft.operators

import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/** The FOUR commit primitives every crash-safety protocol in the saved
  * index lifecycle is built from — the compaction MANIFEST swap
  * (`VecsStream.compactSwap`), the rebalance `_COMMIT` marker and its
  * roll-forward renames (`RabitqIndex.completeRebalanceSwap`), the
  * maintenance lease (`RabitqIndex.withLayoutLock`), and the
  * exactly-once streamed append (`streaming.IdempotentSink`).
  *
  * ==== FILESYSTEM CONTRACT (read this before deploying) ====
  *
  * The protocols are correct iff the layout's filesystem provides:
  *
  *  1. '''atomic rename''' of a file or directory within the layout dir
  *     (a concurrent reader sees the old name or the new name, never a
  *     torn file / half a directory), and
  *  2. '''atomic create-if-absent''' (exactly one of N concurrent
  *     creators of the same path succeeds).
  *
  * True on POSIX local filesystems and on HDFS — the environments this
  * impl targets. '''NOT true on S3/GCS-style object stores''': `s3a://`
  * rename is copy+delete (readers can observe both or neither name) and
  * plain PUT has no exclusive-create. Running the lifecycle mutators
  * against an object store through this impl silently downgrades
  * "old-or-new-never-partial" to "sometimes torn" — the exact failure
  * class Delta Lake's `LogStore` exists for. To deploy there, replace
  * this object's four primitives with a conditional-PUT (If-None-Match)
  * or commit-service implementation (the Delta/Iceberg commit shape);
  * every protocol above is already expressed ONLY in these primitives,
  * so nothing else changes. READ paths (`spark.read.parquet` over the
  * resolved generation) are object-store-safe as-is — immutable files,
  * resolved through a MANIFEST that only this seam mutates.
  *
  * Reference analog: the reference's model dir is write-once-immutable
  * (`/root/reference/src/rabitq.rs:128-156`) and its S3 tier only ever
  * GETs whole immutable objects (`/root/reference/crates/disk/src/cache.rs:24-52`)
  * — it never needed a commit protocol because it never mutates a saved
  * layout; the lifecycle tier here does, hence this seam.
  */
object LayoutCommit {

  /** Durably publish `content` at `target`: write a temp sibling, then
    * atomic rename over the target. A reader never observes a torn or
    * empty file; a crash leaves either the old content or the new.
    */
  def atomicWriteFile(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Atomic file move, REPLACING an existing destination (a same-batch
    * retry overwrites its own deterministic name). Always replace-
    * semantics: POSIX rename(2) — what ATOMIC_MOVE maps to — replaces
    * silently regardless, so a fail-if-exists variant could not honor
    * its contract on the very filesystems this impl targets.
    */
  def atomicMoveFile(src: Path, dst: Path): Unit =
    Files.move(src, dst,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

  /** Atomic directory rename; the destination must not exist. Throws
    * `NoSuchFileException` if `src` is already gone — callers use that
    * to detect losing a rename race (exactly one of N concurrent movers
    * of the same `src` succeeds).
    */
  def atomicRenameDir(src: Path, dst: Path): Unit =
    Files.move(src, dst)

  /** Create-if-absent with `content` as the body: returns true iff THIS
    * call created the file (exactly one of N concurrent callers wins).
    */
  def exclusiveCreate(path: Path, content: String = ""): Boolean =
    try {
      Files.write(path, content.getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
}
