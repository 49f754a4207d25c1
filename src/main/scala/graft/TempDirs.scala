package graft

/** JVM-exit cleanup for per-invocation temp directories (streaming
  * checkpoints/sinks, fvecs exports, prewarm scratch). The declared
  * queries return LAZY DataFrames over files in these dirs, so deleting
  * eagerly after the query function returns would break the driver's
  * later materialization — a shutdown hook is the earliest safe point.
  * Under the 1-cold + 3-warm bench protocol this bounds /tmp growth to
  * one process's worth instead of accumulating across runs forever.
  */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    val it = dirs.iterator()
    while (it.hasNext) org.apache.commons.io.FileUtils.deleteQuietly(it.next())
  }, "graft-tempdir-cleanup"))

  /** Create a temp directory that is recursively deleted at JVM exit. */
  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p.toFile)
    p.toString
  }
}
