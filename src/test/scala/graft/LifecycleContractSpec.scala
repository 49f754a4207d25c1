package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators._

/** EXECUTES the `CommitOps` filesystem contract instead of asserting it
  * in prose: the real lifecycle protocols run under a test double with
  * object-store-degraded semantics (no atomic rename, no exclusive
  * create) and demonstrably TEAR — proving the contract doc is
  * load-bearing — then the SAME schedules run under [[CondPutCommit]]
  * (the conditional-PUT / If-None-Match deployment shape) and hold.
  */
class LifecycleContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val sf = "/root/testdata/sf0.001"
  private def emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  /** The NAIVE object-store double — the semantics a plain S3/GCS
    * connector actually provides, applied to the same local paths the
    * protocols use:
    *
    *  - no atomic rename: an overwrite-publish is delete-then-upload
    *    (the destination is MISSING for the duration of the upload) and
    *    a move is copy-then-delete (both names visible in the window);
    *  - no exclusive create: plain PUT, last writer wins, every caller
    *    "succeeds".
    *
    * `hook(tag, path)` fires inside each visibility window so a spec
    * can deterministically interleave a real reader there.
    */
  final class NaiveObjectStoreOps(
      hook: (String, Path) => Unit = (_, _) => ()) extends CommitOps {

    def atomicWriteFile(target: String, content: String): Unit = {
      val t = java.nio.file.Paths.get(target)
      Files.deleteIfExists(t)
      hook("write-gap", t)
      Files.writeString(t, content)
      ()
    }

    def atomicMoveFile(src: String, dst: String): Unit = {
      val (s, d) = (java.nio.file.Paths.get(src), java.nio.file.Paths.get(dst))
      Files.copy(s, d, StandardCopyOption.REPLACE_EXISTING)
      hook("move-window", d)
      Files.deleteIfExists(s)
      ()
    }

    def atomicRenameDir(srcS: String, dstS: String): Unit = {
      val src = java.nio.file.Paths.get(srcS)
      val dst = java.nio.file.Paths.get(dstS)
      if (!Files.exists(src))
        throw new java.nio.file.NoSuchFileException(srcS)
      if (Files.isRegularFile(src)) { atomicMoveFile(srcS, dstS); return }
      val walk = Files.walk(src)
      try {
        walk.sorted().forEach { p =>
          val rel = dst.resolve(src.relativize(p).toString)
          if (Files.isDirectory(p)) Files.createDirectories(rel)
          else {
            Files.copy(p, rel, StandardCopyOption.REPLACE_EXISTING)
            hook("dir-file", rel)
          }
        }
      } finally walk.close()
      org.apache.commons.io.FileUtils.deleteDirectory(src.toFile)
    }

    def exclusiveCreate(path: String, content: String = ""): Boolean = {
      Files.writeString(java.nio.file.Paths.get(path), content) // plain PUT: everyone "wins"
      true
    }
  }

  /** N mutators racing for the lease; returns (maxConcurrent, completed). */
  private def leaseHammer(dir: String, n: Int): (Int, Int) = {
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val completed = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CyclicBarrier(n)
    val threads = (1 to n).map { _ =>
      new Thread(() => {
        gate.await()
        try {
          RabitqIndex.withLayoutLock(dir, waitMs = 20000L) {
            val now = inside.incrementAndGet()
            maxInside.updateAndGet(m => math.max(m, now))
            Thread.sleep(150)
            inside.decrementAndGet()
            completed.incrementAndGet()
          }
        } catch { case _: IllegalStateException => () }
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    (maxInside.get(), completed.get())
  }

  // ------------------------------------------------------------------
  test("TEAR (executed): last-writer-wins create admits CONCURRENT " +
      "maintenance mutators through the real lease protocol") {
    val dir = Files.createTempDirectory("naive_lease").toString
    val (maxConc, completed) =
      LayoutCommit.withOps(new NaiveObjectStoreOps()) {
        leaseHammer(dir, 4)
      }
    // every acquirer's PUT "succeeded", so mutual exclusion is GONE —
    // this is the torn state the CommitOps scaladoc warns an object-store
    // deployment of the POSIX impl silently reaches
    assert(completed == 4)
    assert(maxConc > 1,
      s"the naive double should have admitted concurrent mutators " +
        s"(saw max $maxConc) — if this fires, the README warning is " +
        "no longer load-bearing")
  }

  test("SURVIVE (executed): the SAME lease schedule under the " +
      "conditional-PUT impl keeps mutators mutually exclusive") {
    val dir = Files.createTempDirectory("condput_lease").toString
    val (maxConc, completed) =
      LayoutCommit.withOps(CondPutCommit) {
        leaseHammer(dir, 4)
      }
    assert(maxConc == 1,
      s"conditional-PUT exclusive create must admit one holder at a time " +
        s"(saw max $maxConc)")
    assert(completed == 4,
      s"serial admission should let every waiter through ($completed/4)")
  }

  /** Shared fixture for the MANIFEST-publish schedules: a layout whose
    * base generation has been compacted away and vacuumed (retain 0),
    * so the active generation is `index-v2` resolved through the
    * MANIFEST, with a fresh tombstone ready for the next cycle. This is
    * exactly the state where a torn MANIFEST is CATASTROPHIC: the
    * no-manifest fallback (`$dir/index`) points at a reclaimed path.
    */
  private def vacuumedV2Layout(): String = {
    import spark.implicits._
    val idxDir = Files.createTempDirectory("publish").toString
    val initial = emb.filter(col("vec_id") < 200)
    val (model, index0) = RabitqIndex.build(spark, initial, numClusters = 4, seed = 7L)
    RabitqIndex.save(spark, model, index0, idxDir)
    Seq(3L).toDF("vec_id").write.parquet(s"$idxDir/deletes")
    graft.streaming.VecsStream.compactIndex(spark, idxDir) // → index-v2
    RabitqIndex.vacuumIndex(idxDir, retainMs = 0L)         // reclaims `index`
    assert(RabitqIndex.indexDataDir(idxDir) == s"$idxDir/index-v2")
    assert(!new java.io.File(s"$idxDir/index").exists)
    Seq(5L).toDF("vec_id").write.parquet(RabitqIndex.tombstoneLogDir(idxDir))
    idxDir
  }

  test("TEAR (executed): a reader racing the real compactSwap MANIFEST " +
      "publish under the naive double resolves a RECLAIMED generation") {
    val idxDir = vacuumedV2Layout()
    @volatile var midPublish: Option[String] = None
    LayoutCommit.withOps(new NaiveObjectStoreOps((tag, p) => {
      if (tag == "write-gap" && p.getFileName.toString == "MANIFEST" &&
          midPublish.isEmpty)
        // a REAL reader resolving the layout inside the publish window
        midPublish = Some(RabitqIndex.indexDataDir(idxDir))
    })) {
      graft.streaming.VecsStream.compactIndex(spark, idxDir) // v2 → v3
    }
    assert(midPublish.contains(s"$idxDir/index"),
      s"mid-publish the MANIFEST was missing, so the reader fell back to " +
        s"the base generation (saw $midPublish)")
    assert(!new java.io.File(midPublish.get).exists,
      "— which vacuum reclaimed long ago: old was index-v2, new is " +
        "index-v3, and the reader resolved NEITHER. That is the torn " +
        "read the CommitOps contract forbids, executed.")
  }

  test("SURVIVE (executed): the SAME compaction schedule under the " +
      "conditional-PUT impl gives every racing reader old-or-new, " +
      "never a torn resolution") {
    val idxDir = vacuumedV2Layout()
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val nReads = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        val r = RabitqIndex.indexDataDir(idxDir)
        nReads.incrementAndGet()
        if (!(r == s"$idxDir/index-v2" || r == s"$idxDir/index-v3") ||
            !new java.io.File(r).isDirectory)
          bad.add(r)
      }
    })
    reader.start()
    try LayoutCommit.withOps(CondPutCommit) {
      graft.streaming.VecsStream.compactIndex(spark, idxDir) // v2 → v3
    } finally { stop = true; reader.join() }
    assert(nReads.get() > 0)
    assert(bad.isEmpty,
      s"readers racing a conditional-PUT publish saw torn resolutions: " +
        s"${bad.toArray.take(5).mkString(", ")}")
    assert(RabitqIndex.indexDataDir(idxDir) == s"$idxDir/index-v3")
  }

  test("SURVIVE (executed): the SAME lifecycle runs end-to-end on the " +
      "Hadoop FileSystem impl (the HDFS deployment shape, over file:)") {
    import spark.implicits._
    val ops = new HadoopFsCommit(new org.apache.hadoop.conf.Configuration())
    // exclusive-create semantics through the Hadoop API (sequential —
    // local RawLocalFileSystem simulates the NameNode's exclusivity
    // with check-then-create, so concurrency is HDFS's guarantee, not
    // the local simulation's; see the impl scaladoc)
    val probe = Files.createTempDirectory("hdfs_excl").resolve("lock")
    assert(ops.exclusiveCreate(probe.toString, "a"))
    assert(!ops.exclusiveCreate(probe.toString, "b"))
    assert(new String(Files.readAllBytes(probe), "UTF-8") == "a")
    val idxDir = Files.createTempDirectory("hadoop_life").toString
    val (m2, live) = LayoutCommit.withOps(ops) {
      val initial = emb.filter(col("vec_id") < 150)
      val (model, index0) = RabitqIndex.build(spark, initial, numClusters = 4, seed = 7L)
      RabitqIndex.save(spark, model, index0, idxDir)
      graft.streaming.IdempotentSink.appendBatch(
        RabitqIndex.appendVectors(spark, model,
          emb.filter(col("vec_id") >= 150 && col("vec_id") < 200)),
        RabitqIndex.indexDataDir(idxDir), idxDir, "hd_life", 0L,
        partitionCols = Seq("cluster_id"))
      graft.streaming.IdempotentSink.appendBatch(
        Seq(9L, 160L).toDF("vec_id"),
        RabitqIndex.tombstoneLogDir(idxDir), idxDir, "hd_life-del", 1L)
      graft.streaming.VecsStream.compactIndex(spark, idxDir)
      RabitqIndex.vacuumIndex(idxDir, retainMs = 0L)
      RabitqIndex.loadLive(spark, idxDir)
    }
    val expected = (0L until 200L).toSet -- Set(9L, 160L)
    assert(live.select("vec_id").collect().map(_.getLong(0)).toSet == expected)
    val baseFinal = emb.filter(col("vec_id") < 200 && !col("vec_id").isin(9L, 160L))
    val qs = ExactKnn.queriesFromEmbeddings(emb, 5)
    val truth = ExactKnn.l2TopK(baseFinal, qs, 10)
    val res = RabitqQuery.topK(spark, m2, live, baseFinal, qs, 4, 10, 4096)
    assert(ExactKnn.recall(res, truth, 10).head().getDouble(0) == 1.0,
      "full-probe search through the Hadoop-FS-maintained layout must " +
        "equal brute force")
  }

  test("SURVIVE (executed): the FULL lifecycle — append → delete → " +
      "compact → REBALANCE → vacuum → query — runs with every probe and " +
      "primitive routed through the Hadoop API (HadoopFs + HadoopFsCommit)") {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration()
    val idxDir = Files.createTempDirectory("hadoop_full").toString
    // BOTH seams swapped: CommitOps → HadoopFsCommit (the four atomic
    // primitives) AND LayoutFs → HadoopFs (every existence probe,
    // listing, marker read, debris delete). A `java.io.File` probe
    // hiding anywhere on the lifecycle paths would still pass over
    // file: — the grep gate below is the companion that proves there
    // isn't one; this leg proves the Hadoop plumbing ROUND-TRIPS the
    // full protocol including the in-place rebalance swap.
    val (m2, live) = LayoutFs.withFs(new HadoopFs(conf)) {
      LayoutCommit.withOps(new HadoopFsCommit(conf)) {
        // skew recipe so the rebalance really splits
        val lowerHalf = emb.filter(element_at(col("embedding"), 1) < 0f)
        val (model, _) = RabitqIndex.build(spark, lowerHalf, numClusters = 8, seed = 7L)
        RabitqIndex.save(spark, model,
          RabitqIndex.appendVectors(spark, model,
            emb.filter(col("vec_id") < 400)), idxDir)
        graft.streaming.IdempotentSink.appendBatch(
          RabitqIndex.appendVectors(spark, model,
            emb.filter(col("vec_id") >= 400)),
          RabitqIndex.indexDataDir(idxDir), idxDir, "hd_full", 0L,
          partitionCols = Seq("cluster_id"))
        graft.streaming.IdempotentSink.appendBatch(
          Seq(9L, 410L).toDF("vec_id"),
          RabitqIndex.tombstoneLogDir(idxDir), idxDir, "hd_full-del", 1L)
        graft.streaming.VecsStream.compactIndex(spark, idxDir)
        assert(RabitqIndex.indexDataDir(idxDir) == s"$idxDir/index-v2")
        val rep = RabitqIndex.rebalanceIndex(spark, idxDir,
          emb.filter(!col("vec_id").isin(9L, 410L)), maxSizeFactor = 1.4)
        assert(rep.numClustersAfter > rep.numClustersBefore,
          s"gate is vacuous: the skewed layout did not split ($rep)")
        RabitqIndex.vacuumIndex(idxDir, retainMs = 0L)
        RabitqIndex.loadLive(spark, idxDir)
      }
    }
    val expected = emb.select("vec_id").collect().map(_.getLong(0)).toSet -- Set(9L, 410L)
    assert(live.select("vec_id").collect().map(_.getLong(0)).toSet == expected,
      "live set after the Hadoop-addressed lifecycle")
    val baseFinal = emb.filter(!col("vec_id").isin(9L, 410L))
    val qs = ExactKnn.queriesFromEmbeddings(emb, 5)
    val truth = ExactKnn.l2TopK(baseFinal, qs, 10)
    val res = RabitqQuery.topK(spark, m2, live, baseFinal, qs,
      m2.params.numClusters, 10, 100000)
    assert(ExactKnn.recall(res, truth, 10).head().getDouble(0) == 1.0,
      "full-probe search through the Hadoop-addressed lifecycle must " +
        "equal brute force")
  }

  test("grep gate: zero java.io.File on the lifecycle mutate/resolve " +
      "paths — every filesystem touch goes through LayoutFs/LayoutCommit") {
    // the companion to the Hadoop leg above: over file: a stray
    // java.io.File probe would still pass functionally, so the gate is
    // textual. Comment lines are excluded; RabitqIndex's sole allowed
    // use is the reference-parity fvecs exporter (local by design,
    // marked in-source).
    // resolve the source root from a stable anchor instead of assuming
    // the test JVM's CWD is the repo root (forked runners and IDEs can
    // run elsewhere — a CWD-relative read would throw, or a runner
    // swallowing it would silently skip the gate)
    val repoRoot = {
      val cwd = java.nio.file.Paths.get(
        sys.props.getOrElse("user.dir", ".")).toAbsolutePath
      Iterator.iterate(cwd)(_.getParent).takeWhile(_ != null)
        .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
        .getOrElse(fail(s"grep gate cannot locate the repo root (no " +
          s"build.sbt on or above $cwd) — refusing to silently skip"))
    }
    def offenders(rel: String, allowed: Int): Seq[String] = {
      val path = repoRoot.resolve(rel)
      assert(java.nio.file.Files.isRegularFile(path),
        s"grep gate target missing: $path — the gate must fail loud, " +
          "not skip")
      val lines = java.nio.file.Files.readAllLines(path)
        .toArray(Array.empty[String])
      // (?![A-Za-z]): java.io.FileNotFoundException is an exception
      // TYPE, not a filesystem touch
      val re = java.util.regex.Pattern.compile("java\\.io\\.File(?![A-Za-z])")
      val hits = lines.zipWithIndex.filter { case (l, _) =>
        val t = l.trim
        re.matcher(l).find() &&
          !t.startsWith("//") && !t.startsWith("*") && !t.startsWith("/**")
      }
      assert(hits.length <= allowed,
        s"$path: ${hits.length} java.io.File uses on lifecycle paths " +
          s"(allowed $allowed):\n  " +
          hits.map { case (l, i) => s"${i + 1}: ${l.trim}" }.mkString("\n  "))
      hits.map(_._1).toSeq
    }
    // the ENTIRE streaming package, not a named-file subset: the r19
    // review found a stray probe (`UpsertStream`) exactly one file
    // outside the old list — enumerate the directory so a new harness
    // file is in scope the day it lands
    val streamingDir = repoRoot.resolve("src/main/scala/graft/streaming")
    val streamingFiles = {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.list(streamingDir)
      try st.iterator().asScala.toList
        .filter(_.toString.endsWith(".scala")).map(_.getFileName.toString)
      finally st.close()
    }
    assert(streamingFiles.length >= 8,
      s"streaming package enumeration looks broken: $streamingFiles")
    streamingFiles.foreach(f =>
      offenders(s"src/main/scala/graft/streaming/$f", 0))
    offenders("src/main/scala/graft/operators/LayoutCommit.scala", 0)
    val allowedRabitq =
      offenders("src/main/scala/graft/operators/RabitqIndex.scala", 1)
    allowedRabitq.foreach(l => assert(l.contains("mkdirs"),
      s"the one allowed RabitqIndex use must be the fvecs exporter's " +
        s"local mkdirs, found: $l"))
  }

  test("TEAR (executed): a reader racing the REAL in-place rebalance " +
      "swap under the naive double sees a HALF-POPULATED cluster — " +
      "present directory, rows silently missing") {
    import spark.implicits._
    // a layout plus a committed rebalance staging whose split cluster
    // holds TWO staged part files — the naive double's dir "rename" is
    // per-file copy, so between the two copies the destination EXISTS
    // with half its rows. (Under POSIX the same protocol gives a racing
    // reader only old-complete, absent, or new-complete — absence is
    // LOUD; a present-but-partial cluster answers queries wrong
    // silently. This is why CommitOps.renamesDirAtomically exists.)
    val idxDir = Files.createTempDirectory("naive_reb").toString
    val (model, index0) = RabitqIndex.build(spark,
      emb.filter(col("vec_id") < 300), numClusters = 4, seed = 7L)
    RabitqIndex.save(spark, model, index0, idxDir)
    val splitId = index0.groupBy("cluster_id").count()
      .orderBy(desc("count")).head().getInt(0)
    val staging = new java.io.File(s"$idxDir/_rebalance_staging")
    spark.read.parquet(s"$idxDir/index")
      .filter(col("cluster_id") === splitId)
      .repartition(2) // → two part files in the staged split dir
      .write.partitionBy("cluster_id").parquet(s"$staging/index")
    for (t <- Seq("centroids", "params"))
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(s"$idxDir/$t"), new java.io.File(staging, t))
    Files.writeString(new java.io.File(staging, "_COMMIT").toPath,
      splitId.toString)
    val tgt = new java.io.File(s"$idxDir/index/cluster_id=$splitId")
    val midCounts = scala.collection.mutable.ArrayBuffer.empty[Long]
    LayoutCommit.withOps(new NaiveObjectStoreOps((tag, p) => {
      // fires after EACH per-file copy of the staged→live dir "rename"
      // (.crc shadows copy first in sort order — count only once a DATA
      // file landed, the way a real scan lists)
      if (tag == "dir-file" && p.getParent != null &&
          p.getParent.toString == tgt.getPath &&
          p.getFileName.toString.endsWith(".parquet"))
        midCounts += spark.read.parquet(tgt.getPath).count()
    })) {
      RabitqIndex.completeRebalanceSwap(idxDir)
    }
    val fin = spark.read.parquet(tgt.getPath).count()
    assert(fin > 0)
    assert(midCounts.exists(c => c > 0 && c < fin),
      s"expected a mid-copy reader to see a partial cluster " +
        s"(saw $midCounts of $fin) — if this fires, the naive double " +
        "no longer tears the in-place swap and the capability flag is " +
        "not load-bearing")
  }

  test("SURVIVE (executed): the rebalance under the conditional-PUT impl " +
      "takes the generation-versioned shape — atomic MANIFEST publish, " +
      "model riding in the generation, tombstone log carried") {
    import spark.implicits._
    val idxDir = Files.createTempDirectory("condput_reb").toString
    // skew: model fit on the lower halfspace, layout holding EVERYTHING —
    // the upper half piles into the boundary clusters (the q120 recipe)
    val lowerHalf = emb.filter(element_at(col("embedding"), 1) < 0f)
    val (model, _) = RabitqIndex.build(spark, lowerHalf, numClusters = 4, seed = 7L)
    RabitqIndex.save(spark, model,
      RabitqIndex.appendVectors(spark, model, emb), idxDir)
    val delId = emb.select(min("vec_id")).head().getLong(0)
    val (m2, live) = LayoutCommit.withOps(CondPutCommit) {
      // an uncompacted tombstone the generation swap must CARRY
      graft.streaming.IdempotentSink.appendBatch(
        Seq(delId).toDF("vec_id"),
        RabitqIndex.tombstoneLogDir(idxDir), idxDir, "cp_reb-del", 0L)
      val rep = RabitqIndex.rebalanceIndex(spark, idxDir, emb,
        maxSizeFactor = 1.4)
      assert(rep.numClustersAfter > rep.numClustersBefore,
        s"gate is vacuous: the skewed layout did not split " +
          s"(${rep.numClustersBefore} → ${rep.numClustersAfter})")
      // published as a NEW generation; the old one retired, not mutated
      assert(RabitqIndex.indexDataDir(idxDir) == s"$idxDir/index-v2")
      assert(new java.io.File(s"$idxDir/index").isDirectory,
        "the old generation must stay intact for retention-window readers")
      assert(new java.io.File(s"$idxDir/_retired/index").isFile)
      // the GROWN model rides inside the generation; the layout-root
      // pair still holds the pre-split model (nothing reader-visible
      // was replaced in place)
      assert(new java.io.File(s"$idxDir/index-v2/_centroids").isDirectory)
      val rootK = spark.read.parquet(s"$idxDir/centroids").count()
      assert(rootK == rep.numClustersBefore.toLong)
      RabitqIndex.loadLive(spark, idxDir)
    }
    assert(m2.params.numClusters > 4,
      "load() must resolve the generation-local (grown) model sidecars")
    assert(live.filter(col("vec_id") === delId).isEmpty,
      "the carried tombstone log must keep masking the deleted id")
    // exactness through the swapped layout
    val baseFinal = emb.filter(col("vec_id") =!= delId)
    val qs = ExactKnn.queriesFromEmbeddings(emb, 5)
    val truth = ExactKnn.l2TopK(baseFinal, qs, 10)
    val res = RabitqQuery.topK(spark, m2, live, baseFinal, qs,
      m2.params.numClusters, 10, 100000)
    assert(ExactKnn.recall(res, truth, 10).head().getDouble(0) == 1.0,
      "full-probe search through the generation-rebalanced layout must " +
        "equal brute force")
    // a later compaction must CARRY the generation-local model forward
    // (else readers of index-v3 would fall back to the stale root pair)
    val m3 = LayoutCommit.withOps(CondPutCommit) {
      graft.streaming.VecsStream.compactIndex(spark, idxDir) // folds the log
      assert(RabitqIndex.indexDataDir(idxDir) == s"$idxDir/index-v3")
      RabitqIndex.vacuumIndex(idxDir, retainMs = 0L)
      assert(!new java.io.File(s"$idxDir/index").exists)
      assert(!new java.io.File(s"$idxDir/index-v2").exists)
      RabitqIndex.load(spark, idxDir)._1
    }
    assert(m3.params.numClusters == m2.params.numClusters,
      "compaction must carry the generation-local model sidecars into " +
        "the next generation")
  }

  test("SURVIVE (executed): a committed in-place staging rolled forward " +
      "under the conditional-PUT impl CONVERTS to a generation publish " +
      "instead of tearing live cluster dirs") {
    // the migration case: a POSIX-deployed rebalance crashed after its
    // point of no return (_COMMIT written, renames not driven), and the
    // layout is next opened under the object-store impl. Driving the
    // in-place renames through per-file copy+delete would expose racing
    // readers to half-populated LIVE dirs (the TEAR test above), so
    // completeRebalanceSwap consults the declared capability and
    // finishes the swap as a generation publish instead.
    val idxDir = Files.createTempDirectory("condput_rollfwd").toString
    val (model, index0) = RabitqIndex.build(spark,
      emb.filter(col("vec_id") < 300), numClusters = 4, seed = 7L)
    RabitqIndex.save(spark, model, index0, idxDir)
    val splitId = index0.groupBy("cluster_id").count()
      .orderBy(desc("count")).head().getInt(0)
    val staging = new java.io.File(s"$idxDir/_rebalance_staging")
    spark.read.parquet(s"$idxDir/index")
      .filter(col("cluster_id") === splitId)
      .write.partitionBy("cluster_id").parquet(s"$staging/index")
    for (t <- Seq("centroids", "params"))
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(s"$idxDir/$t"), new java.io.File(staging, t))
    Files.writeString(new java.io.File(staging, "_COMMIT").toPath,
      splitId.toString)
    val expectedIds = index0.select("vec_id").collect().map(_.getLong(0)).toSet
    val (m2, live) = LayoutCommit.withOps(CondPutCommit) {
      // the first maintenance entry point rolls the swap forward
      RabitqIndex.vacuumIndex(idxDir) // default retention — old gen kept
      RabitqIndex.loadLive(spark, idxDir)
    }
    assert(RabitqIndex.indexDataDir(idxDir) == s"$idxDir/index-v2",
      "the roll-forward must publish a generation, not rename in place")
    assert(new java.io.File(s"$idxDir/index").isDirectory,
      "the old generation must stay intact for retention-window readers")
    assert(!new java.io.File(s"$idxDir/_rebalance_staging").exists)
    assert(m2.params.numClusters == 4)
    val ids = live.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == expectedIds, "the conversion lost or invented rows")
    assert(live.groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "the conversion duplicated rows")
  }

  test("SURVIVE (executed): a batch appended between a crashed " +
      "rebalance's _COMMIT and its roll-forward is NOT dropped by the " +
      "swap — the appender's promote rolls the swap forward first " +
      "(both deployment shapes)") {
    // the post-stale-break race: a POSIX rebalance staged its rows,
    // wrote _COMMIT, and crashed before the renames; the lease is
    // eventually broken and an APPENDER wins the race to the layout
    // before any maintenance pass. Its batch can land in a SPLIT
    // cluster's dir — which the roll-forward replaces WHOLESALE from
    // the staged content — and the batch's commit marker would make
    // the stream's replay a no-op: silent data loss unless the
    // promote itself finishes the swap first, the way every
    // maintenance entry point does.
    for ((tag, ops) <- Seq("posix" -> (PosixCommit: CommitOps),
        "condput" -> (CondPutCommit: CommitOps))) {
      val idxDir = Files.createTempDirectory(s"midswap_append_$tag").toString
      val (model, index0) = RabitqIndex.build(spark,
        emb.filter(col("vec_id") < 300), numClusters = 4, seed = 7L)
      RabitqIndex.save(spark, model, index0, idxDir)
      val splitId = index0.groupBy("cluster_id").count()
        .orderBy(desc("count")).head().getInt(0)
      val memberIds = index0.filter(col("cluster_id") === splitId)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      // committed in-place staging, renames never driven (the crash)
      val staging = new java.io.File(s"$idxDir/_rebalance_staging")
      spark.read.parquet(s"$idxDir/index")
        .filter(col("cluster_id") === splitId)
        .write.partitionBy("cluster_id").parquet(s"$staging/index")
      for (t <- Seq("centroids", "params"))
        org.apache.commons.io.FileUtils.copyDirectory(
          new java.io.File(s"$idxDir/$t"), new java.io.File(staging, t))
      Files.writeString(new java.io.File(staging, "_COMMIT").toPath,
        splitId.toString)
      // the racing batch: fresh ids whose vectors ASSIGN to the split
      // cluster (same embeddings, new ids)
      val extra = emb.filter(col("vec_id").isin(
          memberIds.take(20).toSeq.map(Long.box): _*))
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val extraIds = extra.select("vec_id").collect().map(_.getLong(0)).toSet
      val enc = RabitqIndex.appendVectors(spark, model, extra)
      assert(enc.filter(col("cluster_id") === splitId).count() > 0,
        "gate is vacuous: the racing batch missed the split cluster")
      LayoutCommit.withOps(ops) {
        graft.streaming.IdempotentSink.appendBatch(enc,
          RabitqIndex.indexDataDir(idxDir), idxDir, s"mid_$tag", 0L,
          partitionCols = Seq("cluster_id"))
        // the maintenance pass that would have driven the drop
        RabitqIndex.vacuumIndex(idxDir)
        ()
      }
      val (_, live) = RabitqIndex.loadLive(spark, idxDir)
      val ids = live.select("vec_id").collect().map(_.getLong(0))
      assert(ids.length == ids.distinct.length, s"$tag: duplicated rows")
      assert(extraIds.subsetOf(ids.toSet),
        s"$tag: the roll-forward dropped the appended batch " +
          s"(missing ${(extraIds -- ids.toSet).take(5)}) — the promote " +
          "must finish a committed swap before landing rows")
      assert(index0.select("vec_id").collect().map(_.getLong(0)).toSet
        .subsetOf(ids.toSet), s"$tag: original rows lost")
    }
  }

  test("SURVIVE (executed): a batch PROMOTED but crashed before its " +
      "commit marker is settled out of the SOURCE generation before " +
      "the roll-forward builds its carry listing — the replay lands " +
      "exactly once (no carried-by-reference duplicates)") {
    // the mirror image of the append-drop race above. Reachable via a
    // ZOMBIE rebalance: R settles and stages under the lease, the lease
    // is deemed stale mid-staging and broken, appender A promotes into
    // the still-active source generation and crashes before its commit
    // marker, zombie R writes _COMMIT and dies. The next maintenance
    // pass (vacuum — which never settles) rolls the swap forward as a
    // generation publish; A's unmarked files sit in UNTOUCHED clusters,
    // so the conversion would carry them BY REFERENCE into the new
    // generation's _CARRY listing — where the replay's sweep (which
    // only walks the new generation's own dirs) cannot reach them —
    // and the re-promoted copy would be served alongside the carried
    // one: silent permanent duplicates. The conversion must settle
    // unmarked appends against the SOURCE generation first.
    val idxDir = Files.createTempDirectory("unmarked_carry").toString
    LayoutCommit.withOps(CondPutCommit) {
      val (model, index0) = RabitqIndex.build(spark,
        emb.filter(col("vec_id") < 300), numClusters = 4, seed = 7L)
      RabitqIndex.save(spark, model, index0, idxDir)
      val sizes = index0.groupBy("cluster_id").count()
        .orderBy(desc("count")).collect()
      val splitId = sizes.head.getInt(0)
      val quietId = sizes.last.getInt(0) // an UNTOUCHED cluster
      assert(splitId != quietId)
      // zombie R's staging: read BEFORE the racing promote (faithful to
      // the timeline — R staged from the pre-append layout)
      val staging = new java.io.File(s"$idxDir/_rebalance_staging")
      spark.read.parquet(s"$idxDir/index")
        .filter(col("cluster_id") === splitId)
        .write.partitionBy("cluster_id").parquet(s"$staging/index")
      for (t <- Seq("centroids", "params"))
        org.apache.commons.io.FileUtils.copyDirectory(
          new java.io.File(s"$idxDir/$t"), new java.io.File(staging, t))
      // the racing batch: fresh ids that ASSIGN to the untouched
      // cluster, so its files are exactly what the listing would carry
      val quietMembers = index0.filter(col("cluster_id") === quietId)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val extra = emb.filter(col("vec_id").isin(
          quietMembers.take(15).toSeq.map(Long.box): _*))
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
      val enc = RabitqIndex.appendVectors(spark, model, extra)
      assert(enc.filter(col("cluster_id") === quietId).count() > 0,
        "gate is vacuous: the racing batch missed the untouched cluster")
      val extraIds = extra.select("vec_id").collect().map(_.getLong(0)).toSet
      // promote-then-crash: everything appendBatch does EXCEPT the
      // commit marker — the stranded in-progress sentinel is the
      // crash's evidence the settle keys on
      LayoutFs.mkdirs(s"$idxDir/_commits/unmk")
      LayoutCommit.exclusiveCreate(s"$idxDir/_commits/unmk/0.inprogress")
      val stg = s"$idxDir/_staging/unmk-0"
      enc.write.mode("overwrite").partitionBy("cluster_id").parquet(stg)
      RabitqIndex.promoteStaged(stg, RabitqIndex.indexDataDir(idxDir),
        Some("unmk-0"))
      LayoutFs.deleteRecursively(stg)
      // zombie R's point of no return, written AFTER the promote
      Files.writeString(new java.io.File(staging, "_COMMIT").toPath,
        splitId.toString)
      // the maintenance pass that drives the conversion (never settles
      // on its own)
      RabitqIndex.vacuumIndex(idxDir)
      assert(RabitqIndex.indexDataDir(idxDir) == s"$idxDir/index-v2",
        "the roll-forward must have published a generation")
      // the stream's replay of the unmarked batch
      graft.streaming.IdempotentSink.appendBatch(enc,
        RabitqIndex.indexDataDir(idxDir), idxDir, "unmk", 0L,
        partitionCols = Seq("cluster_id"))
      val (_, live) = RabitqIndex.loadLive(spark, idxDir)
      val ids = live.select("vec_id").collect().map(_.getLong(0))
      assert(ids.length == ids.distinct.length,
        "the carried-by-reference unmarked batch was served twice — " +
          "the conversion must settle unmarked appends against the " +
          "source generation before building its carry listing")
      assert(extraIds.subsetOf(ids.toSet), "the replayed batch was lost")
      assert(index0.select("vec_id").collect().map(_.getLong(0)).toSet
        .subsetOf(ids.toSet), "original rows lost")
      ()
    }
  }

  test("SURVIVE (executed): a full append → delete → compact → vacuum → " +
      "query lifecycle runs end-to-end on the conditional-PUT impl") {
    import spark.implicits._
    val idxDir = Files.createTempDirectory("condput_life").toString
    val out = LayoutCommit.withOps(CondPutCommit) {
      val initial = emb.filter(col("vec_id") < 150)
      val (model, index0) = RabitqIndex.build(spark, initial, numClusters = 4, seed = 7L)
      RabitqIndex.save(spark, model, index0, idxDir)
      // two exactly-once appends through the real sink (staged write +
      // lease-guarded promote + commit marker — all through the seam)
      graft.streaming.IdempotentSink.appendBatch(
        RabitqIndex.appendVectors(spark, model,
          emb.filter(col("vec_id") >= 150 && col("vec_id") < 180)),
        RabitqIndex.indexDataDir(idxDir), idxDir, "cp_life", 0L,
        partitionCols = Seq("cluster_id"))
      graft.streaming.IdempotentSink.appendBatch(
        RabitqIndex.appendVectors(spark, model,
          emb.filter(col("vec_id") >= 180 && col("vec_id") < 200)),
        RabitqIndex.indexDataDir(idxDir), idxDir, "cp_life", 1L,
        partitionCols = Seq("cluster_id"))
      // a replay of batch 1 must still be a no-op under this impl
      graft.streaming.IdempotentSink.appendBatch(
        RabitqIndex.appendVectors(spark, model,
          emb.filter(col("vec_id") >= 180 && col("vec_id") < 200)),
        RabitqIndex.indexDataDir(idxDir), idxDir, "cp_life", 1L,
        partitionCols = Seq("cluster_id"))
      // tombstones + compaction (MANIFEST publish) + retention vacuum
      graft.streaming.IdempotentSink.appendBatch(
        Seq(7L, 155L).toDF("vec_id"),
        RabitqIndex.tombstoneLogDir(idxDir), idxDir, "cp_life-del", 2L)
      graft.streaming.VecsStream.compactIndex(spark, idxDir)
      RabitqIndex.vacuumIndex(idxDir, retainMs = 0L)
      RabitqIndex.loadLive(spark, idxDir)
    }
    val (m2, live) = out
    val expected = (0L until 200L).toSet -- Set(7L, 155L)
    assert(live.select("vec_id").collect().map(_.getLong(0)).toSet == expected,
      "live set after the conditional-PUT lifecycle")
    val baseFinal = emb.filter(col("vec_id") < 200 && !col("vec_id").isin(7L, 155L))
    val qs = ExactKnn.queriesFromEmbeddings(emb, 5)
    val truth = ExactKnn.l2TopK(baseFinal, qs, 10)
    val res = RabitqQuery.topK(spark, m2, live, baseFinal, qs, 4, 10, 4096)
    assert(ExactKnn.recall(res, truth, 10).head().getDouble(0) == 1.0,
      "full-probe search through the conditional-PUT-maintained layout " +
        "must equal brute force")
  }
}
