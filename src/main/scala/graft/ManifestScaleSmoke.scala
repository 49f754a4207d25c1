package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** Generation-manifest scale smoke — the round-20 sharded-listing
  * evidence at a file count the flat shape was about to buckle under:
  *
  *   1. build a skewed layout at `n` rows with ≥50k data files (small
  *      files forced via write parallelism — the metadata plane is the
  *      subject, so MORE files per row is the harder case);
  *   2. run the CondPut generation rebalance (sharded `_CARRY_LIST` +
  *      `_carry/` shards past `carryShardTarget`);
  *   3. time the LISTING BUILD both ways on the same source generation —
  *      the distributed enumeration (`buildCarryEntriesDistributed`,
  *      per-cluster LIST calls fanned out as tasks) vs the r19
  *      driver-side walk (`buildCarryListing`, O(file-count) sequential
  *      LIST round-trips from the driver) — at the full point and at a
  *      ~10× smaller sub-layout, so the scaling of each is measured,
  *      not asserted;
  *   4. measure the LISTING BYTES a probe-pruned query actually reads:
  *      run the real `topKFromDisk` under a recording `LayoutFs` and sum
  *      the `_carry/` shard files it touched vs the total listing size —
  *      sub-linear bytes-per-query is the lazy-resolution claim.
  *
  * Local-FS caveat printed with the numbers: local LIST latency is ~μs,
  * so the wall-clock gap between the two builders here UNDERSTATES the
  * deployed gap (NameNode/S3 LIST round-trips are 1–10 ms each; the
  * driver walk pays file-count × that serially, the distributed build
  * pays ~one task wave). The load-independent signals are the call/byte
  * counts.
  *
  *   sbt "runMain graft.ManifestScaleSmoke 10000000 512 64"
  */
object ManifestScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val k = if (args.length > 1) args(1).toInt else 512
    // write parallelism per append — forces ~writePar files per cluster
    val writePar = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val genUdf = udf { (id: Long) =>
      val noise = graft.functions.VectorOps.syntheticNoise _
      val c = (id % 100L) + 1L
      Array.tabulate(dim)(j => noise(c, j) + 0.25f * noise(id + 7919L, j)).toSeq
    }
    val base = spark.range(n)
      .select(col("id").as("vec_id"), genUdf(col("id")).as("embedding"))
      .repartition(cpus.toInt).persist()
    base.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def countDataFiles(dir: String, gen: String): Int =
      LayoutFs.list(s"$dir/$gen")
        .filter(f => f.isDir && f.name.startsWith("cluster_id="))
        .map(cd => LayoutFs.list(cd.path)
          .count(f => !f.isDir && f.name.endsWith(".parquet"))).sum

    // opt-in EXPORT mode ("export" arg): the reference-layout exporter's
    // scale point — encode all n rows and export through the DISTRIBUTED
    // path (executor-side chunk encode + driver streaming concat; byte
    // identity vs the driver exporter is spec-gated at fixture scale,
    // this measures the corpus-sized run the driver collect could not do)
    if (args.contains("export")) {
      val (modelE, _) = RabitqIndex.buildSampled(spark, base, k,
        sampleN = 200000L, seed = 42L)
      val encAll = RabitqIndex.appendVectors(spark, modelE, base)
      val outDir = TempDirs.create("graft_export_smoke_") + "/ref"
      val (_, expSec) = timed {
        RabitqIndex.exportReferenceLayoutDistributed(
          spark, modelE, encAll, base, outDir)
      }
      val bytes = Seq("orthogonal.fvecs", "centroids.fvecs", "base.fvecs",
        "factors.fvecs", "x_binary_vec.u64vecs", "offsets_ids.ivecs")
        .map(f => f -> LayoutFs.length(s"$outDir/$f"))
      val expectedBase = n * (4L + 4L * modelE.params.padDim)
      require(bytes.toMap.apply("base.fvecs") == expectedBase,
        s"base.fvecs size ${bytes.toMap.apply("base.fvecs")} != " +
          s"$expectedBase (n x (4 + 4 x padDim))")
      require(!LayoutFs.isDirectory(s"$outDir/.export_chunks"),
        "export staging left behind")
      println(f"[manifest-smoke] export n=$n distributed_sec=$expSec%.1f " +
        bytes.map { case (f, b) => s"$f=$b" }.mkString(" "))
      spark.stop()
      return
    }

    // skewed layout: model fit on half the natural clusters, the other
    // half appended after — piles into boundary clusters, so the
    // rebalance splits a minority and carries the majority
    val fitHalf = base.filter(col("vec_id") % 100L < 50L)
    val (model, index0) = RabitqIndex.buildSampled(spark, fitHalf, k,
      sampleN = 200000L, seed = 42L)
    val idxDir = TempDirs.create("graft_manifest_smoke_") + "/idx"
    val (_, saveSec) = timed {
      RabitqIndex.save(spark, model,
        index0.repartition(writePar / 2), idxDir)
    }
    val (_, appendSec) = timed {
      RabitqIndex.appendVectors(spark, model,
          base.filter(col("vec_id") % 100L >= 50L))
        .repartition(writePar)
        .write.mode("append").partitionBy("cluster_id")
        .parquet(s"$idxDir/index")
    }
    val filesBefore = countDataFiles(idxDir, "index")
    println(f"[manifest-smoke] n=$n k=$k files=$filesBefore " +
      f"save=$saveSec%.1fs append=$appendSec%.1fs")

    // shard granularity for the smoke: at the deployed default (4096)
    // a 10⁶-file corpus holds ~244 shards; smoke-scale file counts
    // would yield single-digit shard counts and make the probed/total
    // ratio degenerate. Lowering the target puts the smoke in the same
    // shards ≫ probed-clusters regime the default produces at 100 TB —
    // the probed-shards/total-shards RATIO is the scale-free signal.
    RabitqIndex.carryShardTarget = 512

    // the CondPut generation rebalance — sharded listing shape
    val (rep, rebalSec) = timed {
      LayoutCommit.withOps(CondPutCommit) {
        RabitqIndex.rebalanceIndex(spark, idxDir, base, maxSizeFactor = 1.5)
      }
    }
    require(RabitqIndex.indexDataDir(idxDir) == s"$idxDir/index-v2",
      "rebalance did not publish a generation")
    val splitIds = rep.split.keySet

    // 3. listing build, both ways, same inputs, twice each (second run
    // = warm FS cache); the cross-SCALE comparison comes from running
    // this smoke at two n values and reading the two SCALE_r20 rows
    def buildBoth(tag: String, gen: String, sids: Set[Int]): Unit = {
      val (d1, distSec1) = timed(
        RabitqIndex.buildCarryEntriesDistributed(spark, idxDir, gen, sids))
      val (_, distSec2) = timed(
        RabitqIndex.buildCarryEntriesDistributed(spark, idxDir, gen, sids))
      val (w1, walkSec1) = timed(
        RabitqIndex.buildCarryListing(idxDir, gen, sids))
      val (_, walkSec2) = timed(
        RabitqIndex.buildCarryListing(idxDir, gen, sids))
      require(d1.toSet == w1.toSet,
        s"$tag: distributed enumeration diverged from the driver walk")
      println(f"[manifest-smoke] listing-build $tag entries=${d1.size} " +
        f"distributed=$distSec1%.2f/$distSec2%.2fs " +
        f"driver_walk=$walkSec1%.2f/$walkSec2%.2fs")
    }
    buildBoth("full", "index", splitIds)

    // sharded listing stats
    val shards = RabitqIndex.readCarryShards(idxDir, "index-v2")
    require(shards.nonEmpty, "expected the sharded listing shape at this " +
      s"file count (entries=${RabitqIndex.readCarry(idxDir, "index-v2").size})")
    val shardBytes = shards.map(s =>
      LayoutFs.length(s"$idxDir/index-v2/_carry/${s.name}")).sum
    val listBytes = LayoutFs.length(s"$idxDir/index-v2/_CARRY_LIST")
    val carryEntries = shards.map(_.count).sum
    println(f"[manifest-smoke] shards=${shards.size} " +
      f"carry_entries=$carryEntries shard_bytes=$shardBytes " +
      f"list_bytes=$listBytes rebalance=$rebalSec%.1fs " +
      f"moved_rows=${rep.movedRows} splits=${splitIds.size} " +
      f"k_after=${rep.numClustersAfter}")

    // 4. probe-pruned query: the REAL disk path under a recording FS —
    // listing bytes touched vs total
    final class RecordingFs(inner: LayoutFs) extends LayoutFs {
      val reads = scala.collection.mutable.ArrayBuffer.empty[String]
      def exists(p: String) = inner.exists(p)
      def isFile(p: String) = inner.isFile(p)
      def isDirectory(p: String) = inner.isDirectory(p)
      def list(p: String) = inner.list(p)
      def readString(p: String) = { reads.synchronized(reads += p); inner.readString(p) }
      def lastModified(p: String) = inner.lastModified(p)
      def setLastModified(p: String, ms: Long) = inner.setLastModified(p, ms)
      def length(p: String) = inner.length(p)
      def mkdirs(p: String) = inner.mkdirs(p)
      def delete(p: String) = inner.delete(p)
      def deleteRecursively(p: String) = inner.deleteRecursively(p)
      def sizeOfDirectory(p: String) = inner.sizeOfDirectory(p)
      def copyFile(s: String, d: String) = inner.copyFile(s, d)
      def copyDirectory(s: String, d: String) = inner.copyDirectory(s, d)
    }
    // timing on a realistic 100-query batch (its probe union legitimately
    // spans most clusters — a batch NEEDS most shards); the PER-QUERY
    // bytes accounting runs a single query, the unit the sub-linear
    // claim is about
    val queries = ExactKnn.queriesFromEmbeddings(base, 100).persist()
    queries.count()
    val (nres, querySec) = timed {
      RabitqQuery.topKFromDisk(spark, idxDir, base, queries,
        nprobe = 16, topk = 10, rerank = 200).count()
    }
    val oneQuery = queries.limit(1)
    val rec = new RecordingFs(PosixFs)
    val (nres1, query1Sec) = timed {
      LayoutFs.withFs(rec)(
        RabitqQuery.topKFromDisk(spark, idxDir, base, oneQuery,
          nprobe = 16, topk = 10, rerank = 200).count())
    }
    val touched = rec.reads.filter(_.contains("/_carry/")).distinct
    val touchedBytes = touched.map(LayoutFs.length).sum
    println(f"[manifest-smoke] probe-pruned query: batch100_results=$nres " +
      f"batch100_sec=$querySec%.1f single_results=$nres1 " +
      f"single_sec=$query1Sec%.1f " +
      f"shards_touched=${touched.size}/${shards.size} " +
      f"listing_bytes_touched=$touchedBytes/${shardBytes + listBytes}")
    require(touched.size < shards.size,
      "single-query probe-pruned read touched every shard — lazy " +
        "resolution broken")

    // integrity: zero carried files physically copied + exact row count
    val carryNames = RabitqIndex.readCarry(idxDir, "index-v2")
      .map(_.split('/').last).toSet
    val copied = LayoutFs.list(s"$idxDir/index-v2")
      .filter(f => f.isDir && f.name.startsWith("cluster_id="))
      .flatMap(cd => LayoutFs.list(cd.path))
      .count(f => !f.isDir && carryNames.contains(f.name))
    require(copied == 0, s"$copied carried files physically copied")
    val total = RabitqIndex.loadLive(spark, idxDir)._2.count()
    require(total == n, s"row count after rebalance: $total != $n")
    println(f"[manifest-smoke] integrity: rows=$total copied_carried=0 OK")
    spark.stop()
  }
}
