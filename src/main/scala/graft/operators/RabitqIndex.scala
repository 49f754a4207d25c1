package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.functions.VectorOps

/** Index-build parameters. `seed` drives rotation, k-means init, and the
  * quantizer dither — the reference leaves all three unseeded / per-load
  * (`/root/reference/src/utils.rs:17,38`, `/root/reference/src/rabitq.rs:119`);
  * we seed and persist them so builds are reproducible (SURVEY.md §7 hard
  * part b).
  */
case class RabitqParams(dim: Int, padDim: Int, numClusters: Int, seed: Long)

/** Small driver-side model state, broadcast to executors at use sites:
  * rotation (padDim×padDim, row-major, orthogonal), ROTATED padded
  * centroids (numClusters × padDim), and the per-dimension dither bias.
  * Everything per-vector lives in the index DataFrame, never on the driver.
  *
  * `rerankScale` — (numClusters / BUILT_K)², the budget adaptation for
  * a rebalance-grown layout ([[RabitqIndex.scaledRerank]]'s measured
  * story). Populated by [[RabitqIndex.load]] from the `BUILT_K` sidecar
  * so EVERY query entry point — memory ([[RabitqQuery.topK]]/
  * `filteredTopK`), disk, and serving — applies the same scaling; a
  * freshly built model is 1.0 by construction. Riding in the model
  * (rather than re-read from the dir per query) also makes the scale a
  * load-time cost instead of a per-request file read.
  */
case class RabitqModel(
    params: RabitqParams,
    rotation: Array[Array[Float]],
    centroids: Array[Array[Float]],
    bias: Array[Float],
    rerankScale: Double = 1.0) {

  /** Per-caller override of the rebalance-grown rerank adaptation for
    * the in-memory query paths (`RabitqQuery.topK` reads the factor
    * from the model it is handed; the disk paths take it as a call
    * parameter). Operating points measured on the SCALE_r18 1M
    * frontier (256→368 split, np16): 1.0 → pre-split budget, recall
    * 0.761; k′/k0 → 0.816; the default (k′/k0)² → 0.856 at ~flat cost
    * (query time is probe-scan-dominated); ~2.5× → 0.878, vs 0.883
    * pre-skew parity. See `RabitqIndex.scaledRerank` for the full
    * frontier rationale.
    */
  def withRerankScale(s: Double): RabitqModel = copy(rerankScale = s)
}

/** IVF-RaBitQ index build as one Catalyst plan (SURVEY.md §2.2 B1–B12).
  *
  * Output index DataFrame (one row per vector):
  *   vec_id: long, cluster_id: int, code: array<long> (padDim/64 words),
  *   factor_ip/factor_ppc/error_bound/cds: float
  *
  * The reference's CSR layout (`/root/reference/src/rabitq.rs:231-252`)
  * becomes `write.partitionBy("cluster_id")` — probe selection turns into
  * Catalyst partition pruning instead of offset slices.
  */
object RabitqIndex {

  /** Run independent driver-side actions concurrently (guide §2.6
    * "overlap independent jobs"): the model-sidecar reads/writes are
    * three tiny single-task jobs whose cost is per-job latency, not
    * compute — running them from a small thread pool overlaps that
    * latency. Spark's scheduler handles concurrent jobs natively.
    *
    * Failure semantics: ALL three computations settle (success or
    * failure) before the first error rethrows — a detached future still
    * writing a LIVE sidecar dir (save() writes `$dir/rotation` etc.
    * directly) must never outlive the call, or a caller that catches
    * the error and retries could race its own zombie write. The await
    * is bounded (30 min, far above any sane sidecar IO) instead of
    * infinite: a write hung on a flaky object store fails the op loudly
    * rather than wedging maintenance forever while the lease breaker
    * hands the layout to a second mutator. On that timeout the hung
    * computation cannot be cancelled (no kill seam for a blocked Spark
    * action) — the TimeoutException documents that the op must be
    * treated as crashed, exactly like a process kill at the same point
    * (every caller's crash protocol already covers it).
    */
  private[graft] def inParallel[A, B, C](fa: => A, fb: => B, fc: => C): (A, B, C) = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val (fut1, fut2) = (Future(fa), Future(fb))
    val cTry = scala.util.Try(fc)
    val limit = 30.minutes
    val r1 = scala.util.Try(Await.result(fut1, limit))
    val r2 = scala.util.Try(Await.result(fut2, limit))
    (r1.get, r2.get, cTry.get)
  }

  /** Seeded random orthogonal rotation (B2): QR of a Gaussian matrix with
    * column signs fixed by diag(R) > 0 so Q is unique.
    * (Reference: `/root/reference/src/utils.rs:16-20`, unseeded.)
    */
  def randomOrthogonal(dim: Int, seed: Long): Array[Array[Float]] = {
    import breeze.linalg.{DenseMatrix, qr, diag}
    val rnd = new java.util.Random(seed)
    val g = DenseMatrix.fill[Double](dim, dim)(rnd.nextGaussian())
    val decomp = qr(g)
    val q = decomp.q
    val signs = (0 until dim).map(j => if (decomp.r(j, j) < 0) -1.0 else 1.0)
    Array.tabulate(dim)(i => Array.tabulate(dim)(j => (q(i, j) * signs(j)).toFloat))
  }

  /** Per-dimension dither bias in [0,1), seeded and persisted with the
    * model (the reference regenerates it every load,
    * `/root/reference/src/rabitq.rs:119`).
    */
  def ditherBias(dim: Int, seed: Long): Array[Float] = {
    val rnd = new java.util.Random(seed + 1)
    Array.fill(dim)(rnd.nextFloat())
  }

  /** Train k-means (MLlib k-means‖, B5) then encode. The feature frame is
    * cached for the iterative fit (else every Lloyd iteration re-reads and
    * re-converts the parquet).
    */
  def build(spark: SparkSession, base: DataFrame, numClusters: Int, seed: Long): (RabitqModel, DataFrame) = {
    spark.sparkContext.setJobDescription("rabitq: kmeans fit")
    val withVec = base.select(col("vec_id"), col("embedding"))
      .withColumn("features", array_to_vector(col("embedding")))
      .cache()
    try {
      // k-means|| init: costs a few extra passes vs random init but
      // measurably better IVF partitions (recall 0.85 vs 0.81 at the
      // same probe budget on sf0.01) — worth it, the fit is build-time
      val km = new KMeans()
        .setK(numClusters).setSeed(seed).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("cluster_id")
      val kmModel = km.fit(withVec)
      buildWithCentroids(spark, base, kmModel.clusterCenters.map(_.toArray.map(_.toFloat)), seed)
    } finally withVec.unpersist()
  }

  /** Sampled build for large bases: fit k-means on a deterministic
    * Bernoulli sample (vec_id hash) and encode the FULL base against the
    * fitted centroids. This is the only build shape that holds at 100 TB —
    * Lloyd's iterative passes touch the bounded sample while the full data
    * is read exactly once, for encoding. Centroid quality degrades
    * gracefully with sample size (it shapes partition balance, not
    * correctness — rerank is exact regardless).
    */
  def buildSampled(spark: SparkSession, base: DataFrame, numClusters: Int,
                   sampleN: Long, seed: Long): (RabitqModel, DataFrame) = {
    val total = base.count()
    val sample =
      if (total <= sampleN) base
      else base.filter(
        pmod(xxhash64(col("vec_id"), lit(seed)), lit(1000000L)) <
          lit(math.min(1000000L, sampleN * 1000000L / total)))
    val withVec = sample.select(col("vec_id"), col("embedding"))
      .withColumn("features", array_to_vector(col("embedding")))
      .cache()
    try {
      val km = new KMeans()
        .setK(numClusters).setSeed(seed).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("cluster_id")
      val kmModel = km.fit(withVec)
      buildWithCentroids(spark, base, kmModel.clusterCenters.map(_.toArray.map(_.toFloat)), seed)
    } finally withVec.unpersist()
  }

  /** Two-level k-means (analog of the reference's hierarchical training,
    * `/root/reference/scripts/cluster.py:79-108`): MLlib k-means for the
    * k1 top clusters, then a deterministic in-partition Lloyd refinement
    * splitting each top cluster into k2 — the per-group step runs
    * DISTRIBUTED via flatMapGroups (one task per top cluster), which is
    * the shape that scales: top-level global pass, second level
    * embarrassingly parallel.
    */
  def buildHierarchical(spark: SparkSession, base: DataFrame,
                        k1: Int, k2: Int, seed: Long): (RabitqModel, DataFrame) = {
    import spark.implicits._
    val withVec = base.select(col("vec_id"), col("embedding"))
      .withColumn("features", array_to_vector(col("embedding")))
    val km = new KMeans()
      .setK(k1).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("top_cluster")
    val top = km.fit(withVec).transform(withVec).drop("features")

    val subCentroids: Array[Array[Float]] = top
      .select(col("top_cluster"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val pts = it.toArray.sortBy(_._2).map(_._3.toArray)
        localLloyd(pts, math.min(k2, pts.length), iters = 10).map(c => (g, c.toSeq))
      }
      .collect().sortBy(_._1).map(_._2.toArray)

    buildWithCentroids(spark, base, subCentroids, seed)
  }

  /** Deterministic local Lloyd iterations: init = evenly spaced points of
    * the (id-sorted) group, empty clusters keep their previous center.
    */
  private[operators] def localLloyd(pts: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    if (pts.isEmpty) return Array.empty
    val dim = pts(0).length
    var centers = Array.tabulate(k)(i => pts((i.toLong * pts.length / k).toInt).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      pts.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = VectorOps.l2sq(p, centers(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0) centers(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
    }
    centers
  }

  /** Encode against precomputed raw-space centroids: rotate, assign by
    * broadcast argmin (B4 — a broadcast nearest-neighbor join), residual →
    * code + factors (B1, B3, B6–B11) in one narrow pass.
    */
  def buildWithCentroids(spark: SparkSession, base: DataFrame,
                         rawCentroids: Array[Array[Float]], seed: Long): (RabitqModel, DataFrame) = {
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val padDim = ((dim + 63) / 64) * 64
    val params = RabitqParams(dim, padDim, rawCentroids.length, seed)

    val rotation = randomOrthogonal(padDim, seed)
    val rotCentroids = rawCentroids.map(c => VectorOps.rotate(rotation, VectorOps.pad(c, 64)))
    val model = RabitqModel(params, rotation, rotCentroids, ditherBias(padDim, seed))

    val bRaw = spark.sparkContext.broadcast(rawCentroids)
    val assignUdf = udf { (emb: Seq[Float]) =>
      val v = emb.toArray
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < bRaw.value.length) {
        val d = VectorOps.l2sq(v, bRaw.value(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val assigned = base.select(col("vec_id"), col("embedding"))
      .withColumn("cluster_id", assignUdf(col("embedding")))

    val bRot = spark.sparkContext.broadcast(rotation)
    val bCent = spark.sparkContext.broadcast(rotCentroids)
    // B1+B3+B6..B11 fused in one pass per row: pad → rotate → residual →
    // code + factors. One UDF emitting a struct keeps it a single narrow
    // projection (no intermediate shuffles or row explosions).
    val encode = udf { (emb: Seq[Float], cluster: Int) =>
      val rot = VectorOps.rotate(bRot.value, VectorOps.pad(emb.toArray, 64))
      val residual = VectorOps.subtract(rot, bCent.value(cluster))
      val code = VectorOps.binarizeU64(residual)
      val (fip, fppc, err, cds) = VectorOps.factors(residual)
      (code, fip, fppc, err, cds)
    }

    val index = assigned
      .withColumn("enc", encode(col("embedding"), col("cluster_id")))
      .select(
        col("vec_id"),
        col("cluster_id"),
        col("enc._1").as("code"),
        col("enc._2").as("factor_ip"),
        col("enc._3").as("factor_ppc"),
        col("enc._4").as("error_bound"),
        col("enc._5").as("cds"))
    (model, index)
  }

  /** Resolve the ACTIVE index data directory of a saved layout. A fresh
    * [[save]] writes `$dir/index` and no MANIFEST; a compaction
    * (`VecsStream.compactIndex`) rewrites the live rows into a new
    * versioned sibling (`index-v2`, `index-v3`, …) and atomically swaps
    * a one-line MANIFEST to point at it — so every reader and appender
    * resolves through here and a crash mid-compaction can never expose
    * a partial layout (readers keep the old generation until the swap).
    */
  def indexDataDir(dir: String): String = {
    val mf = s"$dir/MANIFEST"
    if (LayoutFs.isFile(mf)) s"$dir/${LayoutFs.readString(mf).trim}"
    else s"$dir/index"
  }

  /** The tombstone log of the ACTIVE generation. Logs are PER
    * GENERATION (`deletes` for the base `index` dir, `deletes-vN` for
    * `index-vN`): a compaction folds the current generation's log into
    * the rewrite and swaps the MANIFEST — the NEW generation starts with
    * no log, and the folded log stays on disk untouched (an in-flight
    * reader that resolved the old generation pre-swap keeps BOTH its
    * data dir and its log until the retention window expires —
    * [[vacuumIndex]] reclaims them together). Writers (the maintain
    * stream's del leg) resolve through here per batch, exactly like the
    * data dir resolves through the MANIFEST.
    */
  def tombstoneLogDir(dir: String): String = logDirOfGen(dir,
    LayoutFs.baseName(indexDataDir(dir)))

  private[graft] def logDirOfGen(dir: String, gen: String): String =
    if (gen == "index") s"$dir/deletes"
    else s"$dir/deletes-${gen.stripPrefix("index-")}"

  /** The active generation's tombstone log — present only if it holds
    * DATA files. Presence must be judged by data, not by the directory:
    * the streamed del leg creates its target dir unconditionally (the
    * all-empty-batches contract), so a maintain stream that never saw a
    * delete leaves an EMPTY `deletes` dir, and a reader that anti-joined
    * `spark.read.parquet` over it would throw (no files to infer a
    * schema from) on a perfectly healthy layout.
    */
  private[graft] def tombstoneLogIfAny(dir: String): Option[String] =
    tombstoneLogOfGenIfAny(dir, LayoutFs.baseName(indexDataDir(dir)))

  /** [[tombstoneLogIfAny]] against an already-resolved generation — for
    * callers holding a single MANIFEST resolution ([[loadLive]]).
    */
  private[graft] def tombstoneLogOfGenIfAny(
      dir: String, gen: String): Option[String] = {
    val p = logDirOfGen(dir, gen)
    val hasData = LayoutFs.list(p)
      .exists(x => !x.isDir && x.name.endsWith(".parquet"))
    if (hasData) Some(p) else None
  }

  /** File-reference CARRY listing of a generation — the metadata-
    * indirection (Iceberg-manifest) shape: `_CARRY` inside a generation
    * dir lists layout-root-relative parquet data files that BELONG to
    * the generation but physically live in an OLDER generation's
    * directory. Written by the generation-versioned rebalance swap so
    * UNTOUCHED clusters are carried as metadata (one listing line per
    * immutable file — IO ∝ skew) instead of per-file copy (∝ corpus);
    * readers resolve the listing ([[scanOfGen]]), and [[vacuumUnlocked]]
    * refcounts listed files across retained generations instead of
    * retiring at directory granularity. The listing is FLAT, never a
    * chain: a swap that inherits carried entries rewrites the survivors
    * into its own listing, so resolution is one file read. Absent — a
    * fresh [[save]], every compaction rewrite, the in-place POSIX
    * rebalance — the generation is self-contained and the scan is the
    * plain directory read, plan-identical to the pre-listing engine.
    * Underscore name = invisible to Spark's file listing, exactly like
    * the `_centroids`/`_params` generation-local sidecars. Reference
    * analog: the reference's S3 tier only ever GETs immutable objects
    * (`/root/reference/crates/disk/src/cache.rs:24-52`) — this keeps
    * layout MUTATION metadata-sized on the same store.
    */
  private[graft] def readCarry(dir: String, gen: String): Seq[String] = {
    val f = s"$dir/$gen/_CARRY"
    if (LayoutFs.isFile(f))
      LayoutFs.readString(f).split('\n')
        .map(_.trim).filter(_.nonEmpty).toSeq
    else readCarryShards(dir, gen).flatMap(s => readShardEntries(dir, gen, s))
  }

  /** Batch prefixes of PROMOTED-BUT-UNCOMMITTED appends (in-progress
    * sentinel present, commit marker absent — a crashed attempt, or a
    * live batch mid-promote on another worker). Their files may be
    * SWEPT and re-promoted by the replay at any moment
    * (`IdempotentSink.sweepPrefix`), so READERS exclude them from every
    * scan: read-committed visibility for appends, and — the part that
    * bites — no vanishing-file task failures while a crashed append is
    * being recovered under a racing reader (found by the crash×race
    * hammer: a reader that listed the file pre-sweep hard-fails reading
    * it post-sweep). Metadata-sized: one `_commits` listing per
    * resolve, empty on the no-crash path.
    */
  private[graft] def inProgressPrefixes(dir: String): Seq[String] =
    LayoutFs.list(s"$dir/_commits").filter(_.isDir).flatMap { q =>
      LayoutFs.list(q.path)
        .filter(f => !f.isDir && f.name.endsWith(".inprogress"))
        .map(_.name.stripSuffix(".inprogress"))
        .filter(b => !LayoutFs.exists(s"$dir/_commits/${q.name}/$b"))
        .map(b => s"${q.name}-$b")
    }

  private def excludedByInProgress(name: String,
                                   inprog: Seq[String]): Boolean =
    inprog.exists(p => name.startsWith(p + "-"))

  /** Does the generation carry ANY files by reference? Metadata-probe
    * only — the self-contained-vs-carry-listed decision points must not
    * read a corpus-file-count listing just to test emptiness.
    */
  private[graft] def hasCarry(dir: String, gen: String): Boolean =
    (LayoutFs.isFile(s"$dir/$gen/_CARRY") &&
      LayoutFs.length(s"$dir/$gen/_CARRY") > 0) ||
      LayoutFs.isFile(s"$dir/$gen/_CARRY_LIST")

  /** Target entries per carry-manifest SHARD — the point past which
    * [[writeCarryListing]] switches from the flat single `_CARRY` file
    * to the sharded manifest-list shape (`_CARRY_LIST` + `_carry/`).
    * At 100 TB (~10⁵–10⁶ data files) a flat listing is a ~50 MB object
    * rebuilt whole per swap and re-read whole per resolution; sharding
    * bounds every metadata object and lets probe-pruned readers touch
    * only the shards covering their probed clusters
    * ([[readCarryForClusters]]) — Iceberg's manifest-list shape, and
    * the metadata analog of the reference's block-granular ranged GET
    * (`/root/reference/crates/disk/src/cache.rs:105-113`: touch only
    * what you probe). Volatile test seam: specs lower it to exercise
    * the sharded shape at spec scale.
    */
  @volatile private[graft] var carryShardTarget: Int = 4096

  /** One line of `_CARRY_LIST`: a shard's cluster-id range, file name
    * (inside `_carry/`), and entry count.
    */
  private[graft] final case class CarryShard(
      lo: Int, hi: Int, name: String, count: Int)

  private[graft] def readCarryShards(dir: String, gen: String): Seq[CarryShard] = {
    val f = s"$dir/$gen/_CARRY_LIST"
    if (!LayoutFs.isFile(f)) Nil
    else LayoutFs.readString(f).split('\n')
      .map(_.trim).filter(_.nonEmpty).toSeq.map { l =>
        val p = l.split('\t')
        CarryShard(p(0).toInt, p(1).toInt, p(2), p(3).toInt)
      }
  }

  private def readShardEntries(dir: String, gen: String,
                               s: CarryShard): Seq[String] =
    LayoutFs.readString(s"$dir/$gen/_carry/${s.name}").split('\n')
      .map(_.trim).filter(_.nonEmpty).toSeq

  /** Carry entries restricted to `clusters`, reading ONLY the manifest
    * shards whose cluster-id ranges overlap them — the lazy resolution
    * of the probe-pruned disk query path. On the flat shape this is a
    * filter of the one listing file (same bytes as before); on the
    * sharded shape the bytes read are ∝ probed shards, not ∝ corpus
    * file count. Shard ranges can cover more clusters than requested,
    * so entries are filtered exactly either way.
    */
  private[graft] def readCarryForClusters(dir: String, gen: String,
                                          clusters: Set[Int]): Seq[String] = {
    val all =
      if (LayoutFs.isFile(s"$dir/$gen/_CARRY")) readCarry(dir, gen)
      else readCarryShards(dir, gen)
        .filter(s => clusters.exists(c => c >= s.lo && c <= s.hi))
        .flatMap(s => readShardEntries(dir, gen, s))
    all.filter(e => clusters.contains(clusterOfCarryEntry(e)))
  }

  /** Publish a generation's carry listing from its entry list: the flat
    * single `_CARRY` file up to [[carryShardTarget]] entries, the
    * sharded manifest-list shape past it — size-bounded shards cut at
    * CLUSTER boundaries (a cluster's entries never straddle shards, so
    * range-overlap resolution is exact; one oversized cluster gets one
    * oversized shard), then the tiny `_CARRY_LIST` naming each shard's
    * range. Every write goes through the commit seam (kill-sweep
    * crash points); all of it lands inside the still-unreferenced next
    * generation, so a crash anywhere leaves only debris the conversion
    * retry wipes ([[completeRebalanceSwapAsGeneration]] rebuilds
    * `nextDir` from scratch) or vacuum reclaims. Stale listing state
    * from a crashed prior attempt is wiped FIRST so `_CARRY_LIST` can
    * only ever name shards this attempt wrote — and so the two shapes
    * can never coexist (readers prefer `_CARRY`).
    */
  private[graft] def writeCarryListing(nextDir: String,
                                       entries: Seq[String]): Unit = {
    LayoutFs.delete(s"$nextDir/_CARRY")
    LayoutFs.delete(s"$nextDir/_CARRY_LIST")
    LayoutFs.deleteRecursively(s"$nextDir/_carry")
    if (entries.length <= carryShardTarget) {
      LayoutCommit.atomicWriteFile(s"$nextDir/_CARRY", entries.mkString("\n"))
      return
    }
    val byCluster: Seq[(Int, Seq[String])] = entries
      .groupBy(clusterOfCarryEntry).toSeq.sortBy(_._1)
      .map { case (c, es) => (c, es.sorted) }
    val shards = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Seq[String])]
    var lo = -1; var hi = -1
    var buf = Vector.empty[String]
    byCluster.foreach { case (cid, es) =>
      if (buf.nonEmpty && buf.length + es.length > carryShardTarget) {
        shards += ((lo, hi, buf)); buf = Vector.empty
      }
      if (buf.isEmpty) lo = cid
      buf ++= es; hi = cid
    }
    if (buf.nonEmpty) shards += ((lo, hi, buf))
    LayoutFs.mkdirs(s"$nextDir/_carry")
    val listLines = shards.zipWithIndex.map { case ((l, h, es), i) =>
      val name = f"shard-$i%05d.list"
      LayoutCommit.atomicWriteFile(s"$nextDir/_carry/$name",
        es.mkString("\n"))
      s"$l\t$h\t$name\t${es.length}"
    }
    LayoutCommit.atomicWriteFile(s"$nextDir/_CARRY_LIST",
      listLines.mkString("\n"))
  }

  private[graft] def clusterOfCarryEntry(e: String): Int =
    e.split('/').find(_.startsWith("cluster_id="))
      .getOrElse(throw new IllegalArgumentException(
        s"carry entry without a cluster_id= segment: $e"))
      .stripPrefix("cluster_id=").toInt

  /** Build the listing a generation swap publishes: every data file of
    * the current generation's NON-split clusters — its own files by
    * root-relative path plus its inherited carry entries, flattened.
    * Pure directory metadata; no data bytes move.
    */
  private[graft] def buildCarryListing(dir: String, curName: String,
                                       splitIds: Set[Int]): Seq[String] = {
    val own = LayoutFs.list(s"$dir/$curName")
      .filter(f => f.isDir && f.name.startsWith("cluster_id=") &&
        !splitIds.contains(f.name.stripPrefix("cluster_id=").toInt))
      .sortBy(_.name)
      .flatMap(cd => LayoutFs.list(cd.path)
        .filter(f => !f.isDir && f.name.endsWith(".parquet"))
        .sortBy(_.name)
        .map(f => s"$curName/${cd.name}/${f.name}"))
    val inherited = readCarry(dir, curName)
      .filterNot(e => splitIds.contains(clusterOfCarryEntry(e)))
    own ++ inherited
  }

  /** [[buildCarryListing]] with the per-cluster FILE listings fanned out
    * as Spark tasks — the driver does ONE listing (the cluster dirs)
    * and a metadata-sized collect; the O(file-count) NameNode/object-
    * store LIST round-trips run distributed, so listing-build wall-clock
    * stays flat as the corpus grows (the r19 shape walked every file
    * from the driver). Same entry set as the driver walk (spec-pinned).
    * Only the PRIMARY swap path uses this — the crash-recovery
    * conversion ([[completeRebalanceSwapAsGeneration]]) has no
    * SparkSession by contract and keeps the driver walk.
    */
  private[graft] def buildCarryEntriesDistributed(
      spark: SparkSession, dir: String, curName: String,
      splitIds: Set[Int]): Seq[String] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(s"$dir/$curName")
    val fs = rootPath.getFileSystem(hconf)
    val dirs: Seq[(String, String)] =
      if (!fs.exists(rootPath)) Nil
      else fs.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("cluster_id=") &&
          !splitIds.contains(
            s.getPath.getName.stripPrefix("cluster_id=").toInt))
        .map(s => (s.getPath.getName, fs.makeQualified(s.getPath).toString))
    // executor tasks must see the DRIVER's hadoop conf (s3a credentials,
    // endpoints), not a bare `new Configuration()` of classpath defaults
    val bConf = org.apache.spark.graft.SerHadoopConf
      .broadcast(spark.sparkContext, hconf)
    val own: Seq[String] =
      if (dirs.isEmpty) Nil
      else spark.sparkContext
        .parallelize(dirs, math.max(1, math.min(64, dirs.length)))
        .flatMap { case (name, qp) =>
          val p = new org.apache.hadoop.fs.Path(qp)
          p.getFileSystem(bConf.value.conf).listStatus(p).toSeq
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(st => s"$curName/$name/${st.getPath.getName}")
        }.collect().toSeq.sorted
    val inherited = readCarry(dir, curName)
      .filterNot(e => splitIds.contains(clusterOfCarryEntry(e)))
    own ++ inherited
  }

  /** The data scan of an already-resolved generation: its own directory
    * unioned with any files its `_CARRY` listing carries by reference.
    * Carried files are grouped by SOURCE generation and read with
    * `basePath` pointing at that generation dir, so `cluster_id`
    * partition inference — and partition PRUNING of probe filters —
    * works on the carried branches exactly as on the own branch; the
    * listing bounds the file index (no directory walk of retired
    * generations). Carry-free generations return the plain directory
    * read — the identical plan every existing pruning gate asserts.
    */
  private[graft] def scanOfGen(spark: SparkSession, dir: String,
                               gen: String): DataFrame =
    scanOfGen(spark, dir, gen, None)

  /** [[scanOfGen]] with OPTIONAL cluster restriction: when `clusters` is
    * given, carried files are materialized from only the manifest
    * shards overlapping them ([[readCarryForClusters]]) — the planner
    * never even lists the carried files of unprobed clusters, which at
    * 100 TB is the difference between O(probed) and O(corpus-file-count)
    * driver work per query. Restriction contract: the caller MUST still
    * filter `cluster_id ∈ clusters` (the own-dir branch is a full
    * directory read pruned by that filter, exactly as before).
    */
  private[graft] def scanOfGen(spark: SparkSession, dir: String,
                               gen: String,
                               clusters: Option[Set[Int]]): DataFrame = {
    val genName = LayoutFs.baseName(gen)
    val inprog = inProgressPrefixes(dir)
    // the OWN-directory branch: the plain directory read on the
    // no-crash path (inprog empty — plan-identical to every pruning
    // gate), an explicit file enumeration EXCLUDING uncommitted-batch
    // files when a promoted-but-unmarked append exists (read-committed:
    // the replay may sweep those files at any moment, and a racing
    // reader must neither serve them nor hard-fail on their deletion)
    def ownScanAttempt(retries: Int): DataFrame =
      if (inprog.isEmpty) spark.read.parquet(gen)
      else {
        val all = LayoutFs.list(gen)
          .filter(d => d.isDir && d.name.startsWith("cluster_id="))
          .sortBy(_.name)
          .flatMap(cd => LayoutFs.list(cd.path)
            .filter(f => !f.isDir && f.name.endsWith(".parquet"))
            .sortBy(_.name))
        val files = all
          .filterNot(f => excludedByInProgress(f.name, inprog)).map(_.path)
        if (files.nonEmpty) spark.read.option("basePath", gen).parquet(files: _*)
        else if (all.isEmpty) spark.read.parquet(gen)
        else
          // 'no committed files' ≠ 'no files': when the exclusion emptied
          // a non-empty listing, EVERY parquet file here belongs to a
          // promoted-but-uncommitted batch — a full-directory read would
          // serve exactly those rows (and race the replay's sweep), so
          // serve a schema-only empty frame instead (one excluded footer
          // read for the schema, zero data rows — the pure-carry shape).
          // The schema read races the replay's SWEEP of that very file
          // (its deletion is the uncommitted-batch contract): on a
          // vanished-file failure re-list and retry — after the sweep
          // the listing is either empty (plain dir read) or holds the
          // re-promoted attempt's fresh files
          try spark.read.option("basePath", gen).parquet(all.head.path).limit(0)
          catch {
            case _: Exception if retries > 0 &&
                !LayoutFs.isFile(all.head.path) =>
              ownScanAttempt(retries - 1)
          }
      }
    def ownScan: DataFrame = ownScanAttempt(retries = 3)
    // carry-free generation (the common case, two metadata probes):
    // the plain own-dir read, with none of the listing resolution or
    // the ownHasData walk below — the probed disk path must cost the
    // same here as the r19 loadLive read did
    if (!hasCarry(dir, genName)) return ownScan
    val carry0 = clusters.fold(readCarry(dir, genName))(cs =>
      readCarryForClusters(dir, genName, cs))
    // defensive: listings are built post-settle so they never name an
    // uncommitted batch's files — but exclusion here is one string test
    val carry = carry0.filterNot(e =>
      excludedByInProgress(e.split('/').last, inprog))
    def ownHasData = LayoutFs.list(gen)
      .filter(f => f.isDir && f.name.startsWith("cluster_id="))
      .exists(cd => LayoutFs.list(cd.path)
        .exists(f => !f.isDir && f.name.endsWith(".parquet")))
    if (carry.isEmpty) {
      // no carried files at all, or none within the restriction: the
      // own-directory read — except a PURE-carry generation whose
      // probed clusters hold zero carried files, where the own dir has
      // nothing to infer a schema from; read one carried file for the
      // schema and return its empty restriction
      if (clusters.isEmpty || ownHasData) return ownScan
      val anyEntry = (if (LayoutFs.isFile(s"$dir/$genName/_CARRY"))
          readCarry(dir, genName).headOption
        else readCarryShards(dir, genName).headOption
          .flatMap(s => readShardEntries(dir, genName, s).headOption))
        .getOrElse(return ownScan)
      return spark.read
        .option("basePath", s"$dir/${anyEntry.takeWhile(_ != '/')}")
        .parquet(s"$dir/$anyEntry").limit(0)
    }
    val own = if (ownHasData) Seq(ownScan) else Nil
    val carried = carry.groupBy(_.takeWhile(_ != '/')).toSeq.sortBy(_._1)
      .map { case (srcGen, entries) =>
        spark.read.option("basePath", s"$dir/$srcGen")
          .parquet(entries.map(e => s"$dir/$e"): _*)
      }
    (own ++ carried).reduce(_.unionByName(_))
  }

  /** The tombstone-log scan of a generation with the same read-committed
    * exclusion as [[scanOfGen]]: the log is an append target too, so a
    * crashed delete batch's files are excluded (and safe from the
    * replay's sweep racing this read). None when the log is empty or
    * holds only uncommitted batches.
    */
  private[graft] def logScanOfGen(spark: SparkSession, dir: String,
                                  gen: String): Option[DataFrame] = {
    val p = logDirOfGen(dir, gen)
    val inprog = inProgressPrefixes(dir)
    val files = LayoutFs.list(p)
      .filter(f => !f.isDir && f.name.endsWith(".parquet") &&
        !excludedByInProgress(f.name, inprog))
      .sortBy(_.name).map(_.path)
    if (files.isEmpty) None
    else if (inprog.isEmpty) Some(spark.read.parquet(p))
    else Some(spark.read.option("basePath", p).parquet(files: _*))
  }

  /** Mark a generation as RETIRED (superseded by a compaction swap) —
    * the marker's mtime starts the retention clock [[vacuumIndex]]
    * reclaims it on. Written BEFORE the MANIFEST swap so no state exists
    * where a superseded generation looks like immediately-reclaimable
    * rewrite debris.
    */
  private[graft] def markRetired(dir: String, gen: String): Unit = {
    LayoutFs.mkdirs(s"$dir/_retired")
    LayoutCommit.atomicWriteFile(s"$dir/_retired/$gen",
      System.currentTimeMillis().toString)
  }

  /** Move staged parquet data files into a (possibly partitioned) layout
    * directory, preserving the partition-dir structure. `rename =
    * Some(prefix)` gives per-directory DETERMINISTIC names
    * (`$prefix-00000.parquet`, sorted source order) so a retried caller
    * overwrites its own files instead of duplicating them; `None` keeps
    * the writer's names (globally unique part-UUIDs — right for
    * run-once ops like the rebalance promote). File moves are
    * metadata-only on a real filesystem — the staged bytes are written
    * exactly once.
    */
  private[graft] def promoteStaged(staging: String, target: String,
                                   rename: Option[String]): Unit = {
    def walk(src: String, dst: String): Unit = {
      val kids = LayoutFs.list(src)
      kids.filter(d => d.isDir && !d.name.startsWith("_"))
        .foreach(d => walk(d.path, s"$dst/${d.name}"))
      val files = kids.filter(f => !f.isDir && f.name.endsWith(".parquet"))
        .sortBy(_.name)
      if (files.nonEmpty) LayoutFs.mkdirs(dst)
      files.zipWithIndex.foreach { case (f, i) =>
        val name = rename.fold(f.name)(p => f"$p-$i%05d.parquet")
        LayoutCommit.atomicMoveFile(f.path, s"$dst/$name")
      }
    }
    walk(staging, target)
  }

  /** Raw-layout statistics the serving tier carries into its engine
    * snapshot: (physical index rows of the active generation, distinct
    * tombstoned ids). The tombstone side is delete-volume-sized; the row
    * count is a parquet-metadata aggregate.
    */
  def layoutStats(spark: SparkSession, dir: String): (Long, Long) = {
    // single generation resolution (the load() discipline): the counted
    // rows and the counted log must belong to the same generation
    val gen = indexDataDir(dir)
    val nRows = scanOfGen(spark, dir, gen).count()
    val nTomb = tombstoneLogOfGenIfAny(dir, LayoutFs.baseName(gen))
      .fold(0L)(delDir =>
        spark.read.parquet(delDir).select("vec_id").distinct().count())
    (nRows, nTomb)
  }

  /** Persist as a parquet directory (S6 analog of the reference's 5-file
    * layout `/root/reference/src/rabitq.rs:128-156`): index partitioned by
    * cluster_id (→ partition pruning on probes), model sidecar tables.
    * A save RESETS the layout to generation zero: any MANIFEST, old
    * versioned data dirs, stale tombstone logs, retirement markers, AND
    * every lifecycle-protocol leftover from a previous life of the dir
    * are removed (a brand-new index has no history) — data is written
    * first, so a crash mid-save leaves the previous generation readable.
    * The protocol leftovers matter as much as the data dirs: a surviving
    * `_rebalance_staging/_COMMIT` would be rolled FORWARD by the next
    * maintenance pass (replacing fresh cluster dirs with stale re-encoded
    * rows and overwriting the new sidecar), and surviving `_commits`
    * markers would make a restarted stream that reuses a queryName with
    * a fresh checkpoint (batchIds restart at 0) silently SKIP batches in
    * `IdempotentSink` — quiet data loss either way.
    */
  def save(spark: SparkSession, model: RabitqModel, index: DataFrame, dir: String): Unit = {
    import spark.implicits._
    spark.sparkContext.setJobDescription(s"rabitq: save $dir")
    index.write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/index")
    LayoutFs.delete(s"$dir/MANIFEST")
    LayoutFs.list(dir)
      .filter(f => f.isDir &&
        (f.name.startsWith("index-v") || f.name == "deletes" ||
          f.name.startsWith("deletes-") || f.name == "_retired" ||
          f.name == "_rebalance_staging" || f.name == "_commits" ||
          f.name == "_staging" || f.name.startsWith(".rebalance-new-")))
      .foreach(f => LayoutFs.deleteRecursively(f.path))
    LayoutFs.list(dir)
      .filter(f => !f.isDir &&
        (f.name == "MANIFEST.tmp" || f.name == "BUILT_K"))
      .foreach(f => LayoutFs.delete(f.path))
    // the three model sidecars are independent tiny single-task writes —
    // overlap them (inParallel) so the save pays one write latency, not
    // three; data-first crash ordering is preserved (index wrote above)
    inParallel(
      model.rotation.zipWithIndex.map { case (r, i) => (i, r.toSeq) }.toSeq
        .toDF("row_id", "row").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/rotation"),
      model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cluster_id", "centroid").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/centroids"),
      Seq((model.params.dim, model.params.padDim, model.params.numClusters,
           model.params.seed, model.bias.toSeq))
        .toDF("dim", "pad_dim", "num_clusters", "seed", "bias").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/params"))
    ()
  }

  /** Incremental maintenance: encode NEW vectors against the existing
    * model (same rotation, same centroids — nearest-centroid assignment)
    * and return index rows to union/append. The reference leaves
    * insert/update/delete unimplemented (`/root/reference/README.md:18`);
    * on Spark this is a narrow encode pass + an append to the partitioned
    * parquet — no re-clustering, no touch of existing rows. Recall decays
    * only as the new data drifts from the frozen centroids; re-cluster on
    * a schedule, not per batch.
    *
    * CONTRACT: emits exactly the index schema (vec_id, cluster_id, code,
    * factors) — metadata columns the caller wants riding in the layout
    * (the filtered tier's label) are the CALLER's join before the write,
    * like the labeled gates do. Ops that REWRITE existing rows are
    * different: they must preserve whatever already rides in the layout
    * themselves ([[rebalanceIndex]] carries extras across its rewrite;
    * `VecsStream.compactIndex` rewrites the full live frame so extras
    * ride for free).
    */
  def appendVectors(spark: SparkSession, model: RabitqModel, newVecs: DataFrame): DataFrame = {
    // raw-space centroids are not persisted in the model (rotated ones
    // are); assignment in rotated space is equivalent — rotation is
    // orthogonal, so nearest-centroid is preserved
    val bRot = spark.sparkContext.broadcast(model.rotation)
    val bCent = spark.sparkContext.broadcast(model.centroids)
    val encode = udf { (emb: Seq[Float]) =>
      val rot = VectorOps.rotate(bRot.value, VectorOps.pad(emb.toArray, 64))
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < bCent.value.length) {
        val d = VectorOps.l2sq(rot, bCent.value(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val residual = VectorOps.subtract(rot, bCent.value(best))
      val code = VectorOps.binarizeU64(residual)
      val (fip, fppc, err, cds) = VectorOps.factors(residual)
      (best, code, fip, fppc, err, cds)
    }
    newVecs.select(col("vec_id"), col("embedding"))
      .withColumn("enc", encode(col("embedding")))
      .select(
        col("vec_id"),
        col("enc._1").as("cluster_id"),
        col("enc._2").as("code"),
        col("enc._3").as("factor_ip"),
        col("enc._4").as("factor_ppc"),
        col("enc._5").as("error_bound"),
        col("enc._6").as("cds"))
  }

  /** Incremental maintenance, delete side: drop index rows whose vec_id
    * appears in `ids` (one column, `vec_id`). The reference leaves delete
    * unimplemented (`/root/reference/README.md:18`); on Spark it is an
    * anti-join — id-only shuffle when `ids` is large, broadcast when small,
    * Catalyst picks. Centroids stay frozen (same contract as
    * [[appendVectors]]): a delete never degrades recall, it only leaves a
    * cluster sparser, so re-clustering stays a scheduled concern.
    */
  def deleteVectors(index: DataFrame, ids: DataFrame): DataFrame =
    index.join(ids.select("vec_id"), Seq("vec_id"), "left_anti")

  /** Incremental maintenance, update side: re-encode rows whose vec_id
    * already exists (delete + insert against the frozen model — the
    * classic vector-store upsert). One anti-join + one narrow encode
    * pass; new ids flow through the same path, so this is a true upsert.
    */
  def upsertVectors(spark: SparkSession, model: RabitqModel, index: DataFrame,
                    vecs: DataFrame): DataFrame =
    deleteVectors(index, vecs).unionByName(appendVectors(spark, model, vecs))

  /** Whole-model JSON serialization (S8 analog of the reference's serde
    * JSON, `/root/reference/src/rabitq.rs:72-81`): params + rotation +
    * rotated centroids + dither bias in one self-describing file. Index
    * DATA stays parquet — this is only the small driver-side state.
    */
  def dumpModelJson(model: RabitqModel, path: String): Unit = {
    def arr(a: Array[Float]): String = a.mkString("[", ",", "]")
    def mat(m: Array[Array[Float]]): String = m.map(arr).mkString("[", ",", "]")
    val json =
      s"""{"dim":${model.params.dim},"pad_dim":${model.params.padDim},""" +
        s""""num_clusters":${model.params.numClusters},"seed":${model.params.seed},""" +
        s""""rotation":${mat(model.rotation)},"centroids":${mat(model.centroids)},""" +
        s""""bias":${arr(model.bias)}}"""
    // through the seams: an atomic publish readable on any deployment fs
    LayoutCommit.atomicWriteFile(path, json)
  }

  def loadModelJson(path: String): RabitqModel = {
    // dependency-free parser for the fixed shape written above
    val s = LayoutFs.readString(path)
    def long(key: String): Long = {
      val m = java.util.regex.Pattern.compile("\"" + key + "\":(-?\\d+)").matcher(s)
      require(m.find(), s"missing $key"); m.group(1).toLong
    }
    def floats(body: String): Array[Float] =
      if (body.trim.isEmpty) Array.empty
      else body.split(",").map(_.trim.toFloat)
    def matrix(key: String): Array[Array[Float]] = {
      val start = s.indexOf("\"" + key + "\":[[")
      require(start >= 0, s"missing $key")
      val open = s.indexOf("[[", start)
      var depth = 0; var i = open; var end = -1
      while (end < 0) {
        s.charAt(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      s.substring(open + 1, end).split("\\],\\s*\\[")
        .map(row => floats(row.replaceAll("[\\[\\]]", "")))
    }
    def vector(key: String): Array[Float] = {
      val m = java.util.regex.Pattern.compile("\"" + key + "\":\\[([^\\]]*)\\]").matcher(s)
      require(m.find(), s"missing $key"); floats(m.group(1))
    }
    RabitqModel(
      RabitqParams(long("dim").toInt, long("pad_dim").toInt,
        long("num_clusters").toInt, long("seed")),
      matrix("rotation"), matrix("centroids"), vector("bias"))
  }

  /** Export the index in the reference's exact 5-file directory layout
    * (`/root/reference/src/rabitq.rs:128-156`): `orthogonal.fvecs` (dim
    * rows), `centroids.fvecs` (k rows, rotated space), `base.fvecs`
    * (cluster-sorted ROTATED vectors — the reference stores the projected
    * base transposed; we export row-per-vector in the same CSR order),
    * `factors.fvecs` (ONE record of 4·n floats: ip, ppc, error, cds per
    * vector), `x_binary_vec.u64vecs` (n records), `offsets_ids.ivecs`
    * (exactly two records: k+1 prefix-sum offsets, then n original row
    * ids). CSR order = cluster ascending, center-distance ascending within
    * a cluster (`/root/reference/src/rabitq.rs:231-252`).
    *
    * SIZE BOUND: this collects index AND base to the driver — it is a
    * model-parity exporter for reference-sized datasets (≤ a few hundred
    * MB), not a data path. At scale, export each cluster partition with a
    * distributed writer instead.
    */
  def exportReferenceLayout(spark: SparkSession, model: RabitqModel, index: DataFrame,
                            base: DataFrame, dir: String): Unit = {
    import spark.implicits._
    import graft.sources.Fvecs
    // local java.io by design: the fvecs family is the reference's
    // LOCAL-disk format and this exporter is reference parity, not a
    // lifecycle path (see the size-bound note above)
    new java.io.File(dir).mkdirs()

    Fvecs.writeFvecs(
      model.rotation.zipWithIndex.map { case (r, i) => (i.toLong, r.toSeq) }.toSeq
        .toDF("vec_id", "vec"), s"$dir/orthogonal.fvecs")
    Fvecs.writeFvecs(
      model.centroids.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
        .toDF("vec_id", "vec"), s"$dir/centroids.fvecs")

    // CSR ordering: (cluster_id, cds, vec_id); stable + deterministic
    val ordered = index.orderBy(col("cluster_id"), col("cds"), col("vec_id"))
      .select("vec_id", "cluster_id", "code", "factor_ip", "factor_ppc", "error_bound", "cds")
      .collect()

    val bRot = model.rotation
    val vecById = base.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    Fvecs.writeFvecs(
      ordered.zipWithIndex.map { case (r, pos) =>
        val rot = graft.functions.VectorOps.rotate(bRot,
          graft.functions.VectorOps.pad(vecById(r.getLong(0)), 64))
        (pos.toLong, rot.toSeq)
      }.toSeq.toDF("vec_id", "vec"), s"$dir/base.fvecs")

    Fvecs.writeFvecs(
      Seq((0L, ordered.flatMap(r => Seq(
        r.getFloat(3), r.getFloat(4), r.getFloat(5), r.getFloat(6))).toSeq))
        .toDF("vec_id", "vec"), s"$dir/factors.fvecs")

    Fvecs.writeU64vecs(
      ordered.zipWithIndex.map { case (r, pos) => (pos.toLong, r.getSeq[Long](2)) }.toSeq
        .toDF("vec_id", "vec"), s"$dir/x_binary_vec.u64vecs")

    val k = model.params.numClusters
    val sizes = new Array[Int](k)
    ordered.foreach(r => sizes(r.getInt(1)) += 1)
    val offsets = sizes.scanLeft(0)(_ + _)
    val mapIds = ordered.map(_.getLong(0).toInt)
    Fvecs.writeIvecs(
      Seq((0L, offsets.toSeq), (1L, mapIds.toSeq)).toDF("vec_id", "vec"),
      s"$dir/offsets_ids.ivecs")
  }

  /** [[exportReferenceLayout]] WITHOUT the driver-side collect — the
    * scale path the driver exporter's size-bound note names. The
    * corpus-sized streams (`base.fvecs`, `x_binary_vec.u64vecs`,
    * `factors.fvecs` payload, the id half of `offsets_ids.ivecs`) are
    * encoded EXECUTOR-SIDE: the CSR-ordered frame (global range sort on
    * (cluster_id, cds, vec_id) — the exact order the driver exporter
    * collects in) is walked once per partition, each task writing its
    * byte chunks to a staging dir through the Hadoop FileSystem API
    * (works on local disk and on a shared fs alike), and the driver
    * CONCATENATES chunks in partition order — streaming copy, O(1)
    * driver memory. Record encoding is bit-identical to the driver
    * exporter (same LE layout, same `VectorOps.rotate` arithmetic on
    * the same inputs, same total order), spec-gated byte-for-byte.
    * Model-sized files (`orthogonal`/`centroids`) reuse the driver
    * writers. The per-cluster offsets come from a numClusters-row
    * aggregate, never the corpus.
    */
  def exportReferenceLayoutDistributed(
      spark: SparkSession, model: RabitqModel, index: DataFrame,
      base: DataFrame, dir: String): Unit = {
    import spark.implicits._
    import graft.sources.Fvecs
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val rootP = new Path(dir)
    val rootFs = rootP.getFileSystem(hconf)
    rootFs.mkdirs(rootP)

    Fvecs.writeFvecs(
      model.rotation.zipWithIndex.map { case (r, i) => (i.toLong, r.toSeq) }.toSeq
        .toDF("vec_id", "vec"), s"$dir/orthogonal.fvecs")
    Fvecs.writeFvecs(
      model.centroids.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
        .toDF("vec_id", "vec"), s"$dir/centroids.fvecs")

    val staging = s"$dir/.export_chunks"
    rootFs.delete(new Path(staging), true)
    rootFs.mkdirs(new Path(staging))
    val stagingQ = rootFs.makeQualified(new Path(staging)).toString
    val bRot = spark.sparkContext.broadcast(model.rotation)
    // executor tasks must see the DRIVER's hadoop conf (s3a credentials,
    // endpoints — the deployed object-store scale this path targets), not
    // a bare `new Configuration()` of classpath defaults
    val bConf = org.apache.spark.graft.SerHadoopConf
      .broadcast(spark.sparkContext, hconf)
    // u32 headers: the reference layout's fvecs/ivecs record headers and
    // ids are 32-bit — fail FAST past the format's capacity instead of
    // writing corrupt headers (this is the path advertised as the one
    // the driver collect could not scale to, so it hits the limit first)
    val maxIdRow = base.agg(max(col("vec_id"))).head()
    val maxId = if (maxIdRow.isNullAt(0)) 0L else maxIdRow.getLong(0)
    require(maxId <= Int.MaxValue,
      s"reference layout stores u32 row ids; max vec_id $maxId overflows")
    // CSR order, encoded per partition in one pass over the sorted rows.
    // Chunk names carry the TASK ATTEMPT id: with task retries or
    // speculative execution two live attempts of one partition would
    // otherwise write the same file concurrently (corrupting the chunk
    // after the winner's count was collected); attempt-unique names make
    // each attempt's output private, the collected rows name the winning
    // attempt's files, and loser files vanish with the staging dir.
    val chunkCounts: Array[(Int, Long, Long)] = index
      .join(base.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select("vec_id", "cluster_id", "code", "factor_ip", "factor_ppc",
        "error_bound", "cds", "embedding")
      .orderBy(col("cluster_id"), col("cds"), col("vec_id"))
      .rdd.mapPartitionsWithIndex { (pi, it) =>
        import java.nio.{ByteBuffer, ByteOrder}
        val conf = bConf.value.conf
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        def open(tag: String) = {
          val p = new Path(f"$stagingQ/part-$pi%05d-$attempt-$tag.bin")
          new java.io.BufferedOutputStream(p.getFileSystem(conf).create(p, true))
        }
        val (ob, oc, of, oi) = (open("base"), open("codes"), open("factors"), open("ids"))
        var n = 0L
        try {
          it.foreach { r =>
            val rot = graft.functions.VectorOps.rotate(bRot.value,
              graft.functions.VectorOps.pad(
                r.getAs[scala.collection.Seq[Float]]("embedding").toArray, 64))
            val bb = ByteBuffer.allocate(4 + rot.length * 4)
              .order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(rot.length); rot.foreach(bb.putFloat)
            ob.write(bb.array())
            val code = r.getAs[scala.collection.Seq[Long]]("code")
            val cb = ByteBuffer.allocate(4 + code.length * 8)
              .order(ByteOrder.LITTLE_ENDIAN)
            cb.putInt(code.length); code.foreach(cb.putLong)
            oc.write(cb.array())
            val fb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
            fb.putFloat(r.getAs[Float]("factor_ip"))
            fb.putFloat(r.getAs[Float]("factor_ppc"))
            fb.putFloat(r.getAs[Float]("error_bound"))
            fb.putFloat(r.getAs[Float]("cds"))
            of.write(fb.array())
            val ib = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            ib.putInt(r.getAs[Long]("vec_id").toInt)
            oi.write(ib.array())
            n += 1
          }
        } finally { ob.close(); oc.close(); of.close(); oi.close() }
        Iterator.single((pi, n, attempt))
      }.collect().sortBy(_._1)
    val n = chunkCounts.map(_._2).sum

    def concat(tag: String, out: java.io.OutputStream): Unit = {
      val buf = new Array[Byte](1 << 20)
      chunkCounts.foreach { case (pi, cnt, attempt) =>
        if (cnt > 0) {
          val p = new Path(f"$stagingQ/part-$pi%05d-$attempt-$tag.bin")
          val in = p.getFileSystem(hconf).open(p)
          try {
            var r = in.read(buf)
            while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
          } finally in.close()
        }
      }
    }
    def withOut(path: String)(body: java.io.OutputStream => Unit): Unit = {
      val out = new java.io.BufferedOutputStream(
        rootFs.create(new Path(path), true))
      try body(out) finally out.close()
    }
    require(4L * n <= Int.MaxValue,
      s"reference layout's factors.fvecs header is u32 = 4·n floats; " +
        s"n=$n overflows it — the format caps at n ≈ 536M rows")
    withOut(s"$dir/base.fvecs")(concat("base", _))
    withOut(s"$dir/x_binary_vec.u64vecs")(concat("codes", _))
    withOut(s"$dir/factors.fvecs") { out =>
      // ONE record: u32 header = 4·n floats, then the per-row quads
      val hb = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hb.putInt((4L * n).toInt); out.write(hb.array())
      concat("factors", out)
    }
    val k = model.params.numClusters
    val sizes = new Array[Int](k)
    index.groupBy("cluster_id").count().collect()
      .foreach(r => sizes(r.getInt(0)) = r.getLong(1).toInt)
    val offsets = sizes.scanLeft(0)(_ + _)
    withOut(s"$dir/offsets_ids.ivecs") { out =>
      val bb = java.nio.ByteBuffer
        .allocate(4 + offsets.length * 4 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(offsets.length); offsets.foreach(bb.putInt)
      bb.putInt(n.toInt) // header of the id record
      out.write(bb.array())
      concat("ids", out)
    }
    rootFs.delete(new Path(staging), true)
  }

  /** What [[rebalanceIndex]] did: which clusters split into how many,
    * how many rows were re-encoded, and the before/after shape of the
    * size distribution. `movedRows` over the corpus size is the IO
    * fraction — the number that must stay ∝ skew, not ∝ corpus.
    */
  case class RebalanceReport(
      numClustersBefore: Int, numClustersAfter: Int,
      split: Map[Int, Int], movedRows: Long,
      maxSizeBefore: Long, maxSizeAfter: Long)

  /** Scheduled IVF REBALANCE — the lifecycle step after continuous
    * appends ([[appendVectors]], `VecsStream.appendToIndex/maintainIndex`)
    * skew the cluster-size distribution. Probe-bounded search cost is
    * driven by the largest probed clusters, so skew inflates tail
    * latency AND recall at fixed nprobe degrades (one giant cluster
    * soaks up the probe budget while holding vectors that belong in
    * many). The reference never mutates its index (insert/update/delete
    * unchecked, `/root/reference/README.md:18`) so it never needs this;
    * every production IVF store does — this is the vector-index analog
    * of a lakehouse OPTIMIZE/compaction pass.
    *
    * Shape (the one that holds at 100 TB): per-cluster sizes are a
    * numClusters-row aggregate; only clusters with
    * size > maxSizeFactor × mean are touched. Each oversized cluster is
    * re-fit with the deterministic local Lloyd in ROTATED space
    * (orthogonal rotation preserves L2, and the model stores rotated
    * centroids, so the fit output slots in directly) — ONE task per
    * cluster ([[buildHierarchical]]'s second-level shape) over a
    * deterministic hash-capped fit sample. The split cluster's id is
    * REUSED for its first sub-centroid and the rest append at fresh
    * ids, so untouched partitions stay bit-valid (their rows reference
    * unchanged centroid ids). Only the oversized clusters' members are
    * re-encoded (globally nearest over the grown centroid set — they
    * may land in untouched clusters, which is an append, not a
    * rewrite) and only their partition dirs are deleted. IO ∝ oversized
    * mass, never corpus size. Exactness is untouched by construction:
    * rebalance is a pure LAYOUT op — every vector remains present
    * exactly once with a valid (cluster_id, residual) encoding, so
    * full-probe search still equals brute force (the q116 gate) while
    * fixed-nprobe recall improves (the smoke's number).
    *
    * `base` supplies the raw embeddings for re-encoding (codes are
    * lossy — same reason rerank reads the base). Respects a
    * `VecsStream.maintainIndex` tombstone log if present (tombstoned
    * rows of split clusters are dropped here rather than rewritten;
    * the log itself is left for the scheduled compaction — the
    * anti-join is idempotent). Metadata columns riding in the layout
    * beyond the index schema (the filtered-search tier's `label`,
    * `RabitqQuery.filteredTopKFromDisk`) are preserved through the
    * rewrite — carried by an id join over the split members only, so
    * IO stays ∝ skew (the q118 gate).
    *
    * CONTRACT for writers: a rebalance INVALIDATES frozen models —
    * split-cluster ids are re-used with NEW centroids, so a stale
    * [[appendVectors]] caller would encode residuals against a
    * centroid the layout no longer has. Run rebalance between ingest
    * windows and have writers re-[[load]] the model after (the q117
    * lifecycle gate drives exactly this sequence).
    */
  def rebalanceIndex(spark: SparkSession, dir: String, base: DataFrame,
                     maxSizeFactor: Double = 1.5,
                     fitSampleCap: Long = 100000L): RebalanceReport =
    withLayoutLock(dir)(
      rebalanceUnlocked(spark, dir, base, maxSizeFactor, fitSampleCap))

  private[graft] def rebalanceUnlocked(
      spark: SparkSession, dir: String, base: DataFrame,
      maxSizeFactor: Double, fitSampleCap: Long,
      known: Option[(RabitqModel, Map[Int, Long])] = None,
      recovered: Boolean = false): RebalanceReport = {
    import spark.implicits._
    if (!recovered) {
      completeRebalanceSwap(dir) // finish a predecessor's crashed swap first
      // settle crashed uncommitted appends BEFORE reading the layout: a
      // promoted-but-unmarked batch would otherwise be re-encoded into
      // consolidated files (losing its prefix names) and then re-appended
      // whole by the stream's replay — duplicates. `recovered = true` is
      // the maintenanceLoop's contract: the pass already completed the
      // swap and settled appends ONCE under the same held lease.
      graft.streaming.IdempotentSink.settleInProgress(dir,
        Seq(indexDataDir(dir), tombstoneLogDir(dir)))
    }
    // `known` threads the maintenance pass's one measurement through
    // (model + LIVE per-cluster sizes — both invariant across the
    // compaction that may have run in between: the rewrite preserves
    // exactly the live rows with their cluster_id and copies the model
    // sidecars verbatim), replacing this phase's own model load and
    // full-scan size count. The data scan below still resolves the
    // CURRENT generation — only the measurement is reused.
    val gen = indexDataDir(dir)
    val model = known.map(_._1).getOrElse(modelOfGen(spark, dir, gen))
    val index = scanOfGen(spark, dir, gen)
    val live = tombstoneLogOfGenIfAny(dir, LayoutFs.baseName(gen))
      .fold(index)(delDir =>
        index.join(spark.read.parquet(delDir).select("vec_id"),
          Seq("vec_id"), "left_anti"))
    spark.sparkContext.setJobDescription(s"rebalance: sizes $dir")
    val sizes = known.map(_._2).getOrElse {
      // with no tombstone log the live sizes are pure footer metadata
      // (guide §6 — zero data pages), exactly describeIndex's fast path;
      // crashed-append debris present (in-progress batches) or a
      // partitionless layout falls back to the committed scan
      val footer =
        if (tombstoneLogOfGenIfAny(dir, LayoutFs.baseName(gen)).isEmpty &&
            inProgressPrefixes(dir).isEmpty)
          clusterSizesFromFooters(spark, dir, gen)
        else None
      footer.fold(
        live.groupBy("cluster_id").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap)(_.toMap)
    }
    val total = sizes.values.sum
    val k0 = model.centroids.length
    val mean = total.toDouble / k0
    val maxBefore = if (sizes.isEmpty) 0L else sizes.values.max
    // splitK per oversized cluster: enough sub-centroids to bring its
    // expected size back to the mean
    val splitK = sizes.collect {
      case (c, n) if n > maxSizeFactor * mean && math.ceil(n / mean) >= 2 =>
        c -> math.ceil(n / mean).toInt
    }
    if (splitK.isEmpty)
      return RebalanceReport(k0, k0, Map.empty, 0L, maxBefore, maxBefore)

    val splitIds = splitK.keys.toSeq.sorted
    // LEFT join + coverage check, not inner: an inner join would silently
    // DROP any live split-cluster member whose vec_id is missing from the
    // supplied base (a stale/incomplete base) — quiet data loss in the
    // rewrite. A mismatched base must abort the rebalance loudly instead
    // (the Serve.withLabels discipline). The check scans only the split
    // members, so its cost stays ∝ skew.
    // persisted: the split members are read THREE times below (coverage
    // check, fit sample, re-encode) — without the cache each pass re-runs
    // the index⋈base join; with it the join runs once and the two later
    // passes read ∝-skew cached rows (MEMORY_AND_DISK, so an enormous
    // split spills instead of OOMing)
    val members = live.filter(col("cluster_id").isin(splitIds.map(Int.box): _*))
      .select("vec_id", "cluster_id")
      .join(base.select("vec_id", "embedding"), Seq("vec_id"), "left_outer")
      .persist()
    try {
    spark.sparkContext.setJobDescription(s"rebalance: base coverage $dir")
    val missingBase = members.filter(col("embedding").isNull).count()
    require(missingBase == 0L,
      s"$missingBase live index rows in the clusters to split have no vec_id in " +
        "the supplied base — stale base? aborting rebalance instead of dropping them")

    // deterministic per-cluster fit sample: rate_c = cap / size_c as a
    // permille threshold on xxhash64(vec_id) — the buildSampled pattern,
    // but per cluster (sizes are already on the driver)
    val rates = splitK.map { case (c, _) =>
      c -> math.min(1000000L, fitSampleCap * 1000000L / math.max(1L, sizes(c)))
    }
    val rateCol = rates.foldLeft(lit(1000000L)) { case (acc, (c, r)) =>
      when(col("cluster_id") === c, lit(r)).otherwise(acc)
    }
    spark.sparkContext.setJobDescription(s"rebalance: split fit $dir")
    val bRot = spark.sparkContext.broadcast(model.rotation)
    val bSplitK = spark.sparkContext.broadcast(splitK)
    // per-cluster Lloyd over the (id-sorted) rotated fit sample — one
    // task per split cluster, deterministic like buildHierarchical
    val subCentroids: Map[Int, Array[Array[Float]]] = members
      .filter(pmod(xxhash64(col("vec_id"), lit(model.params.seed)),
        lit(1000000L)) < rateCol)
      .select(col("cluster_id"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (c, it) =>
        val pts = it.toArray.sortBy(_._2)
          .map(t => VectorOps.rotate(bRot.value, VectorOps.pad(t._3.toArray, 64)))
        localLloyd(pts, math.min(bSplitK.value(c), pts.length), iters = 10)
          .zipWithIndex.map { case (cent, i) => (c, i, cent.toSeq) }
      }
      .collect()
      .groupBy(_._1)
      .map { case (c, rows) => c -> rows.sortBy(_._2).map(_._3.toArray) }

    // stable ids: split cluster c keeps its id for sub(0); the remaining
    // sub-centroids append at fresh ids. Untouched centroids unchanged.
    val grown = scala.collection.mutable.ArrayBuffer.from(model.centroids)
    subCentroids.toSeq.sortBy(_._1).foreach { case (c, subs) =>
      grown(c) = subs(0)
      grown ++= subs.drop(1)
    }
    val centroids2 = grown.toArray
    val model2 = model.copy(
      params = model.params.copy(numClusters = centroids2.length),
      centroids = centroids2)
    // record the cluster count the query budgets were TUNED against (the
    // first rebalance of this layout): after a split grows the centroid
    // set, a fixed rerank budget loses recall to shortlist displacement,
    // so the disk query paths and the serving tier scale RERANK by
    // numClusters/BUILT_K ([[scaledRerank]] — the why-rerank-not-nprobe
    // sweep lives there; SCALE probe_scale row). Cumulative across
    // repeated rebalances because the FIRST value is kept; save() resets
    // it with the rest of the layout history.
    if (!LayoutFs.exists(s"$dir/BUILT_K"))
      LayoutCommit.atomicWriteFile(s"$dir/BUILT_K", k0.toString)

    // re-encode the members against the grown centroid set. Metadata
    // columns riding in the layout beyond the index schema (e.g. the
    // label the filtered-search tier reads from PushedFilters) must be
    // carried through the rewrite — appendVectors emits only the index
    // schema, so without this join the rewrite would null them on
    // exactly the oversized clusters while untouched partitions keep
    // answering. Joined over the split members only (IO stays ∝ skew).
    val indexSchemaCols =
      Set("vec_id", "cluster_id", "code", "factor_ip", "factor_ppc",
        "error_bound", "cds")
    val extraCols = live.columns.filterNot(indexSchemaCols.contains)
    val reencRaw = appendVectors(spark, model2, members.drop("cluster_id"))
    val reencWide =
      if (extraCols.isEmpty) reencRaw
      else reencRaw.join(
        live.filter(col("cluster_id").isin(splitIds.map(Int.box): _*))
          .select("vec_id", extraCols.toIndexedSeq: _*),
        Seq("vec_id"))
    // The in-place swap is legal only when (a) the commit impl really
    // renames directories atomically AND (b) the active generation is
    // SELF-CONTAINED: a generation assembled by a carry listing cannot
    // be mutated in place — replacing a split cluster's own dir leaves
    // its carried files still listed, resurrecting pre-split rows.
    val activeSelfContained =
      !hasCarry(dir, LayoutFs.baseName(indexDataDir(dir)))
    val (movedRows, reencSizes) =
      if (LayoutCommit.renamesDirAtomically && activeSelfContained) {
        // IN-PLACE swap (IO ∝ skew — only split partition dirs move).
        // Stage EVERYTHING the swap needs DURABLY before touching the
        // live layout: the re-encoded rows (distributed parquet write,
        // IO ∝ skew) AND the new model sidecar (centroids + params
        // change, rotation/bias don't) — recovery must be able to finish
        // the swap with file operations alone, no SparkSession. Then a
        // _COMMIT marker makes the swap the point of no return: before
        // it, a crash rolls BACK (vacuum reclaims the staging as debris,
        // the live layout was never touched); after it, the swap rolls
        // FORWARD ([[completeRebalanceSwap]] — idempotent atomic
        // directory renames, re-driven by the next maintenance pass if
        // this process dies mid-swap). No state ever exists where
        // re-encoded rows are lost.
        val staging = s"$dir/_rebalance_staging"
        spark.sparkContext.setJobDescription(s"rebalance: reencode+swap $dir")
        LayoutFs.deleteRecursively(staging) // pre-commit debris
        // hash-partition on the destination cluster before the partitioned
        // write (the compactRewrite consolidation): ~one part file per
        // destination instead of O(tasks × destinations) fragments riding
        // in the layout until the next compaction
        reencWide.repartition(model2.params.numClusters, col("cluster_id"))
          .write.mode("overwrite").partitionBy("cluster_id")
          .parquet(s"$staging/index")
        val reenc = spark.read.parquet(s"$staging/index")
        // one pass over the staged files: per-cluster sizes, moved = Σ
        // (the former separate count() re-read the same files); the two
        // sidecar writes are independent of it — overlap all three
        val (_, _, sizes2) = inParallel(
          centroids2.zipWithIndex.map { case (cen, i) => (i, cen.toSeq) }.toSeq
            .toDF("cluster_id", "centroid").coalesce(1)
            .write.mode("overwrite").parquet(s"$staging/centroids"),
          Seq((model2.params.dim, model2.params.padDim, model2.params.numClusters,
               model2.params.seed, model2.bias.toSeq))
            .toDF("dim", "pad_dim", "num_clusters", "seed", "bias").coalesce(1)
            .write.mode("overwrite").parquet(s"$staging/params"),
          reenc.groupBy("cluster_id").count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap)
        val moved = sizes2.values.sum
        // the marker names the SPLIT clusters (their dirs are replaced
        // wholesale; every other destination merges) and is itself staged +
        // atomically renamed — a torn marker can never misclassify a dir
        LayoutCommit.atomicWriteFile(s"$staging/_COMMIT",
          splitIds.mkString("\n"))
        completeRebalanceSwap(dir)
        (moved, sizes2)
      } else {
        // the active CommitOps has NO atomic directory rename (an object
        // store) — replacing live partition dirs in place would expose
        // half-populated clusters to racing readers (the contract spec
        // executes exactly that tear), so take compaction's generation-
        // versioned shape instead: everything lands in an unreferenced
        // `index-vN`, one atomic MANIFEST PUT publishes it
        rebalanceGenerationSwap(spark, dir, model2, reencWide, splitIds)
      }

    // after-sizes without re-reading the layout: untouched sizes +
    // re-encoded destinations
    val after = (sizes -- splitIds) ++
      reencSizes.map { case (c, n) => c -> ((sizes -- splitIds).getOrElse(c, 0L) + n) }
    RebalanceReport(k0, centroids2.length, splitK, movedRows,
      maxBefore, if (after.isEmpty) 0L else after.values.max)
    } finally members.unpersist()
  }

  /** The OBJECT-STORE rebalance swap — taken when the active
    * [[CommitOps]] declares no atomic directory rename (`CondPutCommit`;
    * a store where a "dir rename" is per-object copy+delete that racing
    * readers see half-populated). Compaction's generation-versioned
    * shape: build the ENTIRE next generation unreferenced, publish with
    * ONE atomic MANIFEST PUT, retire the old generation into the
    * retention window. Nothing reader-visible mutates in place.
    *
    *  1. Re-encoded split members: distributed parquet write straight
    *     into `index-v{N+1}` (IO ∝ skew; `overwrite` makes a retry
    *     idempotent, and a crashed attempt's partial generation is
    *     unreferenced debris vacuum reclaims).
    *  2. Untouched clusters: carried BY REFERENCE — the new
    *     generation's `_CARRY` listing ([[readCarry]]) names their
    *     immutable part files where they already live, one metadata
    *     line per file, written with one atomic PUT before the publish.
    *     NOTHING corpus-proportional moves: the swap's IO is the
    *     re-encoded split members (∝ skew) plus the listing bytes.
    *     (Rounds ≤18 carried by per-file copy — server-side CopyObject,
    *     but still IO and request volume ∝ CORPUS per rebalance; the
    *     listing is the Iceberg-manifest shape that gets back to
    *     ∝ skew, and the carry-∝-skew spec pins it.) The old generation
    *     stays intact both for its retention-window readers AND as the
    *     physical home of the carried files; vacuum refcounts them.
    *  3. The uncompacted tombstone log is carried the same way — logs
    *     are per generation, and the carried untouched rows still
    *     include tombstoned members (the re-encode dropped them only
    *     for split clusters); the anti-join is idempotent, so split
    *     members' ids matching nothing is harmless.
    *  4. The GROWN model rides INSIDE the generation (`_centroids` /
    *     `_params` — underscore dirs are invisible to the data scan):
    *     the layout-root sidecar pair cannot be replaced atomically
    *     without a directory rename, so the MANIFEST PUT flips data and
    *     model TOGETHER. [[load]] prefers generation-local sidecars;
    *     `VecsStream.compactRewrite` carries them into every later
    *     generation.
    *  5. Publish: [[markRetired]] (the retention clock) + one atomic
    *     MANIFEST PUT — `VecsStream.compactSwap`'s exact sequence.
    *
    * Crash anywhere before 5: readers keep resolving the old
    * generation; the partial next generation is unreferenced debris.
    * Crash after: done — a replayed rebalance finds balanced sizes and
    * no-ops. Gated end-to-end by q123 and the contract spec's
    * generation-rebalance leg; swept by the kill sweep's CondPut order.
    */
  private[graft] def rebalanceGenerationSwap(
      spark: SparkSession, dir: String, model2: RabitqModel,
      reencWide: DataFrame, splitIds: Seq[Int]): (Long, Map[Int, Long]) = {
    import spark.implicits._
    val curName = LayoutFs.baseName(indexDataDir(dir))
    val curV = if (curName == "index") 1 else curName.stripPrefix("index-v").toInt
    val nextName = s"index-v${curV + 1}"
    val nextDir = s"$dir/$nextName"
    reencWide.repartition(model2.params.numClusters, col("cluster_id"))
      .write.mode("overwrite").partitionBy("cluster_id")
      .parquet(nextDir)
    val reenc = spark.read.parquet(nextDir)
    val movedRows = reenc.count()
    val reencSizes = reenc.groupBy("cluster_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // untouched clusters: by reference (one listing line per file — the
    // seam-primitive writes are kill-sweep points and, deployed, atomic
    // PUTs); the per-cluster file enumeration fans out as Spark tasks
    // and the listing shards past carryShardTarget; the tombstone log
    // goes by copy (delete-volume-sized)
    writeCarryListing(nextDir,
      buildCarryEntriesDistributed(spark, dir, curName, splitIds.toSet))
    tombstoneLogOfGenIfAny(dir, curName).foreach(logDir =>
      copyParquetFiles(logDir, logDirOfGen(dir, nextName)))
    model2.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster_id", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$nextDir/_centroids")
    Seq((model2.params.dim, model2.params.padDim, model2.params.numClusters,
         model2.params.seed, model2.bias.toSeq))
      .toDF("dim", "pad_dim", "num_clusters", "seed", "bias").coalesce(1)
      .write.mode("overwrite").parquet(s"$nextDir/_params")
    publishGeneration(dir, curName, nextName)
    (movedRows, reencSizes)
  }

  /** Copy a directory's parquet data files into `tgt` (flat), replacing
    * on retry, in parallel — used only for DELETE-VOLUME- and
    * MODEL-sized payloads (tombstone-log carry, sidecar tables, staged
    * split dirs of a roll-forward conversion); the corpus-sized
    * untouched-cluster carry rides in the `_CARRY` listing instead
    * ([[buildCarryListing]]) and never copies. Staging, not a commit
    * primitive: nothing resolves the destination until the MANIFEST
    * publish, and on a real object store each copy is a server-side
    * CopyObject. A DEDICATED bounded pool, not the JVM-global common
    * ForkJoinPool — blocking file IO on the common pool from the Spark
    * driver can stall every other parallel-stream user in the JVM.
    */
  private[graft] def copyParquetFiles(src: String, tgt: String): Unit = {
    val files = LayoutFs.list(src)
      .filter(f => !f.isDir && f.name.endsWith(".parquet"))
    if (files.isEmpty) return
    LayoutFs.mkdirs(tgt)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.length))
    try {
      val tasks = files.map { f =>
        new java.util.concurrent.Callable[Unit] {
          def call(): Unit = LayoutFs.copyFile(f.path, s"$tgt/${f.name}")
        }
      }
      pool.invokeAll(java.util.Arrays.asList(tasks: _*))
        .forEach(_.get()) // surface the first copy failure
    } finally pool.shutdown()
  }

  /** Atomically publish a fully-built generation: retire `curName` (the
    * retention clock starts) and point the MANIFEST at `nextName` — the
    * ONE reader-visible step of every generation swap, shared by
    * compaction (`VecsStream.compactSwap`) and the object-store
    * rebalance so the two publishes can never diverge.
    */
  private[graft] def publishGeneration(dir: String, curName: String,
                                       nextName: String): Unit = {
    markRetired(dir, curName)
    LayoutCommit.atomicWriteFile(s"$dir/MANIFEST", nextName)
  }

  /** Finish a COMMITTED rebalance swap — idempotent, file operations
    * only, no SparkSession. No-op unless `_rebalance_staging/_COMMIT`
    * exists (i.e. [[rebalanceUnlocked]] finished staging the re-encoded
    * rows and the new sidecar and declared the point of no return).
    * The `_COMMIT` marker lists the SPLIT cluster ids: their partition
    * dirs are REPLACED wholesale (their rows were all re-encoded —
    * atomically rename the old dir aside, rename the staged dir in; a
    * split cluster every member re-assigned AWAY from has no staged dir
    * and its old dir is simply retired);
    * every other staged destination MERGES its files into the existing
    * dir (a re-encoded member can land in ANY cluster of the grown
    * centroid set, and untouched clusters keep their rows — globally
    * unique part names make the file moves idempotent under retry).
    * Sidecar: copy the staged tables to a temp sibling, then
    * atomic-rename over centroids/params (the staged copy survives
    * until final cleanup, so a crash at ANY point re-drives to the same
    * end state). Called at the top of every maintenance entry point
    * (vacuum runs first in the loop), so a swap orphaned by a crash
    * completes on the next pass — the staged rows can never be
    * stranded or reclaimed as debris. Readers racing a mid-swap crash
    * see a consistent-but-incomplete index (a split cluster's dir
    * missing for the duration of two renames) — never a torn file,
    * never resurrections.
    */
  private[graft] def completeRebalanceSwap(dir: String): Unit = {
    val staging = s"$dir/_rebalance_staging"
    val commitF = s"$staging/_COMMIT"
    if (!LayoutFs.exists(commitF)) return
    val splitIds = LayoutFs.readString(commitF).split('\n')
      .map(_.trim).filter(_.nonEmpty).map(_.toInt).toSet
    if (!LayoutCommit.renamesDirAtomically ||
        hasCarry(dir, LayoutFs.baseName(indexDataDir(dir)))) {
      // a committed IN-PLACE staging being rolled forward either under
      // a commit impl with no atomic dir rename (a deployment migrated
      // to the object-store shape with a crashed swap in tow) or onto
      // an active generation assembled by a CARRY listing (whose
      // clusters cannot be replaced by dir rename — the listed files
      // would resurface): driving the renames below would expose racing
      // readers to half-populated LIVE cluster dirs or resurrect
      // carried rows. The staging holds everything the swap needs, so
      // CONVERT it to the generation-versioned publish instead — file
      // operations only, idempotent, and the layout the readers resolve
      // never mutates in place.
      completeRebalanceSwapAsGeneration(dir, splitIds, staging)
      return
    }
    val dataDir = indexDataDir(dir)
    val stagedDirs = LayoutFs.list(s"$staging/index")
      .filter(f => f.isDir && f.name.startsWith("cluster_id="))
      .map(f => f.name -> f.path).toMap
    // every SPLIT cluster's old dir must go — all its rows were
    // re-encoded, wherever they landed. A split cluster can receive
    // ZERO staged rows (every member re-assigned to a sibling sub or a
    // neighbor), so iterate the marker's ids, not the staged dirs: the
    // old dir is moved aside either way (the aside doubles as the
    // processed-marker that makes a crash-retry skip this id instead of
    // moving freshly-swapped rows aside).
    splitIds.foreach { cid =>
      val name = s"cluster_id=$cid"
      val tgt = s"$dataDir/$name"
      val aside = s"$dataDir/.rebalance-old-$name"
      stagedDirs.get(name) match {
        case Some(sd) =>
          if (LayoutFs.exists(tgt)) {
            // tgt still holds the OLD rows (the staged dir is only
            // renamed away after the old one is moved aside)
            LayoutFs.deleteRecursively(aside)
            LayoutCommit.atomicRenameDir(tgt, aside)
          }
          LayoutCommit.atomicRenameDir(sd, tgt)
        case None =>
          if (!LayoutFs.exists(aside) && LayoutFs.exists(tgt))
            LayoutCommit.atomicRenameDir(tgt, aside)
      }
    }
    // every other staged destination MERGES its files into the existing
    // dir (idempotent: moves of globally-unique part names)
    stagedDirs.foreach { case (name, sd) =>
      if (!splitIds.contains(name.stripPrefix("cluster_id=").toInt)) {
        val tgt = s"$dataDir/$name"
        LayoutFs.mkdirs(tgt)
        LayoutFs.list(sd)
          .filter(f => !f.isDir && f.name.endsWith(".parquet"))
          .foreach(f => LayoutCommit.atomicMoveFile(f.path, s"$tgt/${f.name}"))
        LayoutFs.deleteRecursively(sd)
      }
    }
    for (t <- Seq("centroids", "params")) {
      val tmp = s"$dir/.rebalance-new-$t"
      LayoutFs.deleteRecursively(tmp)
      LayoutFs.copyDirectory(s"$staging/$t", tmp)
      LayoutFs.deleteRecursively(s"$dir/$t")
      LayoutCommit.atomicRenameDir(tmp, s"$dir/$t")
      // a generation-LOCAL sidecar (left by an earlier generation-
      // versioned rebalance of this layout on an object-store deployment)
      // SHADOWS the root pair just installed in [[modelSidecarDir]] —
      // refresh it with the same staged copy, the same dance (idempotent
      // under crash-retry: the staged source survives until the staging
      // delete below)
      // keyed on EITHER the sidecar or its tmp: a crash between the
      // deleteDirectory(genLocal) and the rename below would otherwise
      // make the retry SKIP recreating it — the generation would end
      // with a mixed gen-local/root pair (old params against new
      // centroids). The tmp's presence is the evidence of exactly that
      // half-refresh, so it re-drives the dance instead.
      val genLocal = s"$dataDir/_$t"
      val gtmp = s"$dataDir/.rebalance-new-$t"
      if (LayoutFs.isDirectory(genLocal) || LayoutFs.isDirectory(gtmp)) {
        LayoutFs.deleteRecursively(gtmp)
        LayoutFs.copyDirectory(s"$staging/$t", gtmp)
        LayoutFs.deleteRecursively(genLocal)
        LayoutCommit.atomicRenameDir(gtmp, genLocal)
      }
    }
    // ORDER MATTERS: delete the staging (and with it the _COMMIT marker
    // that makes retries re-drive the swap) BEFORE the asides — a retry
    // that found no _COMMIT must never re-interpret swapped-in dirs,
    // and asides stranded by a crash right here are reclaimed by
    // vacuum's debris sweep (no _COMMIT → debris)
    LayoutFs.deleteRecursively(staging)
    LayoutFs.list(dataDir)
      .filter(f => f.isDir && f.name.startsWith(".rebalance-old-"))
      .foreach(f => LayoutFs.deleteRecursively(f.path))
  }

  /** [[completeRebalanceSwap]]'s object-store conversion: finish a
    * committed in-place staging as a GENERATION publish — the next
    * generation built unreferenced from the staged rows, the untouched
    * clusters carried BY REFERENCE in its `_CARRY` listing, the log and
    * the staged sidecars riding inside it, then the shared
    * [[publishGeneration]] atomic PUT. Idempotent at every crash point:
    * BEFORE the publish, the partial generation is unreferenced
    * (rebuilt from scratch on retry — the staging and its `_COMMIT`
    * survive until after the publish); the publish is preceded by a
    * `_PUBLISHED-<gen>` marker inside the staging, so a retry AFTER the
    * publish recognizes the conversion as COMPLETE (the MANIFEST — or
    * the retirement history — already shows the recorded generation)
    * and only deletes the staging. Without the marker, a crash in the
    * publish→cleanup window would make the retry re-run the conversion
    * AGAINST the freshly published generation: split-cluster dirs
    * rebuilt from the stale staged content would silently drop any
    * batch an appender committed into a split-id cluster in the
    * interim, and every such retry would mint a pointless extra
    * generation. Exercised by the contract spec's migration leg and the
    * kill sweep (the marker write is a seam primitive — a crash point).
    */
  private def completeRebalanceSwapAsGeneration(
      dir: String, splitIds: Set[Int], staging: String): Unit = {
    // marker names are matched EXACTLY (and every match evaluated, not
    // the first list entry): a crashed atomicWriteFile leaves sibling
    // tmp debris ALSO prefixed `_PUBLISHED-` (`<name>.tmp` /
    // `<name>.tmp.<seq>`), and a prefix-first pick could read a garbage
    // generation name from the tmp, miss the REAL marker next to it,
    // and re-drive an already-published conversion — minting a spurious
    // generation from stale staged content
    val markerName = "_PUBLISHED-index(-v\\d+)?".r
    val entries = LayoutFs.list(staging).filter(!_.isDir)
    val published = entries.filter(f => markerName.pattern
      .matcher(f.name).matches())
    val activeNow = LayoutFs.baseName(indexDataDir(dir))
    if (published.exists { p =>
      val recorded = p.name.stripPrefix("_PUBLISHED-")
      activeNow == recorded || LayoutFs.isFile(s"$dir/_retired/$recorded")
    }) {
      // a recorded generation was published (it is active, or was and
      // has since been superseded): finishing = cleanup only
      LayoutFs.deleteRecursively(staging)
      return
    }
    // recorded but never published (crash between marker and publish):
    // drop the stale markers — and any tmp debris a crashed marker
    // write stranded — and re-drive against the CURRENT active
    // generation
    entries.filter(_.name.startsWith("_PUBLISHED-"))
      .foreach(f => LayoutFs.delete(f.path))
    val curName = LayoutFs.baseName(indexDataDir(dir))
    // settle crashed promoted-but-UNMARKED appends against the SOURCE
    // generation BEFORE building the carry listing: such a batch's
    // files physically live in curName's dirs, and carrying them BY
    // REFERENCE would put them beyond the reach of the replay's sweep
    // (settle/sweep only walk the new generation's own dirs) — the
    // replay re-promotes the batch and the union scan serves every row
    // twice, permanently. The pre-carry shape was safe by accident (the
    // conversion physically copied untouched files where sweepPrefix
    // found them); the listing shape must settle first. Inductively the
    // INHERITED carry entries are clean: every conversion settles
    // before listing, so an unmarked batch's files never enter one.
    // All callers hold the layout lease (completeRebalanceSwap's
    // contract), so no live appender is mid-promote.
    graft.streaming.IdempotentSink.settleInProgress(dir,
      Seq(s"$dir/$curName", logDirOfGen(dir, curName)))
    val curV = if (curName == "index") 1 else curName.stripPrefix("index-v").toInt
    val nextName = s"index-v${curV + 1}"
    val nextDir = s"$dir/$nextName"
    // a previous crashed attempt's partial generation was never
    // referenced — rebuild it from scratch
    LayoutFs.deleteRecursively(nextDir)
    LayoutFs.list(s"$staging/index")
      .filter(f => f.isDir && f.name.startsWith("cluster_id="))
      .foreach(sd => copyParquetFiles(sd.path, s"$nextDir/${sd.name}"))
    writeCarryListing(nextDir, buildCarryListing(dir, curName, splitIds))
    tombstoneLogOfGenIfAny(dir, curName).foreach(logDir =>
      copyParquetFiles(logDir, logDirOfGen(dir, nextName)))
    for (t <- Seq("centroids", "params"))
      copyParquetFiles(s"$staging/$t", s"$nextDir/_$t")
    LayoutCommit.atomicWriteFile(s"$staging/_PUBLISHED-$nextName", nextName)
    publishGeneration(dir, curName, nextName)
    LayoutFs.deleteRecursively(staging)
  }

  /** Per-cluster row counts from parquet FOOTER metadata only — no data
    * pages touched. One lightweight task per file, distributed (at
    * corpus scale a partitioned layout holds thousands of files; the
    * driver only ever sees the numClusters-row reduction). Returns None
    * when the dir has no `cluster_id=` partition dirs (caller falls
    * back to the scan).
    */
  private[operators] def clusterSizesFromFooters(
      spark: SparkSession, dir: String,
      dataDir: String): Option[Array[(Int, Long)]] = {
    // list AND address through the Hadoop FileSystem API so the paths
    // shipped to executor tasks are FULLY QUALIFIED (scheme+authority) —
    // a driver-local java.io.File listing would ship bare local paths
    // that only resolve when executors share the driver's filesystem
    val hconf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(dataDir)
    val fs = rootPath.getFileSystem(hconf)
    if (!(fs.exists(rootPath) && fs.getFileStatus(rootPath).isDirectory))
      return None
    // files carried BY REFERENCE into this generation count exactly like
    // its own: the listing names them directly (no directory walk of the
    // source generations — the resolution is metadata-bounded)
    val carried: Seq[(Int, String)] =
      readCarry(dir, rootPath.getName).map(e => (clusterOfCarryEntry(e),
        fs.makeQualified(new org.apache.hadoop.fs.Path(s"$dir/$e")).toString))
    val parts = fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cluster_id="))
    if (parts.isEmpty && carried.isEmpty) return None
    val files: Seq[(Int, String)] = parts.toSeq.flatMap { d =>
      val c = d.getPath.getName.stripPrefix("cluster_id=").toInt
      fs.listStatus(d.getPath)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => (c, fs.makeQualified(s.getPath).toString))
    } ++ carried
    if (files.isEmpty) return Some(Array.empty)
    // executor tasks must see the DRIVER's hadoop conf (s3a credentials,
    // endpoints), not a bare `new Configuration()` of classpath defaults
    val bConf = org.apache.spark.graft.SerHadoopConf
      .broadcast(spark.sparkContext, hconf)
    val sizes = spark.sparkContext
      .parallelize(files, math.max(1, math.min(64, files.length)))
      .mapPartitions { it =>
        val conf = bConf.value.conf
        it.map { case (c, p) =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try (c, r.getRecordCount) finally r.close()
        }
      }
      .reduceByKey(_ + _)
      .collect()
    Some(sizes)
  }

  /** Lease file serializing the SCHEDULED maintenance mutators
    * ([[rebalanceIndex]], [[vacuumIndex]], `VecsStream.compactIndex`,
    * and one whole `VecsStream.maintenanceLoop` pass) against a
    * double-fired scheduler: two maintenance ops interleaving on the
    * same layout can be destructive (a rebalance deleting partition
    * dirs a compaction is mid-rewrite on; a vacuum reclaiming a
    * generation a swap is about to reference), and at fleet scale
    * cron/airflow retries DO double-fire. Acquired atomically
    * (`Files.createFile`), released in `finally`; a lease older than
    * `staleMs` is broken (the ops themselves are each crash-safe —
    * versioned rewrite, staged promote, idempotent anti-join — so a
    * crashed holder must not wedge maintenance forever; the lease only
    * serializes CONCURRENT mutators). READERS never take it: the
    * MANIFEST protocol already gives every reader
    * old-or-new-never-partial. Continuous-ingest APPENDS take it only
    * around their metadata-cheap PROMOTE step
    * (`streaming.IdempotentSink.appendBatch` — the staged Spark write
    * stays outside), which makes append-vs-maintenance exclusion
    * MECHANICAL instead of a scheduling convention; running maintenance
    * between ingest windows remains the documented q117 contract for
    * MODEL freshness (a rebalance invalidates frozen writer models
    * regardless of any lock).
    *
    * Crash-safety of the lease itself: the lock body carries a HOLDER
    * TOKEN. A stale lease (older than `staleMs`) is broken by an
    * exclusive-create CLAIM keyed to the measured mtime — exactly one
    * breaker per stale-lock instance is elected, re-confirms the lock is
    * still that instance, and only then renames it aside; the subsequent
    * exclusive-create picks exactly one new holder. (Neither the old
    * delete/re-acquire nor a bare rename-aside is safe: a slow breaker
    * that measured the stale mtime can delete — or rename away — the
    * FRESH lock a faster breaker's successor created, vacating the path
    * for a second concurrent mutator; the racing-breakers spec catches
    * both.) Release verifies the token, so a holder whose lease was
    * broken mid-run (a pass outliving `staleMs`) cannot remove the new
    * holder's lock on its way out. `waitMs` > 0 polls the acquire
    * (100ms) before giving up — the appenders' promote uses it to ride
    * out a maintenance pass instead of failing the batch.
    */
  private[graft] def withLayoutLock[A](
      dir: String, staleMs: Long = 60L * 60 * 1000,
      waitMs: Long = 0L)(body: => A): A = {
    val lock = s"$dir/_maintenance.lock"
    val token = java.util.UUID.randomUUID().toString
    def acquire(): Boolean = LayoutCommit.exclusiveCreate(lock, token)
    def tryBreakStale(): Unit = {
      // lastModified() == 0 means the lock vanished (holder released or a
      // racing breaker won) — nothing to break, just retry the acquire
      val lm = LayoutFs.lastModified(lock)
      if (lm == 0L || System.currentTimeMillis() - lm < staleMs) return
      // ELECT exactly one breaker per stale-lock INSTANCE via an
      // exclusive-create claim keyed to the measured mtime: a naive
      // rename-aside race lets a slow breaker (which measured the OLD
      // stale mtime) rename away the FRESH lock a faster breaker's
      // successor just created — a second mutator then acquires the
      // vacated path (caught by the racing-breakers spec). With the
      // claim, only the winner renames, and only after re-confirming the
      // lock is still the instance it measured (same mtime — fresh and
      // stale differ by ≥ staleMs, so the compare is unambiguous).
      // GC claims a crashed breaker stranded. The age must sit WELL
      // above plausible JVM pause lengths (GC/VM stalls), not just above
      // the break's own microseconds: reclaiming a LIVE breaker's claim
      // re-elects a second breaker for the same stale instance, and the
      // resumed first could then rename away the fresh lock the second's
      // successor created. A stranded claim only DELAYS breaking (this
      // instance stays wedged until the GC age passes) — it can never
      // corrupt — so err long: 5 minutes.
      val claimGcMs = 5L * 60 * 1000
      LayoutFs.list(dir)
        .filter(f => f.name.startsWith("_maintenance.lock.break-") &&
          System.currentTimeMillis() - f.mtime > claimGcMs)
        .foreach(f => LayoutFs.delete(f.path))
      val claim = s"$dir/_maintenance.lock.break-$lm"
      if (!LayoutCommit.exclusiveCreate(claim, token)) return // not elected
      try {
        if (LayoutFs.lastModified(lock) == lm) {
          // belt to the GC age's suspenders: re-verify the claim still
          // exists AND still carries OUR token immediately before the
          // rename — a breaker paused past the GC age between election
          // and here has lost its claim to a newer breaker and must
          // stand down (renaming now could vacate a fresh lock)
          val claimIsOurs = try {
            LayoutFs.readString(claim) == token
          } catch { case _: java.io.IOException => false }
          if (claimIsOurs) {
            val aside = s"$dir/_maintenance.lock.broken-$token"
            try {
              LayoutCommit.atomicRenameDir(lock, aside)
              LayoutFs.delete(aside)
            } catch { case _: java.nio.file.NoSuchFileException => () }
          }
        }
      } finally LayoutFs.delete(claim)
    }
    val deadline = System.currentTimeMillis() + waitMs
    var held = acquire()
    while (!held && System.currentTimeMillis() < deadline) {
      tryBreakStale()
      held = acquire()
      if (!held) Thread.sleep(100)
    }
    if (!held) { tryBreakStale(); held = acquire() }
    if (!held)
      throw new IllegalStateException(
        s"maintenance already in flight on $dir (_maintenance.lock held; " +
          s"a lease breaks after ${staleMs / 1000}s)")
    try body finally {
      // release ONLY our own lease: if a breaker replaced it while we ran
      // (we outlived staleMs), the lock now carries the new holder's token
      try {
        if (LayoutFs.readString(lock) == token) LayoutFs.delete(lock)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** What [[vacuumIndex]] removed. */
  case class VacuumReport(removed: Seq[String], reclaimedBytes: Long)

  /** Default retention window for superseded generations and their
    * folded logs: long enough that no in-flight scan straddles it.
    */
  val DefaultRetainMs: Long = 24L * 60 * 60 * 1000

  /** Garbage-collect a saved layout: remove what the crash-safe
    * lifecycle protocols leave behind, split into two classes.
    *
    * '''Retention-windowed''' (the Delta VACUUM pattern): a compaction
    * swap RETIRES the old generation instead of deleting it inline
    * (`VecsStream.compactSwap` — an in-flight reader that resolved the
    * old generation pre-swap keeps scanning it to completion), so a
    * retired generation and its folded tombstone log are reclaimed only
    * once their `_retired/<gen>` marker is older than `retainMs`. Batch
    * staging under `_staging` is age-gated the same way (FS state alone
    * cannot distinguish a crashed batch's staging from a LIVE batch
    * mid-write — the promote takes the lease, the staging write
    * deliberately does not).
    *
    * '''Immediate debris''' (never reader-visible): an UNRETIRED
    * non-active generation (a compaction that rewrote but never swapped
    * — no reader ever resolved it), a dead `_rebalance_staging` (no
    * `_COMMIT` — pre-point-of-no-return), `.rebalance-old-` asides and
    * `.rebalance-new-` sidecar temps (stranded only by a crash inside
    * the swap's final cleanup, after the end state is fully in place;
    * asides are NOT a reader-visibility mechanism — the swap renames
    * dirs, so pre-swap paths are gone either way), a torn
    * `MANIFEST.tmp`, stranded lease-break asides, and `.inprogress`
    * sentinels whose commit marker exists (the batch committed; the
    * sentinel just makes every later inspection read as a crashed
    * attempt).
    *
    * Never touches the ACTIVE generation or its log (folding is
    * compaction's job), the model sidecars, or the `_commits` markers (a
    * restarted stream needs its replay evidence), or the
    * `_maintenance.lock` lease (held by the caller — [[withLayoutLock]]
    * breaks stale ones itself). Mutual exclusion with the other
    * scheduled maintenance ops is ENFORCED by the lease, not left to
    * the scheduler. Pure filesystem metadata — no jobs.
    */
  def vacuumIndex(dir: String, retainMs: Long = DefaultRetainMs): VacuumReport =
    withLayoutLock(dir)(vacuumUnlocked(dir, retainMs))

  private[graft] def vacuumUnlocked(
      dir: String, retainMs: Long = DefaultRetainMs): VacuumReport = {
    // a COMMITTED rebalance swap is recovery state, not debris — roll
    // it forward before reclaiming anything (its staging holds the only
    // copy of the re-encoded rows until the renames land)
    completeRebalanceSwap(dir)
    val now = System.currentTimeMillis()
    val active = LayoutFs.baseName(indexDataDir(dir))
    val markers = LayoutFs.list(s"$dir/_retired")
      .filter(!_.isDir).map(f => f.name -> f).toMap
    def expired(gen: String): Boolean =
      markers.get(gen).exists(m => now - m.mtime >= retainMs)
    val genDirs = LayoutFs.list(dir).filter(f => f.isDir &&
      (f.name == "index" || f.name.matches("index-v\\d+")))
    // REFCOUNT across generations (the carry-listing shape): a file a
    // RETAINED generation's `_CARRY` still references — the active one,
    // or a retired one inside its retention window (its in-flight
    // readers resolved that listing) — physically lives in an OLDER
    // generation dir and must survive that dir's retirement. File-level
    // refcount replaces dir-granularity reclamation: an expired retired
    // generation keeps exactly its referenced files (reclaimed the pass
    // after a compaction rewrites them into a self-contained
    // generation); everything else in it goes now.
    val retainedGens: Seq[String] = active +: genDirs.map(_.name)
      .filter(g => g != active && markers.contains(g) && !expired(g))
    val referenced: Set[String] =
      retainedGens.flatMap(g => readCarry(dir, g)).toSet
    def referencedUnder(gen: String): Boolean =
      referenced.exists(_.startsWith(gen + "/"))
    // superseded generations: reclaim (with their folded log + marker)
    // only past the retention window; unretired non-active generations
    // are unswapped rewrite debris — no reader ever resolved them (and
    // no listing can reference a never-published generation's files,
    // but guard anyway)
    val retiredExpired = genDirs.filter(g => g.name != active &&
      markers.contains(g.name) && expired(g.name))
    val (partialKeep, retiredVictims) =
      retiredExpired.partition(g => referencedUnder(g.name))
    val debrisGens = genDirs.filter(g => g.name != active &&
      !markers.contains(g.name) && !referencedUnder(g.name))
    // expired retired generations lose their LOG either way: readers of
    // that generation-as-a-generation are gone past the window, and any
    // successor carried the log by copy at swap time
    val logVictims = (retiredExpired ++ debrisGens)
      .map(g => logDirOfGen(dir, g.name)).filter(LayoutFs.isDirectory)
    // orphan markers (their generation already reclaimed — e.g. a crash
    // mid-vacuum between the gen delete and the marker delete): reclaim
    // the log once expired, then the marker
    val orphanMarkers = markers.filter { case (gen, _) =>
      !genDirs.exists(_.name == gen) && gen != active }
    val orphanLogVictims = orphanMarkers.keys.filter(expired).toSeq
      .map(g => logDirOfGen(dir, g)).filter(LayoutFs.isDirectory)
    val markerVictims = (retiredVictims.map(_.name) ++
      orphanMarkers.keys.filter(expired)).toSeq.distinct
      .flatMap(g => markers.get(g).map(_.path))
    // age-gated batch staging (live batches never straddle the window)
    val stagingVictims = LayoutFs.list(s"$dir/_staging")
      .filter(f => f.isDir && now - f.mtime >= retainMs).map(_.path)
    val asideDebris = LayoutFs.list(s"$dir/$active")
      .filter(f => f.isDir && (f.name.startsWith(".rebalance-old-") ||
        f.name.startsWith(".rebalance-new-"))).map(_.path)
    val dirVictims = retiredVictims.map(_.path) ++ debrisGens.map(_.path) ++
      logVictims ++ orphanLogVictims ++ stagingVictims ++ asideDebris ++
      LayoutFs.list(dir).filter(f => f.isDir &&
        (f.name == "_rebalance_staging" ||
          f.name.startsWith(".rebalance-new-"))).map(_.path)
    // committed batches' stranded in-progress sentinels
    val staleSentinels = LayoutFs.list(s"$dir/_commits")
      .filter(_.isDir).flatMap(q => LayoutFs.list(q.path))
      .filter(f => !f.isDir && f.name.endsWith(".inprogress") &&
        LayoutFs.exists(f.path.stripSuffix(".inprogress")))
      .map(_.path)
    val fileVictims = LayoutFs.list(dir).filter(f => !f.isDir &&
      (f.name == "MANIFEST.tmp" ||
        f.name.startsWith("_maintenance.lock.broken-") ||
        f.name.startsWith("_maintenance.lock.break-"))).map(_.path) ++
      LayoutFs.list(s"$dir/_retired")
        .filter(f => !f.isDir && f.name.endsWith(".tmp")).map(_.path) ++
      staleSentinels ++ markerVictims
    val sized = dirVictims.map(v => v -> LayoutFs.sizeOfDirectory(v)) ++
      fileVictims.map(v => v -> LayoutFs.length(v))
    dirVictims.foreach(LayoutFs.deleteRecursively)
    fileVictims.foreach(LayoutFs.delete)
    // PARTIAL reclaim of expired retired generations that still back a
    // retained listing: every file NOT referenced goes now (stale split
    // clusters, sidecars, the generation's own `_CARRY` — it stopped
    // being load-bearing when its last in-window reader left; the
    // retained successors' listings reference the survivors DIRECTLY,
    // flattened at swap time). The `_retired` marker stays so later
    // passes revisit the dir and finish it once a compaction drops the
    // last reference.
    val partialSized = partialKeep.map { g =>
      var bytes = 0L; var n = 0
      // file identity is judged by the CONSTRUCTED root-relative path
      // (gen/cluster_id=N/file), the exact form the `_CARRY` entries
      // use — never by stripping a prefix off the listing's returned
      // path, whose qualification (scheme/authority) the filesystem
      // impl is free to canonicalize differently from the caller's dir
      // string (on HDFS that mismatch would read every carried file as
      // unreferenced and delete live data)
      def walk(f: String, rel: String): Boolean = { // true ⇒ subtree empty
        var empty = true
        LayoutFs.list(f).foreach { k =>
          if (k.isDir) {
            if (walk(k.path, s"$rel/${k.name}")) LayoutFs.delete(k.path)
            else empty = false
          } else if (referenced.contains(s"$rel/${k.name}") ||
              k.name == "_RECLAIMED")
            empty = false
          else { bytes += k.length; n += 1; LayoutFs.delete(k.path) }
        }
        empty
      }
      walk(g.path, g.name)
      // the generation is no longer resolvable AS a generation (its own
      // listing and sidecars are gone) — mark it so [[loadAt]] refuses
      // it instead of serving a partial snapshot; written AFTER the walk
      // (idempotent under crash-retry: the re-walk skips the marker)
      if (!LayoutFs.isFile(s"${g.path}/_RECLAIMED"))
        LayoutCommit.atomicWriteFile(s"${g.path}/_RECLAIMED",
          System.currentTimeMillis().toString)
      s"${g.path} (partial: $n unreferenced files — " +
        "carry-listed survivors retained)" -> bytes
    }
    VacuumReport((sized ++ partialSized).map(_._1).toIndexedSeq,
      (sized ++ partialSized).map(_._2).sum)
  }

  /** Scale a RERANK budget tuned against the ORIGINAL cluster count to a
    * layout whose centroid set has GROWN under [[rebalanceIndex]]:
    * rerank′ = ceil(rerank · (k′/k0)²), with k0 from the `BUILT_K`
    * sidecar the first rebalance writes (a never-rebalanced layout
    * scales by 1). Every query entry point applies this automatically
    * (the factor rides in `RabitqModel.rerankScale` from [[load]]).
    *
    * Why RERANK and not nprobe — measured at 1M across a 256→368 split
    * (SCALE probe_scale row): the post-rebalance recall loss at a fixed
    * budget is SHORTLIST DISPLACEMENT, not probe coverage. At rerank
    * 1000 recall is flat in nprobe (0.916/0.908/0.906 at 16/23/46
    * probes — the 16 nearest clusters already hold the true neighbors),
    * while at any fixed rerank MORE probes LOWER recall (0.761→0.664 at
    * rerank 200) by adding far candidates whose estimate noise displaces
    * true neighbors from the truncated shortlist.
    *
    * Why QUADRATIC — the SCALE_r18 frontier row (1M, 256→368, np16):
    * the linear k′/k0 point (rr288) recovers only 0.816 of the 0.883
    * pre-skew recall, while query cost is probe-scan-dominated and
    * nearly FLAT in rerank — 0.841 @ rr360, 0.864 @ rr432 (= the
    * quadratic point, +5% query_sec), 0.878 @ rr504, 0.889 @ rr576
    * (+21%). (k′/k0)² lands within 0.02 of parity at single-digit cost
    * and stays a closed form that is exactly 1 for an unsplit layout;
    * callers wanting full parity pass ~2.5× the tuned budget (the
    * frontier is in SCALE_r18.json).
    */
  def scaledRerank(dir: String, numClusters: Int, rerank: Int): Int = {
    val s = probeScale(dir, numClusters)
    math.ceil(rerank * s * s).toInt
  }

  /** numClusters / BUILT_K — 1.0 for a never-rebalanced layout. Read
    * ONCE per [[load]] (the value rides in `RabitqModel.rerankScale`
    * from there on — never a per-query file read); an unreadable or
    * corrupt sidecar degrades to 1.0 with a warning instead of throwing
    * from a query path (the pre-rebalance budget is always a safe,
    * merely less-recall-accurate, fallback).
    */
  def probeScale(dir: String, numClusters: Int): Double = {
    val f = s"$dir/BUILT_K"
    if (!LayoutFs.exists(f)) 1.0
    else
      try numClusters.toDouble /
        math.max(1, LayoutFs.readString(f).trim.toInt)
      catch {
        case e @ (_: java.io.IOException | _: NumberFormatException) =>
          System.err.println(
            s"[graft] WARN: unreadable BUILT_K sidecar at $dir (${e.getMessage}) " +
              "— rerank scaling degrades to 1.0 (pre-rebalance budgets)")
          1.0
      }
  }

  /** Resolve a model sidecar table against an ALREADY-RESOLVED
    * generation dir: a generation-LOCAL `_<table>` dir (written by
    * [[rebalanceGenerationSwap]] on object-store deployments, carried
    * forward by every compaction) SHADOWS the layout-root dir [[save]]
    * writes — the root pair cannot be replaced atomically without a
    * directory rename, so there the model travels with the generation
    * and the MANIFEST PUT flips data and model together. Callers must
    * resolve the generation ONCE and derive every path from it (the
    * [[load]] discipline): re-reading the MANIFEST per table would let
    * a concurrent publish hand back a TORN model/data pair — exactly
    * the tear the generation-local shape exists to prevent.
    */
  private[graft] def modelSidecarDir(dir: String, genDir: String,
                                     table: String): String = {
    val genLocal = s"$genDir/_$table"
    if (LayoutFs.isDirectory(genLocal)) genLocal else s"$dir/$table"
  }

  def load(spark: SparkSession, dir: String): (RabitqModel, DataFrame) =
    // ONE generation resolution per load — model sidecars and the data
    // scan must come from the SAME generation even when a concurrent
    // maintenance pass publishes a new one mid-call
    loadOfGen(spark, dir, indexDataDir(dir))

  private def loadOfGen(spark: SparkSession, dir: String,
                        gen: String): (RabitqModel, DataFrame) =
    (modelOfGen(spark, dir, gen), scanOfGen(spark, dir, gen))

  /** The model HALF of [[load]]'s single-resolution read — for callers
    * that must know the model (to enumerate probed clusters) BEFORE
    * constructing the data scan ([[loadLiveProbed]]).
    */
  private[graft] def modelOfGen(spark: SparkSession, dir: String,
                                gen: String): RabitqModel = {
    // three independent tiny single-task reads — overlap them (inParallel)
    // so a model load pays one job latency, not three
    val (p, rotation, centroids) = inParallel(
      spark.read.parquet(modelSidecarDir(dir, gen, "params")).head(),
      spark.read.parquet(s"$dir/rotation")
        .orderBy("row_id").collect()
        .map(r => r.getAs[Seq[Float]]("row").toArray),
      spark.read.parquet(modelSidecarDir(dir, gen, "centroids"))
        .orderBy("cluster_id").collect()
        .map(r => r.getAs[Seq[Float]]("centroid").toArray))
    val params = RabitqParams(p.getAs[Int]("dim"), p.getAs[Int]("pad_dim"),
      p.getAs[Int]("num_clusters"), p.getAs[Long]("seed"))
    val bias = p.getAs[Seq[Float]]("bias").toArray
    // quadratic in the cluster growth — see scaledRerank's frontier note
    val ps = probeScale(dir, params.numClusters)
    RabitqModel(params, rotation, centroids, bias, rerankScale = ps * ps)
  }

  /** Single-resolution PROBE-PRUNED live read — the disk query paths'
    * read: resolve the generation ONCE, load its model, let the caller
    * derive the probed cluster ids from it, and return the live scan
    * restricted to them. Carried files come from only the manifest
    * shards overlapping the probed clusters ([[readCarryForClusters]]),
    * so the planner's file index is ∝ probed data, not ∝ corpus file
    * count; the `cluster_id ∈ probed` filter is already applied (it
    * partition-prunes the own-dir branch exactly as before — the plan
    * the pruning gates assert), and the generation's tombstone log is
    * anti-joined out ([[loadLive]]'s contract). Result-identical to
    * `loadLive` + the same filter: shards cover every cluster, and
    * restriction + filter commute.
    */
  private[graft] def loadLiveProbed(
      spark: SparkSession, dir: String,
      probeOf: (RabitqModel, () => DataFrame) => Seq[Int])
      : (RabitqModel, Seq[Int], DataFrame) = {
    val gen = indexDataDir(dir)
    val genName = LayoutFs.baseName(gen)
    val model = modelOfGen(spark, dir, gen)
    // the FULL live scan of the SAME resolved generation, built only if
    // the probe derivation asks for it (the measured-selectivity
    // fallback) — never a second MANIFEST resolution or model load
    def fullLive(): DataFrame = {
      val s = scanOfGen(spark, dir, gen)
      logScanOfGen(spark, dir, genName).fold(s)(log =>
        s.join(log.select(org.apache.spark.sql.functions.col("vec_id")),
          Seq("vec_id"), "left_anti"))
    }
    val probed = probeOf(model, () => fullLive())
    val scan = scanOfGen(spark, dir, gen, Some(probed.toSet))
      .filter(org.apache.spark.sql.functions.col("cluster_id")
        .isin(probed: _*))
    val live = logScanOfGen(spark, dir, genName).fold(scan)(log =>
      scan.join(log.select("vec_id"), Seq("vec_id"), "left_anti"))
    (model, probed, live)
  }

  /** [[load]] with the maintained-layout READ CONTRACT applied: if the
    * dir carries an uncompacted `VecsStream.maintainIndex` tombstone log,
    * anti-join it out (id-only — broadcast at any realistic delete rate);
    * a no-op, plan-identical to [[load]], when no log exists. Every
    * consumer that ANSWERS QUERIES from a saved layout must read through
    * this (the disk query paths, the serving tier) — raw [[load]] is for
    * layout-level ops that handle the log themselves ([[rebalanceIndex]],
    * `VecsStream.compactIndex`) and for gates that assert physical
    * layout state.
    */
  def loadLive(spark: SparkSession, dir: String): (RabitqModel, DataFrame) = {
    // same single-resolution discipline as load: the tombstone log is
    // PER GENERATION, so it must be the log of the generation the data
    // scan resolved, not a re-read of a possibly-republished MANIFEST
    val gen = indexDataDir(dir)
    val (model, index) = loadOfGen(spark, dir, gen)
    val live = logScanOfGen(spark, dir, LayoutFs.baseName(gen))
      .fold(index)(log =>
        index.join(log.select("vec_id"), Seq("vec_id"), "left_anti"))
    (model, live)
  }

  /** TIME TRAVEL: [[loadLive]] pinned to a NAMED generation — the
    * active one, or a RETIRED generation still inside its retention
    * window. The generation manifest makes this nearly free: a retired
    * generation keeps its own `_CARRY` listing (or flat directory), its
    * generation-local model sidecars, and its own tombstone log, and
    * the refcounted vacuum keeps every file a RETAINED listing
    * references alive — so the snapshot resolves exactly as it did
    * while active, row for row, even after later rebalances rewrote
    * the clusters it carries. Refused (IllegalStateException) when the
    * generation was never published, has left the retention window
    * (vacuum reclaimed it — fully, or partially with a `_RECLAIMED`
    * marker), or does not exist; refusal is the contract, a partial
    * snapshot is never served. Snapshot validity is bounded by the
    * deployment's `retainMs` policy, exactly like Delta/Iceberg time
    * travel.
    */
  def loadAt(spark: SparkSession, dir: String,
             gen: String): (RabitqModel, DataFrame) = {
    val genDir = s"$dir/$gen"
    val active = LayoutFs.baseName(indexDataDir(dir))
    def refuse(why: String) =
      throw new IllegalStateException(
        s"generation $gen is not resolvable under $dir: $why")
    if (gen != active) {
      if (!LayoutFs.isFile(s"$dir/_retired/$gen"))
        refuse("neither active nor retired-retained (never published, " +
          "or reclaimed past the retention window)")
      if (!LayoutFs.isDirectory(genDir))
        refuse("retired and already reclaimed")
      if (LayoutFs.isFile(s"$genDir/_RECLAIMED"))
        refuse("retired and partially reclaimed past the retention " +
          "window — only its still-referenced files survive")
    }
    val model = modelOfGen(spark, dir, genDir)
    val scan = scanOfGen(spark, dir, genDir)
    val live = logScanOfGen(spark, dir, gen).fold(scan)(log =>
      scan.join(log.select("vec_id"), Seq("vec_id"), "left_anti"))
    (model, live)
  }

  /** Layout/health statistics for a saved index dir — the one-row report
    * an operator reads to SCHEDULE the maintenance the lifecycle ops
    * perform: `tombstone debt` (n_tombstones/n_rows) decides when
    * `VecsStream.compactIndex` is worth the rewrite, `skew` and
    * `clusters_oversized` decide when [[rebalanceIndex]] is (the emitted
    * `needs_rebalance` applies rebalanceIndex's own split criterion at
    * the same `maxSizeFactor`, so the report and the op can never
    * disagree). Cost shape: with no tombstone log the WHOLE report is
    * parquet FOOTER metadata ([[clusterSizesFromFooters]] — zero data
    * pages, sub-second at 1M where the scan took 10.9s); with a log the
    * live sizes need the anti-join, so it falls back to ONE slim
    * two-column scan (vec_id, cluster_id — column-pruned, never the
    * codes) into a numClusters-row aggregate. Either way the collected
    * frame is the cluster count, never the corpus. The serving tier's
    * /describe reads the cached frame instead and is per-call cheap.
    */
  /** The health snapshot [[describeIndex]] renders, kept structured so a
    * maintenance pass can consume the SAME measurement the report was
    * built from: `VecsStream.maintenanceLoop` previously re-derived the
    * model and the per-cluster live sizes inside each phase (describe →
    * compact → rebalance each re-resolved the generation and re-scanned
    * the layout under the one held lease); threading this through runs
    * the measurement once per pass (guide §1.2 run fewer passes — and at
    * corpus scale, one set of object-store LIST calls instead of three).
    */
  private[graft] final case class IndexHealth(
      gen: String, model: RabitqModel,
      nRows: Long, nTomb: Long, sizes: Array[(Int, Long)]) {
    def nLive: Long = sizes.map(_._2).sum
    def maxSize: Long = if (sizes.isEmpty) 0L else sizes.map(_._2).max
    def meanSize: Double = nLive.toDouble / model.params.numClusters
    def debt: Double = if (nRows == 0) 0.0 else nTomb.toDouble / nRows
    def oversized(maxSizeFactor: Double): Int = {
      val mean = meanSize
      sizes.count { case (_, s) =>
        s > maxSizeFactor * mean && math.ceil(s / mean) >= 2 }
    }
  }

  private[graft] def indexHealth(spark: SparkSession, dir: String,
                                 footerFastPath: Boolean = true): IndexHealth = {
    // single generation resolution (the load() discipline): model, data
    // scan, log, and footer listing all from ONE MANIFEST read
    val gen = indexDataDir(dir)
    val genName = LayoutFs.baseName(gen)
    val log = tombstoneLogOfGenIfAny(dir, genName)
    // FOOTER fast path: with no tombstone log, every statistic here is a
    // row count per cluster_id= partition — parquet footers carry those
    // exactly, so read ONLY file metadata (one tiny distributed pass,
    // zero data pages) instead of scanning a corpus-sized column. With a
    // log present the live sizes need the anti-join, so fall back to the
    // slim two-column scan.
    val footerSizes: Option[Array[(Int, Long)]] =
      if (footerFastPath && log.isEmpty)
        clusterSizesFromFooters(spark, dir, gen)
      else None
    footerSizes match {
      case Some(fs) =>
        IndexHealth(gen, modelOfGen(spark, dir, gen), fs.map(_._2).sum, 0L, fs)
      case None =>
        val (model, index) = loadOfGen(spark, dir, gen)
        val tomb = log.map(delDir =>
          spark.read.parquet(delDir).select("vec_id").distinct())
        val live = tomb.map(t => index.join(t, Seq("vec_id"), "left_anti"))
          .getOrElse(index)
        // three INDEPENDENT actions — physical row count, tombstone
        // count, live per-cluster sizes — overlapped (guide §2.6). The
        // physical count comes from parquet footers (zero data pages)
        // when the layout is clean of crashed appends; footers list
        // every file, so with in-progress batches present fall back to
        // the committed scan's count (read-committed visibility).
        val (nRowsOpt, nTomb, sizes) = inParallel(
          if (footerFastPath && inProgressPrefixes(dir).isEmpty)
            clusterSizesFromFooters(spark, dir, gen).map(_.map(_._2).sum)
          else None,
          tomb.map(_.count()).getOrElse(0L),
          live.groupBy("cluster_id").count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)))
        IndexHealth(gen, model, nRowsOpt.getOrElse(index.count()), nTomb, sizes)
    }
  }

  def describeIndex(spark: SparkSession, dir: String,
                    maxSizeFactor: Double = 1.5,
                    footerFastPath: Boolean = true): DataFrame = {
    import spark.implicits._
    val h = indexHealth(spark, dir, footerFastPath)
    val oversized = h.oversized(maxSizeFactor)
    val mean = h.meanSize
    Seq((h.model.params.numClusters, h.nRows, h.nLive, h.nTomb, h.debt,
        h.maxSize, mean, if (mean == 0) 0.0 else h.maxSize / mean,
        oversized, oversized > 0))
      .toDF("num_clusters", "n_rows", "n_live", "n_tombstones",
        "tombstone_debt", "max_cluster_size", "mean_cluster_size",
        "skew", "clusters_oversized", "needs_rebalance")
  }
}
