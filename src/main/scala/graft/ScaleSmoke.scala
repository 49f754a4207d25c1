package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Scale smoke: build + query the RaBitQ index on a generated clustered
  * dataset well beyond the driver testdata sizes, and report build time,
  * query throughput, and recall vs brute force. This is the "would the
  * plan survive a scale-up" probe — run it when touching the index or
  * query pipeline.
  *
  *   sbt "runMain graft.ScaleSmoke 200000 256 16 64"  # n, clusters, nprobe, dim
  *
  * Above ~500k rows the k-means fit runs on a 200k-row sample
  * (`RabitqIndex.buildSampled`) — the shape that holds at 100 TB, where
  * Lloyd iterations can never touch the full data.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val k = if (args.length > 1) args(1).toInt else 256
    val nprobe = if (args.length > 2) args(2).toInt else 16
    val dim = if (args.length > 3) args(3).toInt else 64
    // rough-estimate noise grows with dim (1-bit codes): at dim≫64 the
    // shortlist must widen for the true neighbors to survive into rerank
    val rerank = if (args.length > 4) args(4).toInt else 200
    // large values (e.g. 100000) exercise the batch-scoring path: probes
    // are computed executor-side, so the probe build must parallelize
    // instead of serializing on the driver. Recall vs brute force is only
    // measured for small batches (the exact baseline is quadratic).
    val nQueries = if (args.length > 5) args(5).toInt else 100

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic clustered vectors, generated distributed (no driver
    // materialization): cluster centers from hash noise, points = center
    // + small noise
    val genUdf = udf { (id: Long) =>
      val noise = graft.functions.VectorOps.syntheticNoise _
      val c = (id % 100L) + 1L
      // 0.25 noise vs ~0.29 center std: clusters overlap, so probe
      // selection actually has to work (0.08 made recall trivially 1.0)
      Array.tabulate(dim)(j => noise(c, j) + 0.25f * noise(id + 7919L, j)).toSeq
    }
    val base = spark.range(n).select(col("id").as("vec_id"), genUdf(col("id")).as("embedding"))
      .repartition(cpus.toInt).persist()
    base.count()

    val t0 = System.nanoTime()
    val (model, index) =
      if (n > 500000L) RabitqIndex.buildSampled(spark, base, k, sampleN = 200000L, seed = 42L)
      else RabitqIndex.build(spark, base, k, seed = 42L)
    val indexP = index.persist()
    indexP.count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    val queries = ExactKnn.queriesFromEmbeddings(base, nQueries).persist()
    queries.count()

    val t1 = System.nanoTime()
    val approx = RabitqQuery.topK(spark, model, indexP, base, queries,
      nprobe = nprobe, topk = 10, rerank = rerank, largeBatch = nQueries > 1000)
    val nres = approx.count()
    val querySec = (System.nanoTime() - t1) / 1e9

    // opt-in fastscan A/B ("fs" arg): same batch through the LUT
    // estimator — end-to-end check that KernelBench's raw-kernel ratio
    // survives the Catalyst pipeline (ArrayData accessors, join overhead)
    if (args.contains("fs")) {
      // both paths re-timed warm (the cold pass above JIT-compiled the
      // shared pipeline) so neither rides the other's warmup
      def timeOnce(fastscan: Boolean): Double = {
        val t = System.nanoTime()
        val r = RabitqQuery.topK(spark, model, indexP, base, queries,
          nprobe = nprobe, topk = 10, rerank = rerank,
          largeBatch = nQueries > 1000, fastscan = fastscan).count()
        require(r == nres, s"fastscan=$fastscan row count $r != $nres")
        (System.nanoTime() - t) / 1e9
      }
      val lutSec = timeOnce(fastscan = true)
      val planesSec = timeOnce(fastscan = false)
      val lutSec2 = timeOnce(fastscan = true)
      println(s"""{"fastscan_ab":{"n":$n,"dim":$dim,"planes_warm_sec":$planesSec,""" +
        s""""lut_warm_sec":${math.min(lutSec, lutSec2)},""" +
        s""""planes_over_lut":${planesSec / math.min(lutSec, lutSec2)}}}""")
    }

    // the quadratic exact truth is computed ONCE (persisted) and shared by
    // the recall gate and the opt-in A/B branch below — both sit behind
    // the same nQueries <= 1000 gate, so a second full O(n·nQueries) pass
    // would be pure waste
    val heuristic = nQueries <= 1000 && args.contains("ab")
    val truthOpt = if (nQueries <= 1000)
      Some(ExactKnn.l2TopK(base, queries, 10).persist())
    else None // exact baseline is quadratic — skipped at batch scale

    val (recall, exactSec) = truthOpt match {
      case Some(truth) =>
        val t2 = System.nanoTime()
        val r = ExactKnn.recall(approx, truth, 10).head().getDouble(0)
        (r, (System.nanoTime() - t2) / 1e9)
      case None => (-1.0, -1.0)
    }

    // opt-in A/B for the Q10-vs-Q11 crossover note (SURVEY §2 / PLANS
    // Q11): the heuristic fold ships every probed-cluster EMBEDDING into
    // its per-query exchange where the shortlist path moves a
    // rerank-bounded candidate set — measure both at identical
    // nprobe/topk so the crossover claim has a number behind it
    val (hSec, hRecall) = (heuristic, truthOpt) match {
      case (true, Some(truth)) =>
        val t3 = System.nanoTime()
        val h = RabitqQuery.heuristicTopK(spark, model, indexP, base, queries,
          nprobe = nprobe, topk = 10)
        h.count()
        val sec = (System.nanoTime() - t3) / 1e9
        (sec, ExactKnn.recall(h, truth, 10).head().getDouble(0))
      case _ => (-1.0, -1.0)
    }

    println(s"""{"scale_smoke":{"n":$n,"k":$k,"nprobe":$nprobe,"dim":$dim,"rerank":$rerank,"n_queries":$nQueries,"build_sec":$buildSec,""" +
      s""""query_sec":$querySec,"qps":${nQueries / querySec},"results":$nres,""" +
      s""""recall_at_10":$recall,"exact_baseline_sec":$exactSec""" +
      (if (heuristic)
        s""","heuristic_sec":$hSec,"heuristic_qps":${nQueries / hSec},"heuristic_recall":$hRecall}}"""
       else "}}"))

    // opt-in filtered-search stage ("filtered" arg): the q99 property at
    // generated scale — a ~10%-selective label predicate (label rides in
    // the index rows, derived here so no join is needed) queried at the
    // SAME nprobe, recall measured against FILTERED brute force. The
    // number to watch is filtered vs unfiltered recall at equal probe
    // width: selective predicates thin every probed cluster ~10×, so the
    // filtered top-10's true neighbors spread across more clusters and
    // recall degrades first — the production failure mode the q99 gate
    // pins at fixture scale.
    if (args.contains("filtered") && nQueries <= 1000) {
      val pred = pmod(col("vec_id"), lit(10L)) === 7L
      val fBase = base.filter(pred).persist()
      val nf = fBase.count()
      val fIndex = indexP.filter(pred)
      val fTruth = ExactKnn.l2TopK(fBase, queries, 10).persist()
      fTruth.count()
      // sweep: base nprobe (shows the collapse), then nprobe scaled
      // toward 1/selectivity (the remediation — the filtered candidate
      // stream per probe is ~selectivity-thin, so equal EFFECTIVE
      // candidates need ~nprobe/selectivity probes)
      val sweep = Seq(nprobe, math.min(k, 4 * nprobe), math.min(k, 10 * nprobe)).distinct
      val measured = sweep.map { np =>
        val t4 = System.nanoTime()
        val fApprox = RabitqQuery.topK(spark, model, fIndex, fBase, queries,
          nprobe = np, topk = 10, rerank = rerank)
        fApprox.count()
        val fSec = (System.nanoTime() - t4) / 1e9
        val fRecall = ExactKnn.recall(fApprox, fTruth, 10).head().getDouble(0)
        s""""nprobe_$np":{"filtered_recall_at_10":$fRecall,"query_sec":$fSec,"qps":${nQueries / fSec}}"""
      }
      // the auto-widening operator end-to-end (q100's surface): requested
      // nprobe, effective ceil(nprobe/selectivity) clamped to k
      val t5 = System.nanoTime()
      val auto = RabitqQuery.filteredTopK(spark, model, indexP, base, queries,
        pred, nprobe = nprobe, topk = 10, rerank = rerank,
        selectivity = Some(nf.toDouble / n))
      auto.count()
      val autoSec = (System.nanoTime() - t5) / 1e9
      val autoRecall = ExactKnn.recall(auto, fTruth, 10).head().getDouble(0)
      println(s"""{"scale_smoke_filtered":{"n":$n,"selectivity":${nf.toDouble / n},""" +
        s""""unfiltered_recall_at_10_nprobe_$nprobe":$recall,""" +
        measured.mkString(",") +
        s""","auto_widened":{"requested_nprobe":$nprobe,"filtered_recall_at_10":$autoRecall,""" +
        s""""query_sec":$autoSec,"qps":${nQueries / autoSec}}}}""")
      fTruth.unpersist(); fBase.unpersist()
    }
    // opt-in REBALANCE stage ("rebalance" arg): the q116 property at
    // generated scale. Bootstrap the model on HALF the generator modes
    // only, append the other half through the frozen model — the appends
    // pile into the boundary clusters, the skew every continuously-fed
    // IVF index accumulates. Then RabitqIndex.rebalanceIndex. Numbers
    // that matter: moved_frac (rewrite IO must be ∝ skew, not corpus),
    // rebalance_sec, and recall at the SAME nprobe before vs after —
    // fixed probe budget over more, smaller clusters, so the gain has to
    // beat the smaller-probed-fraction headwind (the honest comparison).
    if (args.contains("rebalance") && truthOpt.isDefined) {
      val truth = truthOpt.get
      val tmp = TempDirs.create("graft_rebal_smoke_")
      val boot = base.filter(col("vec_id") % 100L < 50L)
      // a metadata label rides in the layout throughout (the filtered-
      // search shape), so rebalance_sec INCLUDES the extras carry across
      // the rewrite and label integrity is checked at this scale (q118)
      val labels = base.select(col("vec_id"),
        (col("vec_id") % 16L).cast("int").as("label"))
      val t6 = System.nanoTime()
      val (bModel, bIndex) =
        if (n / 2 > 500000L) RabitqIndex.buildSampled(spark, boot, k, sampleN = 200000L, seed = 42L)
        else RabitqIndex.build(spark, boot, k, seed = 42L)
      RabitqIndex.save(spark, bModel, bIndex.join(labels, Seq("vec_id")), s"$tmp/idx")
      RabitqIndex.appendVectors(spark, bModel,
          base.filter(col("vec_id") % 100L >= 50L))
        .join(labels, Seq("vec_id"))
        .write.mode("append").partitionBy("cluster_id").parquet(s"$tmp/idx/index")
      val setupSec = (System.nanoTime() - t6) / 1e9
      def recallAt(m: RabitqModel, idx: org.apache.spark.sql.DataFrame,
                   np: Int = nprobe, rr: Int = rerank): (Double, Double) = {
        // measure the EXPLICIT budget: topK auto-scales rerank by the
        // loaded model's rerankScale since r18 (the shipped adaptation —
        // its operating point is the rrScaled row), so neutralize the
        // factor here or every grid point would be silently rescaled
        val mRaw = m.copy(rerankScale = 1.0)
        val p = idx.persist()
        p.count()
        val t = System.nanoTime()
        val r = RabitqQuery.topK(spark, mRaw, p, base, queries, np, 10, rr)
        r.count()
        val sec = (System.nanoTime() - t) / 1e9
        val rec = ExactKnn.recall(r, truth, 10).head().getDouble(0)
        p.unpersist()
        (rec, sec)
      }
      val (m0, idx0) = RabitqIndex.load(spark, s"$tmp/idx")
      val (recBefore, secBefore) = recallAt(m0, idx0)
      val t7 = System.nanoTime()
      val report = RabitqIndex.rebalanceIndex(spark, s"$tmp/idx", base,
        maxSizeFactor = 1.5)
      val rebalSec = (System.nanoTime() - t7) / 1e9
      val (m1, idx1) = RabitqIndex.load(spark, s"$tmp/idx")
      // layout-content invariants the recall number silently depends on:
      // exactly one row per vector (a surviving stale split dir or a
      // double-merged staged file would pollute every shortlist), found
      // as a real bug in the first cut of the roll-forward swap
      val nIdx = idx1.count()
      val nDup = idx1.groupBy("vec_id").count().filter(col("count") > 1).count()
      require(nIdx == n && nDup == 0,
        s"rebalanced layout corrupt: rows=$nIdx (want $n), dup vec_ids=$nDup")
      // metadata integrity through the rewrite: zero nulls, zero drift
      val labelNulls = idx1.filter(col("label").isNull).count()
      val labelMism = idx1.select(col("vec_id"), col("label"))
        .join(labels.withColumnRenamed("label", "expected"), Seq("vec_id"))
        .filter(col("label") =!= col("expected")).count()
      val (recAfter, secAfter) = recallAt(m1, idx1)
      // RERANK-BUDGET SCALING (BUILT_K sidecar, written by the rebalance):
      // the post-split recall loss at a fixed budget is SHORTLIST
      // DISPLACEMENT, not probe coverage (the sweep below separates the
      // two), so the shipped adaptation — what the disk paths and the
      // serving tier apply automatically — scales rerank by k′/k0 at the
      // same nprobe. Its recall and cost are the honest post-rebalance
      // operating point.
      val rrScaled = RabitqIndex.scaledRerank(s"$tmp/idx",
        m1.params.numClusters, rerank)
      val (recScaled, secScaled) = recallAt(m1, idx1, nprobe, rrScaled)
      // opt-in diagnostic grid ("sweep" arg): recall over (nprobe, rerank)
      // on the REBALANCED layout — separates the probe-coverage headwind
      // from rerank displacement and from sub-centroid estimate quality
      if (args.contains("sweep")) {
        val scale = RabitqIndex.probeScale(s"$tmp/idx", m1.params.numClusters)
        val npScaled = math.min(m1.params.numClusters,
          math.ceil(nprobe * scale).toInt)
        val grid = for {
          np <- Seq(nprobe, npScaled).distinct
          rr <- Seq(rerank, rrScaled, 2 * rerank, 3 * rerank, 5 * rerank).distinct
        } yield {
          val (rec, sec) = recallAt(m1, idx1, np, rr)
          s""""np${np}_rr$rr":{"recall":$rec,"sec":$sec}"""
        }
        println(s"""{"rebalance_sweep":{${grid.mkString(",")}}}""")
      }
      // opt-in FRONTIER stage ("frontier" arg): the recall-vs-cost curve
      // of the rerank budget on the rebalanced layout at the tuned
      // nprobe — the measurement that decides whether the default
      // scale policy (k′/k0) sits at the knee or below it. Points span
      // the shipped operating point (rrScaled) up to ~2× it, plus the
      // pre-split budget for reference.
      if (args.contains("frontier")) {
        val pts = (Seq(rerank, rrScaled) ++
          Seq(1.25, 1.5, 1.75, 2.0).map(f => math.ceil(rrScaled * f).toInt))
          .distinct.sorted
        val rows = pts.map { rr =>
          val (rec, sec) = recallAt(m1, idx1, nprobe, rr)
          s""""rr$rr":{"recall":$rec,"sec":$sec}"""
        }
        println(s"""{"rebalance_frontier":{"nprobe":$nprobe,"rr_scaled":$rrScaled,""" +
          s""""recall_pre_rebalance_at_rr$rerank":$recBefore,${rows.mkString(",")}}}""")
      }
      println(s"""{"scale_smoke_rebalance":{"n":$n,"k":$k,"nprobe":$nprobe,""" +
        s""""rerank_scaled":$rrScaled,"recall_at_10_rerank_scaled":$recScaled,""" +
        s""""query_sec_rerank_scaled":$secScaled,""" +
        s""""label_nulls":$labelNulls,"label_mismatches":$labelMism,""" +
        s""""setup_sec":$setupSec,"clusters_split":${report.split.size},""" +
        s""""k_before":${report.numClustersBefore},"k_after":${report.numClustersAfter},""" +
        s""""moved_rows":${report.movedRows},"moved_frac":${report.movedRows.toDouble / n},""" +
        s""""max_size_before":${report.maxSizeBefore},"max_size_after":${report.maxSizeAfter},""" +
        s""""rebalance_sec":$rebalSec,""" +
        s""""recall_at_10_before":$recBefore,"recall_at_10_after":$recAfter,""" +
        s""""query_sec_before":$secBefore,"query_sec_after":$secAfter}}""")
      // opt-in OBJECT-STORE-SHAPE leg ("condput" arg): an identically
      // skewed layout rebalanced through CondPutCommit — the generation-
      // versioned swap (next generation built unreferenced, grown model
      // riding inside it, ONE atomic MANIFEST publish). Since round 19
      // the untouched-cluster carry is BY REFERENCE (the `_CARRY`
      // listing — the Iceberg-manifest shape), so the generation's
      // physical bytes must be ∝ SKEW, not ∝ corpus: this leg measures
      // written vs carried bytes and emits the r18 copy-shape
      // counterfactual (carried_bytes = exactly what per-file copy
      // used to move) next to them — the ∝ corpus → ∝ skew drop.
      if (args.contains("condput")) {
        val tmp2 = TempDirs.create("graft_rebal_condput_")
        RabitqIndex.save(spark, bModel,
          bIndex.join(labels, Seq("vec_id")), s"$tmp2/idx")
        RabitqIndex.appendVectors(spark, bModel,
            base.filter(col("vec_id") % 100L >= 50L))
          .join(labels, Seq("vec_id"))
          .write.mode("append").partitionBy("cluster_id").parquet(s"$tmp2/idx/index")
        val t8 = System.nanoTime()
        val report2 = graft.operators.LayoutCommit.withOps(
            graft.operators.CondPutCommit) {
          RabitqIndex.rebalanceIndex(spark, s"$tmp2/idx", base,
            maxSizeFactor = 1.5)
        }
        val rebalSec2 = (System.nanoTime() - t8) / 1e9
        require(RabitqIndex.indexDataDir(s"$tmp2/idx") == s"$tmp2/idx/index-v2",
          "condput rebalance did not publish a new generation")
        val genBytes = org.apache.commons.io.FileUtils.sizeOfDirectory(
          new java.io.File(s"$tmp2/idx/index-v2"))
        // the carry: listing lines, not copies — count what was carried
        // by reference (the copy-shape counterfactual) and verify none
        // of it exists physically in the new generation
        val carry = RabitqIndex.readCarry(s"$tmp2/idx", "index-v2")
        val carriedBytes = carry.map(e =>
          new java.io.File(s"$tmp2/idx/$e").length()).sum
        val carryNames = carry.map(_.split('/').last).toSet
        val copiedCarried = Option(
          new java.io.File(s"$tmp2/idx/index-v2").listFiles())
          .getOrElse(Array.empty[java.io.File]).filter(_.isDirectory)
          .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty[java.io.File]))
          .count(f => carryNames.contains(f.getName))
        require(copiedCarried == 0,
          s"$copiedCarried carried files were physically copied into the " +
            "new generation — the carry must be metadata-only")
        val (mC, idxC) = RabitqIndex.load(spark, s"$tmp2/idx")
        require(mC.params.numClusters == report2.numClustersAfter,
          "load() did not resolve the generation-local grown model")
        val nIdxC = idxC.count()
        val nDupC = idxC.groupBy("vec_id").count().filter(col("count") > 1).count()
        require(nIdxC == n && nDupC == 0,
          s"condput-rebalanced layout corrupt: rows=$nIdxC (want $n), dup vec_ids=$nDupC")
        val rrScaledC = RabitqIndex.scaledRerank(s"$tmp2/idx",
          mC.params.numClusters, rerank)
        val (recCond, secCond) = recallAt(mC, idxC, nprobe, rrScaledC)
        println(s"""{"scale_smoke_rebalance_condput":{"n":$n,"k":$k,""" +
          s""""k_after":${report2.numClustersAfter},""" +
          s""""moved_rows":${report2.movedRows},""" +
          s""""rebalance_sec":$rebalSec2,"rebalance_sec_inplace":$rebalSec,""" +
          s""""generation_written_bytes":$genBytes,""" +
          s""""carried_by_reference_files":${carry.size},""" +
          s""""carried_by_reference_bytes":$carriedBytes,""" +
          s""""r18_copy_shape_counterfactual_bytes":${genBytes + carriedBytes},""" +
          s""""written_frac_of_copy_shape":${genBytes.toDouble / math.max(1L, genBytes + carriedBytes)},""" +
          s""""rerank_scaled":$rrScaledC,"recall_at_10_rerank_scaled":$recCond,""" +
          s""""query_sec_rerank_scaled":$secCond}}""")
      }
    }
    // opt-in MAINTENANCE stage ("maintain" arg): the tombstone half of
    // the lifecycle at scale. Save the index, tombstone 5% of ids into
    // the maintainIndex log, then measure what the lifecycle docs claim:
    // (a) the health report is metadata-cheap, (b) querying THROUGH the
    // uncompacted log costs ~nothing (id-only anti-join), (c) compaction
    // is the expensive scheduled rewrite — which is why it's scheduled
    // by tombstone_debt, not run per batch. Invariants: identical result
    // rows before vs after compaction, and no tombstoned id ever
    // surfaces in either.
    if (args.contains("maintain") && nQueries <= 1000) {
      val tmp = TempDirs.create("graft_maint_smoke_")
      val t8 = System.nanoTime()
      RabitqIndex.save(spark, model, indexP, s"$tmp/idx")
      val saveSec = (System.nanoTime() - t8) / 1e9
      base.filter(col("vec_id") % 20L === 7L).select("vec_id")
        .write.parquet(s"$tmp/idx/deletes")
      val liveBase = base.filter(col("vec_id") % 20L =!= 7L).persist()
      liveBase.count()
      val t9 = System.nanoTime()
      val debt = RabitqIndex.describeIndex(spark, s"$tmp/idx").head()
      val describeSec = (System.nanoTime() - t9) / 1e9
      def timedQuery(): (Set[Seq[Any]], Double) = {
        val t = System.nanoTime()
        val rows = RabitqQuery.topKFromDisk(spark, s"$tmp/idx", liveBase,
          queries, nprobe, 10, rerank)
          .select(col("query_id"), col("neighbor_id"), col("rank"))
          .collect().map(_.toSeq).toSet
        (rows, (System.nanoTime() - t) / 1e9)
      }
      val (rowsLog, secLog) = timedQuery()
      val t10 = System.nanoTime()
      graft.streaming.VecsStream.compactIndex(spark, s"$tmp/idx")
      val compactSec = (System.nanoTime() - t10) / 1e9
      // post-compaction the layout has no log, so describeIndex takes
      // the parquet-FOOTER path (zero data pages) — the metadata-cheap
      // report the ops loop polls between maintenance windows
      val t10b = System.nanoTime()
      val post = RabitqIndex.describeIndex(spark, s"$tmp/idx").head()
      val describeFooterSec = (System.nanoTime() - t10b) / 1e9
      require(post.getAs[Long]("n_rows") == post.getAs[Long]("n_live") &&
        post.getAs[Long]("n_tombstones") == 0L, s"compaction left debt: $post")
      val (rowsCompact, secCompact) = timedQuery()
      val resurrected = (rowsLog ++ rowsCompact)
        .count(r => r(1).asInstanceOf[Long] % 20L == 7L)
      // encode-throughput anchor: a frozen-model appendVectors pass over
      // the full corpus, materialized without collecting (the continuous-
      // ingest unit cost; the encode is a Scala UDF today — this is the
      // baseline a codegen encode expression would have to beat)
      val tEnc = System.nanoTime()
      // sum over encoded outputs, NOT count(*): count would let Catalyst
      // prune the projection and skip the UDF entirely
      RabitqIndex.appendVectors(spark, model, base)
        .agg(sum(col("cluster_id").cast("long")), max(col("factor_ip"))).head()
      val encodeSec = (System.nanoTime() - tEnc) / 1e9
      println(s"""{"scale_smoke_maintain":{"n":$n,"k":$k,"nprobe":$nprobe,""" +
        s""""save_sec":$saveSec,""" +
        s""""n_tombstones":${debt.getAs[Long]("n_tombstones")},""" +
        s""""tombstone_debt":${debt.getAs[Double]("tombstone_debt")},""" +
        s""""describe_sec":$describeSec,""" +
        s""""describe_footer_sec":$describeFooterSec,""" +
        s""""query_sec_with_log":$secLog,"compact_sec":$compactSec,""" +
        s""""query_sec_compacted":$secCompact,""" +
        s""""results_equal":${rowsLog == rowsCompact},""" +
        s""""resurrected":$resurrected,""" +
        s""""encode_sec":$encodeSec,""" +
        s""""encode_vecs_per_sec":${(n / encodeSec).toLong}}}""")
      liveBase.unpersist()
    }
    // opt-in MAINTENANCE-LOOP stage ("loop" arg): the q120 operator at
    // generated scale — ONE self-scheduled VecsStream.maintenanceLoop
    // pass (vacuum → describe → compact → rebalance under a single
    // lease) over a layout carrying BOTH tombstone debt and append
    // skew: the state a continuously-fed index reaches between
    // maintenance windows. Construction reuses the rebalance stage's
    // skew shape (bootstrap on half the generator modes, frozen-model
    // append of the rest) plus the maintain stage's 5% tombstones.
    // Numbers that matter: loop_sec end-to-end, recall at the SAME
    // nprobe before vs after the pass, and the invariants — both
    // actions fired, zero debt after, and no tombstoned id in either
    // measured result set.
    if (args.contains("loop") && nQueries <= 1000) {
      val tmp = TempDirs.create("graft_loop_smoke_")
      val t11 = System.nanoTime()
      val boot = base.filter(col("vec_id") % 100L < 50L)
      val (bModel, bIndex) =
        if (n / 2 > 500000L) RabitqIndex.buildSampled(spark, boot, k, sampleN = 200000L, seed = 42L)
        else RabitqIndex.build(spark, boot, k, seed = 42L)
      RabitqIndex.save(spark, bModel, bIndex, s"$tmp/idx")
      RabitqIndex.appendVectors(spark, bModel,
          base.filter(col("vec_id") % 100L >= 50L))
        .write.mode("append").partitionBy("cluster_id").parquet(s"$tmp/idx/index")
      base.filter(col("vec_id") % 20L === 7L).select("vec_id")
        .write.parquet(s"$tmp/idx/deletes")
      val setupSec = (System.nanoTime() - t11) / 1e9
      val liveBase = base.filter(col("vec_id") % 20L =!= 7L).persist()
      liveBase.count()
      val liveTruth = ExactKnn.l2TopK(liveBase, queries, 10).persist()
      liveTruth.count()
      // measured read: loadLive (tombstone-respecting before the loop,
      // plain after) + fixed-nprobe search; the resurrection guard
      // rides every measured result set
      def readNow(): (Double, Double) = {
        val (m, live) = RabitqIndex.loadLive(spark, s"$tmp/idx")
        val p = live.persist(); p.count()
        val t = System.nanoTime()
        val r = RabitqQuery.topK(spark, m, p, liveBase, queries,
          nprobe = nprobe, topk = 10, rerank = rerank).persist()
        r.count()
        val sec = (System.nanoTime() - t) / 1e9
        val rec = ExactKnn.recall(r, liveTruth, 10).head().getDouble(0)
        val resurrected = r.filter(col("neighbor_id") % 20L === 7L).count()
        require(resurrected == 0L, s"tombstoned ids surfaced: $resurrected")
        r.unpersist(); p.unpersist()
        (rec, sec)
      }
      val before = RabitqIndex.describeIndex(spark, s"$tmp/idx",
        maxSizeFactor = 1.5).head()
      require(before.getAs[Double]("tombstone_debt") >= 0.02 &&
        before.getAs[Boolean]("needs_rebalance"),
        s"loop smoke is vacuous: construction created no debt/skew ($before)")
      val (recBefore, secBefore) = readNow()
      val t12 = System.nanoTime()
      val report = graft.streaming.VecsStream.maintenanceLoop(spark,
        s"$tmp/idx", base, debtThreshold = 0.02, maxSizeFactor = 1.5)
      val loopSec = (System.nanoTime() - t12) / 1e9
      require(report.compacted, s"loop did not compact: $report")
      require(report.rebalanced.exists(_.split.nonEmpty),
        s"loop did not rebalance: $report")
      val after = RabitqIndex.describeIndex(spark, s"$tmp/idx",
        maxSizeFactor = 1.5).head()
      require(after.getAs[Long]("n_tombstones") == 0L &&
        after.getAs[Long]("n_rows") == after.getAs[Long]("n_live"),
        s"debt survived the loop: $after")
      // exactly one row per LIVE vector (the rebalance-stage invariant,
      // post compaction-then-rebalance)
      val postIdx = RabitqIndex.loadLive(spark, s"$tmp/idx")._2
      val nLiveRows = postIdx.count()
      val nDupLoop = postIdx.groupBy("vec_id").count()
        .filter(col("count") > 1).count()
      require(nLiveRows == liveBase.count() && nDupLoop == 0,
        s"post-loop layout corrupt: rows=$nLiveRows dup vec_ids=$nDupLoop")
      val (recAfter, secAfter) = readNow()
      val rb = report.rebalanced.get
      println(s"""{"scale_smoke_loop":{"n":$n,"k":$k,"nprobe":$nprobe,""" +
        s""""setup_sec":$setupSec,"loop_sec":$loopSec,""" +
        s""""compacted":${report.compacted},"clusters_split":${rb.split.size},""" +
        s""""k_after":${rb.numClustersAfter},"moved_rows":${rb.movedRows},""" +
        s""""max_size_before":${before.getAs[Long]("max_cluster_size")},""" +
        s""""max_size_after":${after.getAs[Long]("max_cluster_size")},""" +
        s""""n_tombstones_before":${before.getAs[Long]("n_tombstones")},""" +
        s""""recall_at_10_before":$recBefore,"recall_at_10_after":$recAfter,""" +
        s""""query_sec_before":$secBefore,"query_sec_after":$secAfter}}""")
      liveTruth.unpersist(); liveBase.unpersist()
    }
    spark.stop()
  }
}
