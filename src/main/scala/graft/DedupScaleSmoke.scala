package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Dedup scale smoke: run the banded near-dup paths far beyond the driver
  * testdata (default 1M docs / 1M vectors), with PLANTED near-duplicates,
  * and report wall time plus planted-pair recall. The point is shape, not
  * absolute speed: candidate generation must stay ~linear (banded joins),
  * and recall of true near-dups must stay high.
  *
  *   sbt "runMain graft.DedupScaleSmoke 1000000 1000"       # nDocs, nPlanted
  *   sbt "runMain graft.DedupScaleSmoke 10000000 1000 inc"  # one stage only
  *
  * Optional third arg selects a stage subset (comma-separated from
  * minhash,lsh,semantic,text,inc,incstream,seminc,incmh,ingstream; the default set
  * is minhash,lsh,text,inc — `semantic` (whose within-cluster pair scan
  * is the heaviest stage), `incstream`, `seminc`, and `incmh` are
  * opt-in) — the big-n stages each shuffle tens of GB, and rerunning all
  * of them to refresh one datapoint is how a /tmp fills up.
  */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val planted = if (args.length > 1) args(1).toLong else 1000L
    val stages: Set[String] = if (args.length > 2) args(2).split(",").map(_.trim).toSet
      else Set("minhash", "lsh", "text", "inc")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // candidate-volume telemetry: both banded-join operators observe()
    // their candidate count under a `dedup_candidates_` prefix; this
    // listener captures the most recent one so each stage can report the
    // quantity that decides whether its banding params fit n
    @volatile var lastCandidates = -1L
    val obsListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.collect { case (n, r) if n.startsWith("dedup_candidates_") =>
          lastCandidates = r.getAs[Long]("n_candidates") }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(obsListener)
    // listener delivery is async — drain before reading
    def drainCandidates(): Long = {
      val deadline = System.currentTimeMillis() + 10000
      while (lastCandidates < 0 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val v = lastCandidates; lastCandidates = -1L; v
    }

    // ---- 1) minhash over generated text ---------------------------------
    // docs 0..n/2-1 are random 30-token strings; docs n/2..n/2+planted-1
    // copy doc (id - n/2) with the last token changed — 3 of the 28
    // 3-token shingles differ, so jaccard = 25/31 ≈ 0.81; the rest are
    // random again. Tokens drawn from a 50k vocabulary.
    val half = n / 2
    val baseId = when(col("doc_id") >= half && col("doc_id") < half + planted,
      col("doc_id") - half).otherwise(col("doc_id"))
    val isCopy = col("doc_id") >= half && col("doc_id") < half + planted
    val textCol = concat_ws(" ",
      transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"), pmod(xxhash64(baseId * 31 + j,
          when(isCopy && j === 29, lit(1L)).otherwise(lit(0L))), lit(50000L)))))
    if (stages("minhash")) {
    val docs = spark.range(n).select(col("id").as("doc_id"), textCol.as("text"))
      .repartition(cpus.toInt).persist()
    docs.count()

    val t0 = System.nanoTime()
    val pairs = Dedup.minhashPairs(docs, n = 3, simThreshold = 0.5)
      .select(col("doc_a"), col("doc_b")).persist()
    val nPairs = pairs.count()
    val minhashSec = (System.nanoTime() - t0) / 1e9
    val mhCandidates = drainCandidates()
    val plantedFound = pairs
      .filter(col("doc_b") === col("doc_a") + half && col("doc_a") < planted)
      .count()
    // ---- 1b) connected components over the near-dup pairs --------------
    // the clustering step a pipeline runs right after pair generation;
    // at this pair count it exercises the single-task union-find dispatch
    val t0b = System.nanoTime()
    // persist: the verification actions below would otherwise re-run the
    // union-find pipeline once per action (and twice for the self-join)
    val comps = Curation.connectedComponents(pairs).persist()
    val ccNodes = comps.count()
    val ccSec = (System.nanoTime() - t0b) / 1e9
    val ccComponents = comps.agg(countDistinct(col("component"))).head().getLong(0)
    // every planted copy must land in the same component as its source
    val ccPlanted = comps.as("c")
      .join(comps.select(col("doc_id").as("src_id"), col("component").as("src_comp")),
        col("c.doc_id") === col("src_id") + half)
      .filter(col("c.doc_id") < half + planted && col("c.component") === col("src_comp"))
      .count()
    comps.unpersist(); pairs.unpersist(); docs.unpersist()
    println(s"""{"dedup_scale_minhash":{"n_docs":$n,"sec":$minhashSec,"pairs":$nPairs,"planted_found":$plantedFound,""" +
      s""""n_candidates":$mhCandidates,""" +
      s""""cc_sec":$ccSec,"cc_nodes":$ccNodes,"cc_components":$ccComponents,"cc_planted_clustered":$ccPlanted}}""")
    }

    // shared synthetic embedding corpus for the lsh + semantic stages:
    // zero-mean random vectors (cos ≈ 0 between random pairs, so band
    // collisions are rare and candidates stay ~linear — any common mean
    // component would correlate ALL vectors and defeat the banding);
    // vecs n/2..+planted copy vector (id - n/2) with one coordinate
    // nudged (cos ≈ 0.9999). Built lazily ONCE (running both stages
    // must not regenerate and re-persist the same n×64 corpus), released
    // after the last embedding stage.
    lazy val embCorpus: org.apache.spark.sql.DataFrame = {
      val dim = 64
      val genUdf = udf { (id: Long, copyOf: Long) =>
        val src = if (copyOf >= 0) copyOf else id
        val v = Array.tabulate(dim)(j => graft.functions.VectorOps.syntheticNoise(src + 7919L, j))
        if (copyOf >= 0) v(0) += 0.01f
        v.toSeq
      }
      val copyOf = when(col("id") >= half && col("id") < half + planted, col("id") - half)
        .otherwise(lit(-1L))
      val e = spark.range(n)
        .select(col("id").as("vec_id"), genUdf(col("id"), copyOf).as("embedding"))
        .repartition(cpus.toInt).persist()
      e.count()
      e
    }
    def releaseEmbAfter(stage: String): Unit = {
      val later = Seq("lsh", "semantic").dropWhile(_ != stage).drop(1)
      if (!later.exists(stages)) embCorpus.unpersist()
    }

    if (stages("lsh")) {
    // ---- 2) embedding hyperplane-LSH near-dup ---------------------------
    val emb = embCorpus

    val t1 = System.nanoTime()
    // band width follows the operator's scaling law (2^(bandBits+1) ≳
    // numBands·n keeps candidates O(n)): at n = 10⁶, 16-bit bands put
    // ~numBands·n²/2^17 ≈ 30M random pairs through the dim-sized
    // verification fetch (measured 65M → ~75s dominated by verification);
    // 128 planes / 4 × 32-bit bands cut that to ~10² while a planted
    // cos ≈ 0.9999 pair still collides w.p. > 0.999
    val nd = Dedup.embeddingNearDupLSH(spark, emb, threshold = 0.99,
      numBands = 4, numPlanes = 128).persist()
    val ndPairs = nd.count()
    val lshSec = (System.nanoTime() - t1) / 1e9
    val lshCandidates = drainCandidates()
    val ndPlanted = nd
      .filter(col("id_b") === col("id_a") + half && col("id_a") < planted)
      .count()
    nd.unpersist(); releaseEmbAfter("lsh")
    println(s"""{"dedup_scale_lsh":{"n_docs":$n,"lsh_sec":$lshSec,""" +
      s""""lsh_pairs":$ndPairs,"n_candidates":$lshCandidates,"lsh_planted_found":$ndPlanted}}""")
    }

    if (stages("semantic")) {
    // ---- 2b) SemDeDup-style semantic dedup ------------------------------
    // same shared corpus (planted cos ≈ 0.9999 copies). k = 4096
    // deterministic-sample centroids → n_c ≈ n/4096, within-cluster
    // pairs ≈ n·n_c/2; at larger n SCALE K (the operator's documented
    // law) or plug the 2-level hierarchical assignment in as the coarse
    // stage.
    val emb = embCorpus
    val kSem = 4096
    // centroids are sampled from the FIRST HALF only (ids ≥ half are the
    // planted copies), so the step must divide `half`, not n — n/kSem
    // would land only ~kSem/2 sample points below `half` and silently
    // halve the real k vs the reported one
    val step = math.max(1L, half / kSem)
    val centroids = emb.filter(col("vec_id") % step === 0 && col("vec_id") < half)
      .orderBy(col("vec_id")).limit(kSem)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .persist()
    val kActual = centroids.count()
    val t1s = System.nanoTime()
    val surv = Curation.semanticDedup(spark, emb, centroids, threshold = 0.99).persist()
    val nSurv = surv.count()
    val semSec = (System.nanoTime() - t1s) / 1e9
    // every planted copy must be dropped (its source has the smaller id
    // and the 0.01-nudge keeps it in the same coarse cell); every
    // non-planted vector must survive
    val copiesSurvived = surv
      .filter(col("vec_id") >= half && col("vec_id") < half + planted).count()
    surv.unpersist()
    // two-level assignment leg (the k ∝ n scale path: flat assignment is
    // O(n·k·dim); hier is O(n·2√k·dim)) — same centroids, branch = √k
    val t2s = System.nanoTime()
    val survH = Curation.semanticDedupHier(spark, emb, centroids,
      threshold = 0.99).persist()
    val nSurvH = survH.count()
    val semHierSec = (System.nanoTime() - t2s) / 1e9
    val copiesSurvivedH = survH
      .filter(col("vec_id") >= half && col("vec_id") < half + planted).count()
    survH.unpersist(); centroids.unpersist(); releaseEmbAfter("semantic")
    println(s"""{"dedup_scale_semantic":{"n_vecs":$n,"k":$kActual,"sec":$semSec,""" +
      s""""survivors":$nSurv,"planted_dropped":${planted - copiesSurvived},""" +
      s""""hier_sec":$semHierSec,"hier_survivors":$nSurvH,""" +
      s""""hier_planted_dropped":${planted - copiesSurvivedH}}}""")
    }

    if (stages("text")) {
    // ---- 3) linear text-analysis throughput (repetition + vocab) --------
    // regenerate the doc frame (released after stage 1) and time the two
    // corpus-level text aggregations — both must stay map-side-combinable
    // single-shuffle shapes at any n
    val docs2 = spark.range(n).select(col("id").as("doc_id"), textCol.as("text"))
      .repartition(cpus.toInt).persist()
    docs2.count()
    val t2 = System.nanoTime()
    val nRep = TextOps.repetitionSignals(docs2).count()
    val repSec = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val vocab = docs2.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("n_occurrences").desc, col("tok")).limit(100).count()
    val vocabSec = (System.nanoTime() - t3) / 1e9
    docs2.unpersist()
    println(s"""{"dedup_scale_text":{"n_docs":$n,""" +
      s""""repetition_sec":$repSec,"repetition_rows":$nRep,"vocab_sec":$vocabSec,"vocab_rows":$vocab}}""")
    }

    if (stages("inc")) {
    // ---- 4) incremental bloom dedup (q94's path) ------------------------
    // history = n docs, incoming = n/10 (half dups of history, half new):
    // the daily-ingest ratio. Times the two phases separately — sketch
    // build (one narrow history scan) and the filter+verify pass — and
    // checks exactness against the planted split.
    val hist = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("h"), col("id")).as("text")).repartition(cpus.toInt).persist()
    hist.count()
    val nInc = math.max(n / 10, 2L)
    val inc = spark.range(nInc).select((col("id") + n).as("doc_id"),
      when(col("id") % 2 === 0, concat(lit("h"), col("id")))       // dup of history
        .otherwise(concat(lit("x"), col("id"))).as("text"))        // new
      .repartition(cpus.toInt).persist()
    inc.count()
    val t4 = System.nanoTime()
    val newDocs = Dedup.incrementalNew(hist, inc, expectedHistoryDocs = n).persist()
    val nNew = newDocs.count()
    val incSec = (System.nanoTime() - t4) / 1e9
    val expectNew = nInc - (nInc + 1) / 2
    require(nNew == expectNew, s"incremental dedup wrong: $nNew != $expectNew")
    newDocs.unpersist(); hist.unpersist(); inc.unpersist()
    println(s"""{"incremental_dedup_smoke":{"n_history":$n,"n_incoming":$nInc,""" +
      s""""sec":$incSec,"new_docs":$nNew,"docs_per_sec":${(n + nInc) / incSec}}}""")
    }

    if (stages("incstream")) {
    // ---- 5) STREAMING incremental dedup (q95's path) at scale, with
    // REAL multi-batch replay: incoming written as 8 chunk files taken
    // one per micro-batch (maxFilesPerTrigger=1), with in-stream repeats
    // planted ACROSS chunks so the cross-batch
    // dropDuplicatesWithinWatermark state actually carries — the regime
    // where SessionScaleSmoke caught a real q89 bug. Gates: set equality
    // with the batch path and exactly-once emission, both at scale.
    val hist = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("h"), col("id")).as("text")).repartition(cpus.toInt).persist()
    hist.count()
    val nInc = math.max(n / 10, 16L)
    val incText = when(col("id") % 2 === 0, concat(lit("h"), col("id")))   // history dup
      .when(col("id") % 10 === 9,
        concat(lit("r"), pmod(col("id"), lit(997L))))                      // cross-chunk repeats
      .otherwise(concat(lit("x"), col("id")))                              // new
    val incDir = graft.TempDirs.create("graft_incstream_scale_")
    spark.range(nInc).select((col("id") + n).as("doc_id"), incText.as("text"))
      .repartition(8).write.parquet(s"$incDir/in")
    val t5 = System.nanoTime()
    val streamed = graft.streaming.DocsStream.newFingerprints(
        spark, s"$incDir/in", hist, n, 0.01, "inc_scale_stream",
        maxFilesPerTrigger = Some(1))
      .persist()
    val emissions = streamed.count()
    val distinctFps = streamed.distinct().count()
    val secS = (System.nanoTime() - t5) / 1e9
    val batchFps = Dedup
      .incrementalNew(hist, spark.read.parquet(s"$incDir/in"), n)
      .select(Dedup.textFp.as("fp")).distinct().persist()
    val setDiff = streamed.distinct().exceptAll(batchFps).count() +
      batchFps.exceptAll(streamed.distinct()).count()
    batchFps.unpersist(); streamed.unpersist(); hist.unpersist()
    require(setDiff == 0, s"stream/batch set diverged by $setDiff fps")
    require(emissions == distinctFps,
      s"stream emitted $emissions rows for $distinctFps distinct fps")
    println(s"""{"stream_inc_dedup_smoke":{"n_history":$n,"n_incoming":$nInc,""" +
      s""""sec":$secS,"emissions":$emissions,"distinct_new_fps":$distinctFps,""" +
      s""""set_diff_vs_batch":$setDiff,"docs_per_sec":${(n + nInc) / secS}}}""")
    }

    if (stages("incmh")) {
    // ---- 5b) incremental MINHASH near-dup (q106's path) at scale ------
    // history = n random 30-token docs, incoming = n/10: even slots are
    // near-copies of history doc j (last token changed — 3 of 28
    // 3-shingles differ, jaccard = 25/31 ≈ 0.81, well above the 0.5
    // threshold), odd slots fresh. The history band table streams
    // map-side against the BROADCAST day-batch bands. Banding admits a
    // miss probability per planted pair of (1−J²)^4 ≈ 0.015 at J ≈ 0.81,
    // so the 97% recall floor leaves ~2× headroom over the ~1.5%
    // expected miss rate; false drops must be exactly zero (verification
    // is exact Jaccard).
    def tokText(seed: org.apache.spark.sql.Column,
        lastAlt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat_ws(" ", transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"), pmod(xxhash64(seed * 31 + j,
          when(j === 29, lastAlt).otherwise(lit(0L))), lit(50000L)))))
    val hist = spark.range(n).select(col("id").as("doc_id"),
      tokText(col("id"), lit(0L)).as("text")).repartition(cpus.toInt).persist()
    hist.count()
    val nInc = math.max(n / 10, 16L)
    val j0 = col("id")
    val incoming = spark.range(nInc).select((col("id") + n).as("doc_id"),
      when(j0 % 2 === 0, tokText(j0, lit(1L)))                    // near-copy
        .otherwise(tokText(j0 + n + 5000000000L, lit(0L))).as("text")) // fresh
      .repartition(cpus.toInt).persist()
    incoming.count()
    val t5b = System.nanoTime()
    val surv = Dedup.incrementalMinhashNew(hist, incoming, n = 3,
      simThreshold = 0.5).persist()
    val nSurv = surv.count()
    val incMhSec = (System.nanoTime() - t5b) / 1e9
    val mhCand = drainCandidates()
    val planted = (nInc + 1) / 2
    val plantedSurvived = surv.filter((col("doc_id") - n) % 2 === 0).count()
    val freshDropped = (nInc - planted) - (nSurv - plantedSurvived)
    surv.unpersist(); incoming.unpersist(); hist.unpersist()
    require(freshDropped == 0, s"$freshDropped fresh docs falsely dropped")
    require(planted - plantedSurvived >= (planted * 97) / 100,
      s"only ${planted - plantedSurvived} of $planted planted near-dups dropped")
    println(s"""{"incmh_smoke":{"n_history":$n,"n_incoming":$nInc,"sec":$incMhSec,""" +
      s""""survivors":$nSurv,"planted_dropped":${planted - plantedSurvived},""" +
      s""""planted":$planted,"false_drops":$freshDropped,"n_candidates":$mhCand,""" +
      s""""docs_per_sec":${(n + nInc) / incMhSec}}}""")
    }

    if (stages("seminc")) {
    // ---- 6) incremental SEMANTIC dedup (q104's path) at scale ----------
    // history = n vectors, incoming = n/10 (the daily-ingest ratio): even
    // incoming slots are near-copies (cos ≈ 0.9999) of history vectors,
    // odd slots are fresh randoms. Assignment is the HIER kernel (branch
    // = √k — the k ∝ n scale path, now with the distributed super-fit);
    // history streams through one broadcast hash join and never
    // shuffles. Gates: ≥98% of planted copies dropped (hier boundary
    // approximation allows the slack), ZERO fresh vectors dropped.
    val dim = 64
    val genU = udf { (seedId: Long, copyOf: Long) =>
      val src = if (copyOf >= 0) copyOf else seedId
      val v = Array.tabulate(dim)(j => graft.functions.VectorOps.syntheticNoise(src + 7919L, j))
      if (copyOf >= 0) v(0) += 0.01f
      v.toSeq
    }
    val hist = spark.range(n)
      .select(col("id").as("vec_id"), genU(col("id"), lit(-1L)).as("embedding"))
      .repartition(cpus.toInt).persist()
    hist.count()
    val nInc = math.max(n / 10, 16L)
    // fresh seeds offset past any history seed so no accidental dup
    val copyOf = when(col("id") % 2 === 0, col("id")).otherwise(lit(-1L))
    val incoming = spark.range(nInc)
      .select((col("id") + n).as("vec_id"),
        genU(col("id") + n + 5000000000L, copyOf).as("embedding"))
      .repartition(cpus.toInt).persist()
    incoming.count()
    val kSem = 4096
    val step = math.max(1L, n / kSem)
    val centroids = hist.filter(col("vec_id") % step === 0)
      .orderBy(col("vec_id")).limit(kSem)
      .select(col("vec_id").as("cid"), col("embedding").as("ce")).persist()
    val kActual = centroids.count()
    val t6 = System.nanoTime()
    val surv = Curation.incrementalSemanticDedup(spark, hist, incoming, centroids,
      threshold = 0.99, branch = -1).persist()
    val nSurv = surv.count()
    val semIncSec = (System.nanoTime() - t6) / 1e9
    val planted = (nInc + 1) / 2
    val plantedSurvived = surv.filter((col("vec_id") - n) % 2 === 0).count()
    val freshDropped = (nInc - planted) - (nSurv - plantedSurvived)
    surv.unpersist(); centroids.unpersist(); incoming.unpersist(); hist.unpersist()
    require(freshDropped == 0, s"$freshDropped fresh vectors falsely dropped")
    require(planted - plantedSurvived >= (planted * 98) / 100,
      s"only ${planted - plantedSurvived} of $planted planted dups dropped")
    println(s"""{"seminc_smoke":{"n_history":$n,"n_incoming":$nInc,"k":$kActual,""" +
      s""""sec":$semIncSec,"survivors":$nSurv,""" +
      s""""planted_dropped":${planted - plantedSurvived},"planted":$planted,""" +
      s""""false_drops":$freshDropped,"vecs_per_sec":${(n + nInc) / semIncSec}}}""")
    }

    if (stages("ingstream")) {
    // ---- 7) CONTINUOUS ingest curation (q112's path) at scale ----------
    // The four-stage conjunction (quality ∧ exact ∧ minhash ∧ semantic)
    // over 4 real micro-batches, against a text+vector history of n.
    // Per-category recovery is each component smoke's job (inc / incmh /
    // seminc); the gate HERE is the composition's own contract — the
    // streamed survivor set must EXACTLY equal the batch conjunction —
    // plus the amortization claim: static sides (bloom, minhash band
    // index, assigned history vectors) are built once per stream, so
    // per-batch cost is day-batch-sized. Incoming slots cycle
    // exact-dup / minhash-near-copy / vector-near-copy / fresh; the
    // content-hash quality filter drops ~half of each class on top,
    // which the equality gate absorbs by construction.
    val dim = 64
    def tokText7(seed: org.apache.spark.sql.Column,
        lastAlt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat_ws(" ", transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"), pmod(xxhash64(seed * 31 + j,
          when(j === 29, lastAlt).otherwise(lit(0L))), lit(50000L)))))
    val genU7 = udf { (seedId: Long, copyOf: Long) =>
      val src = if (copyOf >= 0) copyOf else seedId
      val v = Array.tabulate(dim)(j => graft.functions.VectorOps.syntheticNoise(src + 7919L, j))
      if (copyOf >= 0) v(0) += 0.01f
      v.toSeq
    }
    val hist = spark.range(n).select(col("id").as("doc_id"),
      tokText7(col("id"), lit(0L)).as("text"),
      lit(100L).as("n_chars")).repartition(cpus.toInt).persist()
    hist.count()
    val histEmb = spark.range(n).select(col("id").as("vec_id"),
      genU7(col("id"), lit(-1L)).as("embedding")).repartition(cpus.toInt).persist()
    histEmb.count()
    val nInc = math.max(n / 10, 16L)
    val slot = col("id") % 4
    val incText = when(slot === 0, tokText7(col("id") % n, lit(0L)))        // exact dup
      .when(slot === 1, tokText7(col("id") % n, lit(1L)))                   // minhash near-copy
      .otherwise(tokText7(col("id") + n + 5000000000L, lit(0L)))            // fresh text
    val incCopyOf = when(slot === 2, col("id") % n).otherwise(lit(-1L))     // vector near-copy
    val incDir = graft.TempDirs.create("graft_ingstream_scale_")
    val incoming = spark.range(nInc).select((col("id") + n).as("doc_id"),
      incText.as("text"), lit(100L).as("n_chars"),
      genU7(col("id") + n + 9000000000L, incCopyOf).as("embedding"))
      .persist()
    incoming.count()
    incoming.select("doc_id", "text", "n_chars").repartition(4)
      .write.parquet(s"$incDir/in")
    val embLookup = histEmb.unionByName(
      incoming.select(col("doc_id").as("vec_id"), col("embedding")))
    val kIng = 4096
    val stepIng = math.max(1L, n / kIng)
    val centroids = histEmb.filter(col("vec_id") % stepIng === 0)
      .orderBy(col("vec_id")).limit(kIng)
      .select(col("vec_id").as("cid"), col("embedding").as("ce")).persist()
    val kActualIng = centroids.count()
    val bloom = Dedup.historyBloomPredicate(hist, n, 0.01)
    val t7 = System.nanoTime()
    val streamed = graft.streaming.IngestStream.curatedIngest(spark,
      s"$incDir/in", hist, histEmb, embLookup, centroids, bloom,
      cosineThreshold = 0.99, shingleN = 3, simThreshold = 0.5,
      incDir, "ingest_scale_stream", maxFilesPerTrigger = Some(1),
      branch = -1).persist()
    val nStreamed = streamed.count()
    val ingSec = (System.nanoTime() - t7) / 1e9
    // batch reference: the same conjunction via the batch operators
    val t7b = System.nanoTime()
    val posIds = graft.operators.Quality.qualityScore(incoming)
      .filter(col("margin_sum") > 0).select("doc_id")
    val afterQ = incoming.join(posIds, Seq("doc_id"), "left_semi")
    val afterE = Dedup.incrementalNew(hist, afterQ, bloom)
    val afterM = Dedup.incrementalMinhashNew(hist, afterE, n = 3, simThreshold = 0.5)
    val semIds = Curation.incrementalSemanticDedup(spark, histEmb,
      incoming.select(col("doc_id").as("vec_id"), col("embedding")),
      centroids, threshold = 0.99, branch = -1)
      .select(col("vec_id").as("doc_id"))
    val batch = afterM.join(semIds, Seq("doc_id"), "left_semi")
      .select("doc_id", "n_chars").persist()
    val nBatch = batch.count()
    val batchSec = (System.nanoTime() - t7b) / 1e9
    val setDiff = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
    streamed.unpersist(); batch.unpersist(); centroids.unpersist()
    incoming.unpersist(); histEmb.unpersist(); hist.unpersist()
    require(setDiff == 0, s"stream/batch conjunction diverged by $setDiff rows")
    println(s"""{"ingstream_smoke":{"n_history":$n,"n_incoming":$nInc,""" +
      s""""k":$kActualIng,"stream_sec":$ingSec,"batch_sec":$batchSec,""" +
      s""""survivors":$nStreamed,"batch_survivors":$nBatch,"set_diff":$setDiff,""" +
      s""""docs_per_sec":${(n + nInc) / ingSec}}}""")
    }
    spark.stop()
  }
}
