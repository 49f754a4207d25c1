package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** HTTP query service — parity with the reference's axum tier
  * (`/root/reference/crates/service/src/main.rs:36-96`): POST /query
  * `{"query": [...], "top_k": k, "probe": p}` → `{"ids": [...],
  * "scores": [...]}`, plus GET /health and GET /metrics. Dependency-free
  * (JDK HttpServer; the engine contract is batch DataFrames — this tier
  * exists to show the serving surface maps onto a long-lived session with
  * a persisted index, the role Spark Connect would play in production).
  *
  *   sbt "runMain graft.Serve /root/testdata/sf0.001 18080"
  */
object Serve {

  /** One immutable serving snapshot: swapped atomically by `/reload`,
    * read once per request — the unit of consistency under mutation.
    * `nRows`/`nTombstones` are the layout stats captured at load/reload
    * time (the cached index frame is already tombstone-anti-joined, so
    * the debt half of the health report must ride in the snapshot —
    * it's what schedules compaction).
    */
  private final case class Engine(model: RabitqModel, index: org.apache.spark.sql.DataFrame,
                                  base: org.apache.spark.sql.DataFrame, hot: HotTier,
                                  nRows: Long, nTombstones: Long)

  // must be set before the HttpServer class initializes: without
  // TCP_NODELAY the response write stalls in the Nagle/delayed-ACK
  // handshake and every request floors at ~40 ms regardless of compute
  System.setProperty("sun.net.httpserver.nodelay", "true")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val port = if (args.length > 1) args(1).toInt else 18080
    val indexDir = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = start(spark, sfDir, port, indexDir)
    println(s"graft serving on :$port (Ctrl-C to stop)")
    // V4: SIGINT/SIGTERM → drain, then stop the session
    sys.addShutdownHook { gracefulStop(server); spark.stop() }
    Thread.currentThread().join()
  }

  /** V4 graceful shutdown — parity with the reference's axum
    * `with_graceful_shutdown` on SIGINT/SIGTERM
    * (`/root/reference/crates/service/src/main.rs:18-31,93`): the
    * listening socket closes immediately (new connections refused) and
    * in-flight exchanges drain for up to `drainSeconds` before the
    * server returns.
    */
  def gracefulStop(server: HttpServer, drainSeconds: Int = 5): Unit =
    server.stop(drainSeconds)

  /** Build the index, persist base + index, and start serving. Returns the
    * server (caller stops it).
    *
    * Two engines per request (reference-parity default, Spark opt-in):
    *  - default: the driver-memory HotTier — microsecond arithmetic, no
    *    job scheduling, byte-identical results (the reference service's
    *    in-RAM shape, `crates/service/src/main.rs:68-96`);
    *  - `"engine":"spark"` in the body: the distributed plan
    *    (`RabitqQuery.topK`) — the path that scales past driver RAM.
    */
  def start(spark: SparkSession, sfDir: String, port: Int,
            indexDir: Option[String] = None): HttpServer = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet").persist()
    // load a persisted index when given one (the reference service's cold
    // start: model from disk, no training); otherwise train in-process.
    // loadLive, not load: a maintained layout (VecsStream.maintainIndex)
    // carries an uncompacted tombstone log, and serving the raw layout
    // would RESURRECT deleted vectors — the anti-join is a no-op when no
    // log exists
    val (model, index0) = indexDir match {
      case Some(dir) => RabitqIndex.loadLive(spark, dir)
      case None =>
        // √n clusters (IVF rule of thumb, clamped): a fixed small k makes
        // every query rough-scan n·nprobe/k candidates — at 200k vectors
        // and k=16 that is ~100k asymDots per request (p50 ≈ 58 ms where
        // k=447 scans ~3.6k and serves in single-digit ms)
        val nBase = base.count()
        val k = math.max(16, math.min(1024, math.sqrt(nBase.toDouble).toInt))
        // sampled fit beyond the driver-friendly range, exact fit below it
        if (nBase > 100000L)
          RabitqIndex.buildSampled(spark, base, numClusters = k, sampleN = 100000L, seed = 42L)
        else RabitqIndex.build(spark, base, numClusters = k, seed = 42L)
    }
    // fail fast on a mismatched saved index (wrong dataset/scale factor):
    // a silent mismatch surfaces later as per-query NPEs (index vec_ids
    // absent from the base map) or quietly wrong neighbors. Only the
    // load path can mismatch — a freshly built index is tautologically
    // consistent, so skip the extra job there.
    indexDir.foreach { dir =>
      val baseDim = base.select(size(col("embedding"))).limit(1).collect()
        .headOption.map(_.getInt(0))
        .getOrElse(throw new IllegalArgumentException(
          s"base embeddings at $sfDir are empty — nothing to serve"))
      require(model.params.dim == baseDim,
        s"saved index dim ${model.params.dim} != base embedding dim $baseDim — " +
          s"index at $dir was built from a different dataset")
    }
    val index = withLabels(index0, base).persist()
    val nLiveWarm = index.count(); base.count() // warm caches before first request
    // tombstone debt for /describe: the cached frame is already live
    // (anti-joined), so the raw-row/tombstone half comes from the layout
    // once per engine build. A freshly trained engine has no log.
    val (nRows, nTomb) = indexDir match {
      case Some(d) => RabitqIndex.layoutStats(spark, d)
      case None    => (nLiveWarm, 0L)
    }
    val hot = HotTier.fromIndex(spark, model, index, base)
    // SERVING UNDER MUTATION: every request reads ONE immutable Engine
    // snapshot from this reference, so an index swap (`/reload`) is
    // atomic per request — a query sees entirely the old or entirely the
    // new index, never a torn mix of model/index/base/hot-tier. The
    // reference serves read-only (`crates/service`); composing its
    // mutation boxes (README:18) with serving needs exactly this
    // copy-on-swap discipline.
    // probe-budget scale for a rebalance-grown layout rides in the MODEL
    // now (RabitqModel.rerankScale, populated by load from the BUILT_K
    // sidecar) — every engine leg reads it from there, so the serving
    // tier and the batch paths can never disagree.
    val engineRef = new java.util.concurrent.atomic.AtomicReference(
      Engine(model, index, base, hot, nRows, nTomb))
    // per-server counter (a JVM-global would bleed across serve instances)
    val queriesServed = new AtomicLong(0)

    // loopback only: this demo tier has no auth; production would sit
    // behind Spark Connect / a gateway
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/health", (ex: HttpExchange) => respond(ex, 200, "OK"))
    server.createContext("/metrics", (ex: HttpExchange) =>
      respond(ex, 200, s"""{"queries_served":${queriesServed.get()}}"""))
    // GET/POST /describe: the FULL RabitqIndex.describeIndex health
    // report for the LIVE engine snapshot (ops hit this to decide when
    // to compact/rebalance off-path and /reload). Same split criterion
    // as rebalanceIndex at its default maxSizeFactor — the spec pins
    // field-for-field equality with describeIndex over the same dir,
    // tombstone-debt fields included. Served from the cached index frame
    // (tombstones were already anti-joined at load; the raw/tombstone
    // counts ride in the snapshot), so the cost is one numClusters-row
    // aggregate per call.
    server.createContext("/describe", (ex: HttpExchange) => {
      try {
        val eng = engineRef.get()
        val sizes = eng.index.groupBy("cluster_id").count()
          .collect().map(_.getLong(1))
        val nLive = sizes.sum
        val k = eng.model.params.numClusters
        val maxSize = if (sizes.isEmpty) 0L else sizes.max
        val mean = nLive.toDouble / k
        val oversized = sizes.count(s => s > 1.5 * mean && math.ceil(s / mean) >= 2)
        val debt =
          if (eng.nRows == 0) 0.0 else eng.nTombstones.toDouble / eng.nRows
        respond(ex, 200,
          s"""{"num_clusters":$k,"n_rows":${eng.nRows},"n_live":$nLive,""" +
          s""""n_tombstones":${eng.nTombstones},"tombstone_debt":$debt,""" +
          s""""max_cluster_size":$maxSize,"mean_cluster_size":$mean,""" +
          s""""skew":${if (mean == 0) 0.0 else maxSize / mean},""" +
          s""""clusters_oversized":$oversized,"needs_rebalance":${oversized > 0}}""")
      } catch {
        case e: Throwable =>
          val msg = jsonEscape(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
          respond(ex, 500, s"""{"error":"$msg"}""")
      }
    })
    server.createContext("/query", (ex: HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val vec = parseFloatArray(body, "query")
        val topK = parseInt(body, "top_k").getOrElse(10)
        val eng = engineRef.get() // one snapshot per request — swap-atomic
        // default probe follows k so the probed FRACTION (not count) is
        // corpus-size-invariant — the fixed 8 was 50% of the old fixed
        // k=16, and silently shrinking to 8/k would degrade default-recall
        // as corpora grow; explicit "probe" in the request overrides.
        // On a rebalance-grown layout the RERANK budget is rescaled by
        // numClusters/BUILT_K (model.rerankScale) like the batch paths —
        // the measured post-split recall loss is shortlist displacement,
        // not probe coverage (RabitqIndex.scaledRerank), so the probe
        // itself is left as requested. The spark leg scales INSIDE
        // RabitqQuery.topK (the model carries the factor), so only the
        // hot-tier leg applies it here — both legs see the same budget.
        val k = eng.model.params.numClusters
        val probe = parseInt(body, "probe")
          .getOrElse(math.max(8, (k + 1) / 2))
        val rerankRaw = math.max(4 * topK, 64)
        val rerank = math.ceil(rerankRaw * eng.model.rerankScale).toInt
        // optional "label": filtered vector search on the serving path —
        // the batch filteredTopK composition (selectivity-aware probe
        // widening + in-scan label skip), reference-style metadata-aware
        // serving the reference itself lacks
        val label = parseInt(body, "label").map(_.toLong)
        val results: Array[(Long, Double)] =
          if (parseString(body, "engine").contains("spark")) {
            import spark.implicits._
            val qDf = Seq((0L, vec.toSeq)).toDF("query_id", "qvec")
            val res = label match {
              case Some(l) =>
                // the hot tier's label histogram IS the catalog statistic,
                // so both engines widen identically → identical results.
                // rerankRaw, not rerank: topK scales by model.rerankScale
                // internally — passing the pre-scaled budget would square
                // the factor
                RabitqQuery.filteredTopK(spark, eng.model, eng.index, eng.base,
                  qDf, col("label") === l, nprobe = probe, topk = topK,
                  rerank = rerankRaw, selectivity = Some(eng.hot.labelSelectivity(l)))
              case None =>
                RabitqQuery.topK(spark, eng.model, eng.index, eng.base, qDf,
                  nprobe = probe, topk = topK, rerank = rerankRaw)
            }
            res.orderBy(col("rank")).select("neighbor_id", "dist").collect()
              .map(r => (r.getLong(0), r.getDouble(1)))
          } else eng.hot.query(vec, probe, topK, rerank, label)
        queriesServed.incrementAndGet()
        val ids = results.map(_._1).mkString("[", ",", "]")
        val scores = results.map(_._2).mkString("[", ",", "]")
        respond(ex, 200, s"""{"ids":$ids,"scores":$scores}""")
      } catch {
        case e: Throwable =>
          val msg = jsonEscape(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
          respond(ex, 400, s"""{"error":"$msg"}""")
      }
    })
    // POST /reload {"index_dir": "...", "base": "<parquet path>"}: load a
    // saved (possibly mutated — appendVectors/upsertVectors output) index
    // and its base vectors, build the new hot tier OFF the serving path,
    // then swap atomically. In-flight queries keep the old snapshot; the
    // old cached index is released after the swap (lazy unpersist — any
    // job still reading it just recomputes).
    server.createContext("/reload", (ex: HttpExchange) => {
      // persisted frames are tracked so a failed reload releases them —
      // otherwise a retrying ops loop would accumulate cached datasets
      // until storage memory is exhausted
      val persisted = scala.collection.mutable.ListBuffer
        .empty[org.apache.spark.sql.DataFrame]
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val idxDir = parseString(body, "index_dir")
          .getOrElse(throw new IllegalArgumentException("missing 'index_dir'"))
        val basePath = parseString(body, "base")
          .getOrElse(s"$sfDir/embeddings.parquet")
        // loadLive: respect an uncompacted tombstone log (see start)
        val (m2, i2raw) = RabitqIndex.loadLive(spark, idxDir)
        // validate BEFORE persisting: an empty base is the same fatal
        // state start() rejects — a 200 here would silently serve nothing
        val b2raw = spark.read.parquet(basePath)
        val baseDim = b2raw.select(size(col("embedding"))).limit(1)
          .collect().headOption.map(_.getInt(0))
          .getOrElse(throw new IllegalArgumentException(
            s"reload base at $basePath is empty — nothing to serve"))
        require(m2.params.dim == baseDim,
          s"reloaded index dim ${m2.params.dim} != base embedding dim $baseDim")
        val b2 = b2raw.persist(); persisted += b2
        val i2 = withLabels(i2raw, b2).persist(); persisted += i2
        val n2 = b2.count(); i2.count()
        val (nRows2, nTomb2) = RabitqIndex.layoutStats(spark, idxDir)
        val hot2 = HotTier.fromIndex(spark, m2, i2, b2)
        val old = engineRef.getAndSet(Engine(m2, i2, b2, hot2, nRows2, nTomb2))
        // release the OLD engine's cache — but Spark keys the cache by
        // analyzed plan, so a reload from the same path would share the
        // entry with the frame just installed; unpersisting that shared
        // entry would evict the NEW engine's cache. Only drop frames
        // whose plan differs from the incoming ones.
        def release(oldDf: org.apache.spark.sql.DataFrame,
                    newDf: org.apache.spark.sql.DataFrame): Unit =
          if (!oldDf.queryExecution.analyzed.sameResult(newDf.queryExecution.analyzed))
            oldDf.unpersist(false)
        release(old.index, i2); release(old.base, b2)
        // the swap succeeded: b2/i2 are now the LIVE engine's frames. Clear
        // the rollback list BEFORE respond() — a late IOException (dropped
        // client) must not uncache the serving index, silently degrading
        // every subsequent query to lineage recompute.
        persisted.clear()
        respond(ex, 200, s"""{"reloaded":true,"n_base":$n2}""")
      } catch {
        case e: Throwable =>
          persisted.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
          val msg = jsonEscape(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
          respond(ex, 400, s"""{"error":"$msg"}""")
      }
    })
    // pooled: the Spark scheduler runs concurrent jobs from separate
    // threads (FIFO across stages), so overlapping requests pipeline
    // instead of queueing behind one another. Daemon threads — the pool
    // must not outlive server.stop() and pin the JVM.
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t }))
    server.start()
    server
  }

  /** The filtered-vector-search layout at serve time: when the base
    * carries a `label` column and the index rows don't already, join it
    * in ONCE at engine build (the annIndexLabeled shape) — label
    * predicates then filter index rows directly instead of joining base
    * per query. A label-free corpus serves exactly as before.
    */
  private def withLabels(index: DataFrame, base: DataFrame): DataFrame =
    if (base.columns.contains("label") && !index.columns.contains("label")) {
      // LEFT join + coverage check, not inner: an inner join would
      // silently drop index rows whose vec_id is missing from the base
      // (e.g. an upserted index reloaded against a stale base) and the
      // engine would serve 200s that can never return those vectors.
      // Mismatches must fail the build/reload loudly instead. The extra
      // counts run once per engine build, beside the existing warm-up
      // counts.
      // Uniqueness first: a base with DUPLICATED vec_ids would silently
      // multiply index rows through the join — inflated candidate sets
      // and duplicate neighbors in every response.
      val idCounts = base.agg(
        org.apache.spark.sql.functions.count(col("vec_id")).as("n"),
        org.apache.spark.sql.functions.countDistinct(col("vec_id")).as("nd")).head()
      require(idCounts.getLong(0) == idCounts.getLong(1),
        s"labeled base has duplicate vec_ids (${idCounts.getLong(0)} rows, " +
          s"${idCounts.getLong(1)} distinct) — joining labels would " +
          "multiply index rows; fix the base before serving")
      val lbl = base.select(col("vec_id"), col("label"),
        org.apache.spark.sql.functions.lit(true).as("__covered"))
      val joined = index.join(lbl, Seq("vec_id"), "left_outer")
      val missing = joined.filter(
        !org.apache.spark.sql.functions.coalesce(col("__covered"),
          org.apache.spark.sql.functions.lit(false))).count()
      require(missing == 0L,
        s"$missing index rows have no vec_id in the labeled base — " +
          "index/base mismatch (wrong base path for this index_dir?)")
      joined.drop("__covered")
    } else index

  /** Escape quotes/backslashes/control chars so exception messages can't
    * break the JSON error body.
    */
  private[graft] def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.toString
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }

  /** Minimal parsers for the fixed request shape (no JSON dependency). */
  private[graft] def parseFloatArray(json: String, key: String): Array[Float] = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*\\[([^\\]]*)\\]").matcher(json)
    require(m.find(), s"missing array field '$key'")
    val body = m.group(1).trim
    if (body.isEmpty) Array.empty else body.split(",").map(_.trim.toFloat)
  }

  private[graft] def parseString(json: String, key: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").matcher(json)
    if (m.find()) Some(m.group(1)) else None
  }

  private[graft] def parseInt(json: String, key: String): Option[Int] = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*(-?\\d+)").matcher(json)
    if (m.find()) Some(m.group(1).toInt) else None
  }
}
