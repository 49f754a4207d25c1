package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.{CountDownLatch, Executors}
import java.util.concurrent.atomic.AtomicInteger

/** Concurrent HTTP latency client against the serving tier — the analog
  * of the reference's bench client (`/root/reference/scripts/client.py:50-108`):
  * fires `nQueries` POST /query requests from `concurrency` threads and
  * reports p50/p95/p99 latency plus aggregate QPS.
  *
  *   sbt "runMain graft.ServeBench /root/testdata/sf0.001 200 4"
  *   sbt "runMain graft.ServeBench gen:200000:64 2000 8"   # synthetic 200k×64
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfArg = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val nQueries = if (args.length > 1) args(1).toInt else 200
    val concurrency = if (args.length > 2) args(2).toInt else 4
    // "mutate": run the same timed load while a background thread
    // alternates POST /reload between the original and a mutated
    // (delete + upsert) saved index — p50/p99 UNDER INDEX CHURN, the
    // latency cost of the atomic Engine swap on the serving path.
    // "filtered": every request carries "label": 7 — the label-filtered
    // serving path (selectivity-aware widening + in-scan skip); needs a
    // corpus with a label column (the testdata layout, not gen:).
    // "spark": every request carries "engine":"spark" — the distributed
    // plan per request instead of the hot tier (the path that scales
    // past driver RAM); this is the leg the per-request model-broadcast
    // memoization exists for.
    // "sharded": serve over a SHARDED-MANIFEST layout — a generation
    // published by the object-store (CondPut) rebalance whose untouched
    // clusters ride as carry-manifest shards (carryShardTarget lowered so
    // the small corpus takes the sharded listing shape, the
    // ManifestScaleSmoke construction). The timed load runs after one
    // /reload over that layout: the row proves the serving tier resolves
    // a sharded generation and measures no regression vs the plain band.
    val mode = if (args.length > 3) args(3) else ""
    val mutate = mode == "mutate"
    val filtered = mode == "filtered"
    val sparkEngine = mode == "spark"
    val sharded = mode == "sharded"

    // point-query serving tier: single-row query batches make AQE's
    // per-stage re-planning and wide shuffles pure overhead — a static
    // 2-partition plan halves per-request latency
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // "gen:n:dim" → serve a synthetic corpus well beyond the testdata
    // sizes (deterministic splitmix-mixed vectors, the ScaleSmoke family),
    // written once to a temp dir in the testdata layout
    val sfDir = if (!sfArg.startsWith("gen:")) sfArg else {
      val parts = sfArg.split(":")
      require(parts.length == 3, s"expected gen:n:dim, got '$sfArg'")
      val (n, dim) =
        try (parts(1).toLong, parts(2).toInt)
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"expected integer n and dim in gen:n:dim, got '$sfArg'")
        }
      val out = java.nio.file.Files.createTempDirectory("graft_serve_gen_")
      // generated corpus is scratch — remove it when the bench exits
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        if (Files.exists(out))
          Files.walk(out).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => { Files.deleteIfExists(p); () })
      }))
      val genUdf = udf { (id: Long) =>
        Array.tabulate(dim)(j =>
          graft.functions.VectorOps.syntheticNoise(id + 7919L, j)).toSeq
      }
      spark.range(n).select(col("id").as("vec_id"), genUdf(col("id")).as("embedding"))
        .write.parquet(s"$out/embeddings.parquet")
      System.err.println(s"[servebench] generated $n x $dim vectors at $out")
      out.toString
    }

    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val server = Serve.start(spark, sfDir, port)
    try {
      // query vectors: first 16 embeddings, round-robined across requests
      val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .filter(col("vec_id") < 16).orderBy(col("vec_id"))
        .select("embedding").collect().map(_.getSeq[Float](0))
      val labelField = if (filtered) """, "label": 7""" else ""
      val engineField = if (sparkEngine) """, "engine": "spark"""" else ""
      val bodies = vecs.map(v =>
        s"""{"query": ${v.mkString("[", ",", "]")}, "top_k": 10, "probe": 8""" +
          s"$labelField$engineField}")

      val client = HttpClient.newHttpClient()
      def fire(i: Int): Long = {
        val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/query"))
          .POST(HttpRequest.BodyPublishers.ofString(bodies(i % bodies.length))).build()
        val t0 = System.nanoTime()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200, s"status ${resp.statusCode()}: ${resp.body()}")
        System.nanoTime() - t0
      }
      if (sharded) {
        import graft.operators.{CondPutCommit, LayoutCommit, LayoutFs, RabitqIndex}
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select("vec_id", "embedding")
        // q116's skew construction: fit on the lower halfspace, append the
        // upper — appends pile into boundary clusters, so the rebalance
        // splits a minority and CARRIES the majority by reference
        val lower = element_at(col("embedding"), 1) < 0f
        val (model, index0) = RabitqIndex.build(spark, emb.filter(lower), 16, 42L)
        val dir = java.nio.file.Files
          .createTempDirectory("servebench_sharded").toString + "/idx"
        RabitqIndex.save(spark, model, index0, dir)
        RabitqIndex.appendVectors(spark, model, emb.filter(!lower))
          .write.mode("append").partitionBy("cluster_id").parquet(s"$dir/index")
        // small-corpus file counts would keep the flat `_CARRY` shape at
        // the deployed 4096 target; lowering it puts this run in the same
        // sharded-manifest regime the default produces at 100 TB
        val savedTarget = RabitqIndex.carryShardTarget
        RabitqIndex.carryShardTarget = 8
        try {
          val rep = LayoutCommit.withOps(CondPutCommit) {
            RabitqIndex.rebalanceIndex(spark, dir, emb, maxSizeFactor = 1.4)
          }
          require(rep.split.nonEmpty,
            s"sharded-mode construction did not trigger a split ($rep)")
          val gen = LayoutFs.baseName(RabitqIndex.indexDataDir(dir))
          require(RabitqIndex.readCarryShards(dir, gen).nonEmpty,
            "expected the sharded carry-manifest shape")
        } finally RabitqIndex.carryShardTarget = savedTarget
        val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/reload"))
          .POST(HttpRequest.BodyPublishers.ofString(
            s"""{"index_dir": "$dir", "base": "$sfDir/embeddings.parquet"}""")).build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200, s"sharded reload failed: ${resp.body()}")
      }
      fire(0); fire(1) // warm the serving path before timing

      // under-mutation churn: two saved engines (the served corpus and a
      // delete-%7 + upsert-twins mutation of it), reloaded alternately
      // every ~150 ms for the duration of the timed run
      val reloads = new AtomicInteger(0)
      val churnStop = new java.util.concurrent.atomic.AtomicBoolean(false)
      // a reload failure must not die silently inside the daemon thread —
      // the bench would keep running and print mutate-mode numbers that
      // measured little or no churn, corrupting the A/B it exists for
      val churnError = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
      val churn: Option[Thread] = if (!mutate) None else {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select("vec_id", "embedding")
        val k = math.max(16, math.min(1024, math.sqrt(emb.count().toDouble).toInt))
        val (model, index) = graft.operators.RabitqIndex.build(spark, emb, k, 42L)
        val dirA = java.nio.file.Files.createTempDirectory("servebench_a").toString
        graft.operators.RabitqIndex.save(spark, model, index, dirA)
        val newVecs = emb.filter(col("vec_id") < 50)
          .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
        val kept = graft.operators.RabitqIndex.deleteVectors(index,
          emb.filter(col("vec_id") % 7 === 3).select("vec_id"))
        val index2 = graft.operators.RabitqIndex.upsertVectors(spark, model, kept, newVecs)
        val dirB = java.nio.file.Files.createTempDirectory("servebench_b").toString
        graft.operators.RabitqIndex.save(spark, model, index2, dirB)
        val baseB = java.nio.file.Files.createTempDirectory("servebench_bb").toString + "/b"
        emb.filter(col("vec_id") % 7 =!= 3).unionByName(newVecs).write.parquet(baseB)
        val baseA = s"$sfDir/embeddings.parquet"
        val t = new Thread(() => {
          try {
            var flip = false
            while (!churnStop.get()) {
              val (d, b) = if (flip) (dirA, baseA) else (dirB, baseB)
              val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/reload"))
                .POST(HttpRequest.BodyPublishers.ofString(
                  s"""{"index_dir": "$d", "base": "$b"}""")).build()
              val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
              require(resp.statusCode() == 200, s"reload failed: ${resp.body()}")
              reloads.incrementAndGet()
              flip = !flip
              Thread.sleep(150)
            }
          } catch { case e: Throwable => churnError.set(e) }
        })
        t.setDaemon(true); t.start(); Some(t)
      }

      val latencies = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val next = new AtomicInteger(0)
      val done = new CountDownLatch(concurrency)
      val pool = Executors.newFixedThreadPool(concurrency)
      val t0 = System.nanoTime()
      (0 until concurrency).foreach { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            try {
              var i = next.getAndIncrement()
              while (i < nQueries) {
                latencies.add(fire(i))
                i = next.getAndIncrement()
              }
            } finally done.countDown()
          }
        })
      }
      done.await()
      // close the timed window BEFORE stopping the churn thread — its
      // join (up to 5 s mid-reload) would otherwise inflate wallSec and
      // understate qps, corrupting the mutate-vs-plain A/B
      val wallSec = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      churnStop.set(true)
      churn.foreach { th =>
        th.join(15000)
        // a reload still blocked in client.send when a bounded join
        // returns can fail AFTER the checks below read churnError — if
        // the thread is still alive the run cannot vouch for its churn,
        // so record that as a failure rather than report clean numbers
        if (th.isAlive)
          churnError.compareAndSet(null, new IllegalStateException(
            "churn thread still blocked in /reload after 15s — " +
              "mutate-mode churn unverified"))
      }

      val sorted = latencies.toArray(new Array[java.lang.Long](0)).map(_.toLong).sorted
      def pct(p: Double): Double = sorted((p * (sorted.length - 1)).round.toInt) / 1e6
      val mutTag = if (mutate) s""","reloads":${reloads.get()}"""
        else if (filtered) ""","mode":"filtered""""
        else if (sparkEngine) ""","mode":"spark""""
        else if (sharded) ""","mode":"sharded"""" else ""
      val failTag = Option(churnError.get())
        .map(e => s""","churn_failed":"${Serve.jsonEscape(
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")}"""")
        .getOrElse("")
      println(s"""{"serve_bench":{"sf_dir":"$sfDir","n_queries":${sorted.length},""" +
        s""""concurrency":$concurrency,"qps":${sorted.length / wallSec},""" +
        s""""p50_ms":${pct(0.50)},"p95_ms":${pct(0.95)},"p99_ms":${pct(0.99)}$mutTag$failTag}}""")
      // the mutate A/B is void if churn died mid-run — fail loudly
      Option(churnError.get()).foreach(e =>
        throw new IllegalStateException("reload churn thread failed mid-bench", e))
    } finally {
      server.stop(0)
      spark.stop()
    }
  }
}
