package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators._

class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val sf = "/root/testdata/sf0.001"

  private def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")

  // ---------------- stratified sampling ---------------------------------
  test("stratifiedSample: deterministic, nested across rates, exact at 0 and 1") {
    val ids = (keep: DataFrame) => keep.select("doc_id").collect().map(_.getLong(0)).toSet
    val at = (r: Double) =>
      ids(Curation.stratifiedSample(docs, col("doc_id"), col("lang"), Map.empty, r))
    val s10 = at(0.1); val s30 = at(0.3); val s100 = at(1.0)
    assert(at(0.0).isEmpty)
    assert(s100.size == docs.count())
    // same hash + lower threshold ⇒ smaller sample is a SUBSET (nested)
    assert(s10.subsetOf(s30) && s30.subsetOf(s100))
    assert(s10.nonEmpty && s10.size < s30.size && s30.size < s100.size)
    // re-run selects identical rows (no RNG state)
    assert(at(0.3) == s30)
    // per-stratum rates apply to the right rows
    val mixed = Curation.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.0), 0.0)
    assert(ids(mixed) == ids(docs.filter(col("lang") === "en")))
  }

  // ---------------- contamination ---------------------------------------
  test("contamination: planted overlap found, clean doc not flagged, bench side broadcast") {
    import spark.implicits._
    val bench = Seq((1000L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then alpha beta gamma delta stolen span"), // 2 shared trigrams
      (2L, "completely different content with no shared window at all"),
      (3L, "alpha beta gamma inside"))                              // 1 shared trigram
      .toDF("doc_id", "text")
    val hits = Curation.contamination(corpus, bench, n = 3, minOverlap = 2)
    val got = hits.select("doc_id", "bench_id", "n_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1000L, 2L))) // doc 3 below minOverlap, doc 2 clean
    // the benchmark shingle index must broadcast (no corpus-side shuffle)
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  // ---------------- connected components --------------------------------
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents: chains merge transitively, min label wins") {
    import spark.implicits._
    // two chains and an isolated pair; 1-2-3 and 20-21-22-23 are NOT
    // pairwise similar end to end — only transitivity links them
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (21L, 20L), (21L, 22L), (22L, 23L))
    val got = Curation.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("connectedComponents: random graph equals union-find ground truth on BOTH paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val truth = unionFind(edges)
    val df = edges.toDF("doc_a", "doc_b")
    // dispatcher (single-task union-find at this size)
    val got = Curation.connectedComponents(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == truth)
    // forced iterative hash-min path must produce the identical labeling
    val gotLoop = Curation.connectedComponentsLoop(df, maxIter = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotLoop == truth)
  }

  test("connectedComponents: long chain converges on the iterative path") {
    import spark.implicits._
    // a 13-node path graph (diameter 12, like the sf0.1 simhash graph) —
    // exercises multi-round propagation under the maxIter bound
    val chain = (0L until 12L).map(i => (i, i + 1))
    val got = Curation.connectedComponentsLoop(chain.toDF("doc_a", "doc_b"), maxIter = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (0L to 12L).map(_ -> 0L).toMap)
  }

  // ---------------- redaction -------------------------------------------
  test("redactionStats: counts per pattern and fingerprint of redacted text") {
    import spark.implicits._
    val pats = Seq(
      "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "kw" -> "\\bsecret\\b")
    val df = Seq(
      (1L, "mail a@b.com and c.d@e.org hold a secret secretly"),
      (2L, "nothing sensitive here")).toDF("doc_id", "text")
    val got = Curation.redactionStats(df, pats).orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 2L) // two emails
    assert(got(0).getLong(2) == 1L) // \b stops 'secretly'
    assert(got(1).getLong(1) == 0L && got(1).getLong(2) == 0L)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("mail [REDACTED] and [REDACTED] hold a [REDACTED] secretly"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0).getString(3) == expected)
    // untouched text fingerprints to md5(text)
    val plain = java.security.MessageDigest.getInstance("MD5")
      .digest("nothing sensitive here".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1).getString(3) == plain)
  }

  // ---------------- shard stats ------------------------------------------
  test("shardStats: every doc lands in exactly one of numShards shards") {
    val stats = Curation.shardStats(docs, numShards = 8).collect()
    val shards = stats.map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < 8))
    assert(stats.map(_.getLong(1)).sum == docs.count())
    // hash balance: no shard holds more than 3× the uniform share
    val mx = stats.map(_.getLong(1)).max
    assert(mx <= 3 * docs.count() / 8 + 1, s"skewed shards: ${stats.mkString(",")}")
  }

  // ---------------- WAV container parse -----------------------------------
  test("parseWav: roundtrips wavBytes, skips foreign chunks, rejects junk") {
    import graft.operators.Multimodal
    val (rate, ch, bits, n, peak, sum) = Multimodal.parseWav(Multimodal.wavBytes("AB", 8000))
    assert((rate, ch, bits, n) == ((8000L, 1L, 16L, 2L)))
    // 'A'=65, 'B'=66 → samples (65-2048)*16=-31728, (66-2048)*16=-31712
    assert(peak == 31728L)
    assert(sum == ((-31728L - 31712L) % 1000000007L + 1000000007L) % 1000000007L)
    // empty text → header-only file, zero samples
    assert(Multimodal.parseWav(Multimodal.wavBytes("", 44100)) ==
      ((44100L, 1L, 16L, 0L, 0L, 0L)))
    // an odd-sized foreign chunk BEFORE fmt/data must be pad-skipped
    val base = Multimodal.wavBytes("A", 8000)
    val foreign = Array[Byte]('J', 'U', 'N', 'K', 3, 0, 0, 0, 1, 2, 3, 0) // size 3 + pad
    val spliced = base.take(12) ++ foreign ++ base.drop(12)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8) // patch riff size
    assert(Multimodal.parseWav(spliced)._4 == 1L)
    // non-RIFF bytes fail loudly, not silently
    intercept[IllegalArgumentException] {
      Multimodal.parseWav("definitely not audio".getBytes("UTF-8"))
    }
    // a chunk whose declared size overruns the payload fails loudly
    val truncated = base.dropRight(1)
    intercept[IllegalArgumentException] { Multimodal.parseWav(truncated) }
  }

  test("parseBmp: roundtrips bmpBytes across row paddings, handles multi-row, rejects junk") {
    import graft.operators.Multimodal
    // widths 0..5 cover all four 4-byte row-padding residues
    for (txt <- Seq("", "A", "AB", "ABC", "ABCD", "ABCDE")) {
      val (w, h, bpp, n, peak, sum) = Multimodal.parseBmp(Multimodal.bmpBytes(txt))
      val cps = txt.codePoints().toArray
      val sums = cps.map(cp => (cp % 256) + (cp * 7 % 256) + (cp * 13 % 256)).map(_.toLong)
      assert((w, h, bpp, n) == ((cps.length.toLong, if (cps.isEmpty) 0L else 1L, 24L, cps.length.toLong)))
      assert(peak == (if (sums.isEmpty) 0L else sums.max))
      assert(sum == sums.sum % 1000000007L)
    }
    // hand-built 2x2: rows are read bottom-up-agnostic here (fold is
    // order-independent), but padding must be skipped per row
    val bb = java.nio.ByteBuffer.allocate(54 + 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(54 + 16)
    bb.putShort(0); bb.putShort(0); bb.putInt(54)
    bb.putInt(40); bb.putInt(2); bb.putInt(2); bb.putShort(1); bb.putShort(24)
    bb.putInt(0); bb.putInt(16); bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    // row 0: pixels (1,1,1),(2,2,2) + 2 pad; row 1: (3,3,3),(4,4,4) + 2 pad
    Seq(1, 1, 1, 2, 2, 2, 0, 0, 3, 3, 3, 4, 4, 4, 0, 0).foreach(v => bb.put(v.toByte))
    val (w2, h2, _, n2, peak2, sum2) = Multimodal.parseBmp(bb.array())
    assert((w2, h2, n2) == ((2L, 2L, 4L)))
    assert(peak2 == 12L && sum2 == 3L + 6L + 9L + 12L) // pad bytes NOT folded
    intercept[IllegalArgumentException] {
      Multimodal.parseBmp("not an image at all........................................".getBytes)
    }
    intercept[IllegalArgumentException] {
      Multimodal.parseBmp(Multimodal.bmpBytes("ABC").dropRight(1))
    }
    // hostile header: width near Int.MaxValue/3 overflows an Int row
    // stride ((w*3+3) wraps negative) — must fail the overrun check, not
    // reach the pixel loop; likewise a pixel offset inside the headers
    val hostile = Multimodal.bmpBytes("AB")
    val hb = java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hb.putInt(18, Int.MaxValue / 3)
    intercept[IllegalArgumentException] { Multimodal.parseBmp(hostile) }
    val badOff = Multimodal.bmpBytes("AB")
    java.nio.ByteBuffer.wrap(badOff).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(10, 2)
    intercept[IllegalArgumentException] { Multimodal.parseBmp(badOff) }
    // hostile width AND height: rowBytesL * h (~1.4e19) wraps negative
    // even in LONG — the division-form guard must still reject it with
    // IllegalArgumentException, not reach the pixel loop and AIOOBE
    val hostile2 = Multimodal.bmpBytes("AB")
    val hb2 = java.nio.ByteBuffer.wrap(hostile2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hb2.putInt(18, Int.MaxValue - 2); hb2.putInt(22, Int.MaxValue - 2)
    intercept[IllegalArgumentException] { Multimodal.parseBmp(hostile2) }
  }

  test("wavFeatures: histogram over decoded samples equals per-codepoint expectation") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions._
    val docs = spark.createDataFrame(Seq(
      (1L, "AAB"), (2L, ""), (3L, "zz  z"))).toDF("doc_id", "text")
    val media = Multimodal.wavMediaFromDocuments(docs, sampleRate = 8000)
    val got = Multimodal.wavFeatures(media, bins = 2048)
      .orderBy("media_id", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def bins(txt: String): Seq[(Long, Long)] =
      txt.codePoints().toArray.map(cp => ((cp % 4096 - 2048) * 16 + 32768L) / 32)
        .groupBy(identity).toSeq.map { case (b, xs) => (b, xs.length.toLong) }.sortBy(_._1)
    val expected = Seq(1L -> "AAB", 3L -> "zz  z").flatMap { case (id, txt) =>
      bins(txt).map { case (b, n) => (id, b, n) }
    }.sorted
    assert(got.toSeq == expected) // doc 2 (empty) emits no rows
    // coarse 8-bin histogram still sums to n_samples
    val total = Multimodal.wavFeatures(media, bins = 8).agg(sum("n")).head().getLong(0)
    assert(total == "AAB".length + "zz  z".length)
    intercept[IllegalArgumentException] { Multimodal.wavFeatures(media, bins = 7) }
  }

  test("bmpFeatures: channel histogram over decoded pixels equals per-codepoint expectation") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions._
    val docs = spark.createDataFrame(Seq(
      (1L, "AAB"), (2L, ""), (3L, "zz  z"))).toDF("doc_id", "text")
    val media = Multimodal.bmpMediaFromDocuments(docs)
    val got = Multimodal.bmpFeatures(media, bins = 16)
      .orderBy("media_id", "channel", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def hist(txt: String): Seq[(Long, Long, Long)] = {
      val cps = txt.codePoints().toArray
      (for {
        (f, ch) <- Seq((cp: Int) => cp % 256, (cp: Int) => cp * 7 % 256,
          (cp: Int) => cp * 13 % 256).zipWithIndex
        (bin, xs) <- cps.map(cp => f(cp) / 16).groupBy(identity).toSeq
      } yield (ch.toLong, bin.toLong, xs.length.toLong)).sorted
    }
    val expected = Seq(1L -> "AAB", 3L -> "zz  z").flatMap { case (id, txt) =>
      hist(txt).map { case (ch, b, n) => (id, ch, b, n) }
    }.sorted
    assert(got.toSeq == expected) // doc 2 (empty) emits no rows
    // every channel's histogram sums to the pixel count
    val perChannel = Multimodal.bmpFeatures(media, bins = 4)
      .groupBy("channel").agg(sum("n").as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nPix = ("AAB".length + "zz  z".length).toLong
    assert(perChannel == Map(0L -> nPix, 1L -> nPix, 2L -> nPix))
    intercept[IllegalArgumentException] { Multimodal.bmpFeatures(media, bins = 7) }
    // a null payload is an absent medium: no histogram rows, never a
    // crash (mediaSchema declares payload nullable — the codec-path
    // contract decodeStub pins applies to the real decoders too)
    val withNull = media.withColumn("payload",
      when(col("media_id") === 1L, lit(null).cast("binary")).otherwise(col("payload")))
    val nullSafe = Multimodal.bmpFeatures(withNull, bins = 16)
    assert(nullSafe.filter(col("media_id") === 1L).count() == 0L)
    assert(nullSafe.filter(col("media_id") === 3L).count() > 0L)
  }

  test("resizeBmp: factor 1 is identity, nearest-neighbor picks every f-th pixel, null-safe") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions._
    val docs = spark.createDataFrame(Seq(
      (1L, "ABCDE"), (2L, ""), (3L, "xy"))).toDF("doc_id", "text")
    val media = Multimodal.bmpMediaFromDocuments(docs)
    def digest(df: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeBmp(df).collect()
        .map(r => (r.getLong(0), r.toSeq.drop(1))).toMap
    // factor 1: re-encode must be pixel-identical to the source
    assert(digest(Multimodal.resizeBmp(media, 1)) == digest(media))
    // factor 2 on "ABCDE" keeps codepoints A, C, E (indices 0, 2, 4)
    val d2 = digest(Multimodal.resizeBmp(media, 2))
    def s(c: Char) = (c.toInt % 256) + (c.toInt * 7 % 256) + (c.toInt * 13 % 256)
    val expSum = (s('A') + s('C') + s('E')).toLong
    assert(d2(1L) == Seq(3L, 1L, 24L, 3L, Seq('A', 'C', 'E').map(s).max.toLong, expSum))
    assert(d2(2L) == Seq(0L, 0L, 24L, 0L, 0L, 0L)) // empty image stays empty
    assert(d2(3L)(3) == 1L) // "xy" -> 1 pixel ('x')
    // null payload: skipped, not a crash
    val withNull = media.withColumn("payload",
      when(col("media_id") === 3L, lit(null).cast("binary")).otherwise(col("payload")))
    assert(Multimodal.resizeBmp(withNull, 2).count() == 2L)
  }

  test("resampleWav: factor 1 is identity, decimation keeps every f-th sample, rate divides") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions._
    val docs = spark.createDataFrame(Seq(
      (1L, "ABCDE"), (2L, ""), (3L, "xy"))).toDF("doc_id", "text")
    val media = Multimodal.wavMediaFromDocuments(docs, sampleRate = 8000)
    def digest(df: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeWav(df).collect()
        .map(r => (r.getLong(0), r.toSeq.drop(1))).toMap
    val id = digest(Multimodal.resampleWav(media, 1))
    val orig = digest(media)
    // factor 1: identical samples at identical rate
    assert(id == orig)
    val d2 = digest(Multimodal.resampleWav(media, 2))
    def s(c: Char) = ((c.toInt % 4096) - 2048) * 16L
    val sel = Seq('A', 'C', 'E').map(s)
    val P = 1000000007L
    // "ABCDE" decimated by 2 keeps samples for A, C, E at rate 4000
    assert(d2(1L) == Seq(4000L, 1L, 16L, 3L, sel.map(math.abs).max,
      ((sel.sum % P) + P) % P))
    assert(d2(2L)(3) == 0L) // empty audio stays empty
    val withNull = media.withColumn("payload",
      when(col("media_id") === 3L, lit(null).cast("binary")).otherwise(col("payload")))
    assert(Multimodal.resampleWav(withNull, 2).count() == 2L)
  }

  test("decodeStub contract: deterministic dim-sized features, null-safe, schema-extending") {
    // decodeStub is the documented codec EXTENSION POINT (see README):
    // a production codec swaps in behind the same mapPartitions shape.
    // This pins the contract a replacement must keep: output schema =
    // input schema + features[dim]; deterministic across runs and
    // partitionings; null payload -> zero vector, never a crash.
    import graft.operators.Multimodal
    val docs = spark.createDataFrame(Seq(
      (1L, "hello"), (2L, "world!"), (3L, null.asInstanceOf[String]))).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
      .withColumn("payload",
        when(col("media_id") === 3L, lit(null).cast("binary")).otherwise(col("payload")))
    val out = Multimodal.decodeStub(spark, media, dim = 8)
    assert(out.schema.fieldNames.toSeq ==
      media.schema.fieldNames.toSeq :+ "features")
    val rows = out.select("media_id", "features").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(rows.values.forall(_.length == 8))
    assert(rows(3L).forall(_ == 0.0f)) // null payload -> zero vector
    // deterministic under repartitioning (per-partition init must not
    // change values)
    val rows2 = Multimodal.decodeStub(spark, media.repartition(7), dim = 8)
      .select("media_id", "features").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(rows == rows2)
    // known value: "hello" bytes folded mod 8
    val expected = new Array[Float](8)
    "hello".getBytes("UTF-8").zipWithIndex.foreach { case (b, i) =>
      expected(i % 8) += (b & 0xff) / 255.0f }
    assert(rows(1L) == expected.toSeq)
  }

  // ---------------- latest-by-key compaction ------------------------------
  test("latestByKey: newest wins, ties broken by tie-break column") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 100L, 10.0), (2L, "a", 200L, 20.0), (3L, "a", 200L, 30.0), // tie on ts
      (4L, "b", 50L, 5.0),
      (5L, "c", 70L, 7.0), (6L, "c", 60L, 6.0))
    val df = rows.toDF("event_id", "k", "tsv", "value")
      .withColumn("ts", timestamp_micros(col("tsv")))
    val got = Curation.latestByKey(df, Seq(col("k")), col("ts"), col("event_id"),
        Seq("last_event_id" -> col("event_id"), "last_value" -> col("value")))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 3L, 30.0), ("b", 4L, 5.0), ("c", 5L, 7.0)))
    // plan shape: partial aggregation, not a window sort
    val plan = Curation.latestByKey(df, Seq(col("k")), col("ts"), col("event_id"),
      Seq("last_event_id" -> col("event_id"))).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("Window"))
  }
}
