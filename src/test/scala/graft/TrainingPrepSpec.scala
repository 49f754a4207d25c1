package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators._

class TrainingPrepSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val sf = "/root/testdata/sf0.001"
  private def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")
  private def emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  private def docsOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---------------- sequence packing ------------------------------------
  test("sequencePack: conserves tokens, assigns by first-token offset") {
    // single shard, budget 4; tokens per doc: 3, 2, 4, 1 → offsets 0,3,5,9
    // → packs 0,0,1,2
    val d = docsOf(Seq(0L -> "a b c", 1L -> "d e", 2L -> "f g h i", 3L -> "j"))
    val out = TrainingPrep.sequencePack(d, budget = 4, nShards = 1, hashFamily = 3)
      .orderBy("pack_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 2L, 5L), (1L, 1L, 4L), (2L, 1L, 1L)))
  }

  test("sequencePack: token conservation and shard-locality on real docs") {
    val out = TrainingPrep.sequencePack(docs, budget = 1024, nShards = 8, hashFamily = 3)
    val packed = out.agg(sum("pack_tokens"), sum("n_docs")).head()
    val direct = docs.agg(
      sum(TextOps.tokenCount(col("text"))), count(lit(1))).head()
    assert(packed.getLong(0) == direct.getLong(0)) // every token in exactly one pack
    assert(packed.getLong(1) == direct.getLong(1)) // every doc in exactly one pack
    assert(out.filter(col("pack_id") < 0 || col("shard") < 0 || col("shard") >= 8).isEmpty)
    // deterministic: rerun is identical
    assert(out.exceptAll(TrainingPrep.sequencePack(docs, 1024, 8, 3)).isEmpty)
    // a giant doc spanning several budgets still lands in exactly one pack
    val big = docsOf(Seq(0L -> Seq.fill(10)("t").mkString(" "), 1L -> "a b"))
    val bigOut = TrainingPrep.sequencePack(big, budget = 3, nShards = 1, hashFamily = 3)
      .orderBy("pack_id").collect()
    // doc0 at offset 0 → pack 0 (10 tokens); doc1 at offset 10 → pack 3
    assert(bigOut.map(r => (r.getLong(1), r.getLong(3))).toSeq ==
      Seq((0L, 10L), (3L, 2L)))
  }

  // ---------------- overlapping chunking --------------------------------
  test("chunkOverlap: exact windows, overlap reconstruction, empty-doc drop") {
    val text = "0123456789" // len 10, width 4, stride 3 → starts 0,3,6,9
    val d = docsOf(Seq(7L -> text, 8L -> ""))
    val out = TrainingPrep.chunkOverlap(d, width = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
    assert(out.forall(_.getLong(0) == 7L)) // empty doc produces no chunks
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L, 1L))
    val expectMd5 = Seq("0123", "3456", "6789", "9").map { s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(out.map(_.getString(3)).toSeq == expectMd5)
    // real docs: chunks tile every document exactly —
    val byIdx = TrainingPrep.chunkOverlap(docs, width = 200, stride = 150)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_len"))
      .groupBy("doc_id")
      .agg(max(col("chunk_idx") * 150 + col("chunk_len")).as("covered"),
        count(lit(1)).as("n_chunks"))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
    // last chunk reaches exactly the end of the doc; chunk count matches
    assert(byIdx.filter(col("covered") =!= col("len")).isEmpty)
    assert(byIdx.filter(col("n_chunks") =!=
      (floor((col("len") - 1) / 150) + 1)).isEmpty)
  }

  // ---------------- int8 quantization -----------------------------------
  test("int8Quant: bounded codes, zero vector, scale invariance") {
    val out = TrainingPrep.int8Quant(emb)
    assert(out.filter(col("max_code") > 127 || col("min_code") < -127).isEmpty)
    assert(out.filter(col("n_dims") =!= 64).isEmpty)
    // at least one code per vector hits ±127 (the abs-max element)
    assert(out.filter(col("max_code") =!= 127 && col("min_code") =!= -127).isEmpty)
    // zero vector → all-zero codes
    import spark.implicits._
    val zero = Seq((0L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val zr = TrainingPrep.int8Quant(zero).head()
    assert(zr.getLong(2) == 0L && zr.getLong(3) == 3L)
    // codes are invariant under power-of-two rescaling (exact in f64)
    val scaled = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(4.0f)).as("embedding"))
    assert(TrainingPrep.int8Quant(scaled).exceptAll(out).isEmpty)
  }

  // ---------------- tf-idf top term -------------------------------------
  test("tfidfTopTerm: hand-computed example, one row per non-empty doc") {
    // 3 docs; "rare" appears only in doc 0 → its top term; "the" is in all
    // docs (idf = ln(1) = 0) so it can never win despite high tf
    val d = docsOf(Seq(
      0L -> "the the the rare",
      1L -> "the shared word",
      2L -> "the shared word"))
    val out = TextOps.tfidfTopTerm(d).orderBy("doc_id").collect()
    assert(out.length == 3)
    val r0 = out(0)
    assert(r0.getString(1) == "rare" && r0.getLong(2) == 1L && r0.getLong(3) == 1L)
    assert(math.abs(r0.getDouble(4) - math.rint(math.log(3.0) * 1e4) / 1e4) < 1e-9)
    // docs 1,2 tie on {shared, word} (same tf, same df) → term-asc tiebreak
    assert(out(1).getString(1) == "shared" && out(2).getString(1) == "shared")
    // real corpus: exactly one row per doc, df ≤ N, tf ≥ 1, score ≥ 0
    val real = TextOps.tfidfTopTerm(docs)
    val nDocs = docs.count()
    assert(real.count() == nDocs)
    assert(real.select(countDistinct("doc_id")).head().getLong(0) == nDocs)
    assert(real.filter(col("tf") < 1 || col("df") < 1 || col("df") > nDocs ||
      col("tfidf") < 0).isEmpty)
  }

  // ---------------- vocab-join strategy (the giant-vocab fallback) ------
  test("vocabJoin: broadcast / shuffle / auto are row-identical; shuffle " +
      "really shuffles; auto switches sides at the term threshold") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def hashJoins(df: DataFrame): (Int, Int) = {
        val p = df.queryExecution.executedPlan
        (p.collect { case _: BroadcastHashJoinExec => 1 }.sum,
          p.collect { case j: ShuffledHashJoinExec => 1
                      case j: SortMergeJoinExec => 1 }.sum)
      }
      // the two explicit strategies agree row-for-row on the real corpus —
      // the hash-equality pin behind the giant-vocab fallback claim
      val bTf = TextOps.tfidfTopTerm(docs, TextOps.VocabJoin.Broadcast)
      val sTf = TextOps.tfidfTopTerm(docs, TextOps.VocabJoin.Shuffle)
      assert(bTf.exceptAll(sTf).isEmpty && sTf.exceptAll(bTf).isEmpty)
      val bLm = TextOps.unigramLogProb(docs, TextOps.VocabJoin.Broadcast)
      val sLm = TextOps.unigramLogProb(docs, TextOps.VocabJoin.Shuffle)
      assert(bLm.exceptAll(sLm).isEmpty && sLm.exceptAll(bLm).isEmpty)
      // the physical plans really differ: shuffle mode keys the df join
      // off a shuffle (no vocab broadcast OOM possible); broadcast mode
      // has no shuffled join
      assert(hashJoins(sTf)._2 >= 1, "shuffle strategy must shuffle the term join")
      assert(hashJoins(bTf)._2 == 0, "broadcast strategy must not shuffle a join")
      // auto: fixture vocab (< threshold) → broadcast plan; a forced
      // 1-term threshold → the shuffle plan. Rows identical either way.
      val autoB = TextOps.tfidfTopTerm(docs, TextOps.VocabJoin.Auto)
      assert(hashJoins(autoB)._2 == 0, "auto below threshold must broadcast")
      val autoS = TextOps.tfidfTopTerm(docs, TextOps.VocabJoin.Auto, autoMaxTerms = 1L)
      assert(hashJoins(autoS)._2 >= 1, "auto above threshold must shuffle")
      assert(autoS.exceptAll(bTf).isEmpty && bTf.exceptAll(autoS).isEmpty)
      intercept[IllegalArgumentException](TextOps.tfidfTopTerm(docs, "bogus"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      // Auto persists the vocab aggregate; drop it so later plan-shape
      // tests don't see an InMemoryTableScan where they assert file scans
      spark.catalog.clearCache()
    }
  }

  // ---------------- length-bucketed batching stats ----------------------
  test("lengthBuckets: conservation, bounds, non-negative waste") {
    val out = TrainingPrep.lengthBuckets(docs, width = 64)
    val totals = out.agg(sum("n_docs"), sum("sum_tokens")).head()
    val direct = docs.select(TextOps.tokenCount(col("text")).as("nt"))
      .filter(col("nt") > 0).agg(count(lit(1)), sum("nt")).head()
    assert(totals.getLong(0) == direct.getLong(0))
    assert(totals.getLong(1) == direct.getLong(1))
    // every bucket's max fits its top boundary and exceeds the one below;
    // waste is exactly padded − sum and never negative
    assert(out.filter(col("max_tokens") > (col("bucket") + 1) * 64 ||
      col("max_tokens") <= col("bucket") * 64).isEmpty)
    assert(out.filter(col("waste_tokens") =!=
      col("padded_tokens") - col("sum_tokens")).isEmpty)
    assert(out.filter(col("waste_tokens") < 0).isEmpty)
    // a doc of exactly 64 tokens belongs to bucket 0 (top boundary closed)
    val edge = TrainingPrep.lengthBuckets(
      docsOf(Seq(0L -> Seq.fill(64)("t").mkString(" "))), width = 64).head()
    assert(edge.getLong(0) == 0L && edge.getLong(3) == 64L)
  }

  // ---------------- JL random projection --------------------------------
  test("jlProject: plane formula on a basis vector, norm concentration") {
    import spark.implicits._
    // e_1 → proj_j = ±1/√16 with the sign = parity of affine_j at d = 1
    val e1 = Seq((0L, Array(1f) ++ Array.fill(63)(0f))).toDF("vec_id", "embedding")
    val got = TrainingPrep.jlProject(e1, outDims = 16)
      .orderBy("j").collect().map(_.getDouble(2))
    val expect = (0 until 16).map { j =>
      val (a, b) = Dedup.affine(j)
      if (((a * 1 + b) % Dedup.P) % 2 == 1) 0.25 else -0.25
    }
    assert(got.toSeq == expect)
    // real embeddings: 16 coords per vector, deterministic rerun,
    // and E[‖proj‖²] = ‖v‖² (JL isometry in expectation) within loose
    // bounds on the corpus mean
    val proj = TrainingPrep.jlProject(emb, outDims = 16)
    assert(proj.groupBy("vec_id").count().filter(col("count") =!= 16).isEmpty)
    assert(proj.exceptAll(TrainingPrep.jlProject(emb, outDims = 16)).isEmpty)
    val ratio = proj.groupBy("vec_id").agg(sum(col("proj") * col("proj")).as("p2"))
      .join(emb.select(col("vec_id"),
        aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0d), (a, x) => a + x).as("n2")), "vec_id")
      .agg(avg(col("p2") / col("n2"))).head().getDouble(0)
    assert(ratio > 0.5 && ratio < 2.0, s"mean norm ratio $ratio")
  }

  // ---------------- plan shapes (the 100 TB claims, pinned) --------------
  test("plans: shuffle-free chunk/quant/jl; one data exchange for packing; " +
      "broadcast-only corpus path for mix; single corpus scan for tfidf") {
    import org.apache.spark.sql.execution.exchange.{ShuffleExchangeExec, BroadcastExchangeExec}
    import org.apache.spark.sql.execution.FileSourceScanExec
    // AQE off so the executed plan is the static one under test
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def shuffles(df: DataFrame): Int =
        df.queryExecution.executedPlan.collect { case _: ShuffleExchangeExec => 1 }.sum
      // chunking, int8 quantization, JL projection: narrow, zero-shuffle
      assert(shuffles(TrainingPrep.chunkOverlap(docs, 200, 150)) == 0)
      assert(shuffles(TrainingPrep.int8Quant(emb)) == 0)
      assert(shuffles(TrainingPrep.jlProject(emb, 16)) == 0)
      // packing: exactly ONE data exchange (the shard hash); the pack
      // aggregation reuses the window's shard distribution
      assert(shuffles(TrainingPrep.sequencePack(docs, 1024, 8, 3)) == 1)
      // domain mix: the corpus side is never shuffled — only the tiny
      // per-lang count aggregate (2 exchanges) moves, and the rate table
      // comes back as a broadcast
      val mix = TrainingPrep.domainMix(docs, Map("en" -> 0.5), 100, 4)
      assert(shuffles(mix) == 2)
      assert(mix.queryExecution.executedPlan.collect {
        case _: BroadcastExchangeExec => 1 }.sum >= 1)
      // tf-idf (round 9): ONE corpus exchange (repartition(doc_id)) that
      // the tf aggregate AND the min_by argmax both reuse via the
      // distribution subset rule, plus the vocab-sized df exchange whose
      // input partial-combines map-side (df distinctness is the in-row
      // array_distinct, so term NEVER keys a corpus-sized exchange — the
      // hot-term skew of the window form is impossible by construction).
      // Text is scanned twice (tf branch + in-row df branch), both
      // narrow; dfreq and N come back as broadcasts; NO window operator
      // anywhere.
      val tfidf = TextOps.tfidfTopTerm(docs)
      val textScans = tfidf.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec if s.schema.fieldNames.contains("text") => 1 }.sum
      assert(textScans == 2)
      assert(shuffles(tfidf) == 3,
        "exactly: the doc_id repartition, the vocab-sized df exchange, " +
          "and the 1-row SinglePartition exchange under the N count")
      val windows = tfidf.queryExecution.executedPlan.collect {
        case _: org.apache.spark.sql.execution.window.WindowExec => 1 }.sum
      assert(windows == 0, "no window operator — argmax is partial-combined min_by")
      assert(tfidf.queryExecution.executedPlan.collect {
        case _: BroadcastExchangeExec => 1 }.sum >= 2, "dfreq and N broadcast back")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("plans: digest-only shuffles for span dedup; sharded windows + " +
      "broadcast offsets for curriculum; corpus-exchange-once unigram LM") {
    import org.apache.spark.sql.execution.exchange.{ShuffleExchangeExec, BroadcastExchangeExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def shuffleSchemas(df: DataFrame) =
        df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e.schema.fieldNames.toSeq }
      // q80: the text column NEVER crosses an exchange — spans are
      // digested in-row, so only (doc_id, 32-hex md5) pairs move
      val span = Dedup.spanDupStats(docs, k = 5)
      assert(shuffleSchemas(span).forall(!_.contains("text")),
        "span dedup must shuffle digests, never documents")
      // q81: every corpus-sized window is PARTITIONED (by shard); the
      // only empty-partition window runs over the S-row per-shard totals
      // (its subtree contains the aggregate), and offsets + bounds come
      // back as broadcasts
      val cur = TrainingPrep.tokenCurriculum(docs, stepBudget = 2048, nShards = 7)
      val wins = cur.queryExecution.executedPlan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty)
      val global = wins.filter(_.partitionSpec.isEmpty)
      assert(global.forall(_.child.collect {
        case _: HashAggregateExec => 1 }.nonEmpty),
        "an unpartitioned window may only run over the per-shard totals")
      assert(cur.queryExecution.executedPlan.collect {
        case _: BroadcastExchangeExec => 1 }.sum >= 2,
        "id bounds and shard offsets must broadcast back, not shuffle the corpus")
      // q83: q76's shape — ONE corpus exchange (doc_id), the vocab-sized
      // unigram exchange, the 1-row total — and the per-doc fold
      // aggregate reuses the doc_id distribution (no 4th exchange, no
      // window); text never crosses an exchange
      val lm = TextOps.unigramLogProb(docs)
      assert(lm.queryExecution.executedPlan.collect {
        case _: ShuffleExchangeExec => 1 }.sum == 3,
        "exactly: doc_id repartition, unigram exchange, 1-row total count")
      // the ONE corpus exchange (pre-explode doc_id repartition) is the
      // only shuffle that carries text; the term-keyed exchange is
      // vocab-sized partials, never postings
      assert(shuffleSchemas(lm).count(_.contains("text")) == 1)
      assert(shuffleSchemas(lm).filter(_.contains("term"))
        .forall(f => !f.contains("doc_id")),
        "no (doc, term) postings exchange — term only keys the vocab aggregate")
      assert(lm.queryExecution.executedPlan.collect {
        case _: WindowExec => 1 }.sum == 0)
      assert(lm.queryExecution.executedPlan.collect {
        case o: ObjectHashAggregateExec => o }.nonEmpty,
        "per-doc term-sorted fold is the collect_list aggregate pair")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  // ---------------- domain mixing ---------------------------------------
  test("domainMix: clamped rates, exclusion, monotone in budget") {
    val w = Map("en" -> 0.5, "de" -> 0.5)
    val out = TrainingPrep.domainMix(docs, w, budget = 100, hashFamily = 4)
      .orderBy("lang").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("de", "en")) // others excluded
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))    // selected ⊆ available
    // budget beyond corpus size → rate clamps to 1, everything selected
    val all = TrainingPrep.domainMix(docs, w, budget = 1000000, hashFamily = 4)
      .collect()
    assert(all.forall(r => r.getLong(2) == r.getLong(1)))
    // monotone: bigger budget never selects fewer (same hash, higher threshold)
    val small = TrainingPrep.domainMix(docs, w, budget = 40, hashFamily = 4)
      .orderBy("lang").collect()
    assert(small.zip(out).forall { case (s, b) => s.getLong(2) <= b.getLong(2) })
    // deterministic rerun
    val again = TrainingPrep.domainMix(docs, w, budget = 100, hashFamily = 4)
      .orderBy("lang").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  // ---------------- token curriculum ------------------------------------
  test("tokenCurriculum: hand-computed steps, first-token rule") {
    // tokens 3,2,4,1 → cum 3,5,9,10; step = (cum − n) div 4 → 0,0,1,2
    val d = docsOf(Seq(0L -> "a b c", 1L -> "d e", 2L -> "f g h i", 3L -> "j"))
    val out = TrainingPrep.tokenCurriculum(d, stepBudget = 4, nShards = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((0L, 3L, 3L, 0L), (1L, 2L, 5L, 0L),
      (2L, 4L, 9L, 1L), (3L, 1L, 10L, 2L)))
  }

  test("tokenCurriculum: shard-count invariant, monotone, conserves tokens") {
    val one = TrainingPrep.tokenCurriculum(docs, stepBudget = 2048, nShards = 1)
    val many = TrainingPrep.tokenCurriculum(docs, stepBudget = 2048, nShards = 7)
    // the prefix sum is over the doc_id total order — partitioning choice
    // (including the degenerate single shard) cannot change the answer
    assert(one.exceptAll(many).isEmpty && many.exceptAll(one).isEmpty)
    val rows = many.orderBy("doc_id").collect()
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a.getLong(2) < b.getLong(2) || b.getLong(1) == 0 } ) // cum strictly grows (0-token docs aside)
    val total = docs.agg(sum(TextOps.tokenCount(col("text")))).head().getLong(0)
    assert(rows.last.getLong(2) == total) // last cum = corpus total
    assert(rows.forall(r => r.getLong(3) == (r.getLong(2) - r.getLong(1)) / 2048))
  }

  // ---------------- temperature mixing ----------------------------------
  test("temperatureMix: τ=1 is proportional, τ=0 is uniform, weights sum to 1") {
    val m1 = TrainingPrep.temperatureMix(docs, tau = 1.0, epochTokens = 100000L)
      .collect()
    val total = m1.map(_.getLong(2)).sum.toDouble
    m1.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2) / total) < 5e-5) }
    val m0 = TrainingPrep.temperatureMix(docs, tau = 0.0, epochTokens = 100000L)
      .collect()
    m0.foreach(r => assert(math.abs(r.getDouble(3) - 1.0 / m0.length) < 5e-5))
    val mt = TrainingPrep.temperatureMix(docs, tau = 0.7, epochTokens = 100000L)
      .collect()
    assert(math.abs(mt.map(_.getDouble(3)).sum - 1.0) < 1e-3) // 4dp rounding slack
    // τ<1 compresses: the largest domain's weight shrinks vs proportional,
    // the smallest grows — the low-resource-upweighting the rule exists for
    val prop = m1.map(r => r.getString(0) -> r.getDouble(3)).toMap
    val temp = mt.map(r => r.getString(0) -> r.getDouble(3)).toMap
    val byTokens = m1.sortBy(_.getLong(2))
    assert(temp(byTokens.last.getString(0)) < prop(byTokens.last.getString(0)))
    assert(temp(byTokens.head.getString(0)) > prop(byTokens.head.getString(0)))
  }

  test("temperatureMix: hand-computed two-domain case") {
    // equal token counts → weights exactly 0.5; dup_factor = 0.5·B/n
    val d = docsOf(Seq(0L -> "a b c d", 1L -> "e f g h"))
      .withColumn("lang", when(col("doc_id") === 0, "en").otherwise("de"))
    val out = TrainingPrep.temperatureMix(d, tau = 0.7, epochTokens = 16L)
      .orderBy("lang").collect()
    out.foreach { r =>
      assert(r.getDouble(3) == 0.5)
      assert(r.getDouble(4) == 2.0) // 0.5 · 16 / 4
    }
  }

  // ---------------- unigram LM quality ----------------------------------
  test("unigramLogProb: hand-computed, uniform corpus scores 0") {
    // corpus "a a b" + "b": cnt(a)=2, cnt(b)=2, total=4 →
    // every term has prob 1/2; both docs average ln(1/2) ≈ −0.6931
    val d = docsOf(Seq(0L -> "a a b", 1L -> "b"))
    val out = TextOps.unigramLogProb(d).orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    out.foreach(r => assert(r.getDouble(2) == -0.6931))
    // single-word corpus: prob 1, log 0 — and −0.0 must normalize to +0.0
    val u = docsOf(Seq(0L -> "x x x", 1L -> "x"))
    TextOps.unigramLogProb(u).collect()
      .foreach(r => assert(r.getDouble(2) == 0.0))
  }

  test("unigramLogProb: every non-empty doc scored, corpus-typical ≥ rare") {
    val out = TextOps.unigramLogProb(docs)
    val n = docs.filter(length(trim(col("text"))) > 0).count()
    assert(out.count() == n)
    // scores are finite and ≤ 0 (probabilities ≤ 1)
    assert(out.filter(col("avg_logprob") > 0 || isnan(col("avg_logprob"))).isEmpty)
  }
}
