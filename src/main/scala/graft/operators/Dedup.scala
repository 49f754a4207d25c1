package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.feature.{MinHashLSH, RegexTokenizer, NGram, CountVectorizer, HashingTF}
import graft.functions.VectorOps

/** Deduplication operators for a training-data pipeline over `documents`
  * (north-star extensions, SURVEY.md §7 M5 / BASELINE.json). The reference
  * has no text surface; these reuse its binary-signature machinery in
  * spirit (MinHash/SimHash signatures ≈ B8's bit codes).
  *
  * Scale notes: every variant avoids the O(n²) document cross join —
  * exact dedup is a hash aggregate; n-gram Jaccard uses an inverted
  * shingle index (join on shingle, then per-pair agg); MinHash-LSH joins
  * on (band, band-hash); SimHash joins on 16-bit sub-bands; embedding
  * near-dup buckets by coarse cluster first.
  */
object Dedup {

  /** Exact dedup: canonical doc per distinct text (min doc_id wins).
    * Groups on the md5 digest, NOT the text — at 100 TB the shuffle moves
    * 16-byte digests instead of whole documents (same result barring an
    * md5 collision, which at 2^64 docs is ~2^-64).
    * Output: (doc_id, n_copies) per surviving representative.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** Word n-gram shingles, lowercase, as distinct strings per doc. */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("shingle"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity join via inverted index: pairs of
    * docs sharing ≥1 shingle, scored |∩|/|∪|, kept when ≥ threshold.
    * Deterministic and SQL-expressible (oracle-able) — the exact
    * counterpart that MinHash-LSH approximates.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    // one aggregation builds the per-doc shingle SET with its size; the
    // inverted index then carries the size alongside each posting, so no
    // separate sizes join is needed (one shuffle saved, and at scale the
    // size column costs 8 bytes per posting instead of two hash joins)
    // persisted: both sides of the self-join read this — without the cache
    // the whole scan→shingle→aggregate pipeline runs twice (the broadcast
    // side defeats exchange reuse)
    val docSets = shingles(docs, n)
      .groupBy(col("doc_id"))
      .agg(collect_list(col("shingle")).as("set"), count(lit(1)).as("ns"))
      .persist()
    val inv = docSets.select(col("doc_id"), col("ns"), explode(col("set")).as("shingle"))
    val a = inv.select(col("doc_id").as("doc_a"), col("ns").as("sa"), col("shingle"))
    val b = inv.select(col("doc_id").as("doc_b"), col("ns").as("sb"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "sa", "sb")
      .agg(count(lit(1)).as("n_common"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double") /
          (col("sa") + col("sb") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash-LSH near-dup candidates (MLlib): shingle → hashed term freq →
    * minhash signatures → banded similarity join at `jaccardThreshold`
    * Jaccard DISTANCE (1 − similarity). Output: (doc_a, doc_b, dist).
    */
  def minhashPairs(spark: SparkSession, docs: DataFrame, n: Int,
                   jaccardDistThreshold: Double, numHashes: Int = 8): DataFrame = {
    // 8 OR-amplified tables: P(candidate) = 1-(1-s)^8 ≈ 0.996 at s=0.5 and
    // ~1 at the s≥0.9 near-dup band, so recall vs the exact jaccard join
    // stays ~1 at a quarter of the 32-table signature cost
    val sh = shingles(docs, n)
      .groupBy("doc_id").agg(collect_list(col("shingle")).as("sh"))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(sh).filter(col("doc_id").isNotNull)
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(numHashes).setSeed(42L)
    val mhModel = mh.fit(feat)
    mhModel.approxSimilarityJoin(feat, feat, jaccardDistThreshold, "dist")
      .select(
        col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        col("dist"))
      .filter(col("doc_a") < col("doc_b"))
  }

  /** 64-bit SimHash over word tokens: per-token hash votes per bit,
    * signature bit = sign of the vote sum. Near-dups = signatures within
    * `maxHamming`; candidate generation joins on 16-bit sub-bands (any
    * pair within hamming ≤ 3 shares at least one of 4 exact sub-bands —
    * pigeonhole), so no O(n²) scan.
    * Output: (doc_a, doc_b, hamming).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "sub-band scheme covers hamming <= 3")
    val sig = simhashSignatures(docs)
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          col("sig").bitwiseAND(lit(0xffffL << (16 * b))).as("bits"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bits"))
    val a = banded.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("band"), col("bits"))
    val b = banded.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("band"), col("bits"))
    a.join(b, Seq("band", "bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** 64-bit simhash per doc (deterministic: token hash = xxhash64).
    * Single pass: explode tokens, then ONE groupBy with 64 sum aggregates
    * (per-bit votes, map-side combinable); signature bit i set iff vote>0.
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v$i")
    }
    val agg = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until 64)
      .map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sig.as("sig"))
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold. Candidate space is
    * cut by coarse k-means bucketing (pairs only within a bucket) when
    * `buckets` > 1; buckets = 1 ⇒ exact all-pairs (oracle-able).
    * Output: (id_a, id_b, cos_sim).
    */
  /** Scale path for embedding near-dup: random-hyperplane LSH. 64 seeded
    * Gaussian directions → sign-bit signature; candidates share one of 8
    * 8-bit sub-bands (P(bit match) = 1 − θ/π, so a cos≥0.95 pair is
    * recovered w.p. ≈ 99% while the candidate set stays ~linear); exact
    * cosine then confirms ≥ threshold. No O(n²) scan — this is the variant
    * that survives 10⁹ vectors, with `embeddingNearDup` as its oracle-able
    * exact counterpart.
    */
  def embeddingNearDupLSH(spark: SparkSession, emb: DataFrame, threshold: Double,
                          seed: Long = 42L): DataFrame = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(64, dim)(rnd.nextGaussian().toFloat)
    val bPlanes = spark.sparkContext.broadcast(planes)
    val sigUdf = udf { (v: Seq[Float]) =>
      val x = v.toArray
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (VectorOps.dot(x, bPlanes.value(j)) > 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
    val sig = emb.select(col("vec_id"), col("embedding"), sigUdf(col("embedding")).as("sig"))
    val banded = sig.select(col("vec_id"), col("embedding"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), 8 * b).bitwiseAND(lit(0xffL)).as("bits"))
      }: _*)).as("bb"))
      .select(col("vec_id"), col("embedding"), col("bb.band"), col("bb.bits"))
    val a = banded.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
      col("band"), col("bits"))
    val b = banded.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      col("band"), col("bits"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExpressions.cosineSim(col("ea"), col("eb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }

  def embeddingNearDup(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExpressions.cosineSim(col("ea"), col("eb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
