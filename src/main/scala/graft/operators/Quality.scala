package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Model-based corpus curation: hashed n-gram linear quality scoring
  * (the fastText/CCNet-style filter every LLM data pipeline runs in
  * front of training) and DSIR-style importance resampling (Xie et al.
  * 2023: reweight a raw pool toward a target distribution under hashed
  * n-gram bag models).
  *
  * Everything here rides the SAME deterministic token machinery as the
  * dedup tier ([[graft.functions.ShinglePolyHashes]]: one fused codegen
  * pass per row — tokenize → per-token polyhash → window fold), so a
  * DuckDB oracle replays scoring bit-for-bit. The reference engine has
  * no text tier at all (/root/reference/src — vector search only); this
  * is the training-data-pipeline surface the brief adds on top.
  *
  * Scale shape (100 TB): scoring is embarrassingly parallel — ZERO
  * shuffles; model state (B-bucket weight tables) is metadata-sized and
  * rides in the plan. The only exchange in the whole tier is the
  * B-bucket count aggregation when FITTING dsir weights (map-side
  * combined, B = 4096 post-agg rows), and the one distributed pass of
  * MLlib LogisticRegression when training a learned filter.
  */
object Quality {

  /** Default hashed feature space size. 4096 buckets keeps weight
    * tables plan-embeddable (32 KiB of longs) while leaving unigram
    * collision rates low for fixture vocabularies; production fastText
    * uses 2^21 — pass `numBuckets` to [[train]] (the trainer's feature
    * build is sparse: per-row cost is doc-length-sized, never
    * bucket-count-sized, so 2^21 costs the same per row as 4096) and
    * [[scoreWith]] sizes itself from the weight table.
    */
  val B = 4096

  private val P = Dedup.P // 1e9+7 — the portable polyhash modulus

  /** Docs that carry at least one real token. `trim` (ASCII spaces, like
    * DuckDB's) keeps the boundary-empty-token semantics of the shingle
    * tier intact — both engines fold those identically — while dropping
    * docs whose normalized text is empty (whose "features" would be one
    * phantom hash-0 token).
    */
  private def nonEmpty(docs: DataFrame): DataFrame =
    docs.filter(trim(lower(col("text"))) =!= "")

  /** Feature buckets for one document: word unigram + bigram polyhashes
    * (base 131 mod P, the minhash tier's arithmetic) each taken mod B,
    * multiplicity kept — a bag of hashed n-grams as ONE codegen array
    * expression, no shuffle, no UDF. Empty array below one token.
    */
  def featureBuckets(text: Column, numBuckets: Int = B): Column = {
    val norm = lower(trim(text))
    val uni = TextExpressions.shinglePolyHashes(norm, 1, 131L, P)
    val bi = TextExpressions.shinglePolyHashes(norm, 2, 131L, P)
    concat(transform(uni, h => h % lit(numBuckets.toLong)),
      transform(bi, h => h % lit(numBuckets.toLong)))
  }

  /** Deterministic per-bucket weight in [-1000, 1000] (Knuth
    * multiplicative hash of the bucket id) — the fixed-weight scorer the
    * correctness gate replays in SQL; a TRAINED model swaps in
    * [[scoreWith]] over the same feature space.
    */
  private def detWeight(b: Column): Column =
    (b * lit(2654435761L)) % lit(2001L) - lit(1000L)

  /** Linear quality score under the deterministic weight table: for each
    * doc with ≥1 token, the integer margin sum over its features, the
    * feature count, and the calibrated probability
    * sigmoid(margin/n/1000) rounded to 6 decimals (integer margins make
    * the gate engine-portable; the single exp is the only float op).
    * Output: (doc_id, n_feat, margin_sum, quality_prob).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val f = featureBuckets(col("text"))
    nonEmpty(docs).select(col("doc_id"), f.as("f"))
      .select(col("doc_id"), size(col("f")).cast("long").as("n_feat"),
        aggregate(col("f"), lit(0L), (acc, b) => acc + detWeight(b)).as("margin_sum"))
      .withColumn("quality_prob",
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("margin_sum").cast("double") / col("n_feat").cast("double")) / lit(1000.0))), 6))
  }

  /** Score with a LEARNED weight table (one double per bucket + bias),
    * e.g. from [[train]]: mean feature weight + bias through a sigmoid —
    * exactly fastText's linear bag-of-ngrams scorer. The table rides in
    * the plan as a literal (B doubles); scoring stays one codegen pass,
    * zero shuffles. Output: (doc_id, quality_prob).
    */
  def scoreWith(docs: DataFrame, weights: Array[Double], bias: Double): DataFrame = {
    require(weights.nonEmpty, "weight table is empty")
    // the bucket count IS the table length — a scorer fed 2^21-bucket
    // fastText-scale weights hashes into 2^21 automatically
    val w = typedLit(weights.toSeq)
    val f = featureBuckets(col("text"), weights.length)
    nonEmpty(docs).select(col("doc_id"), f.as("f"))
      .select(col("doc_id"),
        (aggregate(col("f"), lit(0.0d),
          (acc, b) => acc + element_at(w, (b + lit(1L)).cast("int")))
          / size(col("f")) + lit(bias)).as("margin"))
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-col("margin")))).as("quality_prob"))
  }

  /** Train a logistic quality filter over the hashed feature space:
    * docs (doc_id, text) + integer labelCol (1 = keep-quality, 0 =
    * reject). Distributed MLlib LogisticRegression over sparse
    * count vectors — the fit is the offline stage; the returned
    * (weights, bias) plug into [[scoreWith]]'s codegen scorer for the
    * online pass. L2-regularized, deterministic (no sampling).
    */
  def train(spark: SparkSession, docs: DataFrame, labelCol: String,
            maxIter: Int = 50, regParam: Double = 1e-4,
            numBuckets: Int = B): (Array[Double], Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val feats = nonEmpty(docs)
      .select(col(labelCol).cast("double").as("label"),
        featureBuckets(col("text"), numBuckets).as("f"))
    import spark.implicits._
    val train = feats.select(col("label"), col("f")).as[(Double, Seq[Long])]
      .map { case (label, f) =>
        // per-row SPARSE build: the map is doc-length-sized, never
        // bucket-count-sized — at fastText's 2^21 buckets a dense
        // per-row buffer would be a 16 MB allocation per document
        val counts = scala.collection.mutable.HashMap.empty[Int, Double]
        f.foreach { b =>
          val i = b.toInt
          counts.update(i, counts.getOrElse(i, 0.0) + 1.0)
        }
        val n = f.length.toDouble
        // mean-normalized counts — matches scoreWith's mean-weight form
        val idx = counts.keysIterator.toArray.sorted
        (label, Vectors.sparse(numBuckets, idx, idx.map(counts(_) / n)))
      }.toDF("label", "features")
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(train)
    (model.coefficients.toArray, model.intercept)
  }

  /** DSIR importance weights: per-bucket scaled log-likelihood ratio
    * between the TARGET subset and the rest of the pool under
    * add-one-smoothed hashed-ngram bag models —
    * llr(b) = round(1e6 · ln(((ct+1)/(Nt+B)) / ((cr+1)/(Nr+B)))), an
    * INTEGER per bucket so downstream sums are engine-exact. One
    * map-side-combined B-bucket aggregation is the only exchange.
    * Returns all B buckets (absent buckets get the pure-smoothing llr).
    */
  def dsirWeights(spark: SparkSession, docs: DataFrame, isTarget: Column): DataFrame = {
    val cnt = nonEmpty(docs)
      .select(isTarget.as("is_t"), explode(featureBuckets(col("text"))).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    val tot = cnt.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"),
      coalesce(sum(col("cr")), lit(0L)).as("nr")).head()
    val (nt, nr) = (tot.getLong(0), tot.getLong(1))
    spark.range(B).select(col("id").as("b"))
      .join(cnt, Seq("b"), "left_outer")
      .select(col("b"),
        round(lit(1e6) * log(
          ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") / lit((nt + B).toDouble)) /
            ((coalesce(col("cr"), lit(0L)) + lit(1L)).cast("double") / lit((nr + B).toDouble))))
          .cast("long").as("llr_scaled"))
  }

  /** DSIR resampling: score every NON-target doc by the sum of its
    * features' llr and keep the m most target-like (weight desc, doc_id
    * asc — fully deterministic). The llr table is collected once
    * (B longs — metadata) and embedded in the plan, so scoring is one
    * codegen pass with ZERO shuffles; the top-m is a bounded
    * per-partition heap (TakeOrderedAndProject), never a global sort.
    * Output: (doc_id, dsir_weight).
    */
  def dsirResample(spark: SparkSession, docs: DataFrame, isTarget: Column,
                   m: Int): DataFrame = {
    val llr: Array[Long] = dsirWeights(spark, docs, isTarget)
      .orderBy(col("b")).collect().map(_.getLong(1))
    val w = typedLit(llr.toSeq)
    val f = featureBuckets(col("text"))
    nonEmpty(docs).filter(!isTarget)
      .select(col("doc_id"), f.as("f"))
      .select(col("doc_id"),
        aggregate(col("f"), lit(0L),
          (acc, b) => acc + element_at(w, (b + lit(1L)).cast("int"))).as("dsir_weight"))
      .orderBy(col("dsir_weight").desc, col("doc_id"))
      .limit(m)
  }
}
