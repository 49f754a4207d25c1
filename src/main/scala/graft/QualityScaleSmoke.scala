package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Model-based-curation scale smoke: quality scoring, distributed
  * training, and DSIR resampling at 10M docs (default) — far beyond the
  * driver testdata. Invariants are require()d in the smoke itself:
  *
  *  - scoring is one codegen pass (plan asserted shuffle-free in the
  *    unit spec); here we measure docs/sec at corpus scale;
  *  - a filter TRAINED on a 1-in-7 sample (coprime to the lang cycle,
  *    so every vocabulary is represented) must separate the disjoint
  *    vocabularies at ≥ 0.99 accuracy over the FULL corpus;
  *  - DSIR must surface exactly the planted target-like raw docs: the
  *    non-English pool is 1/50 planted with English-vocabulary text,
  *    and every top-m pick must be planted.
  *
  *   sbt "runMain graft.QualityScaleSmoke 10000000"   # nDocs
  */
object QualityScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // deterministic 30-token docs: English docs (and the planted 1-in-50
    // of each non-English lang) draw from the "w<h>" vocabulary; the
    // rest draw from a disjoint "<lang>w<h>" vocabulary. 800 tokens per
    // vocabulary (3200 distinct over B = 4096 buckets) — the fastText
    // regime where the hashed feature space covers the vocabulary; a
    // vocabulary ≫ B mixes every bucket across classes and no linear
    // model can separate it (measured: 0.56 accuracy at 50k/class)
    val langCol = element_at(array(lit("en"), lit("zh"), lit("de"), lit("fr")),
      (pmod(col("doc_id"), lit(4L)) + 1).cast("int"))
    val planted = col("lang") =!= "en" && col("doc_id") % 50L === 7L
    val prefix = when(col("lang") === "en" || planted, lit("w"))
      .otherwise(concat(col("lang"), lit("w")))
    val textCol = concat_ws(" ",
      transform(sequence(lit(0), lit(29)), j =>
        concat(prefix, pmod(xxhash64(col("doc_id") * 31 + j), lit(800L)))))
    val docs = spark.range(n)
      .select(col("id").as("doc_id"), langCol.as("lang"))
      .select(col("doc_id"), col("lang"), textCol.as("text"),
        (col("lang") === "en" || planted).cast("int").as("label"))
      .repartition(cpus.toInt).persist()
    docs.count() // materialize: stage timings measure operators, not the generator

    // ---- 1) deterministic-weight scoring (q108 shape, zero shuffles) ----
    val ((nScored, avgProb), scoreSec) = timed {
      val r = Quality.qualityScore(docs)
        .agg(count(lit(1)), avg(col("quality_prob"))).head()
      (r.getLong(0), r.getDouble(1))
    }
    require(nScored == n, s"scored $nScored of $n docs")

    // ---- 2) distributed train on 1/7, codegen scoreWith over ALL -------
    // the sample modulus must be COPRIME to the lang cycle (doc_id % 4):
    // a % 10 sample sees only {en, de}, leaves the zh/fr vocabularies
    // untrained, and hash-collision noise then classifies them at a
    // coin flip (measured: exactly the 0.75 majority-mix plateau)
    val (wb, trainSec) = timed {
      Quality.train(spark, docs.filter(col("doc_id") % 7L === 0L), "label",
        maxIter = 30)
    }
    val (acc, inferSec) = timed {
      val scored = Quality.scoreWith(docs, wb._1, wb._2)
        .join(docs.select(col("doc_id"), col("label")), Seq("doc_id"))
      val r = scored.agg(
        sum(when((col("quality_prob") >= 0.5) === (col("label") === 1), 1L)
          .otherwise(0L)), count(lit(1))).head()
      r.getLong(0).toDouble / r.getLong(1)
    }
    require(acc >= 0.99, s"trained filter accuracy $acc < 0.99 on disjoint vocabularies")

    // ---- 3) DSIR resampling toward the English distribution ------------
    // planted pool = n/50 (every doc_id ≡ 7 mod 50 is non-English: the
    // mod-4 residues of that progression cycle {3, 1}); keep m at half
    // of it so "every pick is planted" stays a strict test of ranking
    val m = math.min(10000L, n / 100L).toInt
    val ((nPicked, nPlantedPicked), dsirSec) = timed {
      val picked = Quality.dsirResample(spark, docs, col("lang") === "en", m)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      val r = picked.agg(count(lit(1)),
        sum(when(col("doc_id") % 50L === 7L, 1L).otherwise(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(nPicked == m, s"resample returned $nPicked of $m")
    require(nPlantedPicked == m,
      s"only $nPlantedPicked of $m DSIR picks were planted target-like docs")

    // ---- 4) BPE tokenizer: train on the full corpus, segment it --------
    // the corpus-wide pass is the word-count aggregation; 30 merge
    // iterations then run over the compressed distinct-word table.
    // Invariants: all 30 merges learned, and each step's symbol
    // reduction inside its exact two-sided bound (freq/2 ≤ removed ≤
    // freq — overlapping-pair semantics)
    val (bpe, bpeTrainSec) = timed {
      graft.operators.BpeTrain.learn(spark, docs, numMerges = 30)
    }
    require(bpe.merges.length == 30, s"learned ${bpe.merges.length} of 30 merges")
    val totals = bpe.initialSymbols +: bpe.stepSymbols
    require(bpe.merges.indices.forall { i =>
      val rm = totals(i) - totals(i + 1)
      rm * 2 >= bpe.merges(i).freq && rm <= bpe.merges(i).freq
    }, "per-step compression outside the overlap bound")
    // segmentation: 30 nested codegen MergePair applications per word,
    // zero shuffles — the tokenizer-apply hot path
    val ((nSeg, nSubwords), segSec) = timed {
      val r = graft.operators.BpeTrain.segment(docs, bpe.merges)
        .agg(count(lit(1)), sum(size(col("subwords")))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(nSeg == n, s"segmented $nSeg of $n docs")

    println(s"""{"quality_scale_smoke":{"n_docs":$n,""" +
      s""""score_sec":$scoreSec,"score_docs_per_sec":${(n / scoreSec).toLong},""" +
      s""""avg_prob":$avgProb,""" +
      s""""train_sec":$trainSec,"train_rows":${n / 7},""" +
      s""""infer_sec":$inferSec,"infer_docs_per_sec":${(n / inferSec).toLong},"accuracy":$acc,""" +
      s""""dsir_sec":$dsirSec,"dsir_docs_per_sec":${(n / dsirSec).toLong},""" +
      s""""m":$m,"planted_picked":$nPlantedPicked,""" +
      s""""bpe_train_sec":$bpeTrainSec,"bpe_merges":${bpe.merges.length},""" +
      s""""bpe_segment_sec":$segSec,"bpe_segment_docs_per_sec":${(n / segSec).toLong},""" +
      s""""bpe_subwords":$nSubwords}}""")
    spark.stop()
  }
}
