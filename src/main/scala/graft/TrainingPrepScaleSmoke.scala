package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Training-prep-tier scale smoke: run the q72–q83 operators at 10M docs
  * / 1M embeddings — far beyond the driver testdata — and report wall
  * time + rows/sec per stage. Shapes under test: one shard exchange
  * (packing), zero-shuffle explode (chunking), zero-shuffle array folds
  * (int8 quant), broadcast rate table (domain mix), the
  * tf→df-agg-join→WindowGroupLimit pipeline (tf-idf), digest-only span
  * dedup, the two-phase distributed prefix sum (curriculum, with its
  * defining invariant asserted), the domain-count temperature mix, and
  * the corpus-exchange-once unigram-LM score. Nothing here materializes
  * to the driver — every stage ends in an aggregate.
  *
  *   sbt "runMain graft.TrainingPrepScaleSmoke 10000000 1000000"
  */
object TrainingPrepScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val nVec = if (args.length > 1) args(1).toLong else 1000000L
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

    // deterministic 30-token docs from a 50k vocabulary (same generator
    // family as CurationScaleSmoke), generated distributed
    val textCol = concat_ws(" ",
      transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"), pmod(xxhash64(col("doc_id") * 31 + j), lit(50000L)))))
    val langCol = element_at(array(lit("en"), lit("zh"), lit("de"), lit("fr")),
      (pmod(col("doc_id"), lit(4L)) + 1).cast("int"))
    val docs = spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), langCol.as("lang"), textCol.as("text"))
      .repartition(cpus.toInt).persist()
    docs.count() // materialize so stage timings measure the operator

    // ---- q72 shape: sequence packing (one shard exchange + window) ------
    val (packAgg, packSec) = timed {
      TrainingPrep.sequencePack(docs, budget = 1024, nShards = 256, hashFamily = 3)
        .agg(count(lit(1)), sum(col("pack_tokens"))).head()
    }

    // ---- q73 shape: overlapping chunking (zero-shuffle explode) ---------
    val (nChunks, chunkSec) = timed {
      TrainingPrep.chunkOverlap(docs, width = 200, stride = 150).count()
    }

    // ---- q75 shape: domain mixing (broadcast rate table) ----------------
    val (mixAgg, mixSec) = timed {
      TrainingPrep.domainMix(docs,
          Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.2),
          budget = n / 4, hashFamily = 4)
        .agg(sum(col("n_selected")), sum(col("n_available"))).head()
    }

    // ---- q76 shape: tf-idf top term (tf agg → df agg-join → top-1) ------
    val (nKeyword, tfidfSec) = timed { TextOps.tfidfTopTerm(docs).count() }

    // ---- q77 shape: length buckets (map-side-combinable aggregate) ------
    val (bucketWaste, bucketSec) = timed {
      TrainingPrep.lengthBuckets(docs, width = 16)
        .agg(sum(col("waste_tokens"))).head().getLong(0)
    }

    // ---- q74 shape: int8 quantization (zero-shuffle array folds) --------
    // deterministic 64-dim float vectors, generated distributed
    val vecCol = transform(sequence(lit(0), lit(63)), j =>
      (pmod(xxhash64(col("vec_id") * 131 + j), lit(2001L)) - 1000L)
        .cast("float") / 1000.0f)
    val emb = spark.range(nVec).select(col("id").as("vec_id"))
      .select(col("vec_id"), vecCol.as("embedding"))
      .repartition(cpus.toInt).persist()
    emb.count()
    val (quantAgg, quantSec) = timed {
      TrainingPrep.int8Quant(emb)
        .agg(sum(col("checksum")), max(col("max_code")), min(col("min_code"))).head()
    }

    // ---- q78 shape: JL projection (zero-shuffle folds + posexplode) -----
    val (jlAgg, jlSec) = timed {
      TrainingPrep.jlProject(emb, outDims = 16)
        .agg(count(lit(1)), avg(col("proj") * col("proj"))).head()
    }

    // ---- q81 shape: token curriculum (two-phase prefix sum) -------------
    val (curAgg, curSec) = timed {
      TrainingPrep.tokenCurriculum(docs, stepBudget = 65536, nShards = 256)
        .agg(max(col("cum_tokens")), max(col("step"))).head()
    }
    // the scan's defining invariant: last cumulative = corpus total
    val totalToks = docs.agg(sum(TextOps.tokenCount(col("text")))).head().getLong(0)
    require(curAgg.getLong(0) == totalToks,
      s"prefix sum broke: ${curAgg.getLong(0)} != $totalToks")

    // ---- q82 shape: temperature mixing (domain-count aggregate) ---------
    val (tmixAgg, tmixSec) = timed {
      TrainingPrep.temperatureMix(docs, tau = 0.7, epochTokens = 1000000000L)
        .agg(sum(col("mix_weight")), count(lit(1))).head()
    }

    // ---- q83 shape: unigram LM score (corpus-exchange-once) -------------
    val (lmAgg, lmSec) = timed {
      TextOps.unigramLogProb(docs)
        .agg(count(lit(1)), avg(col("avg_logprob"))).head()
    }

    // ---- q80 shape: span dup stats (digest-only shuffles) ---------------
    // LAST on purpose: its 260M-row digest explode leaves the heap full
    // of short-lived garbage, and the light aggregates above would pay
    // its GC aftermath if they ran behind it (first run measured q82 at
    // 127s that way — 10x its real cost)
    // 1% of docs re-enter under fresh ids with IDENTICAL text, so every
    // span of a duplicated doc occurs in exactly 2 docs → expected
    // shared-doc count ≈ 2·n/100 (random 50k-vocab spans add ~nothing)
    val spanInput = docs.union(
      docs.filter(pmod(col("doc_id"), lit(100L)) === 0)
        .withColumn("doc_id", -col("doc_id") - 1))
    val (spanAgg, spanSec) = timed {
      Dedup.spanDupStats(spanInput, k = 5)
        .agg(count(lit(1)), sum((col("n_shared") > 0).cast("long"))).head()
    }

    // Locale.ROOT, not the locale-sensitive f-interpolator: on a
    // comma-decimal host f"%.1f" renders 1,2 and corrupts the JSON line
    // (the same hazard Bench.scala guards against)
    def d1(v: Double): String = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    def d4(v: Double): String = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    println(
      s"""{"metric":"trainingprep_scale_smoke","n_docs":$n,"n_vecs":$nVec,
         |"pack_sec":${d1(packSec)},"pack_docs_per_sec":${(n / packSec).toLong},
         |"n_packs":${packAgg.getLong(0)},"pack_tokens":${packAgg.getLong(1)},
         |"chunk_sec":${d1(chunkSec)},"chunk_docs_per_sec":${(n / chunkSec).toLong},"n_chunks":$nChunks,
         |"mix_sec":${d1(mixSec)},"mix_docs_per_sec":${(n / mixSec).toLong},
         |"n_mix_selected":${mixAgg.getLong(0)},"n_mix_available":${mixAgg.getLong(1)},
         |"tfidf_sec":${d1(tfidfSec)},"tfidf_docs_per_sec":${(n / tfidfSec).toLong},"n_keywords":$nKeyword,
         |"bucket_sec":${d1(bucketSec)},"bucket_docs_per_sec":${(n / bucketSec).toLong},"bucket_waste":$bucketWaste,
         |"quant_sec":${d1(quantSec)},"quant_vecs_per_sec":${(nVec / quantSec).toLong},
         |"quant_max_code":${quantAgg.getLong(1)},"quant_min_code":${quantAgg.getLong(2)},
         |"jl_sec":${d1(jlSec)},"jl_vecs_per_sec":${(nVec / jlSec).toLong},
         |"jl_rows":${jlAgg.getLong(0)},"jl_mean_sq":${d4(jlAgg.getDouble(1))},
         |"span_sec":${d1(spanSec)},"span_docs_per_sec":${(n / spanSec).toLong},
         |"span_docs":${spanAgg.getLong(0)},"span_shared_docs":${spanAgg.getLong(1)},
         |"cur_sec":${d1(curSec)},"cur_docs_per_sec":${(n / curSec).toLong},
         |"cur_total_tokens":${curAgg.getLong(0)},"cur_steps":${curAgg.getLong(1) + 1},
         |"tmix_sec":${d1(tmixSec)},"tmix_weight_sum":${d4(tmixAgg.getDouble(0))},
         |"tmix_domains":${tmixAgg.getLong(1)},
         |"lm_sec":${d1(lmSec)},"lm_docs_per_sec":${(n / lmSec).toLong},
         |"lm_docs":${lmAgg.getLong(0)},"lm_mean":${d4(lmAgg.getDouble(1))}}"""
        .stripMargin.replace("\n", ""))
    spark.stop()
  }
}
