package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Curation-tier scale smoke: run the q55–q60 operators at 10M docs
  * (default) — far beyond the driver testdata — and report wall time +
  * rows/sec per stage. The q55–q60 shapes are O(n) by design (codegen
  * filters, broadcast semi-joins, map-side-combine aggregates); this
  * proves it: nothing here materializes to the driver — every stage ends
  * in an aggregate or a bounded head.
  *
  *   sbt "runMain graft.CurationScaleSmoke 10000000"   # nDocs
  */
object CurationScaleSmoke {
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
    def rps(sec: Double): Long = (n / sec).toLong

    // deterministic 30-token docs from a 50k vocabulary, generated
    // distributed; docs with doc_id % 2000 == 1 copy the text of the
    // doc below them (whose id % 2000 == 0 — those become the benchmark
    // set), planting exactly one contamination partner per bench doc
    val isCopy = col("doc_id") % 2000L === 1L
    val baseId = when(isCopy, col("doc_id") - 1L).otherwise(col("doc_id"))
    val textCol = concat_ws(" ",
      transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"), pmod(xxhash64(baseId * 31 + j), lit(50000L)))))
    val langCol = element_at(array(lit("en"), lit("zh"), lit("de"), lit("fr")),
      (pmod(col("doc_id"), lit(4L)) + 1).cast("int"))
    val docs = spark.range(n).select(col("id").as("doc_id"), langCol.as("lang"),
        textCol.as("text"))
      .repartition(cpus.toInt).persist()
    docs.count() // materialize so stage timings measure the operator, not the generator

    // ---- q55 shape: deterministic stratified sample (codegen filter) ----
    val (nSampled, sampleSec) = timed {
      Curation.stratifiedSample(docs, col("doc_id"), col("lang"),
        Map("en" -> 0.5, "zh" -> 0.1), 0.3).count()
    }

    // ---- q56 shape: benchmark decontamination (broadcast shingle index) --
    val bench = docs.filter(col("doc_id") % 2000L === 0L)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 2000L =!= 0L)
    val ((nContaminated, plantedHit), contamSec) = timed {
      val c = Curation.contamination(corpus, bench, n = 3, minOverlap = 2).persist()
      val tot = c.select(col("doc_id")).distinct().count()
      val planted = c.filter(col("doc_id") === col("bench_id") + 1L).count()
      c.unpersist()
      (tot, planted)
    }

    // ---- q58 shape: redaction stats (codegen regex, linear) -------------
    val ((redactHits, nDocs), redactSec) = timed {
      val r = Curation.redactionStats(docs, Seq(
          "w4x" -> "w4\\d\\d\\b", "w123" -> "\\bw123\\b"))
        .agg(sum(col("n_w4x")), sum(col("n_w123")), count(lit(1))).head()
      (r.getLong(0) + r.getLong(1), r.getLong(2))
    }

    // ---- q59 shape: shard assignment + stats (map-side combine) ---------
    val (nShards, shardSec) = timed { Curation.shardStats(docs, 64).count() }

    // ---- q62 shape: training-order head (TakeOrderedAndProject) ---------
    val (nHead, orderSec) = timed {
      docs.select(col("doc_id"), Curation.trainingOrder(col("doc_id")).as("pos"))
        .orderBy(col("pos"), col("doc_id")).limit(200).count()
    }

    // ---- q60 shape: CDC latest-by-key compaction (map-side max_by) ------
    // 10M change events over n/10 (user, type) keys, generated distributed
    val events = spark.range(n).select(
      (col("id") % (n / 10L)).as("user_id"),
      (col("id") % 4L).cast("string").as("event_type"),
      timestamp_micros(pmod(xxhash64(col("id")), lit(1000000000L))).as("ts"),
      col("id").as("event_id"),
      (col("id") % 1000L).cast("double").as("value"))
      .repartition(cpus.toInt).persist()
    events.count()
    val (nKeys, latestSec) = timed {
      Curation.latestByKey(events, Seq(col("user_id"), col("event_type")),
        col("ts"), col("event_id"),
        Seq("last_event_id" -> col("event_id"), "last_value" -> col("value"))).count()
    }

    println(s"""{"curation_scale_smoke":{"n_docs":$n,""" +
      s""""sample_sec":$sampleSec,"sample_rows_per_sec":${rps(sampleSec)},"n_sampled":$nSampled,""" +
      s""""contam_sec":$contamSec,"n_contaminated":$nContaminated,"planted_hit":$plantedHit,""" +
      s""""redact_sec":$redactSec,"redact_rows_per_sec":${rps(redactSec)},"n_redaction_hits":$redactHits,"n_docs_scanned":$nDocs,""" +
      s""""shard_sec":$shardSec,"shard_rows_per_sec":${rps(shardSec)},"n_shards":$nShards,""" +
      s""""order_head_sec":$orderSec,"n_head":$nHead,""" +
      s""""latest_sec":$latestSec,"latest_rows_per_sec":${rps(latestSec)},"n_keys":$nKeys}}""")
    spark.stop()
  }
}
