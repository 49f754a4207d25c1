package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Scratch A/B probe for the giant-vocab regime of q76/q83: the vocab
  * table (df / unigram counts) joined back onto tf under each
  * `TextOps.VocabJoin` strategy, on a corpus whose vocabulary grows
  * LINEARLY with the doc count (Heaps'-law worst case). Each document
  * carries a Zipfian-ish head of shared terms plus `tail` terms unique to
  * that document, so at n docs the vocabulary is ~n·tail uniques — the
  * regime where `broadcast(dfreq)` stops being a plan choice and becomes
  * an executor OOM. Not part of the declared surface.
  *
  *   sbt "runMain graft.VocabProbe 10000000 broadcast,shuffle,auto 5"
  */
object VocabProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val variants = if (args.length > 1) args(1).split(",").toSet
      else Set("broadcast", "shuffle", "auto")
    val tail = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // the point of the probe is the giant-broadcast failure mode — keep
      // the driver honest about what a real executor would see
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 25 head tokens (50k-term Zipfian vocab: u^4 concentrates the head)
    // + `tail` tokens unique to this doc → vocab ≈ 50k + n·tail uniques
    val head = transform(sequence(lit(0), lit(24)), j => concat(lit("w"),
      floor(pow(pmod(xxhash64(col("doc_id") * 31 + j), lit(50000L))
        .cast("double") / 50000.0, 4.0) * 50000.0).cast("long")))
    val uniq = transform(sequence(lit(0), lit(tail - 1)),
      j => concat(lit("u"), col("doc_id"), lit("_"), j))
    val docs = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", concat(head, uniq)).as("text"))
      .repartition(cpus.toInt).persist()
    val nd = docs.count()
    println(s"[probe] corpus: $nd docs, vocab ≈ ${50000L + n * tail} uniques")

    def timed(label: String)(f: => Long): Unit =
      try {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $label%-22s $sec%8.1f s   $rows rows")
      } catch {
        case e: Throwable =>
          println(s"[probe] $label FAILED: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(200)}")
      }

    if (variants("broadcast")) timed("tfidf broadcast") {
      TextOps.tfidfTopTerm(docs, TextOps.VocabJoin.Broadcast).count()
    }
    if (variants("shuffle")) timed("tfidf shuffle") {
      TextOps.tfidfTopTerm(docs, TextOps.VocabJoin.Shuffle).count()
    }
    if (variants("auto")) timed("tfidf auto") {
      TextOps.tfidfTopTerm(docs, TextOps.VocabJoin.Auto).count()
    }
    if (variants("lm")) timed("unigram-lm shuffle") {
      TextOps.unigramLogProb(docs, TextOps.VocabJoin.Shuffle).count()
    }
    spark.stop()
  }
}
