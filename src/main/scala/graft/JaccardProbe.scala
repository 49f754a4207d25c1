package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** A/B probe for q15's candidate generation: size-bound-only AllPairs vs
  * PPJoin positional filtering, on the real documents fixture. Records the
  * candidate-count reduction and the end-to-end effect (PLANS.md q15). Not
  * part of the declared surface.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.JaccardProbe"
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 3
    val threshold = 0.5
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-28s $sec%8.2f s   $rows rows")
      rows
    }

    // same prefix index ngramJaccardPairs builds, each stage timed
    val docSets = Dedup.docShingleSets(docs, n).persist()
    timed("docSets build+persist")(docSets.count())
    val posting = docSets.select(col("doc_id"), col("ns"), explode(col("set")).as("shingle"))
    timed("posting rows")(posting.count())
    val freq = posting.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("shingle").asc)
    val prefix = posting.join(freq, Seq("shingle"))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= Dedup.prefixLen(col("ns"), threshold))
      .select(col("doc_id"), col("ns"), col("rn"), col("shingle"))
      .persist()
    timed("prefix build+persist")(prefix.count())

    val plain = timed("candidates size-bound only") {
      Dedup.jaccardCandidates(prefix, threshold, positional = false).count()
    }
    val pos = timed("candidates + positional") {
      Dedup.jaccardCandidates(prefix, threshold, positional = true).count()
    }
    println(f"[probe] reduction: $plain -> $pos (${100.0 * (plain - pos) / math.max(plain, 1)}%.1f%% fewer)")

    // verification-leg cost on the positional candidate set
    val cands = Dedup.jaccardCandidates(prefix, threshold, positional = true).persist()
    cands.count()
    val setsA = docSets.select(col("doc_id").as("doc_a"), col("set").as("set_a"), col("ns").as("sa"))
    val setsB = docSets.select(col("doc_id").as("doc_b"), col("set").as("set_b"), col("ns").as("sb"))
    timed("verification joins") {
      cands.join(setsA, Seq("doc_a")).join(setsB, Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"),
          size(array_intersect(col("set_a"), col("set_b"))).cast("long").as("nc"))
        .select(col("doc_a"), col("doc_b"),
          (col("nc").cast("double") / (col("sa") + col("sb") - col("nc"))).as("jaccard"))
        .filter(col("jaccard") >= threshold).count()
    }
    cands.unpersist()

    // sanity: final answers identical either way
    val full = timed("full q15 (positional)") {
      Dedup.ngramJaccardPairs(docs, n, threshold).count()
    }
    println(s"[probe] final pairs: $full")
    spark.stop()
  }
}
