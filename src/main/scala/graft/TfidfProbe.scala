package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TextOps

/** Scratch A/B probe for the q76 document-frequency formulation (window
  * vs aggregate-join vs aggregate-broadcast-join) — used to pick the
  * scale path with measurements instead of folklore. Not part of the
  * declared surface.
  *
  *   sbt "runMain graft.TfidfProbe 2000000"
  */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // uniform: 50k-term flat vocabulary (every term df ≈ 30n/50000).
    // zipf: heavy-tailed head — u^4 concentrates ~8% of ALL tokens on w0,
    // so w0's tf row appears in essentially every document: the "the"
    // regime where a per-term COUNT WINDOW serializes one task.
    val zipf = args.length > 2 && args(2) == "zipf"
    val termIdx = { (j: org.apache.spark.sql.Column) =>
      val u = pmod(xxhash64(col("doc_id") * 31 + j), lit(50000L))
        .cast("double") / 50000.0
      if (zipf) floor(pow(u, 4.0) * 50000.0).cast("long")
      else pmod(xxhash64(col("doc_id") * 31 + j), lit(50000L))
    }
    val textCol = concat_ws(" ",
      transform(sequence(lit(0), lit(29)), j => concat(lit("w"), termIdx(j))))
    val docs = spark.range(n).select(col("id").as("doc_id"),
        textCol.as("text"))
      .repartition(cpus.toInt).persist()
    docs.count()

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-22s $sec%8.1f s   $rows rows")
    }

    def toks = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    def tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val nDf = docs.agg(count(lit(1)).as("n"))
    def finish(scored: DataFrame): Long = {
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
        .count()
    }

    val variants = if (args.length > 1) args(1).split(",").toSet
      else Set("window", "join", "bcast", "shipped")
    if (variants("window")) timed("window-df") {
      finish(tf
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .join(broadcast(nDf))
        .withColumn("tfidf",
          round(col("tf") * log(col("n").cast("double") / col("df")), 4)))
    }
    if (variants("join")) timed("join-df") {
      finish(tf
        .join(tf.groupBy(col("term")).agg(count(lit(1)).as("df")), "term")
        .join(broadcast(nDf))
        .withColumn("tfidf",
          round(col("tf") * log(col("n").cast("double") / col("df")), 4)))
    }
    if (variants("bcast")) timed("bcast-join-df") {
      finish(tf
        .join(broadcast(tf.groupBy(col("term")).agg(count(lit(1)).as("df"))), "term")
        .join(broadcast(nDf))
        .withColumn("tfidf",
          round(col("tf") * log(col("n").cast("double") / col("df")), 4)))
    }
    // current operator as shipped
    if (variants("shipped")) timed("TextOps (shipped)") { TextOps.tfidfTopTerm(docs).count() }
    if (variants("partagg")) timed("partagg") {
      // ONE doc exchange: repartition(doc_id) up front; tf agg AND the
      // min_by argmax both reuse hash(doc_id) (subset-satisfied
      // ClusteredDistribution), df is in-row array_distinct partial-
      // combined to a tiny term exchange and broadcast back
      val toksCol = split(trim(lower(col("text"))), "\\s+")
      val parted = docs.repartition(col("doc_id"))
      val tfp = parted
        .select(col("doc_id"), explode(toksCol).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = docs
        .select(explode(array_distinct(org.apache.spark.sql.functions
          .filter(toksCol, t => length(t) > 0))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tfp
        .join(broadcast(dfreq), "term")
        .join(broadcast(nDf))
        .withColumn("tfidf",
          round(col("tf") * log(col("n").cast("double") / col("df")), 4))
      scored.groupBy(col("doc_id"))
        .agg(min_by(struct(col("term"), col("tf"), col("df"), col("tfidf")),
          struct((-col("tfidf")).as("nt"), col("term"))).as("w"))
        .select(col("doc_id"), col("w.term").as("term"), col("w.tf").as("tf"),
          col("w.df").as("df"), col("w.tfidf").as("tfidf"))
        .count()
    }
    if (sys.env.contains("TFIDF_PLANS2")) {
      val prevA = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      println("==== SHIPPED PLAN (AQE off) ====")
      println(TextOps.tfidfTopTerm(docs).queryExecution.executedPlan.toString.take(8000))
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
    if (sys.env.contains("TFIDF_PLANS")) {
      val shipped = TextOps.tfidfTopTerm(docs)
      println("==== SHIPPED PLAN ====")
      println(shipped.queryExecution.executedPlan.toString.take(6000))
      val probe = tf
        .join(tf.groupBy(col("term")).agg(count(lit(1)).as("df")), "term")
        .join(broadcast(nDf))
        .withColumn("tfidf",
          round(col("tf") * log(col("n").cast("double") / col("df")), 4))
      val w2 = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      val probeFull = probe.withColumn("rn", row_number().over(w2))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
      println("==== PROBE JOIN-DF PLAN ====")
      println(probeFull.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
