package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B probe for the token-count formulation (TfidfProbe's
  * pattern): `size(split(text))` materializes a per-row token ARRAY when
  * only its length is wanted; `regexp_count(text, "\s+") + 1` counts
  * separator runs with no allocation. On trimmed text the two are equal
  * by construction (tokens and separators alternate). Not part of the
  * declared surface — the measured basis for TextOps.tokenCount's
  * implementation choice.
  *
  *   sbt "runMain graft.TokenProbe 20000000"
  */
object TokenProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val textCol = concat_ws(" ",
      transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"), pmod(xxhash64(col("id") * 31 + j), lit(50000L)))))
    val docs = spark.range(n).select(col("id"), textCol.as("text"))
      .repartition(cpus.toInt).persist()
    docs.count()

    def timed(label: String)(agg: org.apache.spark.sql.Column): Unit = {
      // 1 warm-up + 3 timed passes, median reported (Bench protocol)
      def once(): Double = {
        val t0 = System.nanoTime(); docs.agg(agg).head()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val xs = Seq.fill(3)(once()).sorted
      println(f"[probe] $label%-18s ${xs(1)}%6.1f s median of 3")
    }
    val t = col("text")
    timed("split-size") {
      sum(when(length(trim(t)) === 0, lit(0L))
        .otherwise(size(split(trim(t), "\\s+")).cast("long")))
    }
    timed("regexp-count") {
      sum(when(length(trim(t)) === 0, lit(0L))
        .otherwise(regexp_count(trim(t), lit("\\s+")).cast("long") + 1L))
    }
    // equality gate: identical totals on this corpus
    val a = docs.agg(sum(when(length(trim(t)) === 0, lit(0L))
      .otherwise(size(split(trim(t), "\\s+")).cast("long")))).head().getLong(0)
    val b = docs.agg(sum(when(length(trim(t)) === 0, lit(0L))
      .otherwise(regexp_count(trim(t), lit("\\s+")).cast("long") + 1L))).head().getLong(0)
    println(s"[probe] totals equal: ${a == b} ($a)")
    spark.stop()
  }
}
