package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout: the co-located-join strategy for joins both of
  * whose sides are corpus-sized — where neither side can broadcast and a
  * shuffle would move the full corpus across the cluster every run.
  *
  * Writing both tables bucketed (and sorted) on the join key pins each
  * key to a deterministic bucket file; Spark's bucketed scan then
  * satisfies the join's distribution requirement at READ time, so the
  * repeated per-query/per-run cost is zero exchanges on either side.
  * The one-time bucketing write is itself a shuffle — the trade is
  * "shuffle once at ingest, never again", which is the only shape that
  * holds when the same 100 TB fact table joins the same dimension keys
  * across thousands of runs. (The ANN index makes the identical trade
  * with `partitionBy(cluster_id)` for partition PRUNING; bucketing is
  * the co-LOCATION analog for equi-joins.)
  *
  * Bucket count sizes the parallelism floor of every downstream join:
  * pick ≈ (table bytes / target partition bytes), not cores-of-the-day.
  */
object Bucketed {

  /** One-time ingest: write `df` as a parquet table bucketed AND sorted
    * on `key`. Sorting within buckets lets the bucketed scan also
    * satisfy sort requirements (one file per bucket), turning the join
    * into a zero-exchange sort-merge.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a managed-table location left behind by a PREVIOUS process isn't in
    // this session's in-memory catalog, and saveAsTable refuses to reuse
    // the directory (LOCATION_ALREADY_EXISTS) — clear it first. Hadoop
    // FileSystem API, not java.io.File: the warehouse may live on any
    // scheme (file:, hdfs:, s3a:), and new File(new URI(...)) throws for
    // anything but file:
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Equi-join two tables previously written by `writeBucketed` with the
    * SAME bucket count on their respective join keys. Plans a sort-merge
    * join with NO Exchange on either side (spec-asserted): bucket i of
    * the left joins bucket i of the right, task-local.
    *
    * Fails fast if either table isn't bucketed on its join key or the
    * bucket counts differ — a mismatch doesn't produce wrong results, it
    * silently reintroduces an Exchange (Spark re-shuffles the smaller
    * bucketing), defeating the helper's zero-exchange contract with no
    * signal until someone reads the plan.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    def spec(table: String, key: String) = {
      val bs = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .bucketSpec
        .getOrElse(throw new IllegalArgumentException(
          s"table $table is not bucketed — write it with writeBucketed first"))
      require(bs.bucketColumnNames == Seq(key),
        s"table $table is bucketed on ${bs.bucketColumnNames.mkString(",")}, " +
          s"not the join key $key — the join would shuffle")
      bs
    }
    val (l, r) = (spec(leftTable, leftKey), spec(rightTable, rightKey))
    require(l.numBuckets == r.numBuckets,
      s"bucket count mismatch: $leftTable has ${l.numBuckets} buckets, " +
        s"$rightTable has ${r.numBuckets} — rewrite one side with a matching " +
        "count or the join silently reintroduces an Exchange")
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}
