package graft.streaming

import org.apache.spark.sql.SparkSession

/** Stream-drive-scoped state-partition width.
  *
  * Every micro-batch snapshots and commits the state store once per
  * shuffle partition, so a stateful drive whose state is small pays the
  * session's full shuffle width in store commits per batch — 32 tiny
  * snapshot files for state that fits in a handful. The stateful drives
  * scope the stream's shuffle width to the state's cardinality for the
  * duration of the drive and restore the session default after — the
  * same deployment knob `AsofStream.runOnce/runFileSource` already
  * scope. State partition count is sized to key cardinality at
  * deployment (it is baked into the checkpoint on first batch), not to
  * the host's core count; the batch tier's shuffle width is untouched
  * because the conf is restored before any downstream batch action runs.
  *
  * The RocksDB provider was A/B-measured here and REJECTED for these
  * drives: at their state sizes (10^3–10^5 rows, one or two
  * micro-batches) the per-partition native store open/commit costs more
  * than the HDFS-backed map it replaces — warm q49 0.89→1.23 s,
  * q25 1.10→1.35, q89 2.10→2.55, q95 3.23→3.95 on an otherwise
  * identical run pair. `AsofStream.runFileSource` (q61) keeps RocksDB
  * deliberately: that query declares the large-state deployment drive,
  * where the incremental-changelog store is the right shape.
  */
object StreamConf {
  def withStateParts[A](spark: SparkSession, stateParts: Int)(body: => A): A = {
    val default = spark.sessionState.conf.numShufflePartitions
    spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", default.toString)
  }
}
