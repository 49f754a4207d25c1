package org.apache.spark.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Public seam over Spark's `private[spark]` SerializableConfiguration
  * (the ColumnShim pattern): executor-side tasks that open Hadoop
  * filesystems directly must see the DRIVER's configuration (s3a
  * credentials, endpoints, programmatic spark.hadoop.* settings) — a
  * bare `new Configuration()` built in the task sees only classpath
  * defaults. Hadoop's Configuration is not serializable itself, which
  * is the whole reason the wrapper exists.
  */
class SerHadoopConf(private val inner: SerializableConfiguration)
    extends Serializable {
  def conf: Configuration = inner.value
}

object SerHadoopConf {
  def broadcast(sc: SparkContext,
                conf: Configuration): Broadcast[SerHadoopConf] =
    sc.broadcast(new SerHadoopConf(new SerializableConfiguration(conf)))
}
