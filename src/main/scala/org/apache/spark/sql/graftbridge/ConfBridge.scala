package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Bridge into `private[spark] SerializableConfiguration` — the standard
  * way to ship a Hadoop Configuration to executors (every Spark file
  * source does exactly this); needed for distributed parquet-footer
  * reads outside org.apache.spark.
  */
object ConfBridge {
  def broadcast(sc: SparkContext): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc)

  def value(b: Broadcast[SerializableConfiguration]): Configuration = b.value.value
}
