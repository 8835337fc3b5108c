package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Bridge to Spark's serializable Hadoop-conf wrapper (`private[spark]`
  * in some Spark lines, so accessed from inside the package tree like
  * the other bridges). The graft-docs connector ships the SESSION's
  * Hadoop configuration to its executor-side readers/writers with this
  * — `new Configuration()` would silently drop every `spark.hadoop.*`
  * setting (object-store credentials, default FS) the session carries.
  */
class SerializableHadoopConf(@transient conf: Configuration)
    extends Serializable {
  private val wrapped = new SerializableConfiguration(conf)
  def value: Configuration = wrapped.value
}
