package org.apache.spark.graftaccess

import org.apache.spark.SparkEnv
import org.apache.spark.util.Utils

/** Minimal forwarder to `Utils.getLocalDir`, which is `private[spark]` —
  * the supported resolution of an executor's scratch volume: it consults
  * `spark.local.dir` AND the cluster-manager env-var forms
  * (SPARK_LOCAL_DIRS, YARN/K8s LOCAL_DIRS) that a bare conf read misses.
  * Lives under org.apache.spark solely for package access; nothing else
  * belongs here.
  */
object LocalDirAccess {
  /** One of the configured executor-local scratch dirs, or None when no
    * SparkEnv exists (plain unit tests off the Spark runtime).
    */
  def scratchDir(): Option[String] =
    Option(SparkEnv.get).map(env => Utils.getLocalDir(env.conf))
}
