package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** `SparkSessionExtensions.registerFunctions` — the step the session
  * builder runs for `spark.sql.extensions` classes — is `private[sql]`.
  * Re-exported here (same namespace trick as [[ColumnBridge]]) so the
  * spec can drive the REAL injection path against a registry without
  * booting a second SparkSession. No Spark internals are modified.
  */
object ExtensionsBridge {
  def applyInjectedFunctions(
      ext: SparkSessionExtensions, registry: FunctionRegistry): Unit = {
    ext.registerFunctions(registry)
    ()
  }
}
