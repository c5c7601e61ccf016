package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftext.GraftFunctionRegistry

/** `SparkSessionExtensions` hook: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) to get the engine's
  * custom expressions in every new session's SQL surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctionRegistry.functions.foreach(ext.injectFunction)
}
