package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.CosineSimilarity

/** The engine's `SparkSessionExtensions` hook: registers the custom
  * Catalyst expressions (currently `cosine_sim`) with every session
  * built through [[GraftSession]] — or any session configured with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(CosineSimilarity.functionDescription)
}
