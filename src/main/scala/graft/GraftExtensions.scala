package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{CosineSimilarity, MinHashSig, RollingHash48, Shingle3, SimHash48, SrpBucket}
import graft.plans.BucketRangeInference

/** The engine's `SparkSessionExtensions` hook: registers the custom
  * Catalyst pieces — the codegen'd `cosine_sim` expression, the native
  * `minhash_sig`/`simhash48` text-hash folds, and the bucket-range
  * partition-pruning inference rule — with every session built through
  * [[GraftSession]] — or any session configured with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineSimilarity.functionDescription)
    ext.injectFunction(MinHashSig.functionDescription)
    ext.injectFunction(Shingle3.functionDescription)
    ext.injectFunction(SimHash48.functionDescription)
    ext.injectFunction(RollingHash48.functionDescription)
    ext.injectFunction(SrpBucket.functionDescription)
    // SQL surface for the table-shaped operator library: TVFs that
    // expand to exactly the Scala API's logical plans (see
    // graft.functions.TableFunctions).
    graft.functions.TableFunctions.descriptions.foreach(ext.injectTableFunction)
    // SQL surface for the lakehouse DML (GRAFT MERGE/DELETE/VACUUM/…):
    // a delegating parser — GRAFT statements become thin commands over
    // the FactStore API, everything else passes through untouched.
    ext.injectParser((_, parser) => new graft.plans.GraftSqlParser(parser))
    ext.injectOptimizerRule(new BucketRangeInference(_))
    // Standard SQL row-level DML (UPDATE / MERGE INTO / modulo-shaped
    // DELETE) on graft tables: resolved plans route into the one
    // FactStore commit layer (see graft.plans.GraftRowLevelSql).
    ext.injectPostHocResolutionRule(new graft.plans.GraftRowLevelSql(_))
    // Join sizing for graft catalog tables: manifest-backed sizes feed
    // the broadcast decision the V1Scan wrapper otherwise hides.
    ext.injectOptimizerRule(_ => new graft.plans.GraftJoinSizing)
    // Zero-Exchange fact⋈fact key joins through FRESH bucketed mirrors
    // (after GraftJoinSizing: a broadcast-hinted side stays broadcast).
    ext.injectOptimizerRule(new graft.plans.GraftStorageJoin(_))
  }
}
