package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.spatial.Snapshots

/** Streaming in/out of snapshot tables.
  *
  * Sink: each micro-batch commits as one snapshot — the shape of the
  * reference's streaming write, where every epoch becomes an Iceberg
  * snapshot commit (`spark/v3.5/spark/src/main/java/org/apache/iceberg/
  * spark/source/SparkWrite.java:181-186` in /root/reference). Exactly-once
  * is DURABLE: the committed batch id is written into the snapshot
  * manifest's property map atomically with the data, so a replayed batch
  * after a checkpoint loss or driver restart is skipped — the same
  * mechanism as Iceberg's snapshot summary batch-id dedup.
  *
  * Source: snapshot tables stream back with admission control — a
  * `maxFilesPerTrigger` cap per micro-batch, the reference's
  * `SupportsAdmissionControl` surface (`SparkMicroBatchStream.java:117-184`).
  */
object GeoStreams {

  /** Batch-id high-water marks are PER QUERY, keyed by a stable token of
    * the query's checkpoint location — the unit Spark scopes batch ids to.
    * A replay of the same query (same checkpoint, e.g. a driver restart
    * that re-runs a batch already committed to the table) is skipped; a
    * DIFFERENT query writing to the same table starts its own counter and
    * loses nothing (the round-3 table-global key silently dropped the
    * first N+1 batches of any second writer). This matches the reference,
    * which dedups per checkpoint-scoped epoch, not per table.
    */
  private[streaming] def batchKey(streamToken: String) =
    s"stream.$streamToken.lastCommittedBatchId"

  /** Stable token for a checkpoint location (property-key safe). */
  private[graft] def streamToken(checkpoint: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(checkpoint.stripSuffix("/").getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  /** Last durably committed batch id of a query (-1 if none). */
  def lastCommittedBatch(path: String, streamToken: String = "default"): Long =
    if (Snapshots.currentVersion(path) == 0) -1L
    else Snapshots.readProps(path).get(batchKey(streamToken)).map(_.toLong).getOrElse(-1L)

  /** Commit one micro-batch exactly once: skips batch ids at or below the
    * query's durable high-water mark. Returns true if appended. The
    * cheap pre-check short-circuits obvious replays; the authoritative
    * dedup re-checks INSIDE the commit CAS ([[Snapshots.appendIfBatchNew]])
    * — a zombie driver and its restarted replacement replaying the same
    * batch both pass any outside check, and the loser's commit retry
    * would otherwise re-publish the duplicate on top of the winner.
    */
  private[graft] def commitBatch(batch: DataFrame, path: String, batchId: Long,
      streamToken: String = "default"): Boolean = {
    if (batchId <= lastCommittedBatch(path, streamToken)) false
    else Snapshots.appendIfBatchNew(batch, path, batchKey(streamToken), batchId)
  }

  /** Start a streaming append into a snapshot table at `path`. The input
    * must already carry the bbox shadow column(s) (GeoTable.withBbox).
    */
  def appendStream(stream: DataFrame, path: String,
      checkpoint: String): StreamingQuery = {
    val token = streamToken(checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        commitBatch(batch, path, batchId, token)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream a snapshot table as micro-batches of COMMITTED appends via the
    * manifest-driven [[GraftStreamProvider]] — orphan files never enter
    * the stream, the snapshot's positional/equality deletes are applied in
    * the readers, and the schema comes from the manifest (no per-read
    * inference). At most `maxFilesPerTrigger` files per batch. Declared
    * geometry encodings decode and the evolved logical schema projects on
    * top, exactly like the batch read; pending MoR predicate deletes that
    * only resolve against the logical schema are applied here post-decode.
    */
  def readTableStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int): DataFrame = {
    graft.spatial.Geo.install(spark)
    val raw = spark.readStream
      .format("graft-stream")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      // this wrapper applies the post-decode belt below, so in-source
      // predicate binding may fall back to it instead of failing
      .option("mor-bind-fallback", "true")
      .load(path)
    val decoded = graft.spatial.GeometryFields.get(path).foldLeft(raw) { case (df, (c, e)) =>
      if (raw.columns.contains(c))
        df.withColumn(c, graft.spatial.GeometryEncoding.decode(
          org.apache.spark.sql.functions.col(c), e))
      else df
    }
    val logical = graft.spatial.TableSchema.toLogical(decoded, path)
    // belt for predicate deletes over DECODED geometry values — the only
    // shape the per-batch in-source evaluation can't bind physically
    // (renamed columns now translate inside GraftStreamFilters, so they
    // stay per-batch fresh). NOTE this list is captured at stream START:
    // a decoded-geometry predicate delete committed later is not applied
    // until the stream restarts — documented limitation.
    graft.spatial.GeoTable.applyDeletes(logical,
      if (Snapshots.currentVersion(path) == 0) Nil else Snapshots.readDeletes(path))
  }
}
