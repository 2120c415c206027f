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

  private[streaming] val BatchKey = "stream.lastCommittedBatchId"

  /** Last durably committed stream batch id (-1 if none). */
  def lastCommittedBatch(path: String): Long =
    if (Snapshots.currentVersion(path) == 0) -1L
    else Snapshots.readProps(path).get(BatchKey).map(_.toLong).getOrElse(-1L)

  /** Commit one micro-batch exactly once: skips batch ids at or below the
    * manifest's durable high-water mark. Returns true if appended.
    */
  private[graft] def commitBatch(batch: DataFrame, path: String, batchId: Long): Boolean = {
    if (batchId <= lastCommittedBatch(path)) false
    else {
      Snapshots.append(batch, path, Map(BatchKey -> batchId.toString))
      true
    }
  }

  /** Start a streaming append into a snapshot table at `path`. The input
    * must already carry the bbox shadow column(s) (GeoTable.withBbox).
    */
  def appendStream(stream: DataFrame, path: String,
      checkpoint: String): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        commitBatch(batch, path, batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream a snapshot table's data files as micro-batches, at most
    * `maxFilesPerTrigger` files per batch (admission control / rate
    * limiting). Manifest and delete files are underscore-hidden, so only
    * data files enter the stream.
    */
  def readTableStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
  }
}
