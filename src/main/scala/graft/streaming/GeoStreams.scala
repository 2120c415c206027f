package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.spatial.Snapshots

/** Streaming sink into a snapshot table: each micro-batch commits as one
  * snapshot — the shape of the reference's streaming write, where every
  * epoch becomes an Iceberg snapshot commit
  * (`spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/source/SparkWrite.java:181-186`
  * in /root/reference). `foreachBatch` + the manifest publish gives the
  * same append-per-epoch semantics; the checkpoint's batch id guards
  * replays (a retried batch would re-append — production would record the
  * committed batch id in the manifest, noted below).
  */
object GeoStreams {

  /** Start a streaming append into a snapshot table at `path`. The input
    * must already carry the bbox shadow column(s) (GeoTable.withBbox).
    */
  def appendStream(stream: DataFrame, path: String,
      checkpoint: String): StreamingQuery = {
    var lastCommitted = -1L
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        // idempotence guard within this query's lifetime; a durable guard
        // would store batchId in the published manifest
        if (batchId > lastCommitted) {
          Snapshots.append(batch, path)
          lastCommitted = batchId
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
