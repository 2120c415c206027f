package graft.streaming

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.spatial.Snapshots

/** DSv2 streaming sink: `df.writeStream.format("graft").start(path)` or
  * `.toTable("cat.db.t")` — the reference's `SparkWrite` streaming face
  * (`spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/source/SparkWrite.java:181-186`).
  *
  * Executors stage one parquet file per non-empty task, named by
  * (query, epoch, task); `commit(epoch)` registers all of an epoch's
  * files in ONE snapshot that also advances the query's durable batch
  * high-water mark. A replayed epoch after a driver restart (id at or
  * below the mark) deletes its staged files instead of re-appending —
  * the same checkpoint-scoped exactly-once dedup as the foreachBatch
  * sink, keyed by the STABLE streaming query id (persisted in the
  * checkpoint, unchanged across restarts).
  */
class GraftStreamingWrite(path: String, schema: StructType, queryId: String)
    extends StreamingWrite {

  require(graft.spatial.GeoTable.readPartitionSpecs(path).isEmpty,
    "streaming write to partition-transformed tables is not supported — " +
      "use GeoStreams.appendStream (foreachBatch) which lays out partitions")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val sqlConf = spark.sessionState.conf
    val conf = spark.sessionState.newHadoopConf()
    // write-side ParquetWriteSupport conf dance (mirror of the read-side
    // keys in GraftScan.createReaderFactory) — the executors' WriteSupport
    // reads these during init
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.getConf(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG).toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    GraftStreamWriterFactory(path, new SerializableConfiguration(conf), queryId)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case GraftStagedFile(Some(name)) => name }.toSeq
    Snapshots.commitStreamEpoch(SparkSession.active, path,
      GeoStreams.streamToken(queryId), epochId, files)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftStagedFile(Some(name)) =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path, name))
      case _ =>
    }
}

/** Staged file name relative to the table dir; None = empty task. */
case class GraftStagedFile(name: Option[String]) extends WriterCommitMessage

case class GraftStreamWriterFactory(dir: String, conf: SerializableConfiguration,
    queryId: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(dir,
      s"part-stream-${queryId.take(8)}-$epochId-$partitionId-" +
        s"${UUID.randomUUID().toString.take(8)}.parquet",
      conf.value)
}

/** One staged parquet file per task; empty tasks stage nothing (no file
  * is even created until the first row arrives).
  */
class GraftStreamDataWriter(dir: String, name: String, conf: Configuration)
    extends DataWriter[InternalRow] {

  private var rows = 0L

  private class Builder(p: Path)
      extends ParquetWriter.Builder[InternalRow, Builder](p) {
    override def self(): Builder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  private lazy val writer: ParquetWriter[InternalRow] =
    new Builder(new Path(new Path(dir), name))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()

  override def write(row: InternalRow): Unit = { writer.write(row); rows += 1 }

  override def commit(): WriterCommitMessage =
    if (rows == 0) GraftStagedFile(None)
    else { writer.close(); GraftStagedFile(Some(name)) }

  override def abort(): Unit = if (rows > 0) {
    try writer.close() catch { case _: Exception => () }
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, name))
  }

  override def close(): Unit = ()
}
