package graft.sources

import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder, Transform}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriterCommitMessage}
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, StructType, TimestampType}

import graft.spatial.{GeoTable, Snapshots, Transforms}
import graft.streaming.{GraftStagedFiles, GraftStreamDataWriter, GraftWriters}

/** DSv2 batch write for DYNAMIC PARTITION OVERWRITE — the plan Spark
  * builds for `df.writeTo(t).overwritePartitions()` and for
  * `INSERT OVERWRITE` under `spark.sql.sources.partitionOverwriteMode =
  * dynamic` (`OverwritePartitionsDynamicExec` has no V1 fallback, so this
  * mode needs a real `toBatch`). The reference's `asDynamicOverwrite`
  * (`spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/source/SparkWrite.java:161-186`
  * in /root/reference).
  *
  * Executors stage parquet files straight into their partition
  * directories (the streaming sink's writer, reused); `commit` publishes
  * ONE snapshot that registers the staged files and drops every prior
  * file in a touched partition directory
  * ([[Snapshots.commitDynamicOverwrite]]). Untouched partitions keep
  * their files byte-identical; time travel still serves the pre-overwrite
  * snapshot.
  *
  * Reports a CLUSTERED distribution over the table's partition transforms
  * (the reference's `RequiresDistributionAndOrdering`,
  * `SparkWriteUtil.java:68-92`): rows shuffle to their partition before
  * writing, so each directory receives files from FEW tasks — without it
  * a 1000-task write into D dirs stages up to 1000×D slivers.
  */
/** The CLUSTERED write distribution over a table's partition transforms —
  * ONE implementation consulted by every DSv2 write face (dynamic
  * overwrite, the append/overwrite `V1Write`, and through it the
  * streaming sink): rows shuffle to their partition before writing, so
  * each directory receives files from FEW tasks. Without it a 1000-task
  * write (or a 200-task streaming epoch) into D dirs stages up to
  * 1000×D sliver files — the problem compounds per TRIGGER on streams.
  */
object GraftWriteDistribution {

  /** Transforms whose V2 function resolution is known to succeed (the
    * bind-type checks in [[GraftFunctions]]); anything else degrades to
    * an unspecified distribution instead of failing the query.
    */
  private def clusterable(t: Transforms.Transform, dt: Option[DataType]): Boolean = t match {
    case _: Transforms.Identity => true
    case _: Transforms.Bucket => dt.exists {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
           StringType | BinaryType | BooleanType | DateType | TimestampType => true
      case _ => false
    }
    case _: Transforms.Truncate => dt.exists {
      case StringType | IntegerType | LongType => true
      case _ => false
    }
    // hour binds TIMESTAMP-only, year/month/day DATE-only (the
    // GraftFunctions bind checks) — a missing hour arm here silently
    // dropped the clustered distribution for hours(ts) tables, staging
    // one sliver file per (task, hour dir)
    case Transforms.DatePart("hour", _) => dt.contains(TimestampType)
    case Transforms.DatePart(_, _) => dt.contains(DateType)
  }

  def forTable(path: String, writeSchema: StructType): Distribution = {
    val specs = GeoTable.readPartitionSpecs(path)
    def dt(c: String): Option[DataType] =
      writeSchema.fields.find(_.name == c).map(_.dataType)
    if (specs.isEmpty || !specs.forall(t => clusterable(t, dt(t.source))))
      Distributions.unspecified()
    else Distributions.clustered(specs.map[Transform] {
      case Transforms.Identity(c) => Expressions.identity(c)
      case Transforms.Bucket(n, c, _) => Expressions.bucket(n, c)
      case Transforms.Truncate(w, c, _) => Expressions.apply("truncate",
        Expressions.literal(w), Expressions.column(c))
      case Transforms.DatePart("year", c) => Expressions.years(c)
      case Transforms.DatePart("month", c) => Expressions.months(c)
      case Transforms.DatePart("hour", c) => Expressions.hours(c)
      case Transforms.DatePart(_, c) => Expressions.days(c)
    }.toArray)
  }
}

class GraftDynamicOverwrite(path: String, writeSchema: StructType,
    writeOptions: Map[String, String],
    snapshotProps: Map[String, String] = Map.empty,
    validate: Option[(Int, String)] = None)
    extends Write with RequiresDistributionAndOrdering {

  private def spark = SparkSession.active

  override def description(): String = s"graft dynamic overwrite $path"

  override def requiredDistribution(): Distribution =
    GraftWriteDistribution.forTable(path, writeSchema)

  override def requiredOrdering(): Array[SortOrder] = Array.empty

  // 0 = let Spark pick (AQE coalesces the shuffle to data size)
  override def requiredNumPartitions(): Int = 0

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val sess = spark
      val proj = GraftWriters.physicalProjection(sess, path, writeSchema)
      GraftBatchWriterFactory(path,
        GraftWriters.writeConf(sess, proj.map(_._1).getOrElse(writeSchema), path,
          writeOptions),
        GraftWriters.boundTransforms(sess, path, writeSchema),
        proj.map(_._2).getOrElse(Nil))
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val files = messages.collect { case GraftStagedFiles(names) => names }.flatten.toSeq
      val stamped = GeoTable.readPartitionSpecs(path)
        .collectFirst { case b: Transforms.Bucket => b } match {
        case Some(b) => GeoTable.stampBucketIds(spark, path, b, files)
        case None => files
      }
      try Snapshots.commitDynamicOverwrite(spark, path, stamped, snapshotProps, validate)
      catch { case scala.util.control.NonFatal(e) =>
        // the stamp RENAMED the staged files; abort() only knows the
        // pre-stamp names, so a failed commit must clean the stamped
        // ones here or they linger as resurrectable orphans. Cleanup
        // failures must never MASK the commit exception.
        if (stamped ne files) stamped.foreach(n =>
          try { java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path, n)); () }
          catch { case scala.util.control.NonFatal(c) => e.addSuppressed(c) })
        throw e
      }
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case GraftStagedFiles(names) => names.foreach(n =>
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path, n)))
        case _ =>
      }
  }
}

case class GraftBatchWriterFactory(dir: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    transforms: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    proj: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(dir,
      s"part-dyn-$partitionId-${UUID.randomUUID().toString.take(8)}.parquet",
      conf.value, transforms, proj)
}
