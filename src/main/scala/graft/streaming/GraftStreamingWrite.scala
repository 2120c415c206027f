package graft.streaming

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{Alias, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.spatial.{GeometryEncoding, GeometryFields, GeoTable, Snapshots, TableSchema, Transforms}

/** Shared driver-side prep for the DSv2 executor writers (the streaming
  * sink and the dynamic-overwrite batch write): partition-transform
  * binding, the logical→physical write projection, and the parquet
  * WriteSupport conf dance. Everything here runs on the DRIVER; the
  * products (bound expressions + a serializable conf) ship to executors.
  */
object GraftWriters {

  /** Partition transforms bound to the write schema: evaluated row-by-row
    * in the writers to route each row to its partition directory (same
    * derived values as [[Transforms.writeExpr]] on the batch V1 path).
    */
  def boundTransforms(spark: SparkSession, path: String,
      schema: StructType): Seq[(String, Expression)] = {
    val specs = GeoTable.readPartitionSpecs(path)
    if (specs.isEmpty) return Nil
    specs.foreach(t => require(schema.fieldNames.contains(t.source),
      s"DSv2 write: partition source column ${t.source} missing from write schema"))
    val dummy = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val proj = dummy.select(
      specs.map(t => Transforms.writeExpr(t, dummy).as(t.derivedName)): _*)
    proj.queryExecution.analyzed match {
      case p: Project =>
        val out = p.children.head.output
        specs.zip(p.projectList).map { case (t, e) =>
          val inner = e match { case a: Alias => a.child; case x => x }
          t.derivedName -> BindReferences.bindReference(inner, out)
        }
      case other => throw new IllegalStateException(s"unexpected plan: $other")
    }
  }

  /** Logical→physical write projection: declared geometry columns encode
    * to their storage repr, renamed columns map to their physical file
    * names, and IDENTITY partition source columns are dropped (the
    * directory carries them, exactly like the V1 path's `partitionBy`
    * layout — an in-file copy would also shadow the dir-served column) —
    * the executor-side equivalent of the V1 path's
    * `encodeForStorage` ∘ `TableSchema.toPhysical`. None = nothing to do
    * (writers pass rows through untouched).
    * Returns (physical parquet schema, bound per-column expressions).
    */
  def physicalProjection(spark: SparkSession, path: String,
      schema: StructType): Option[(StructType, Seq[Expression])] = {
    import org.apache.spark.sql.functions.col
    val enc = GeometryFields.get(path).filter { case (c, _) =>
      schema.fieldNames.contains(c) }
    // declared uuid/fixed/time columns validate + canonicalize on THIS
    // path too (the V1 writeBack path does it via ExtendedTypes.validate;
    // without it here, streamed / dynamic-overwrite rows would skip the
    // invariant every read relies on, e.g. lowercase-canonical uuids)
    val xtypes = graft.spatial.ExtendedTypes.get(path).filter { case (c, _) =>
      schema.fieldNames.contains(c) }
    val live = TableSchema.read(path).filterNot(_.dropped)
      .filter(e => schema.fieldNames.contains(e.logical))
    val rename = live.filter(e => e.logical != e.physical)
      .map(e => e.logical -> e.physical).toMap
    // nested-evolved struct columns rebuild under physical field names
    val nested = live.filter(_.children.nonEmpty).map(e => e.logical -> e).toMap
    val identSrc = GeoTable.readPartitionSpecs(path)
      .collect { case Transforms.Identity(c) => c }
      .filter(schema.fieldNames.contains).toSet
    if (enc.forall(_._2 == "wkb") && rename.isEmpty && identSrc.isEmpty &&
      nested.isEmpty && xtypes.isEmpty) return None
    graft.spatial.Geo.install(spark) // encode exprs resolve ST_ functions
    val dummy = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val cols = schema.fields.toSeq.filterNot(f => identSrc(f.name)).map { f =>
      val validated = xtypes.get(f.name) match {
        case Some(x) => graft.spatial.ExtendedTypes.validExpr(col(f.name), f.name, x)
        case None => col(f.name)
      }
      val base = enc.get(f.name) match {
        case Some(e) => GeometryEncoding.encode(validated, e)
        case None => validated
      }
      val shaped = nested.get(f.name)
        .map(e => TableSchema.projectPhysical(base, e, f.dataType)).getOrElse(base)
      shaped.as(rename.getOrElse(f.name, f.name))
    }
    val proj = dummy.select(cols: _*)
    proj.queryExecution.analyzed match {
      case p: Project =>
        val out = p.children.head.output
        Some((proj.schema, p.projectList.map {
          case a: Alias => BindReferences.bindReference(a.child, out)
          case e => BindReferences.bindReference(e, out)
        }))
      case other => throw new IllegalStateException(s"unexpected plan: $other")
    }
  }

  /** Hadoop conf prepared for executor-side [[ParquetWriteSupport]] over
    * the PHYSICAL file schema (mirror of the read-side keys in
    * `GraftScan.createReaderFactory`).
    */
  def writeConf(spark: SparkSession, physicalSchema: StructType,
      path: String,
      writeOptions: Map[String, String] = Map.empty): SerializableConfiguration = {
    val sqlConf = spark.sessionState.conf
    val conf = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(physicalSchema, conf)
    // declared parquet compression (session conf > table property — the
    // V1 path's Snapshots.compressionSpec precedence) rides the conf to
    // the executor-side ParquetWriter; zstd level via its parquet-mr key
    val tableProps =
      if (graft.spatial.Snapshots.currentVersion(path) > 0)
        graft.spatial.Snapshots.readProps(path)
      else Map.empty[String, String]
    val (codec, level) =
      graft.spatial.Snapshots.compressionSpec(spark, tableProps, delete = false)
    codec.foreach(c => conf.set("graft.write.compression-codec", c))
    level.foreach(l => conf.set("parquet.compression.codec.zstd.level", l))
    // declared target file size rides to the executor-side writer, which
    // ROLLS to a new file when the in-progress one reaches it (the
    // reference's WRITE_TARGET_FILE_SIZE_BYTES + RollingDataWriter,
    // TableProperties.java:296-297) — without it one task writing 5 GB
    // of a partition emits one 5 GB file at 100 TB scale
    // per-write option wins over the table property (the reference's
    // SparkWriteOptions.TARGET_FILE_SIZE_BYTES > TableProperties order)
    writeOptions.get("target-file-size-bytes")
      .orElse(tableProps.get("write.target-file-size-bytes"))
      .foreach { t =>
        // validate ONCE on the driver: the value is consumed lazily on
        // executors, where a malformed ('512MB') or non-positive value
        // would fail every task with a context-free NumberFormatException
        // — or silently roll a file per poll window
        val v = try t.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"write.target-file-size-bytes must be a byte count, got '$t'")
        }
        require(v > 0, s"write.target-file-size-bytes must be positive, got $t")
        conf.set("graft.write.target-file-size", t)
      }
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
    new SerializableConfiguration(conf)
  }
}

/** DSv2 streaming sink: `df.writeStream.format("graft").start(path)` or
  * `.toTable("cat.db.t")` — the reference's `SparkWrite` streaming face
  * (`spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/source/SparkWrite.java:181-186`).
  *
  * Executors stage one parquet file per non-empty task AND partition
  * directory; partition-transformed tables get their hive-layout dirs by
  * evaluating the bound transform expressions per row (the same derived
  * values the batch write computes). `commit(epoch)` registers all of an
  * epoch's files in ONE snapshot that also advances the query's durable
  * batch high-water mark. A replayed epoch after a driver restart (id at
  * or below the mark) deletes its staged files instead of re-appending —
  * the same checkpoint-scoped exactly-once dedup as the foreachBatch
  * sink, keyed by the STABLE streaming query id (persisted in the
  * checkpoint, unchanged across restarts).
  */
class GraftStreamingWrite(path: String, schema: StructType, queryId: String,
    overwrite: Boolean = false,
    // `snapshot-property.<key>` writeStream options — committed with every
    // epoch snapshot, like the batch path (the reference's
    // extraSnapshotMetadata applies to streaming commits too)
    extraProps: Map[String, String] = Map.empty,
    writeOptions: Map[String, String] = Map.empty) extends StreamingWrite {

  private def spark = SparkSession.active

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val sess = spark
    val proj = GraftWriters.physicalProjection(sess, path, schema)
    GraftStreamWriterFactory(path,
      GraftWriters.writeConf(sess, proj.map(_._1).getOrElse(schema), path,
        writeOptions), queryId,
      GraftWriters.boundTransforms(sess, path, schema), proj.map(_._2).getOrElse(Nil))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case GraftStagedFiles(names) => names }.flatten.toSeq
    // bucketed tables: staged files need the `_0000K` bucket-id stamp so
    // the scan keeps reporting HashPartitioning (same as the batch path)
    val stamped = GeoTable.readPartitionSpecs(path)
      .collectFirst { case b: Transforms.Bucket => b } match {
      case Some(b) => GeoTable.stampBucketIds(spark, path, b, files)
      case None => files
    }
    try Snapshots.commitStreamEpoch(spark, path,
      GeoStreams.streamToken(queryId), epochId, stamped, overwrite = overwrite,
      extraProps = extraProps)
    catch { case scala.util.control.NonFatal(e) =>
      // the stamp RENAMED staged files; abort() only knows pre-stamp
      // names. Cleanup failures must never MASK the commit exception.
      if (stamped ne files) stamped.foreach(n =>
        try { java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path, n)); () }
        catch { case scala.util.control.NonFatal(c) => e.addSuppressed(c) })
      throw e
    }
    ()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftStagedFiles(names) => names.foreach(n =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path, n)))
      case _ =>
    }
}

/** Staged file names relative to the table dir (empty = empty task). */
case class GraftStagedFiles(names: Seq[String]) extends WriterCommitMessage

case class GraftStreamWriterFactory(dir: String, conf: SerializableConfiguration,
    queryId: String, transforms: Seq[(String, Expression)],
    proj: Seq[Expression] = Nil)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(dir,
      s"part-stream-${queryId.take(8)}-$epochId-$partitionId-" +
        s"${UUID.randomUUID().toString.take(8)}.parquet",
      conf.value, transforms, proj)
}

/** One staged parquet file per (task, partition dir); rows route to their
  * dir by evaluating the bound transform expressions (on the INCOMING
  * logical row), then the physical projection — storage encodings,
  * renamed columns — applies before the row lands. Empty tasks stage
  * nothing (no file is created until the first row arrives).
  */
class GraftStreamDataWriter(dir: String, baseName: String, conf: Configuration,
    transforms: Seq[(String, Expression)],
    proj: Seq[Expression] = Nil) extends DataWriter[InternalRow] {

  private class Builder(p: Path)
      extends ParquetWriter.Builder[InternalRow, Builder](p) {
    override def self(): Builder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  // an in-progress staged file: the writer, its relative name, and the
  // rows written since the last size poll (getDataSize walks every
  // column writer — O(columns) — so the roll check samples every
  // SizePollRows rows, Iceberg's RollingFileWriter ROWS_DIVISOR posture,
  // instead of paying that walk per row)
  private final class Open(val w: ParquetWriter[InternalRow], val rel: String) {
    var sincePoll: Int = 0
  }
  private val SizePollRows = 1000
  // partition dir ("" for unpartitioned) → in-progress staged file
  private val writers = mutable.LinkedHashMap.empty[String, Open]
  // files already rolled-and-closed this task (relative names)
  private val rolled = mutable.ArrayBuffer.empty[String]
  private var rollIdx = 0

  // declared target file size (write.target-file-size-bytes, via
  // writeConf): the writer ROLLS to a fresh file once the in-progress
  // one reaches it — the reference's RollingDataWriter. getDataSize()
  // is parquet-mr's buffered+flushed estimate, the same signal the
  // reference's appender polls.
  private lazy val targetFileSize: Option[Long] =
    Option(conf.get("graft.write.target-file-size")).map(_.toLong)

  private lazy val physicalRow: UnsafeProjection = UnsafeProjection.create(proj)

  // the batch writer (Spark partitionBy) formats timestamp dir values in
  // the SESSION time zone as 'yyyy-MM-dd HH:mm:ss[.SSSSSS]' — raw epoch
  // micros in the dir would read back as NULL through the string cast
  private lazy val tsFormatter =
    org.apache.spark.sql.catalyst.util.TimestampFormatter.getFractionFormatter(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
        Option(conf.get(org.apache.spark.sql.internal.SQLConf.SESSION_LOCAL_TIMEZONE.key))
          .getOrElse("UTC")))
  private lazy val ntzFormatter =
    org.apache.spark.sql.catalyst.util.TimestampFormatter.getFractionFormatter(
      java.time.ZoneOffset.UTC)

  private def dirFor(row: InternalRow): String =
    transforms.map { case (name, e) =>
      val v = e.eval(row)
      // hive dir formatting must match the batch writer's (read back by
      // GraftFileIndex.castPart): dates print as ISO strings, not day
      // ints; timestamps print formatted, not as epoch micros
      val str = v match {
        case null => null
        case i: java.lang.Integer if e.dataType == org.apache.spark.sql.types.DateType =>
          java.time.LocalDate.ofEpochDay(i.longValue).toString
        case l: java.lang.Long if e.dataType == org.apache.spark.sql.types.TimestampType =>
          tsFormatter.format(l.longValue)
        case l: java.lang.Long if e.dataType == org.apache.spark.sql.types.TimestampNTZType =>
          ntzFormatter.format(l.longValue)
        case x => x.toString
      }
      val s = if (str == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
        else ExternalCatalogUtils.escapePathName(str)
      s"$name=$s"
    }.mkString("/")

  // the declared codec rides in on the conf (GraftWriters.writeConf);
  // snappy is the default the V1 writer path shares. Spellings are Spark's
  // ParquetOptions set — a couple have no same-named parquet-mr enum
  // constant ('none', 'lz4raw'), so map them instead of crashing the
  // stream on a codec Spark itself accepts.
  private lazy val codec: CompressionCodecName =
    Option(conf.get("graft.write.compression-codec"))
      .map(_.toLowerCase(java.util.Locale.ROOT) match {
        case "none" | "uncompressed" => CompressionCodecName.UNCOMPRESSED
        case "lz4raw" | "lz4_raw" => CompressionCodecName.LZ4_RAW
        case c =>
          try CompressionCodecName.valueOf(c.toUpperCase(java.util.Locale.ROOT))
          catch { case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"unknown parquet compression codec for streaming write: '$c' " +
                "(none|uncompressed|snappy|gzip|lzo|brotli|lz4|lz4raw|zstd)")
          }
      })
      .getOrElse(CompressionCodecName.SNAPPY)

  // cap on SIMULTANEOUSLY open parquet writers: each buffers up to a row
  // group in memory, so a task whose rows span many partitions (a
  // backlog epoch over days(ts)) would otherwise hold dirs × ~128MB and
  // OOM the executor. Evicting closes the oldest-opened writer (rows
  // usually arrive roughly partition-ordered); its partition re-opens as
  // a roll file on the next row — more files, bounded memory, the
  // FileFormatWriter concurrent-writers posture.
  private val MaxOpenWriters = 16

  override def write(row: InternalRow): Unit = {
    val d = if (transforms.isEmpty) "" else dirFor(row)
    val o = writers.getOrElse(d, {
      if (writers.size >= MaxOpenWriters) {
        val (oldDir, old) = writers.head
        old.w.close()
        rolled += old.rel
        writers.remove(oldDir)
        rollIdx += 1
      }
      // rolled files need distinct names: roll k re-opens as `…-rk.parquet`
      val fname = if (rollIdx == 0) baseName
        else s"${baseName.stripSuffix(".parquet")}-r$rollIdx.parquet"
      val rel = if (d.isEmpty) fname else s"$d/$fname"
      val fresh = new Open(new Builder(new Path(new Path(dir), rel))
        .withConf(conf)
        .withCompressionCodec(codec)
        .build(), rel)
      writers.put(d, fresh)
      fresh
    })
    o.w.write(if (proj.isEmpty) row else physicalRow(row))
    targetFileSize.foreach { t =>
      o.sincePoll += 1
      // per-writer sampled poll: each dir's own row flow drives its check
      // cadence, so a rarely-written dir (small file anyway) never
      // starves and a hot dir overshoots by at most SizePollRows rows
      if (o.sincePoll >= SizePollRows) {
        o.sincePoll = 0
        if (o.w.getDataSize >= t) {
          o.w.close()
          rolled += writers.remove(d).get.rel
          rollIdx += 1 // the next write to this dir opens roll file -r<k>
        }
      }
    }
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.w.close())
    GraftStagedFiles(rolled.toSeq ++ writers.values.map(_.rel).toSeq)
  }

  override def abort(): Unit =
    (writers.values.map(o => (o.w, o.rel)).toSeq ++ rolled.map(r => (null, r)))
      .foreach { case (w, rel) =>
        if (w != null) { try w.close() catch { case _: Exception => () } }
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, rel))
      }

  override def close(): Unit = ()
}
