package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetReadSupport, ParquetWriteSupport}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration

/** Executor-side merge-on-read delete application for the DSv2 batch and
  * streaming read paths — the shape of the reference's `DeleteFilter`
  * (`RowDataReader.java:95` in /root/reference): the driver ships only
  * delete-file METADATA (paths, lengths, key schemas); each task opens the
  * delete files itself and applies exactly the entries scoped to its own
  * data file.
  *
  * Scale contract (the 100 TB posture):
  *  - the driver never materializes delete ROWS. It runs one distributed
  *    `distinct (data_file, delete_file)` aggregation to learn which
  *    positional-delete files cover which data files — file-level
  *    metadata, the same order as the manifest itself (Iceberg tracks the
  *    identical association in its delete manifests).
  *  - each task reads only the delete files attached to ITS partition and
  *    keeps only its own positions / key set. A MoR-heavy table with
  *    millions of pending delete rows costs executor memory proportional
  *    to the deletes against the files that executor actually reads.
  *  - a per-JVM cache ([[DeleteFileCache]]) parses each delete file once
  *    per executor, not once per task.
  */

/** A delete parquet file as shipped to tasks: path + length (stat'd once
  * at planning, so executors never pay a per-task namenode round trip).
  */
case class DeleteFileRef(path: String, len: Long) extends Serializable

/** An equality-delete file applicable to some partition: key ordinals and
  * types are bound to the COMBINED read row of the owning scan, and
  * `factory` is a serializable row reader for exactly the key columns.
  */
case class EqDeleteSpec(
    file: DeleteFileRef,
    ordinals: Array[Int],
    types: Array[DataType],
    seq: Int,
    factory: ParquetPartitionReaderFactory) extends Serializable

/** The delete state scoped to ONE data file (or file range) of a task.
  * `rel` is the table-relative path (the manifest key); `posDeletes`
  * lists only the positional-delete files whose coverage includes this
  * file, and `eqDeletes` only the equality deletes sequenced after it
  * was added. Files with positional deletes are never range-split, so a
  * slice's emitted-row counter IS the file row position.
  */
case class GraftFileSlice(
    rel: String,
    posDeletes: Array[DeleteFileRef],
    eqDeletes: Seq[EqDeleteSpec],
    /** The file's typed partition key under the current spec (serves the
      * `_partition` metadata column); null when the file predates the
      * spec or the table is unpartitioned.
      */
    partKey: InternalRow = null) extends Serializable {
  def hasDeletes: Boolean = posDeletes.nonEmpty || eqDeletes.nonEmpty
}

/** One task: a bin-packed / range-split set of data files plus the
  * delete state scoped to each ([[TaskPlanner]]). `slices` is parallel
  * to `fp.files`.
  */
case class GraftInputPartition(
    fp: FilePartition,
    slices: Seq[GraftFileSlice],
    key: InternalRow = null) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  def hasDeletes: Boolean = slices.exists(_.hasDeletes)
  // non-null whenever the scan reports KeyGroupedPartitioning (the only
  // time Spark reads it): same-key files group into one SPJ task
  override def partitionKey(): InternalRow = key
  // keep the wrapped FilePartition's block-host hints — without this the
  // scheduler loses data locality on any locality-aware store
  override def preferredLocations(): Array[String] = fp.preferredLocations()
}

object DeleteFiles {

  /** `_metadata.file_path` comes back scheme-qualified (`file:///…`,
    * `s3a://bucket/…`); the manifest-planned scan paths are unqualified
    * absolute paths built via `Path.toUri.getPath`. Normalize BOTH sides
    * through the same URI→path routine so scheme AND authority are
    * stripped identically — a regex that only strips the scheme would
    * keep `hdfs://nn:8020/…`'s authority as a path prefix and silently
    * match nothing (coverage resolving empty ⇒ deleted rows resurface).
    */
  /** Every boolean `ParquetToSparkSchemaConverter` reads from the
    * TASK-side Configuration — ONE list for the three reader-factory
    * construction sites (this one, the batch scan, the path-based
    * stream); a key missing from any copy breaks only that read path
    * with a context-free executor error.
    */
  def primeTaskSideParquetConfs(conf: org.apache.hadoop.conf.Configuration,
      sqlConf: org.apache.spark.sql.internal.SQLConf): Unit = {
    val sc = org.apache.spark.sql.internal.SQLConf
    Seq(sc.NESTED_SCHEMA_PRUNING_ENABLED, sc.CASE_SENSITIVE, sc.PARQUET_BINARY_AS_STRING,
      sc.PARQUET_INT96_AS_TIMESTAMP, sc.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
      sc.LEGACY_PARQUET_NANOS_AS_LONG, sc.PARQUET_FIELD_ID_READ_ENABLED,
      sc.PARQUET_IGNORE_VARIANT_ANNOTATION, sc.PARQUET_READER_RESPECT_UNKNOWN_TYPE_ANNOTATION)
      .foreach(e => conf.setBoolean(e.key, sqlConf.getConf(e).asInstanceOf[Boolean]))
  }

  def norm(p: String): String =
    try new Path(p).toUri.getPath
    catch { case _: IllegalArgumentException => p.replaceFirst("^[a-zA-Z0-9]+:/+", "/") }

  /** A serializable parquet ROW reader factory for a delete-file schema —
    * the executor-side reading channel. Mirrors the conf wiring of the
    * main scan factories (without it parquet-mr NPEs on executors).
    */
  def readerFactory(spark: SparkSession, schema: StructType): ParquetPartitionReaderFactory = {
    val sqlConf = spark.sessionState.conf
    val conf = spark.sessionState.newHadoopConf()
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, schema.json)
    conf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, schema.json)
    conf.set("spark.sql.session.timeZone", sqlConf.sessionLocalTimeZone)
    ParquetWriteSupport.setSchema(schema, conf)
    primeTaskSideParquetConfs(conf, sqlConf)
    val broadcastConf = spark.sparkContext.broadcast(new SerializableConfiguration(conf))
    ParquetPartitionReaderFactory(sqlConf, broadcastConf, schema, schema,
      new StructType(), Array.empty, None,
      new ParquetOptions(Map.empty[String, String], sqlConf))
  }

  val PosDeleteSchema: StructType = StructType(Seq(
    StructField("file_path", StringType), StructField("pos", LongType)))

  /** Positional-delete coverage: which delete files touch which data
    * files. One distributed distinct-pairs job; the driver collects
    * FILE-LEVEL pairs only (≤ #delete-files × #touched-data-files), never
    * delete rows. Returns normalized data path → covering delete files.
    */
  // delete files are immutable (UUID-named, replaced not rewritten), so a
  // per-FILE coverage result is valid forever — memoized per driver JVM,
  // keyed by individual delete file (NOT by the whole delete-file set: a
  // streaming MoR table grows that set every few commits, and set-keyed
  // entries would accrete O(N^2) superseded state). A micro-batch only
  // pays the distinct-pairs job for delete files it has never seen.
  // LRU-bounded: overflow evicts the coldest entries one at a time — a
  // table with more live delete files than the bound keeps its hot set
  // instead of re-running the coverage job on every planning.
  // var so specs can shrink the bound and exercise the eviction path
  private[graft] var CoverageMaxEntries = 4096
  private val coverageCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Seq[String]](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Seq[String]]): Boolean =
        size() > CoverageMaxEntries
    })

  private def coverageKey(f: DeleteFileRef): String = s"${f.path}#${f.len}"

  def posCoverage(spark: SparkSession, tablePath: String,
      posFiles: Seq[DeleteFileRef]): Map[String, Seq[DeleteFileRef]] = {
    if (posFiles.isEmpty) return Map.empty
    // snapshot cached entries into a LOCAL map first: the result must be
    // assembled from local values only, never re-read from the cache —
    // the bound-triggered clear() below (or one from a concurrent planning
    // thread) would otherwise drop coverage for files this very call still
    // references, silently detaching their deletes from the scan
    val local = scala.collection.mutable.HashMap.empty[String, Seq[String]]
    posFiles.foreach { f =>
      val v = coverageCache.get(coverageKey(f))
      if (v != null) local(coverageKey(f)) = v
    }
    val missing = posFiles.filter(f => !local.contains(coverageKey(f)))
    if (missing.nonEmpty) {
      import org.apache.spark.sql.functions.col
      val bySrc = spark.read.parquet(missing.map(_.path): _*)
        .select(col("file_path"), col("_metadata.file_path").as("__src"))
        .distinct()
        .collect()
        .groupBy(r => norm(r.getString(1)))
      missing.foreach { f =>
        val covered = bySrc.getOrElse(norm(f.path), Array.empty)
          .map(r => norm(r.getString(0))).toSeq.distinct
        local(coverageKey(f)) = covered
        coverageCache.put(coverageKey(f), covered)
      }
    }
    val acc = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[DeleteFileRef]]
    posFiles.foreach { f =>
      local.getOrElse(coverageKey(f), Nil).foreach { data =>
        acc.getOrElseUpdate(data, scala.collection.mutable.ArrayBuffer.empty) += f
      }
    }
    acc.map { case (k, v) => k -> v.toSeq }.toMap
  }

  /** Fallback coverage index by PATH SUFFIX, built once per planning: a
    * legacy delete file can record a differently-rooted absolute path, so
    * a primary-key miss used to scan the whole coverage map per planned
    * file (O(files × delete files) driver string work). Every '/'-suffix
    * of every covered path is indexed instead — one pass over the map.
    * ONE implementation shared by the batch scan and the streaming
    * source, so the lookup rule can never drift between them.
    */
  def suffixIndex(
      posCov: Map[String, Seq[DeleteFileRef]]): Map[String, Seq[DeleteFileRef]] = {
    val m = scala.collection.mutable.HashMap.empty[String, Seq[DeleteFileRef]]
    posCov.foreach { case (k, v) =>
      var i = k.indexOf('/')
      while (i >= 0) {
        val suf = k.substring(i + 1)
        // MERGE on suffix collision: the same data file recorded under two
        // roots (old and new delete files) must attach BOTH coverage sets —
        // keeping the first would drop the other's positions
        // nondeterministically (map iteration order)
        if (suf.nonEmpty)
          m(suf) = (m.getOrElse(suf, Nil) ++ v).distinct
        i = k.indexOf('/', i + 1)
      }
    }
    m.toMap
  }

  /** Stat delete files once at planning (absolute paths + lengths). The
    * ref keeps the FULLY-QUALIFIED path (scheme + authority): the driver's
    * coverage read and the executor-side cache open it directly, and an
    * object-store-rooted table (s3a://bucket/tbl) must not resolve its
    * delete files against the cluster's default filesystem. Matching
    * against coverage keys goes through norm(), which strips the scheme on
    * both sides.
    */
  def refs(spark: SparkSession, tablePath: String, rels: Seq[String]): Seq[DeleteFileRef] = {
    if (rels.isEmpty) return Nil
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    rels.map { r =>
      val p = new Path(root, r)
      DeleteFileRef(fs.makeQualified(p).toString, fs.getFileStatus(p).getLen)
    }
  }
}

/** Per-executor parsed delete-file cache: each delete file is read and
  * indexed at most once per JVM regardless of how many tasks consult it.
  * Entries are bounded by the table's live delete state (compaction
  * clears them) and live in EXECUTOR memory — the point of the design.
  */
object DeleteFileCache {
  // Bounded by estimated parsed BYTES, evicted least-recently-used and
  // one entry at a time: an executor serving a MoR-heavy 100 TB table (or
  // many tables) keeps the delete indexes its current tasks actually
  // consult instead of wiping the whole cache on overflow — a clear-all
  // made every task re-parse exactly when delete files were most numerous.
  // var so specs can shrink the bound and exercise incremental eviction
  private[graft] var MaxBytes: Long = 256L * 1024 * 1024

  private final class Entry(val value: AnyRef, val bytes: Long) {
    @volatile var touched: Long = 0L
  }
  private val cache = new ConcurrentHashMap[String, Entry]()
  private val clock = new java.util.concurrent.atomic.AtomicLong()
  private val totalBytes = new java.util.concurrent.atomic.AtomicLong()

  private[graft] def cachedEntries: Int = cache.size
  // parse-count telemetry: a re-parse after eviction bumps this; specs
  // assert hot entries do NOT re-parse across plannings
  private[graft] val parses = new java.util.concurrent.atomic.AtomicLong()

  private def getOrLoad(key: String)(load: => (AnyRef, Long)): AnyRef = {
    // computeIfAbsent keeps the parse-once-per-JVM guarantee (concurrent
    // tasks on the same file block on one parse, not N)
    val e = cache.computeIfAbsent(key, _ => {
      val (v, b) = load
      parses.incrementAndGet()
      totalBytes.addAndGet(b)
      new Entry(v, b)
    })
    e.touched = clock.incrementAndGet()
    if (totalBytes.get > MaxBytes) evict(key)
    e.value
  }

  /** Drop coldest entries until under the bound (never the one just
    * touched) — incremental, hot set survives.
    */
  private def evict(keep: String): Unit = synchronized {
    while (totalBytes.get > MaxBytes && cache.size > 1) {
      var coldest: String = null
      var coldestTouch = Long.MaxValue
      cache.forEach { (k, e) =>
        if (k != keep && e.touched < coldestTouch) { coldest = k; coldestTouch = e.touched }
      }
      if (coldest == null) return
      val removed = cache.remove(coldest)
      if (removed != null) totalBytes.addAndGet(-removed.bytes)
    }
  }

  /** Sorted deleted positions of `dataAbs` (falling back to a
    * table-relative suffix match for entries recorded under a differently
    * rooted absolute path).
    */
  def positionsFor(factory: ParquetPartitionReaderFactory, file: DeleteFileRef,
      dataAbs: String, rel: String): Array[Long] = {
    val idx = getOrLoad("pos:" + file.path) {
      val acc = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.ArrayBuffer[Long]]
      readAll(factory, file) { r =>
        acc.getOrElseUpdate(DeleteFiles.norm(r.getUTF8String(0).toString),
          scala.collection.mutable.ArrayBuffer.empty[Long]) += r.getLong(1)
      }
      val m = acc.map { case (k, v) => k -> v.toArray.sorted }.toMap
      val bytes = m.iterator.map { case (k, v) => 2L * k.length + 8L * v.length + 48L }.sum
      (m, bytes)
    }.asInstanceOf[Map[String, Array[Long]]]
    idx.getOrElse(dataAbs,
      idx.collectFirst { case (k, v) if k.endsWith("/" + rel) => v }
        .getOrElse(Array.emptyLongArray))
  }

  /** Catalyst values compare by `equals`, but BinaryType extracts as
    * Array[Byte], whose equals is REFERENCE identity — a binary-keyed
    * equality delete would never match any row (set membership always
    * false, every deleted row resurrected). Canonicalize to a
    * value-comparing immutable wrapper; BOTH the cached key set and the
    * per-row probes must build keys through this one seat.
    */
  def canonKeyVal(v: Any): Any = v match {
    case a: Array[Byte] => scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    case x => x
  }

  /** The key set of an equality-delete file, as CATALYST values (so they
    * compare equal to reader-row extractions). Rows are copied out of the
    * reader's reused buffer before extraction.
    */
  def keysFor(spec: EqDeleteSpec): Set[Seq[Any]] =
    getOrLoad("eq:" + spec.file.path) {
      val acc = Set.newBuilder[Seq[Any]]
      var n = 0L
      readAll(spec.factory, spec.file) { r =>
        val copied = r.copy()
        acc += spec.types.indices
          .map(i => canonKeyVal(copied.get(i, spec.types(i)))).toList
        n += 1
      }
      (acc.result(), n * (16L * spec.types.length + 48L))
    }.asInstanceOf[Set[Seq[Any]]]

  private def readAll(factory: ParquetPartitionReaderFactory, file: DeleteFileRef)(
      f: InternalRow => Unit): Unit = {
    val pf = PartitionedFile(InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPathString(file.path), 0, file.len)
    val reader = factory.createReader(FilePartition(0, Array(pf)))
    try { while (reader.next()) f(reader.get()) } finally reader.close()
  }
}
