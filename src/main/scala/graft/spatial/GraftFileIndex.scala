package graft.spatial

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Manifest-driven [[FileIndex]]: file-level skipping from per-file min/max
  * stats, evaluated inclusively by [[FileStats.mightMatch]], combined with
  * identity partition pruning for hive-layout partition directories.
  *
  * This is the Spark-native seat of the reference's scan planning
  * (`core/src/main/java/org/apache/iceberg/ManifestGroup.java:182-268` +
  * `ManifestReader.java:214-231` in /root/reference): where Iceberg walks
  * manifest entries and asks `InclusiveMetricsEvaluator.eval(file)`, Spark's
  * `FileSourceScanExec` hands the pushed data filters to
  * `FileIndex.listFiles`, and we drop every file whose stats prove it can't
  * match. Partition predicates arrive separately as `partitionFilters` and
  * are evaluated exactly against each file's partition values — the
  * combination the reference's partitioned spatial matrix exercises
  * (`data/src/test/java/org/apache/iceberg/havasu/TestGeometryReadersAndWriters.java:266-315`).
  *
  * At 100 TB this is the difference between touching every object on S3 and
  * opening only the Hilbert-clustered files whose bbox overlaps the query
  * window; the manifest is O(#files), read once on the driver.
  */
class GraftFileIndex(
    spark: SparkSession,
    basePath: Path,
    stats: Seq[FileStats],
    val dataSchema: StructType,
    override val partitionSchema: StructType = new StructType(),
    partitionSpecs: Seq[Transforms.Transform] = Nil) extends FileIndex {

  // FileStatus built straight from the manifest (path + size are all split
  // planning needs) — no per-file RPC; a 100k-file table opens with zero
  // object-store round-trips.
  private val statuses: Map[String, FileStatus] =
    stats.map { f =>
      f.path -> new FileStatus(f.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
        new Path(basePath, f.path))
    }.toMap

  // Pruning schema: the served partition columns plus HIDDEN derived
  // columns — transforms whose derived value lives only in directory names
  // (catalog tables use Iceberg-style hidden partitioning: `bucket(4,id)`
  // never appears in the logical schema, yet `WHERE id = 42` must still
  // prune to one bucket). Served columns come first so expressions bound
  // against `partitionSchema` index correctly into prune rows.
  private val pruneSchema: StructType = {
    val extra = partitionSpecs
      .filterNot(t => t.isInstanceOf[Transforms.Identity] ||
        partitionSchema.fieldNames.contains(t.derivedName))
      .flatMap { t =>
        val dt = t match {
          case tr: Transforms.Truncate =>
            // without the source type a string-parsed dir value could
            // mis-compare in range projection — skip pruning instead
            dataSchema.fields.find(_.name == tr.source).map(_.dataType)
          case _ => Some(IntegerType)
        }
        dt.map(StructField(t.derivedName, _))
      }
    StructType(partitionSchema.fields ++ extra)
  }

  // partition values from each file's directory segments — reusing the
  // per-FileStats dirVals memo: manifest entries are cached per (table,
  // version), so the segment parse happens once per file across ALL scan
  // builds, not once per index construction
  private val partValues: Map[String, InternalRow] =
    if (pruneSchema.isEmpty) Map.empty
    else stats.map(f => f.path -> parsePartRow(f.dirVals)).toMap

  /** Full manifest, for planning-time consumers (aggregate pushdown). */
  def allStats: Seq[FileStats] = stats

  override def rootPaths: Seq[Path] = Seq(basePath)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = stats.filter(f => dataFilters.forall(f.mightMatch))
    if (pruneSchema.isEmpty) {
      Seq(PartitionDirectory(InternalRow.empty,
        kept.map(f => FileStatusWithMetadata(statuses(f.path)))))
    } else {
      val bound = partitionFilters.map(bindPart)
      // compiled ONCE per listing: conjunct flattening and transform
      // projection used to re-run for every partition group
      val projChecks = projectionChecks(dataFilters)
      kept.groupBy(f => partValues(f.path))
        .filter { case (row, _) =>
          bound.forall(p => p.eval(row) == true) && projChecks.forall(_(row))
        }
        .map { case (row, fs) =>
          PartitionDirectory(served(row), fs.map(f => FileStatusWithMetadata(statuses(f.path))))
        }.toSeq
    }
  }

  /** Prune row → the row of SERVED partition columns only (hidden derived
    * columns trimmed; they exist solely for planning-time projection).
    */
  private def served(row: InternalRow): InternalRow =
    if (pruneSchema.length == partitionSchema.length) row
    else InternalRow.fromSeq(partitionSchema.fields.indices.map(i =>
      if (row.isNullAt(i)) null else row.get(i, partitionSchema(i).dataType)))

  private def bindPart(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      BoundReference(partitionSchema.fieldIndex(a.name), a.dataType, a.nullable)
  }

  // ---- partition projection (Iceberg's transform projection): an
  // equality/IN predicate on a transform's SOURCE column projects to the
  // derived directory value at planning time, pruning hash-scattered
  // buckets that file stats can't.
  // Identity transforms participate too (derived col = the source itself,
  // present in partitionSchema with its declared type): the DSv2 path
  // delivers partition-column predicates as DATA filters — both the static
  // pushdown and runtime (DPP) join-key filters — and they must still
  // prune to the matching directories.
  private val transformIdx: Seq[(Transforms.Transform, Int)] =
    partitionSpecs
      .flatMap(t => pruneSchema.fieldNames.indexOf(t.derivedName) match {
        case -1 => None // unprunable (e.g. truncate with unknown source type)
        // dir strings for uncastable types (timestamp, decimal) can't be
        // compared against projected literals — a mistyped compare would
        // silently prune EVERY file; stay conservative instead
        case i if !PartitionPaths.castable(pruneSchema(i).dataType) => None
        case i => Some(t -> i)
      })

  /** Compile the projectable conjuncts of `dataFilters` into
    * per-partition row checks — ONCE per listing: conjunct flattening,
    * pattern matching, AND the transform projection of every literal
    * used to re-run for each partition group. Value ordering defers to
    * [[ValueOrder]], the pruning layer's one comparator seat.
    */
  private def projectionChecks(dataFilters: Seq[Expression]): Seq[InternalRow => Boolean] = {
    if (transformIdx.isEmpty) return Nil
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def derived(row: InternalRow, i: Int): Any =
      if (row.isNullAt(i)) null else row.get(i, pruneSchema(i).dataType)
    /** `src IN values`: the partition survives unless every projected
      * value disagrees with its derived value. A null derived value (no
      * dir segment: older spec generation or a genuinely-null source)
      * proves nothing — keep. One unprojectable literal voids the check.
      */
    def eqChecks(src: String, values: Seq[Any]): Seq[InternalRow => Boolean] =
      transformIdx.filter(_._1.source == src).flatMap { case (t, i) =>
        val projected = values.map(t.project)
        if (projected.exists(_.isEmpty)) None
        else {
          val ps = projected.flatten
          Some((row: InternalRow) => {
            val cur = derived(row, i)
            cur == null || ps.exists(valuesEqual(_, cur))
          })
        }
      }
    /** Range bound against a monotonic transform's derived value: with
      * `lower = true`, keep iff derived >= project(bound) (the derived
      * value of any row satisfying the predicate can't be below the
      * projected bound; > collapses to >= because the transform is
      * many-to-one). Incomparable values keep the partition.
      */
    def boundChecks(src: String, v: Any, lower: Boolean): Seq[InternalRow => Boolean] =
      transformIdx.filter { case (t, _) => t.source == src && t.monotonic }
        .flatMap { case (t, i) =>
          t.project(v).map(p => (row: InternalRow) =>
            ValueOrder.compare(derived(row, i), p) match {
              case Some(c) => if (lower) c >= 0 else c <= 0
              case None => true
            })
        }
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
    dataFilters.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, Literal(v, _)) => eqChecks(a.name, Seq(v))
      case EqualTo(Literal(v, _), a: AttributeReference) => eqChecks(a.name, Seq(v))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        eqChecks(a.name, vs.map(_.asInstanceOf[Literal].value))
      // OptimizeIn converts 10+-value IN-lists to InSet BEFORE this code
      // runs — without this arm exactly the hash-scattered large-IN
      // workloads hidden partitioning exists for lost all dir pruning
      case org.apache.spark.sql.catalyst.expressions.InSet(a: AttributeReference, vs) =>
        eqChecks(a.name, vs.toSeq)
      // range projection for MONOTONIC transforms: src >= L ⇒ derived >= t(L)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => boundChecks(a.name, v, lower = true)
      case GreaterThan(a: AttributeReference, Literal(v, _)) => boundChecks(a.name, v, lower = true)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => boundChecks(a.name, v, lower = false)
      case LessThan(a: AttributeReference, Literal(v, _)) => boundChecks(a.name, v, lower = false)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => boundChecks(a.name, v, lower = false)
      case GreaterThan(Literal(v, _), a: AttributeReference) => boundChecks(a.name, v, lower = false)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) => boundChecks(a.name, v, lower = true)
      case LessThan(Literal(v, _), a: AttributeReference) => boundChecks(a.name, v, lower = true)
      case _ => Nil // other shapes: no projection, stay conservative
    }
  }

  /** Equality defers to [[ValueOrder]] where an order exists; the
    * remaining shapes (NaN/Infinity partition values — BigDecimal would
    * throw; booleans) compare textually, both sides having come through
    * the same cast/format path.
    */
  private def valuesEqual(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case _ => ValueOrder.compare(a, b) match {
      case Some(c) => c == 0
      case None => String.valueOf(a) == String.valueOf(b)
    }
  }

  private def parsePartRow(kv: Map[String, String]): InternalRow = {
    InternalRow.fromSeq(pruneSchema.map { f =>
      kv.get(f.name) match {
        case None | Some(PartitionPaths.NullSentinel) => null
        // uncastable types (timestamp, decimal) SERVE through a lenient
        // session-zone catalyst cast — a raw string in a typed slot would
        // CCE in the reader; they stay excluded from pruning decisions
        case Some(v) => PartitionPaths.cast(v, f.dataType)
          .getOrElse(PartitionPaths.castLenient(v, f.dataType))
      }
    })
  }

  override def inputFiles: Array[String] =
    stats.map(f => new Path(basePath, f.path).toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = stats.map(_.sizeBytes).sum
}
