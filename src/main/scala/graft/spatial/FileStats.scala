package graft.spatial

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column statistics + the inclusive "can this file match?" check.
  *
  * Spark-native rebuild of the reference's manifest-level metrics evaluation
  * (`api/src/main/java/org/apache/iceberg/expressions/InclusiveMetricsEvaluator.java`
  * in /root/reference, incl. the geometry-bbox branch at :484-542): each data
  * file carries min/max per primitive leaf (struct leaves flattened as
  * "col.field"); a filter expression is evaluated inclusively — ROWS_MIGHT_MATCH
  * unless the stats *prove* no row can match. Anything unknown — an
  * unrecognized expression, a Cast-wrapped column (stat and literal would be
  * in different units), or an incomparable stat/literal pair — is
  * conservatively "might match", mirroring `StrictMetricsEvaluator.java:469-477`'s
  * stance that pruning must never drop a matching file.
  */
case class FileStats(
    path: String,
    rows: Long,
    sizeBytes: Long,
    mins: Map[String, Any],
    maxs: Map[String, Any],
    /** Snapshot version that ADDED this file — the engine's sequence
      * number (Iceberg's `data_sequence_number`): equality deletes apply
      * only to files with a lower sequence. 0 = unknown (legacy manifest),
      * treated as "older than everything" so old tables keep old behavior.
      */
    addedV: Int = 0,
    /** Per-column null-value counts (Iceberg's `null_value_counts`,
      * `InclusiveMetricsEvaluator.notNull/isNull` in the reference): a
      * column absent from the map has an UNKNOWN count (legacy manifest or
      * stat-less row group) and never prunes.
      */
    nulls: Map[String, Long] = Map.empty,
    /** Per-column on-disk byte sizes (Iceberg's `column_sizes`), summed
      * over the file's column chunks; empty = unknown (legacy manifest).
      * Surfaced through the files/entries metadata tables'
      * `readable_metrics.<col>.column_size`.
      */
    colSizes: Map[String, Long] = Map.empty,
    /** Columns whose bounds were TRUNCATED at write time
      * (write.metadata.metrics truncate(n) — [[MetricsModes]]): bounds
      * remain sound for inclusive pruning but are NOT the exact extreme
      * values, so MIN/MAX aggregate pushdown must decline them.
      */
    truncated: Seq[String] = Nil) {

  /** Hive-layout partition values parsed from the path — computed once
    * per FileStats instance; combined with the parsed-manifest memo
    * ([[Snapshots.readManifest]]) this makes dir parsing one pass per
    * (table, version) across all scan builds.
    */
  @transient lazy val dirVals: Map[String, String] = PartitionPaths.dirValues(path)

  def mightMatch(filter: Expression): Boolean = canMatch(filter)

  def withAddedV(v: Int): FileStats = if (addedV == 0) copy(addedV = v) else this

  private def canMatch(e: Expression): Boolean = e match {
    case And(l, r) => canMatch(l) && canMatch(r)
    case Or(l, r) => canMatch(l) || canMatch(r)
    case LessThan(a, Literal(v, _)) => test(a, n => cmpMin(n, v).forall(_ < 0))
    case LessThanOrEqual(a, Literal(v, _)) => test(a, n => cmpMin(n, v).forall(_ <= 0))
    case GreaterThan(a, Literal(v, _)) => test(a, n => cmpMax(n, v).forall(_ > 0))
    case GreaterThanOrEqual(a, Literal(v, _)) => test(a, n => cmpMax(n, v).forall(_ >= 0))
    case EqualTo(a, Literal(v, _)) =>
      test(a, n => cmpMin(n, v).forall(_ <= 0) && cmpMax(n, v).forall(_ >= 0))
    case LessThan(Literal(v, _), a) => canMatch(GreaterThan(a, Literal(v)))
    case LessThanOrEqual(Literal(v, _), a) => canMatch(GreaterThanOrEqual(a, Literal(v)))
    case GreaterThan(Literal(v, _), a) => canMatch(LessThan(a, Literal(v)))
    case GreaterThanOrEqual(Literal(v, _), a) => canMatch(LessThanOrEqual(a, Literal(v)))
    case EqualTo(l @ Literal(_, _), a) => canMatch(EqualTo(a, l))
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      test(a, n => vs.exists { case Literal(v, _) =>
        cmpMin(n, v).forall(_ <= 0) && cmpMax(n, v).forall(_ >= 0) })
    case InSet(a, vs) =>
      test(a, n => vs.exists(v =>
        cmpMin(n, v).forall(_ <= 0) && cmpMax(n, v).forall(_ >= 0)))
    // null-count pruning (the reference's InclusiveMetricsEvaluator
    // notNull/isNull from null_value_counts): a zero-null file can't
    // match IS NULL; an all-null file can't match IS NOT NULL. An unknown
    // count (absent key) keeps the file.
    case IsNull(a) => nullStatName(a).forall(n => nulls.get(n).forall(_ > 0))
    case IsNotNull(a) => nullStatName(a).forall(n => nulls.get(n).forall(_ < rows))
    case _ => true // NOT / unknown exprs: conservative, file might match
  }

  /** Stats key for null-count lookups — unlike [[statName]] it does not
    * require a min/max entry (an all-null column has no value bounds but
    * a perfectly known null count).
    */
  private def nullStatName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case GetStructField(a: AttributeReference, _, Some(f)) => Some(s"${a.name}.$f")
    case _ => None
  }

  private def test(a: Expression, p: String => Boolean): Boolean =
    statName(a).forall(p)

  /** Stats key for a supported reference: top-level attr or struct leaf.
    * Only *numeric-widening* casts are stripped (stat and literal are then
    * compared exactly via BigDecimal); unit-changing casts like
    * timestamp→date would compare micros against days and must stay opaque.
    */
  private def statName(e: Expression): Option[String] = e match {
    case a: AttributeReference if mins.contains(a.name) => Some(a.name)
    case GetStructField(a: AttributeReference, _, Some(f)) if mins.contains(s"${a.name}.$f") =>
      Some(s"${a.name}.$f")
    case Cast(c, dt, _, _) if isPlainNumeric(dt) && isPlainNumeric(c.dataType) => statName(c)
    case _ => None
  }

  private def isPlainNumeric(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | DoubleType | FloatType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** sign of (file-min(stat) - literal), or None if incomparable. */
  private def cmpMin(n: String, v: Any): Option[Int] = cmp(mins(n), v)
  private def cmpMax(n: String, v: Any): Option[Int] = cmp(maxs(n), v)

  private def cmp(stat: Any, lit: Any): Option[Int] = ValueOrder.compare(stat, lit)
}

/** THE value comparator of the pruning layer — one seat shared by the
  * inclusive metrics evaluator ([[FileStats]]), the footer min/max merge
  * ([[FooterStats]]), and partition range projection
  * ([[GraftFileIndex]]), so an ordering rule can never drift between
  * them. Strings order by UTF-8 BYTES (Spark's own string order; UTF-16
  * compareTo ranks supplementary characters below [U+E000, U+FFFF] and
  * would flip pruning decisions against recorded bounds); numbers —
  * including Catalyst Decimals — compare exactly through BigDecimal
  * (immune to double rounding above 2^53). None = incomparable (nulls,
  * NaN/Infinity, mixed string/number): every caller treats it as
  * "cannot prune".
  */
private[spatial] object ValueOrder {
  private def utf8(v: Any): Option[UTF8String] = v match {
    case u: UTF8String => Some(u)
    case s: String => Some(UTF8String.fromString(s))
    case _ => None
  }

  private def big(v: Any): Option[BigDecimal] = v match {
    case d: java.lang.Double if d.isNaN || d.isInfinite => None
    case f: java.lang.Float if f.isNaN || f.isInfinite => None
    case n: Number => Some(BigDecimal(n.toString))
    case d: org.apache.spark.sql.types.Decimal => Some(d.toBigDecimal)
    case _ => None
  }

  def compare(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x, y) if utf8(x).isDefined || utf8(y).isDefined =>
      for (p <- utf8(x); q <- utf8(y)) yield p.compareTo(q)
    case _ => for (p <- big(a); q <- big(b)) yield p.compare(q)
  }
}

/** An equality-delete file reference: rows of `path` (a parquet under
  * `_graft_deletes/`) delete any table row matching on all of `cols`.
  * `seq` = the snapshot version the delete was committed at — it applies
  * ONLY to data files with `addedV < seq` (Iceberg's sequence-number
  * scoping: delete-then-reinsert must not hide the reinserted rows).
  * seq = 0 (legacy manifests) applies to every file.
  */
case class EqDelete(path: String, cols: Seq[String], seq: Int = 0) {
  def appliesTo(f: FileStats): Boolean = seq == 0 || f.addedV < seq
  def withSeq(v: Int): EqDelete = if (seq == 0) copy(seq = v) else this
}
