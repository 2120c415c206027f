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
  * unless the stats *prove* no row can match. Unknown expressions are
  * conservatively true, mirroring `StrictMetricsEvaluator.java:469-477`'s
  * stance that pruning must never drop a matching file.
  */
case class FileStats(
    path: String,
    rows: Long,
    sizeBytes: Long,
    mins: Map[String, Any],
    maxs: Map[String, Any]) {

  def mightMatch(filter: Expression): Boolean = canMatch(filter)

  private def canMatch(e: Expression): Boolean = e match {
    case And(l, r) => canMatch(l) && canMatch(r)
    case Or(l, r) => canMatch(l) || canMatch(r)
    case LessThan(a, Literal(v, _)) => statName(a).forall(n => cmpMin(n, v) < 0)
    case LessThanOrEqual(a, Literal(v, _)) => statName(a).forall(n => cmpMin(n, v) <= 0)
    case GreaterThan(a, Literal(v, _)) => statName(a).forall(n => cmpMax(n, v) > 0)
    case GreaterThanOrEqual(a, Literal(v, _)) => statName(a).forall(n => cmpMax(n, v) >= 0)
    case EqualTo(a, Literal(v, _)) =>
      statName(a).forall(n => cmpMin(n, v) <= 0 && cmpMax(n, v) >= 0)
    case LessThan(Literal(v, _), a) => canMatch(GreaterThan(a, Literal(v)))
    case LessThanOrEqual(Literal(v, _), a) => canMatch(GreaterThanOrEqual(a, Literal(v)))
    case GreaterThan(Literal(v, _), a) => canMatch(LessThan(a, Literal(v)))
    case GreaterThanOrEqual(Literal(v, _), a) => canMatch(LessThanOrEqual(a, Literal(v)))
    case EqualTo(l @ Literal(_, _), a) => canMatch(EqualTo(a, l))
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      statName(a).forall(n => vs.exists { case Literal(v, _) =>
        cmpMin(n, v) <= 0 && cmpMax(n, v) >= 0 })
    case InSet(a, vs) =>
      statName(a).forall(n => vs.exists(v => cmpMin(n, v) <= 0 && cmpMax(n, v) >= 0))
    case _ => true // IsNull / NOT / unknown exprs: conservative, file might match
  }

  /** Stats key for a supported reference: top-level attr or struct leaf. */
  private def statName(e: Expression): Option[String] = e match {
    case a: AttributeReference if mins.contains(a.name) => Some(a.name)
    case GetStructField(a: AttributeReference, _, Some(f)) if mins.contains(s"${a.name}.$f") =>
      Some(s"${a.name}.$f")
    case Cast(c, _, _, _) => statName(c)
    case _ => None
  }

  /** compare file-min(stat) with literal v; sign of (min - v). */
  private def cmpMin(n: String, v: Any): Int = cmp(mins(n), v)
  private def cmpMax(n: String, v: Any): Int = cmp(maxs(n), v)

  private def cmp(stat: Any, lit: Any): Int = (stat, lit) match {
    case (null, _) => 0 // no stat → undetermined → treat as overlapping
    case (s: Number, l: Number) => java.lang.Double.compare(s.doubleValue(), l.doubleValue())
    case (s: String, l: UTF8String) => s.compareTo(l.toString)
    case (s: String, l: String) => s.compareTo(l)
    case _ => 0
  }
}
