package graft.spatial

import org.locationtech.jts.geom.Envelope

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{GeoCodec, StCovers, StIntersects}

/** Catalyst rewrite of spatial predicates into pushable bbox range
  * predicates — the rebuild of the reference's single most important piece
  * of optimizer code, `SpatialPredicatePushDown`
  * (`spark/v3.5/spark-extensions/src/main/scala/org/apache/spark/sql/execution/datasources/v2/optimizer/havasu/SpatialPredicatePushDown.scala:49-134`
  * in /root/reference).
  *
  * Where the fork translates `ST_Intersects(geom, Q)` into an Iceberg
  * expression and injects it into the scan, here the translation target is
  * ordinary comparisons on the `<geom>_bbox` shadow struct:
  *
  *   ST_Intersects(g, Q) ⇒ g_bbox.xmin <= Q.maxX ∧ g_bbox.xmax >= Q.minX
  *                        ∧ g_bbox.ymin <= Q.maxY ∧ g_bbox.ymax >= Q.minY
  *   ST_Covers(g, Q)     ⇒ g_bbox.xmin <= Q.minX ∧ g_bbox.xmax >= Q.maxX
  *                        ∧ g_bbox.ymin <= Q.minY ∧ g_bbox.ymax >= Q.maxY
  *
  * which Spark's own machinery pushes to the parquet scan (row-group
  * pruning) and [[GraftFileIndex]] uses for file pruning. The original
  * spatial conjunct is retained for exact row-level JTS evaluation, same as
  * the fork keeps its `Filter` node (`SpatialPredicatePushDown.scala:62-66`)
  * — bbox pruning is inclusive-only.
  *
  * AND/OR recursion mirrors the fork (`:91-123`); NOT is deliberately not
  * translated — spatial predicates are non-negatable
  * (`api/.../expressions/Expression.java:65-98` throws on `negate()`), and a
  * bbox test is only a *necessary* condition, so `NOT ST_Intersects` must
  * never produce pruning.
  */
object SpatialPredicatePushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      derive(cond, child.output) match {
        case Some(extra) =>
          val existing = splitAnd(cond)
          val fresh = splitAnd(extra).filterNot(e => existing.exists(_.semanticEquals(e)))
          if (fresh.isEmpty) f
          else Filter(And(fresh.reduce(And), cond), child)
        case None => f
      }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Derive a bbox predicate implied by `cond`, if any. AND: any conjunct
    * may contribute. OR: both sides must contribute (else unsound).
    */
  private def derive(cond: Expression, out: Seq[Attribute]): Option[Expression] = cond match {
    case And(l, r) =>
      (derive(l, out), derive(r, out)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b)
      }
    case Or(l, r) =>
      for (a <- derive(l, out); b <- derive(r, out)) yield Or(a, b)
    // both argument orders: intersects is symmetric; covers(lit, geom)
    // means the literal covers the geometry → the geometry's bbox must lie
    // within the query envelope (the ST_Within-style containment test)
    case StIntersects(a, b) =>
      translate(a, b, out, Intersects).orElse(translate(b, a, out, Intersects))
    case StCovers(a, b) =>
      translate(a, b, out, Covers).orElse(translate(b, a, out, CoveredBy))
    case _ => None
  }

  private sealed trait Mode
  private case object Intersects extends Mode
  private case object Covers extends Mode
  private case object CoveredBy extends Mode

  private def translate(
      g: Expression, q: Expression, out: Seq[Attribute], mode: Mode): Option[Expression] = {
    val geomAttr = g match {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    val env: Option[Envelope] = q match {
      case lit if lit.foldable && lit.dataType == org.apache.spark.sql.types.BinaryType =>
        Option(lit.eval(null)).map(b =>
          GeoCodec.readWkb(b.asInstanceOf[Array[Byte]]).getEnvelopeInternal)
      case _ => None
    }
    for {
      a <- geomAttr
      e <- env
      // name match alone isn't proof: the rule is installed session-wide,
      // so a user's own unrelated `<g>_bbox` struct must not be read by
      // ordinal — require the exact shadow shape (4 double leaves named
      // xmin/ymin/xmax/ymax, same test as FooterStats.geometryShadowStems).
      // The match must also be UNIQUE: a self-join surfaces two
      // same-named shadows and binding the wrong relation's bbox would
      // filter on the wrong row's envelope — prefer the geometry
      // attribute's qualifier, else DECLINE (pruning lost, rows kept).
      bbox <- {
        val cands = out.collect {
          case b: AttributeReference if b.name == s"${a.name}_bbox" &&
            isShadowStruct(b.dataType) => b
        }
        // the qualifier check applies to a SINGLE candidate too: in a
        // join where only the OTHER relation's same-named shadow survived
        // column pruning, binding it would inject a bbox conjunct over
        // the wrong row's envelope and silently DROP matching rows —
        // same-relation attributes always share the geometry's qualifier
        cands.filter(_.qualifier == a.qualifier) match {
          case Seq(one) => Some(one)
          case _ => None
        }
      }
    } yield {
      val names = bbox.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames
      def leaf(n: String) = GetStructField(bbox, names.indexOf(n), Some(n))
      val (xmin, ymin, xmax, ymax) = (leaf("xmin"), leaf("ymin"), leaf("xmax"), leaf("ymax"))
      // NULL-SAFE per leaf: the bbox test is a NECESSARY condition only —
      // a row whose shadow is NULL (add_files-imported parquet, pre-shadow
      // generations null-filled by the fully-nullable read schema) must
      // fall through to the retained exact predicate, never be dropped by
      // And(NULL, true) = NULL. Per-LEAF IsNull keeps file pruning: stats
      // record zero nulls on shadow leaves of normal files, so
      // FileStats.canMatch(IsNull) still excludes them.
      def le(l: Expression, v: Double) =
        Or(IsNull(l), LessThanOrEqual(l, Literal(v, DoubleType)))
      def ge(l: Expression, v: Double) =
        Or(IsNull(l), GreaterThanOrEqual(l, Literal(v, DoubleType)))
      val cs = mode match {
        case Intersects =>
          Seq(le(xmin, e.getMaxX), ge(xmax, e.getMinX), le(ymin, e.getMaxY), ge(ymax, e.getMinY))
        case Covers => // geom covers Q: geom bbox encloses Q
          Seq(le(xmin, e.getMinX), ge(xmax, e.getMaxX), le(ymin, e.getMinY), ge(ymax, e.getMaxY))
        case CoveredBy => // Q covers geom: geom bbox inside Q
          Seq(ge(xmin, e.getMinX), le(xmax, e.getMaxX), ge(ymin, e.getMinY), le(ymax, e.getMaxY))
      }
      cs.reduce[Expression](And)
    }
  }

  private def isShadowStruct(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case s: org.apache.spark.sql.types.StructType =>
      s.fields.length == 4 &&
        s.fields.map(_.name).toSet == Set("xmin", "ymin", "xmax", "ymax") &&
        s.fields.forall(_.dataType == DoubleType)
    case _ => false
  }
}

/** Session installation for the geo layer (the fork injects its rule via
  * `IcebergSparkSessionExtensions.scala:48-54`; Spark-native equivalent is
  * `spark.experimental.extraOptimizations`, which runs after the main
  * optimizer batches — constant folding has already collapsed
  * `st_makeenvelope(lits…)` into a binary literal by then).
  */
object Geo {
  def installRule(spark: SparkSession): Unit = {
    val rules = Seq(SpatialPredicatePushdown, graft.plans.StatsAggregatePushdown,
      graft.sources.GraftScanFilterPushdown)
    val cur = spark.experimental.extraOptimizations
    val missing = rules.filterNot(cur.contains)
    if (missing.nonEmpty) {
      spark.experimental.extraOptimizations = cur ++ missing
    }
  }
  def install(spark: SparkSession): Unit = {
    graft.functions.GeoSql.install(spark)
    installRule(spark)
  }
}
