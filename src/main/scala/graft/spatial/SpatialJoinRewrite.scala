package graft.spatial

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.{StBboxStruct, StDWithin, StDistance, StIntersects}

/** Plans the SQL spelling of a spatial join through the PBSM machinery.
  *
  * `SELECT … FROM a JOIN b ON ST_Intersects(a.geom, b.geom)` analyzes to a
  * `Join` whose condition Catalyst cannot equi-split, so the planner emits a
  * BroadcastNestedLoopJoin — correct but O(N·M), the first scale-killer a
  * SQL user hits (the reference-as-a-system delegates exactly this shape to
  * Sedona's RangeJoinExec strategy, `/root/reference/README.md:26-28`). This
  * rule rewrites the logical join into the SAME cell-explode equi-join
  * construction [[SpatialJoin.intersects]]/[[SpatialJoin.dwithin]] build for
  * the Scala API — declared at the logical level, so Catalyst still picks
  * the physical join (SMJ/SHJ, AQE skew splitting, broadcast of a small
  * exploded side) — instead of injecting a bespoke physical operator.
  *
  * Shape (identical to the API path, so the SpatialJoinSpec equivalence
  * arguments carry over):
  *
  *   Join(l, r, Inner, ST_Intersects(lg, rg) [∧ rest]) ⇒
  *     Project(origOutput,
  *       Filter(refCellDedup ∧ originalCondition,
  *         Join(explodeCells(l, lg [±dist]), explodeCells(r, rg),
  *              Inner, lcx = rcx ∧ lcy = rcy)))
  *
  * Exactness: the equi-join over covered cells yields every pair whose
  * (expanded) bboxes share a cell — a superset of the pairs satisfying the
  * driver predicate — each exactly once after the reference-corner dedup
  * (the [[SpatialJoin]] argument); the ORIGINAL condition retained in the
  * Filter then restores the join's semantics verbatim, so the rewrite is
  * answer-preserving for ANY residual conjuncts. Driver forms recognized in
  * top-level conjuncts, both argument orders, one side's geometry per
  * child: `ST_Intersects(lg, rg)`, `ST_DWithin(lg, rg, d)` (foldable
  * nonnegative finite d), and `ST_Distance(lg, rg) <= d` / `< d` spelled
  * either way around.
  *
  * Declines (falls back to Spark's own planning) when:
  *  - the join is not Inner/Cross (outer/semi/anti keep rows the candidate
  *    construction would have to re-derive — the pushdown rule's posture);
  *  - no top-level conjunct is a cross-side spatial driver (an OR-guarded
  *    predicate is not a necessary match condition);
  *  - either side carries an explicit join-strategy hint (the user chose);
  *  - a side is broadcast-tiny (`spark.graft.spatial.join.fallbackBytes`,
  *    default = autoBroadcastJoinThreshold): a handful of broadcast rows
  *    beats exploding a side whose huge geometries could cover thousands
  *    of cells each — BNLJ over a tiny broadcast is the cheaper plan;
  *  - the condition already holds a cross-side equi-conjunct: such a join
  *    never plans as a nested loop (the equi keys hash/sort, the spatial
  *    predicate rides as a residual), and the gate doubles as the
  *    idempotence proof — every rewritten or API-built PBSM join carries
  *    its cell equality there, however later batches rename attributes
  *    (a `__graft_spj_` reference check backs it up).
  *
  * Pitch: `spark.graft.spatial.join.cellDeg` (default 1.0 coordinate
  * units), the [[SpatialJoin]] contract — data-independent shuffle-key
  * cardinality, skewed cells handled by AQE skew-join splitting.
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] {

  private val P = "__graft_spj_"
  val EnabledKey = "spark.graft.spatial.join.rewrite"
  val CellDegKey = "spark.graft.spatial.join.cellDeg"
  val FallbackBytesKey = "spark.graft.spatial.join.fallbackBytes"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transform {
      case j @ Join(_, _, Inner | Cross, Some(cond), hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty &&
            !cond.references.exists(_.name.startsWith(P)) &&
            !hasCrossSideEquiKey(j, cond) =>
        driverOf(j, cond) match {
          case Some(d) if !anySideTiny(j) => rewrite(j, cond, d)
          case _ => j
        }
    }
  }

  /** The structural idempotence + necessity gate: a join whose condition
    * already holds a cross-side equi-conjunct never plans as a nested-loop
    * cartesian — ExtractEquiJoinKeys hashes/sorts on those keys and keeps
    * the spatial predicate as a residual — so there is nothing to rescue,
    * and rewriting would only add an explode. This also recognizes every
    * already-rewritten or API-built PBSM join by SHAPE (their cell
    * equality conjuncts) — name-based guards alone miss them once
    * NestedColumnAliasing rewrites `bbox.xmin` references into fresh
    * `_extract_*` attributes (caught by the co-gridded SPJ plan spec).
    */
  private def hasCrossSideEquiKey(j: Join, cond: Expression): Boolean = {
    def crossRef(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
          (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet)))
    splitAnd(cond).exists {
      case EqualTo(a, b) => crossRef(a, b)
      case EqualNullSafe(a, b) => crossRef(a, b)
      case _ => false
    }
  }

  /** The cross-side spatial conjunct that drives the candidate join:
    * left-side geometry, right-side geometry, and the bbox expansion
    * distance (0 for intersects).
    */
  private case class Driver(lGeom: AttributeReference, rGeom: AttributeReference,
      dist: Double)

  private def driverOf(j: Join, cond: Expression): Option[Driver] = {
    def cross(a: Expression, b: Expression): Option[(AttributeReference, AttributeReference)] =
      (a, b) match {
        case (ar: AttributeReference, br: AttributeReference) =>
          // both predicates are symmetric in their geometry arguments, so
          // normalize to (left-side geom, right-side geom)
          if (j.left.outputSet.contains(ar) && j.right.outputSet.contains(br)) Some((ar, br))
          else if (j.left.outputSet.contains(br) && j.right.outputSet.contains(ar)) Some((br, ar))
          else None
        case _ => None
      }
    def distOf(e: Expression): Option[Double] =
      if (!e.foldable) None
      else e.eval(null) match {
        case n: java.lang.Number =>
          val d = n.doubleValue()
          if (d >= 0 && !d.isNaN && !d.isInfinite) Some(d) else None
        case d: org.apache.spark.sql.types.Decimal => distOf(Literal(d.toDouble, DoubleType))
        case _ => None
      }
    splitAnd(cond).iterator.flatMap {
      case StIntersects(a, b) => cross(a, b).map { case (l, r) => Driver(l, r, 0.0) }
      case StDWithin(a, b, d) =>
        for (p <- cross(a, b); dv <- distOf(d)) yield Driver(p._1, p._2, dv)
      // ST_Distance(a,b) <= d / < d: candidates for <= cover < too
      case LessThan(StDistance(a, b), d) =>
        for (p <- cross(a, b); dv <- distOf(d)) yield Driver(p._1, p._2, dv)
      case LessThanOrEqual(StDistance(a, b), d) =>
        for (p <- cross(a, b); dv <- distOf(d)) yield Driver(p._1, p._2, dv)
      case GreaterThan(d, StDistance(a, b)) =>
        for (p <- cross(a, b); dv <- distOf(d)) yield Driver(p._1, p._2, dv)
      case GreaterThanOrEqual(d, StDistance(a, b)) =>
        for (p <- cross(a, b); dv <- distOf(d)) yield Driver(p._1, p._2, dv)
      case _ => None
    }.nextOption()
  }

  private def anySideTiny(j: Join): Boolean = {
    val t = conf.getConfString(FallbackBytesKey,
      conf.autoBroadcastJoinThreshold.toString).toLong
    t > 0 && (j.left.stats.sizeInBytes <= t || j.right.stats.sizeInBytes <= t)
  }

  private def rewrite(j: Join, cond: Expression, d: Driver): LogicalPlan = {
    val cell = conf.getConfString(CellDegKey, "1.0").toDouble
    require(cell > 0 && !cell.isNaN && !cell.isInfinite,
      s"$CellDegKey must be a positive finite grid pitch, got $cell")
    val cellLit = Literal(cell, DoubleType)
    val tz = Some(conf.sessionLocalTimeZone)
    def cellOf(e: Expression) = Cast(Floor(Divide(e, cellLit)), LongType)

    // expansion on the LEFT side only, like SpatialJoin.dwithin: a pair
    // within euclidean dist has per-axis displacement at most dist, so the
    // right bbox meets the left's expanded bbox
    val (lPlan, lbb, lcx, lcy) = explodeSide(j.left, d.lGeom, "l", d.dist, cellOf, tz)
    val (rPlan, rbb, rcx, rcy) = explodeSide(j.right, d.rGeom, "r", 0.0, cellOf, tz)

    val candidates = Join(lPlan, rPlan, Inner,
      Some(And(EqualTo(lcx, rcx), EqualTo(lcy, rcy))), JoinHint.NONE)

    def fld(bb: AttributeReference, i: Int): Expression =
      GetStructField(bb, i, Some(StBboxStruct.schema.fieldNames(i)))
    def less(e: Expression): Expression =
      if (d.dist == 0.0) e else Subtract(e, Literal(d.dist, DoubleType))
    // keep only the cell holding the (expanded-)bbox-intersection corner —
    // each candidate pair exactly once, no distinct
    val dedup = And(
      EqualTo(lcx, cellOf(Greatest(Seq(less(fld(lbb, 0)), fld(rbb, 0))))),
      EqualTo(lcy, cellOf(Greatest(Seq(less(fld(lbb, 1)), fld(rbb, 1))))))
    Project(j.output, Filter(And(dedup, cond), candidates))
  }

  /** One join side: Project appending the bbox shadow, then two chained
    * Generates exploding the covered cell range per axis (equivalent to the
    * API path's array-of-struct explode without the intermediate array
    * allocation). A null geometry's null bbox yields null sequences, which
    * the non-outer Generates drop — those rows cannot satisfy an inner
    * spatial condition anyway.
    */
  private def explodeSide(child: LogicalPlan, geom: AttributeReference, tag: String,
      expand: Double, cellOf: Expression => Expression, tz: Option[String])
      : (LogicalPlan, AttributeReference, AttributeReference, AttributeReference) = {
    val bbAlias = Alias(StBboxStruct(geom), s"$P${tag}bb")()
    val proj = Project(child.output :+ bbAlias, child)
    val bb = proj.output.last.asInstanceOf[AttributeReference]
    def fld(i: Int): Expression =
      GetStructField(bb, i, Some(StBboxStruct.schema.fieldNames(i)))
    def lo(e: Expression): Expression =
      if (expand == 0.0) e else Subtract(e, Literal(expand, DoubleType))
    def hi(e: Expression): Expression =
      if (expand == 0.0) e else Add(e, Literal(expand, DoubleType))
    val cx = AttributeReference(s"$P${tag}cx", LongType, nullable = false)()
    val genX = Generate(Explode(Sequence(cellOf(lo(fld(0))), cellOf(hi(fld(2))), None, tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cx), child = proj)
    val cy = AttributeReference(s"$P${tag}cy", LongType, nullable = false)()
    val genY = Generate(Explode(Sequence(cellOf(lo(fld(1))), cellOf(hi(fld(3))), None, tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cy), child = genX)
    (genY, bb, cx, cy)
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }
}
