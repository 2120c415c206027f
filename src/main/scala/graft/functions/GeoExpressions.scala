package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the ST_* surface the reference delegates
  * to a pluggable geo library (SPI `GeospatialLibrary`,
  * `spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/geo/spi/GeospatialLibrary.java`
  * in /root/reference; row-level semantics per
  * `api/.../expressions/Evaluator.java:162-170` — exact JTS intersects/covers).
  *
  * Geometry travels as WKB bytes in BinaryType columns. Catalyst expressions
  * (not UDFs) so predicates stay visible to optimizer rules
  * ([[graft.spatial.SpatialPredicatePushdown]] pattern-matches these nodes)
  * and constant-fold: `foldable` is true when all children are, so
  * `st_makeenvelope(lits…)` collapses to a binary Literal before pushdown.
  *
  * Every expression implements `doGenCode` as a call to a STATIC kernel in
  * [[GeoKernels]] — one `CodegenFallback` in a filter would knock the whole
  * stage out of WholeStageCodegen, and the geo filter is the hot loop of
  * the flagship scan path. The kernel is shared with interpreted eval, so
  * the two paths cannot diverge.
  */
abstract class GeoExpression extends Expression {
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  /** Name of the [[GeoKernels]] static method this expression compiles to.
    * Its JVM signature must be (childCodegenTypes...) → boxed result, with
    * `null` meaning SQL NULL.
    */
  protected def kernel: String

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null else notNull(vs)
  }
  protected def notNull(vs: Seq[Any]): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val javaType = CodeGenerator.javaType(dataType)
    val boxedType = CodeGenerator.boxedType(dataType)
    val r = ctx.freshName("kernelRes")
    val nullCheck = gens.map(_.isNull).filterNot(_.toString == "false") match {
      case Seq() => "false"
      case xs => xs.mkString(" || ")
    }
    val call = s"graft.functions.GeoKernels.$kernel(${gens.map(_.value).mkString(", ")})"
    ev.copy(code = code"""
      ${gens.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!($nullCheck)) {
        $boxedType $r = $call;
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = ($javaType) $r; }
      }""")
  }

  protected final def bytes(v: Any): Array[Byte] = v.asInstanceOf[Array[Byte]]
  protected final def dbl(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.asInstanceOf[Double]
  }
  protected final def str(v: Any): UTF8String = v.asInstanceOf[UTF8String]
  protected final def utf8(s: String): UTF8String = UTF8String.fromString(s)
}

// ---- constructors / converters ----------------------------------------

case class StGeomFromText(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](StringType)
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "geomFromText"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.geomFromText(str(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StGeomFromWkb(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType)
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "geomFromWkb"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.geomFromWkb(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StGeomFromGeoJson(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](StringType)
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "geomFromGeoJson"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.geomFromGeoJson(str(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StAsText(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType)
  override def dataType: DataType = StringType
  override protected def kernel: String = "asText"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.asText(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StAsGeoJson(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType)
  override def dataType: DataType = StringType
  override protected def kernel: String = "asGeoJson"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.asGeoJson(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StAsEwkb(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType)
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "asEwkb"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.asEwkb(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StPoint(x: Expression, y: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(x, y)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "point"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.point(dbl(vs(0)), dbl(vs(1)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StMakeEnvelope(minX: Expression, minY: Expression, maxX: Expression, maxY: Expression)
    extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(minX, minY, maxX, maxY)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "makeEnvelope"
  override protected def notNull(vs: Seq[Any]): Any =
    GeoKernels.makeEnvelope(dbl(vs(0)), dbl(vs(1)), dbl(vs(2)), dbl(vs(3)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3))
}

// ---- predicates (the reference's expression-algebra additions:
//      ST_INTERSECTS / ST_COVERS, Expression.java:47-48) ------------------

abstract class GeoPredicate extends GeoExpression with ExpectsInputTypes {
  def left: Expression
  def right: Expression
  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
}

case class StIntersects(left: Expression, right: Expression) extends GeoPredicate {
  override protected def kernel: String = "intersects"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.intersects(bytes(vs(0)), bytes(vs(1)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StCovers(left: Expression, right: Expression) extends GeoPredicate {
  override protected def kernel: String = "covers"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.covers(bytes(vs(0)), bytes(vs(1)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StContains(left: Expression, right: Expression) extends GeoPredicate {
  override protected def kernel: String = "contains"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.contains(bytes(vs(0)), bytes(vs(1)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StWithin(left: Expression, right: Expression) extends GeoPredicate {
  override protected def kernel: String = "within"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.within(bytes(vs(0)), bytes(vs(1)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StDistance(left: Expression, right: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "distance"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.distance(bytes(vs(0)), bytes(vs(1)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StDWithin(left: Expression, right: Expression, dist: Expression)
    extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(left, right, dist)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType, BinaryType, DoubleType)
  override def dataType: DataType = BooleanType
  override protected def kernel: String = "dwithin"
  override protected def notNull(vs: Seq[Any]): Any =
    GeoKernels.dwithin(bytes(vs(0)), bytes(vs(1)), dbl(vs(2)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1), c(2))
}

// ---- unary accessors / transforms --------------------------------------

abstract class GeoUnary extends GeoExpression with ExpectsInputTypes {
  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType)
}

case class StEnvelope(child: Expression) extends GeoUnary {
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "envelope"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.envelope(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StCentroid(child: Expression) extends GeoUnary {
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "centroid"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.centroid(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StBuffer(child: Expression, dist: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child, dist)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "buffer"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.buffer(bytes(vs(0)), dbl(vs(1)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

/** `st_transform(geom, fromSrid, toSrid)` — CRS reprojection for the
  * supported pair EPSG:4326 <-> EPSG:3857 (closed-form spherical
  * Mercator; [[GeoKernels.transformSrid]]). SRIDs are configuration, not
  * data: they must be foldable, and an unsupported pair fails at ANALYSIS
  * time naming the EPSG codes rather than per-row at execution.
  */
case class StTransform(child: Expression, fromSrid: Expression, toSrid: Expression)
    extends GeoExpression with FoldableArgCheck {
  override def children: Seq[Expression] = Seq(child, fromSrid, toSrid)
  override def inputTypes =
    Seq[org.apache.spark.sql.types.DataType](BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override protected def kernel: String = "transformSrid"
  override protected def foldableArgs =
    Seq(fromSrid -> "the source SRID", toSrid -> "the target SRID")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) return base
    (fromSrid.eval(null), toSrid.eval(null)) match {
      case (f: Int, t: Int) if f == t || Set(f, t) == Set(4326, 3857) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (f: Int, t: Int) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"st_transform: unsupported CRS pair EPSG:$f -> EPSG:$t " +
            "(supported: EPSG:4326 <-> EPSG:3857)")
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "st_transform: the SRIDs must not be NULL")
    }
  }
  override protected def notNull(vs: Seq[Any]): Any =
    GeoKernels.transformSrid(bytes(vs(0)),
      vs(1).asInstanceOf[Int], vs(2).asInstanceOf[Int])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2))
}

case class StX(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "x"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.x(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StY(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "y"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.y(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StXMin(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "xMin"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.xMin(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}
case class StXMax(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "xMax"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.xMax(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}
case class StYMin(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "yMin"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.yMin(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}
case class StYMax(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "yMax"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.yMax(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StArea(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "area"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.area(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StLength(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "length"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.length(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StIsEmpty(child: Expression) extends GeoUnary {
  override def dataType: DataType = BooleanType
  override protected def kernel: String = "isEmpty"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.isEmpty(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StIsValid(child: Expression) extends GeoUnary {
  override def dataType: DataType = BooleanType
  override protected def kernel: String = "isValid"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.isValid(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** Per-row bbox struct — the writer-side analogue of the reference's
  * per-file geometry metrics (`core/.../havasu/GeometryFieldMetrics.java:45-89`):
  * parquet min/max stats on these four leaves carry exactly the information
  * of the fork's manifest fields `geom_lower_bounds`/`geom_upper_bounds`.
  */
case class StBboxStruct(child: Expression) extends GeoUnary {
  override def dataType: DataType = StBboxStruct.schema
  override protected def kernel: String = "bboxStruct"
  override protected def notNull(vs: Seq[Any]): Any = GeoKernels.bboxStruct(bytes(vs.head))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}
object StBboxStruct {
  val schema: StructType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType)))
}

/** Hilbert index of the envelope center — the reference's
  * `hilbert[res,minX,minY,maxX,maxY]` transform
  * (`api/.../transforms/Hilbert.java:32-142`, `functions/HilbertFunction.java:37-114`).
  * Null for null/empty/out-of-bounds geometries, matching `Hilbert.java:86-97`.
  */
case class HilbertIndex(g: Expression, res: Expression,
    minX: Expression, minY: Expression, maxX: Expression, maxY: Expression)
    extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(g, res, minX, minY, maxX, maxY)
  override def inputTypes =
    Seq(BinaryType, IntegerType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = LongType
  override protected def kernel: String = "hilbert"
  override protected def notNull(vs: Seq[Any]): Any =
    GeoKernels.hilbert(bytes(vs(0)), vs(1).asInstanceOf[Int],
      dbl(vs(2)), dbl(vs(3)), dbl(vs(4)), dbl(vs(5)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3), c(4), c(5))
}
