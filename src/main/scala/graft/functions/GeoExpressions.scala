package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.Geometry

import graft.spatial.HilbertCurve2D

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
  */
abstract class GeoExpression extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null else notNull(vs)
  }
  protected def notNull(vs: Seq[Any]): Any
  protected final def geom(v: Any): Geometry = GeoCodec.readWkb(v.asInstanceOf[Array[Byte]])
  protected final def dbl(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.asInstanceOf[Double]
  }
  protected final def str(v: Any): String = v.asInstanceOf[UTF8String].toString
  protected final def utf8(s: String): UTF8String = UTF8String.fromString(s)
}

// ---- constructors / converters ----------------------------------------

case class StGeomFromText(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](StringType)
  override def dataType: DataType = BinaryType
  override protected def notNull(vs: Seq[Any]): Any = GeoCodec.writeWkb(GeoCodec.readWkt(str(vs.head)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StGeomFromWkb(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType)
  override def dataType: DataType = BinaryType
  override protected def notNull(vs: Seq[Any]): Any =
    GeoCodec.writeWkb(geom(vs.head)) // validates + normalizes (EWKB accepted)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StGeomFromGeoJson(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](StringType)
  override def dataType: DataType = BinaryType
  override protected def notNull(vs: Seq[Any]): Any = GeoCodec.writeWkb(GeoCodec.readGeoJson(str(vs.head)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StAsText(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType)
  override def dataType: DataType = StringType
  override protected def notNull(vs: Seq[Any]): Any = utf8(GeoCodec.writeWkt(geom(vs.head)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StAsGeoJson(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType)
  override def dataType: DataType = StringType
  override protected def notNull(vs: Seq[Any]): Any = utf8(GeoCodec.writeGeoJson(geom(vs.head)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StAsEwkb(child: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType)
  override def dataType: DataType = BinaryType
  override protected def notNull(vs: Seq[Any]): Any = {
    val g = geom(vs.head); g.setSRID(GeoCodec.Srid); GeoCodec.writeEwkb(g)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StPoint(x: Expression, y: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(x, y)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override protected def notNull(vs: Seq[Any]): Any =
    GeoCodec.writeWkb(GeoCodec.point(dbl(vs(0)), dbl(vs(1))))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StMakeEnvelope(minX: Expression, minY: Expression, maxX: Expression, maxY: Expression)
    extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(minX, minY, maxX, maxY)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override protected def notNull(vs: Seq[Any]): Any =
    GeoCodec.writeWkb(GeoCodec.envelope(dbl(vs(0)), dbl(vs(1)), dbl(vs(2)), dbl(vs(3))))
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
  protected def test(a: Geometry, b: Geometry): Boolean
  override protected def notNull(vs: Seq[Any]): Any =
    java.lang.Boolean.valueOf(test(geom(vs(0)), geom(vs(1))))
}

case class StIntersects(left: Expression, right: Expression) extends GeoPredicate {
  override protected def test(a: Geometry, b: Geometry): Boolean = a.intersects(b)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StCovers(left: Expression, right: Expression) extends GeoPredicate {
  override protected def test(a: Geometry, b: Geometry): Boolean = a.covers(b)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StContains(left: Expression, right: Expression) extends GeoPredicate {
  override protected def test(a: Geometry, b: Geometry): Boolean = a.contains(b)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StWithin(left: Expression, right: Expression) extends GeoPredicate {
  override protected def test(a: Geometry, b: Geometry): Boolean = a.within(b)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StDistance(left: Expression, right: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override protected def notNull(vs: Seq[Any]): Any = geom(vs(0)).distance(geom(vs(1)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StDWithin(left: Expression, right: Expression, dist: Expression)
    extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(left, right, dist)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType, BinaryType, DoubleType)
  override def dataType: DataType = BooleanType
  override protected def notNull(vs: Seq[Any]): Any =
    java.lang.Boolean.valueOf(geom(vs(0)).isWithinDistance(geom(vs(1)), dbl(vs(2))))
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
  override protected def notNull(vs: Seq[Any]): Any = GeoCodec.writeWkb(geom(vs.head).getEnvelope)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StCentroid(child: Expression) extends GeoUnary {
  override def dataType: DataType = BinaryType
  override protected def notNull(vs: Seq[Any]): Any = GeoCodec.writeWkb(geom(vs.head).getCentroid)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StBuffer(child: Expression, dist: Expression) extends GeoExpression with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child, dist)
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override protected def notNull(vs: Seq[Any]): Any =
    GeoCodec.writeWkb(geom(vs(0)).buffer(dbl(vs(1))))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StX(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def notNull(vs: Seq[Any]): Any = geom(vs.head) match {
    case p: org.locationtech.jts.geom.Point => p.getX
    case _ => null
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StY(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def notNull(vs: Seq[Any]): Any = geom(vs.head) match {
    case p: org.locationtech.jts.geom.Point => p.getY
    case _ => null
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

abstract class EnvSide extends GeoUnary {
  override def dataType: DataType = DoubleType
  protected def pick(e: org.locationtech.jts.geom.Envelope): Double
  override protected def notNull(vs: Seq[Any]): Any = {
    val g = geom(vs.head)
    if (g.isEmpty) null else pick(g.getEnvelopeInternal)
  }
}
case class StXMin(child: Expression) extends EnvSide {
  override protected def pick(e: org.locationtech.jts.geom.Envelope): Double = e.getMinX
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}
case class StXMax(child: Expression) extends EnvSide {
  override protected def pick(e: org.locationtech.jts.geom.Envelope): Double = e.getMaxX
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}
case class StYMin(child: Expression) extends EnvSide {
  override protected def pick(e: org.locationtech.jts.geom.Envelope): Double = e.getMinY
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}
case class StYMax(child: Expression) extends EnvSide {
  override protected def pick(e: org.locationtech.jts.geom.Envelope): Double = e.getMaxY
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StArea(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def notNull(vs: Seq[Any]): Any = geom(vs.head).getArea
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StLength(child: Expression) extends GeoUnary {
  override def dataType: DataType = DoubleType
  override protected def notNull(vs: Seq[Any]): Any = geom(vs.head).getLength
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StIsEmpty(child: Expression) extends GeoUnary {
  override def dataType: DataType = BooleanType
  override protected def notNull(vs: Seq[Any]): Any = java.lang.Boolean.valueOf(geom(vs.head).isEmpty)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StIsValid(child: Expression) extends GeoUnary {
  override def dataType: DataType = BooleanType
  override protected def notNull(vs: Seq[Any]): Any = java.lang.Boolean.valueOf(geom(vs.head).isValid)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** Per-row bbox struct — the writer-side analogue of the reference's
  * per-file geometry metrics (`core/.../havasu/GeometryFieldMetrics.java:45-89`):
  * parquet min/max stats on these four leaves carry exactly the information
  * of the fork's manifest fields `geom_lower_bounds`/`geom_upper_bounds`.
  */
case class StBboxStruct(child: Expression) extends GeoUnary {
  override def dataType: DataType = StBboxStruct.schema
  override protected def notNull(vs: Seq[Any]): Any = {
    val g = geom(vs.head)
    if (g.isEmpty) null
    else {
      val e = g.getEnvelopeInternal
      new GenericInternalRow(Array[Any](e.getMinX, e.getMinY, e.getMaxX, e.getMaxY))
    }
  }
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
  override def eval(input: InternalRow): Any = {
    val gv = g.eval(input)
    if (gv == null) null
    else {
      val geo = geom(gv)
      if (geo.isEmpty) null
      else {
        val c = geo.getEnvelopeInternal.centre()
        HilbertCurve2D.index(
          res.eval(input).asInstanceOf[Int],
          dbl(minX.eval(input)), dbl(minY.eval(input)),
          dbl(maxX.eval(input)), dbl(maxY.eval(input)))(c.x, c.y)
          .map(java.lang.Long.valueOf).orNull
      }
    }
  }
  override protected def notNull(vs: Seq[Any]): Any =
    throw new IllegalStateException("unused") // eval overridden
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3), c(4), c(5))
}
