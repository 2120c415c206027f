package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Registration + DataFrame-side API for the ST_* function catalog
  * (reference exposes `system.hilbert` etc. through a DSv2 FunctionCatalog,
  * `spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/functions/` in
  * /root/reference; here the Spark-native registration point is the session
  * FunctionRegistry so both SQL and `call_function` resolve them).
  */
object GeoSql {
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "st_geomfromtext" -> (e => StGeomFromText(e.head)),
    "st_geomfromwkb" -> (e => StGeomFromWkb(e.head)),
    "st_geomfromgeojson" -> (e => StGeomFromGeoJson(e.head)),
    "st_astext" -> (e => StAsText(e.head)),
    "st_asgeojson" -> (e => StAsGeoJson(e.head)),
    "st_asewkb" -> (e => StAsEwkb(e.head)),
    "st_point" -> (e => StPoint(e(0), e(1))),
    "st_makeenvelope" -> (e => StMakeEnvelope(e(0), e(1), e(2), e(3))),
    "st_intersects" -> (e => StIntersects(e(0), e(1))),
    "st_covers" -> (e => StCovers(e(0), e(1))),
    "st_contains" -> (e => StContains(e(0), e(1))),
    "st_within" -> (e => StWithin(e(0), e(1))),
    "st_distance" -> (e => StDistance(e(0), e(1))),
    "st_dwithin" -> (e => StDWithin(e(0), e(1), e(2))),
    "st_envelope" -> (e => StEnvelope(e.head)),
    "st_centroid" -> (e => StCentroid(e.head)),
    "st_buffer" -> (e => StBuffer(e(0), e(1))),
    "st_x" -> (e => StX(e.head)),
    "st_y" -> (e => StY(e.head)),
    "st_xmin" -> (e => StXMin(e.head)),
    "st_xmax" -> (e => StXMax(e.head)),
    "st_ymin" -> (e => StYMin(e.head)),
    "st_ymax" -> (e => StYMax(e.head)),
    "st_area" -> (e => StArea(e.head)),
    "st_length" -> (e => StLength(e.head)),
    "st_isempty" -> (e => StIsEmpty(e.head)),
    "st_isvalid" -> (e => StIsValid(e.head)),
    "st_bbox" -> (e => StBboxStruct(e.head)),
    "st_union" -> (e => StUnion(e(0), e(1))),
    "st_intersection" -> (e => StIntersection(e(0), e(1))),
    "st_difference" -> (e => StDifference(e(0), e(1))),
    "st_simplify" -> (e => StSimplify(e(0), e(1))),
    "st_convexhull" -> (e => StConvexHull(e.head)),
    "st_geometrytype" -> (e => StGeometryType(e.head)),
    "st_numgeometries" -> (e => StNumGeometries(e.head)),
    "st_numpoints" -> (e => StNumPoints(e.head)),
    "st_extent" -> (e => StExtent(e.head).toAggregateExpression()),
    "st_transform" -> (e => StTransform(e(0), e(1), e(2))),
    "hilbert" -> (e => HilbertIndex(e(0), e(1), e(2), e(3), e(4), e(5))),
    "zorder_key" -> (e => ZOrderKey(e))
  )

  // registries already installed into (weak identity set: a dropped session
  // must not leak). `functionExists` can NOT be the guard — Spark 4 ships
  // its own (feature-flagged-off) builtin st_* names, which must be
  // SHADOWED by ours, not deferred to.
  private val installedRegistries =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]())

  /** Idempotent per session: registers every ST_ function exactly once —
    * re-replacing 37 functions per query floods the log with
    * SimpleFunctionRegistry WARNs (synchronized console I/O on the hot
    * path).
    */
  def install(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    if (!installedRegistries.contains(reg)) {
      builders.foreach { case (name, b) =>
        reg.createOrReplaceTempFunction(name, b, "built-in")
      }
      installedRegistries.add(reg)
    }
  }

  // DataFrame-side helpers (resolve through the registry installed above).
  def st_geomfromtext(wkt: Column): Column = call_function("st_geomfromtext", wkt)
  def st_astext(g: Column): Column = call_function("st_astext", g)
  def st_point(x: Column, y: Column): Column = call_function("st_point", x, y)
  def st_makeenvelope(minX: Column, minY: Column, maxX: Column, maxY: Column): Column =
    call_function("st_makeenvelope", minX, minY, maxX, maxY)
  def st_intersects(a: Column, b: Column): Column = call_function("st_intersects", a, b)
  def st_covers(a: Column, b: Column): Column = call_function("st_covers", a, b)
  def st_contains(a: Column, b: Column): Column = call_function("st_contains", a, b)
  def st_within(a: Column, b: Column): Column = call_function("st_within", a, b)
  def st_distance(a: Column, b: Column): Column = call_function("st_distance", a, b)
  def st_dwithin(a: Column, b: Column, d: Column): Column = call_function("st_dwithin", a, b, d)
  def st_buffer(g: Column, d: Column): Column = call_function("st_buffer", g, d)
  def st_envelope(g: Column): Column = call_function("st_envelope", g)
  def st_centroid(g: Column): Column = call_function("st_centroid", g)
  def st_x(g: Column): Column = call_function("st_x", g)
  def st_y(g: Column): Column = call_function("st_y", g)
  def st_bbox(g: Column): Column = call_function("st_bbox", g)
  def st_transform(g: Column, fromSrid: Int, toSrid: Int): Column =
    call_function("st_transform", g,
      org.apache.spark.sql.functions.lit(fromSrid),
      org.apache.spark.sql.functions.lit(toSrid))
  def hilbert(g: Column, res: Column, minX: Column, minY: Column, maxX: Column, maxY: Column): Column =
    call_function("hilbert", g, res, minX, minY, maxX, maxY)
  def zorder_key(cols: Column*): Column = call_function("zorder_key", cols: _*)
}
