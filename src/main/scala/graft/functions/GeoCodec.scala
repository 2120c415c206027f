package graft.functions

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{ByteOrderValues, WKBReader, WKBWriter, WKTReader, WKTWriter}

/** Geometry byte codecs for the four encodings the reference supports
  * (`api/src/main/java/org/apache/iceberg/types/havasu/GeometryEncoding.java:26-32`
  * in /root/reference): ewkb, wkb (physical BINARY) and wkt, geojson
  * (physical STRING). The engine's in-flight representation is WKB bytes in
  * a BinaryType column; JTS does the geometry math.
  *
  * JTS reader/writer instances are not thread-safe → thread-locals
  * (executors run many tasks per JVM in local mode and on real clusters).
  */
object GeoCodec {
  val Srid = 4326
  private val factory = new GeometryFactory(new PrecisionModel(), Srid)

  private def tl[T <: AnyRef](mk: => T): ThreadLocal[T] = new ThreadLocal[T] {
    override def initialValue(): T = mk
  }
  private val wkbR = tl(new WKBReader(factory))
  private val wkbW = tl(new WKBWriter(2, ByteOrderValues.LITTLE_ENDIAN, false))
  private val ewkbW = tl(new WKBWriter(2, ByteOrderValues.LITTLE_ENDIAN, true))
  private val wktR = tl(new WKTReader(factory))
  private val wktW = tl(new WKTWriter(2))

  def readWkb(b: Array[Byte]): Geometry = wkbR.get.read(b) // handles WKB and EWKB
  def writeWkb(g: Geometry): Array[Byte] = wkbW.get.write(g)
  def writeEwkb(g: Geometry): Array[Byte] = ewkbW.get.write(g)
  def readWkt(s: String): Geometry = wktR.get.read(s)
  def writeWkt(g: Geometry): String = wktW.get.write(g)

  def point(x: Double, y: Double): Geometry =
    factory.createPoint(new Coordinate(x, y))

  def envelope(minX: Double, minY: Double, maxX: Double, maxY: Double): Geometry =
    factory.toGeometry(new Envelope(minX, maxX, minY, maxY))

  // --- minimal GeoJSON codec (jts-core has no GeoJSON IO; format per RFC 7946)

  def writeGeoJson(g: Geometry): String = {
    def coord(c: Coordinate) = s"[${c.x},${c.y}]"
    def coords(cs: Array[Coordinate]) = cs.map(coord).mkString("[", ",", "]")
    def poly(p: Polygon): String = {
      val rings = (Seq(p.getExteriorRing) ++
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
      rings.map(r => coords(r.getCoordinates)).mkString("[", ",", "]")
    }
    g match {
      // empty point: GeoJSON's standard empty-coordinates form, not an NPE
      case p: Point if p.isEmpty => """{"type":"Point","coordinates":[]}"""
      case p: Point => s"""{"type":"Point","coordinates":${coord(p.getCoordinate)}}"""
      case l: LineString => s"""{"type":"LineString","coordinates":${coords(l.getCoordinates)}}"""
      case p: Polygon => s"""{"type":"Polygon","coordinates":${poly(p)}}"""
      case m: MultiPoint =>
        val cs = (0 until m.getNumGeometries).map(i => coord(m.getGeometryN(i).asInstanceOf[Point].getCoordinate))
        s"""{"type":"MultiPoint","coordinates":${cs.mkString("[", ",", "]")}}"""
      case m: MultiLineString =>
        val cs = (0 until m.getNumGeometries).map(i => coords(m.getGeometryN(i).getCoordinates))
        s"""{"type":"MultiLineString","coordinates":${cs.mkString("[", ",", "]")}}"""
      case m: MultiPolygon =>
        val cs = (0 until m.getNumGeometries).map(i => poly(m.getGeometryN(i).asInstanceOf[Polygon]))
        s"""{"type":"MultiPolygon","coordinates":${cs.mkString("[", ",", "]")}}"""
      case gc: GeometryCollection =>
        val gs = (0 until gc.getNumGeometries).map(i => writeGeoJson(gc.getGeometryN(i)))
        s"""{"type":"GeometryCollection","geometries":${gs.mkString("[", ",", "]")}}"""
      case other => throw new IllegalArgumentException(s"unsupported geometry: ${other.getGeometryType}")
    }
  }

  def readGeoJson(s: String): Geometry = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def d(v: JValue): Double = v match {
      case JDouble(x) => x
      case JInt(x) => x.toDouble
      case JDecimal(x) => x.toDouble
      case JLong(x) => x.toDouble
      case other => throw new IllegalArgumentException(s"bad coordinate: $other")
    }
    def c(v: JValue): Coordinate = v match {
      case JArray(x :: y :: _) => new Coordinate(d(x), d(y))
      case other => throw new IllegalArgumentException(s"bad coordinate: $other")
    }
    def cs(v: JValue): Array[Coordinate] = v match {
      case JArray(items) => items.map(c).toArray
      case other => throw new IllegalArgumentException(s"bad coordinates: $other")
    }
    def ring(v: JValue) = factory.createLinearRing(cs(v))
    def poly(v: JValue): Polygon = v match {
      // RFC 7946 represents empty geometries as empty coordinate arrays —
      // the writer emits exactly that for POLYGON EMPTY, so the reader
      // must round-trip it (LineString/Multi* already do through cs())
      case JArray(Nil) => factory.createPolygon()
      case JArray(shell :: holes) =>
        factory.createPolygon(ring(shell), holes.map(ring).toArray)
      case other => throw new IllegalArgumentException(s"bad polygon: $other")
    }
    def build(j: JValue): Geometry = {
      val JString(typ) = j \ "type"
      val coords = j \ "coordinates"
      typ match {
        case "Point" => coords match {
          case JArray(Nil) => factory.createPoint(null: Coordinate) // POINT EMPTY
          case _ => factory.createPoint(c(coords))
        }
        case "LineString" => factory.createLineString(cs(coords))
        case "Polygon" => poly(coords)
        case "MultiPoint" => factory.createMultiPoint(cs(coords).map(factory.createPoint))
        case "MultiLineString" =>
          val JArray(ls) = coords
          factory.createMultiLineString(ls.map(l => factory.createLineString(cs(l))).toArray)
        case "MultiPolygon" =>
          val JArray(ps) = coords
          factory.createMultiPolygon(ps.map(poly).toArray)
        case "GeometryCollection" =>
          val JArray(gs) = j \ "geometries"
          factory.createGeometryCollection(gs.map(build).toArray)
        case other => throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
      }
    }
    build(JsonMethods.parse(s))
  }
}
