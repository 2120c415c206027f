package graft.spatial

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}

/** Iceberg's `uuid` / `fixed[n]` / `time` primitive types (ref
  * `api/src/main/java/org/apache/iceberg/types/Types.java:50-58`,
  * `Type.java:39-43` in /root/reference), which Spark has no primitives
  * for. The mapping is the one iceberg-spark itself uses (SURVEY §1.2):
  *
  *  - `uuid`     → physical STRING, canonical lowercase 8-4-4-4-12
  *  - `fixed[n]` → physical BINARY of exactly n bytes
  *  - `time`     → physical BIGINT, microseconds since midnight
  *
  * The declared type is recorded in a sidecar (`_graft_xtypes.json`, the
  * [[GeometryFields]] pattern — the same trick the reference's
  * SchemaParser uses to smuggle `havasu.geometry-encoding` past old
  * readers) so it round-trips across sessions, and every write funneling
  * through `Snapshots.writeBack` validates + canonicalizes values with
  * codegen'd expressions (`when`/`rlike`/`raise_error`, no UDF). Stats,
  * pruning, and promotion behave as the physical type's: per the
  * reference's `TypeUtil.isPromotionAllowed` these types take part in NO
  * promotions, so the schema-evolution matrix needs no new rows.
  */
object ExtendedTypes {

  sealed trait XType { def spec: String; def physical: DataType }
  case object Uuid extends XType { val spec = "uuid"; val physical: DataType = StringType }
  final case class Fixed(n: Int) extends XType {
    def spec = s"fixed($n)"; val physical: DataType = BinaryType
  }
  case object Time extends XType { val spec = "time"; val physical: DataType = LongType }

  private val FixedRe = """fixed[\[(](\d+)[\])]""".r

  /** Parse a declared type spec; None = not an extended type (let the
    * normal Spark DDL parser have it).
    */
  def parse(spec: String): Option[XType] =
    spec.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "uuid" => Some(Uuid)
      case "time" => Some(Time)
      // toIntOption: a width past Int.MaxValue must fall to "not an
      // extended type" (the caller's friendly error), not leak a raw
      // NumberFormatException out of the pattern guard
      case FixedRe(n) if n.toIntOption.exists(_ > 0) => Some(Fixed(n.toInt))
      case _ => None
    }

  val FileName = "_graft_xtypes.json"

  def get(path: String): Map[String, XType] = {
    val f = Paths.get(path, FileName)
    if (!Files.exists(f)) return Map.empty
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(new String(Files.readAllBytes(f), StandardCharsets.UTF_8)) match {
      case JObject(kv) => kv.collect {
        case (k, JString(v)) if parse(v).isDefined => k -> parse(v).get
      }.toMap
      case _ => Map.empty
    }
  }

  // column names are user data: quotes/backslashes/control chars must be
  // JSON-escaped or one exotic name bricks every later read of the sidecar
  private def escJson(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def put(path: String, m: Map[String, XType]): Unit = {
    if (m.isEmpty) { Files.deleteIfExists(Paths.get(path, FileName)); return }
    val body = m.toSeq.sortBy(_._1)
      .map { case (c, x) => s""""${escJson(c)}":"${x.spec}"""" }.mkString("{", ",", "}")
    Files.write(Paths.get(path, FileName), body.getBytes(StandardCharsets.UTF_8))
    ()
  }

  def declare(path: String, col: String, x: XType): Unit =
    put(path, get(path) + (col -> x))

  /** Table property declaring extended types at CREATE TABLE:
    * `TBLPROPERTIES ('graft.xtypes' = 'u:uuid, f:fixed(16), t:time')`.
    * Spark's DDL parser has no uuid/fixed/time keywords, so the schema
    * declares the PHYSICAL twin (string/binary/bigint) and the property
    * names which columns carry the extended meaning — checked against the
    * schema here so a typo fails the CREATE, not a later write.
    */
  val PropertyKey = "graft.xtypes"

  /** Parse + validate the property against the schema WITHOUT writing —
    * callers validate before committing table metadata, so a bad property
    * fails the CREATE without leaving a half-created table behind.
    */
  def parseProperty(schema: org.apache.spark.sql.types.StructType,
      spec: String): Seq[(String, XType)] =
    spec.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { s =>
      val i = s.indexOf(':')
      require(i > 0, s"$PropertyKey entry '$s': want col:type")
      val (c, t) = (s.substring(0, i).trim, s.substring(i + 1).trim)
      val x = parse(t).getOrElse(throw new IllegalArgumentException(
        s"$PropertyKey entry '$s': unknown extended type '$t' (uuid, fixed(n), time)"))
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"$PropertyKey names a column not in the schema: $c"))
      require(f.dataType == x.physical,
        s"column $c: declared ${x.spec} stores as ${x.physical.simpleString}, " +
          s"schema says ${f.dataType.simpleString}")
      c -> x
    }

  def declareFromProperty(path: String, schema: org.apache.spark.sql.types.StructType,
      spec: String): Unit =
    parseProperty(schema, spec).foreach { case (c, x) => declare(path, c, x) }

  /** Keep the annotation map in step with column evolution. */
  def onRename(path: String, from: String, to: String): Unit = {
    val m = get(path)
    m.get(from).foreach(x => put(path, m - from + (to -> x)))
  }

  def onDrop(path: String, col: String): Unit = {
    val m = get(path)
    if (m.contains(col)) put(path, m - col)
  }

  /** Canonical uuid text: 8-4-4-4-12 hex groups. */
  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  val MicrosPerDay: Long = 86400000000L

  private[graft] def validExpr(c: Column, name: String, x: XType): Column = x match {
    case Uuid =>
      when(c.isNull, c)
        .when(c.rlike(UuidRe), lower(c)) // canonical form is lowercase
        .otherwise(raise_error(concat(
          lit(s"column $name: invalid uuid (want 8-4-4-4-12 hex): "), c)))
    case Fixed(n) =>
      when(c.isNull, c)
        .when(length(c) === n, c)
        .otherwise(raise_error(concat(lit(s"column $name: fixed($n) value has "),
          length(c).cast(StringType), lit(" bytes"))))
    case Time =>
      when(c.isNull, c)
        .when(c >= 0L && c < MicrosPerDay, c)
        .otherwise(raise_error(concat(
          lit(s"column $name: time out of range [0, $MicrosPerDay) µs: "),
          c.cast(StringType))))
  }

  /** Validate + canonicalize a LOGICAL frame about to be written; no-op
    * (the same frame) for tables without declarations. Map-only, stays
    * inside whole-stage codegen.
    */
  def validate(df: DataFrame, path: String): DataFrame = {
    val declared = get(path).filter { case (c, _) => df.columns.contains(c) }
    declared.foldLeft(df) { case (d, (c, x)) => d.withColumn(c, validExpr(col(c), c, x)) }
  }
}
