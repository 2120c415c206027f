package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style partition transforms as a table-level DSL
  * (`api/src/main/java/org/apache/iceberg/transforms/` in /root/reference):
  * `bucket(n, col)`, `truncate(w, col)`, `year(col)`, `month(col)`,
  * `day(col)`, or plain `col` (identity). A transform spec materializes a
  * derived directory column on write, and — the part that matters at scale
  * — supports PARTITION PROJECTION on read: an equality/IN predicate on
  * the SOURCE column is projected to the derived value at planning time,
  * so `id = 7` opens only the `id_bucket=<bucket(7)>` directory even
  * though file stats can't prune hash-scattered buckets.
  */
object Transforms {

  sealed trait Transform {
    def source: String

    /** Derived partition directory column name. */
    def derivedName: String

    /** Project a source literal to the derived value (planning time);
      * None = not projectable for this transform/literal (no pruning).
      */
    def project(v: Any): Option[Any]

    /** Order-preserving in the source (enables RANGE projection:
      * `src >= L` ⇒ `derived >= project(L)`). Bucket is not.
      */
    def monotonic: Boolean

    /** Canonical spec string for the manifest. */
    def spec: String
  }

  case class Identity(source: String) extends Transform {
    def derivedName: String = source
    def project(v: Any): Option[Any] = Some(v)
    def monotonic: Boolean = true
    def spec: String = source
  }

  /** Murmur3(value) mod n — same hash as Spark's `hash()` (seed 42).
    * `name` overrides the derived directory column (spec evolution gives
    * a REPLACEMENT bucket a distinct name — `id_bucket8` — so its dirs
    * never mix with the retired generation's `id_bucket` dirs, which
    * would poison projection pruning).
    */
  case class Bucket(n: Int, source: String, name: Option[String] = None) extends Transform {
    def derivedName: String = name.getOrElse(s"${source}_bucket")
    def project(v: Any): Option[Any] = v match {
      case null => None
      case _ =>
        val h = Murmur3Hash(Seq(Literal(v)), 42).eval(null).asInstanceOf[Int]
        Some(((h % n) + n) % n)
    }
    def monotonic: Boolean = false
    def spec: String = s"bucket($n,$source${name.fold("")("," + _)})"
  }

  /** Numbers floor to a width-multiple; strings take a prefix — both
    * order-preserving.
    */
  case class Truncate(w: Int, source: String, name: Option[String] = None) extends Transform {
    def derivedName: String = name.getOrElse(s"${source}_trunc")
    def project(v: Any): Option[Any] = v match {
      // CODE-POINT prefix, matching the write path's substring(col, 1, w)
      // (Spark substring counts code points): String.take counts UTF-16
      // units, so a supplementary character (emoji) would make the
      // projected value disagree with the written directory and mis-prune
      case s: UTF8String => Some(s.substringSQL(1, w))
      case s: String => Some(UTF8String.fromString(s).substringSQL(1, w).toString)
      case l: Long => Some(l - (((l % w) + w) % w))
      case i: Int => Some(i - (((i % w) + w) % w))
      case _ => None
    }
    def monotonic: Boolean = true
    def spec: String = s"truncate($w,$source${name.fold("")("," + _)})"
  }

  /** Iceberg ordinal semantics so every part is MONOTONIC in the source:
    * year = calendar year, month = months since 1970-01, day = days since
    * epoch. Projection handles DateType literals (epoch days — timezone
    * free); timestamp literals stay unprojected (session-timezone
    * dependent) and rely on file stats instead.
    */
  case class DatePart(part: String, source: String) extends Transform {
    def derivedName: String = s"${source}_$part"
    def project(v: Any): Option[Any] = (v, part) match {
      case (days: Int, _) => // DateType literal
        val d = java.time.LocalDate.ofEpochDay(days.toLong)
        part match {
          case "year" => Some(d.getYear)
          case "month" => Some((d.getYear - 1970) * 12 + (d.getMonthValue - 1))
          case "day" => Some(days)
          case _ => None // hour over a DATE literal: not derivable
        }
      // TimestampType literal (epoch micros): only the hour ordinal is
      // timezone-independent, so only it projects
      case (micros: Long, "hour") =>
        Some(Math.floorDiv(micros, 3600L * 1000000L).toInt)
      case _ => None
    }
    def monotonic: Boolean = true
    def spec: String = s"$part($source)"
  }

  private val BucketRe = """(?i)bucket\s*\(\s*(\d+)\s*,\s*([\w.]+)\s*(?:,\s*(\w+)\s*)?\)""".r
  private val TruncRe = """(?i)truncate\s*\(\s*(\d+)\s*,\s*([\w.]+)\s*(?:,\s*(\w+)\s*)?\)""".r
  private val DateRe = """(?i)(year|month|day|hour)s?\s*\(\s*([\w.]+)\s*\)""".r

  def parse(spec: String): Transform = spec.trim match {
    case BucketRe(n, c, nm) => Bucket(n.toInt, c, Option(nm))
    case TruncRe(w, c, nm) => Truncate(w.toInt, c, Option(nm))
    case DateRe(p, c) => DatePart(p.toLowerCase, c)
    case ident if ident.matches("[\\w.]+") => Identity(ident)
    case other => throw new IllegalArgumentException(s"bad partition transform: $other")
  }

  /** Column expression computing the derived value on write (needs the
    * frame for the resolved source type).
    */
  def writeExpr(t: Transform, df: DataFrame): Column = t match {
    case Identity(src) => col(src)
    case Bucket(n, src, _) => pmod(hash(col(src)), lit(n))
    case Truncate(w, src, _) =>
      df.schema(src).dataType match {
        case org.apache.spark.sql.types.StringType => substring(col(src), 1, w)
        case _ => col(src) - pmod(col(src), lit(w))
      }
    case DatePart(part, src) => part match {
      case "year" => year(col(src))
      case "month" => (year(col(src)) - 1970) * 12 + month(col(src)) - 1
      case "day" => datediff(col(src), lit(java.sql.Date.valueOf("1970-01-01")))
      // hours since epoch — TIMESTAMP sources only (epoch division is
      // timezone-independent, unlike year/month/day over timestamps).
      // floorDiv in exact integer arithmetic: (a - pmod(a,b)) / b — the
      // numerator is an exact multiple of b, so the division is lossless
      // (a float floor could round an epsilon-under-boundary value UP)
      case "hour" =>
        val us = unix_micros(col(src))
        val b = 3600L * 1000000L
        ((us - pmod(us, lit(b))) / b).cast("int")
    }
  }
}

/** The ONE seat of hive-layout partition-directory parsing: segment
  * extraction, the null sentinel, and string→catalyst casting. Shared by
  * the file index's prune rows, the DSv2 scan's partition key rows, and
  * exact-filter evaluation — a type added (or found unparseable) here is
  * handled identically everywhere.
  */
object PartitionPaths {
  import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
  import org.apache.spark.sql.types._

  val NullSentinel: String = ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  /** dir-segment name → raw unescaped value for a table-relative path
    * (the null sentinel is preserved for callers to interpret).
    */
  def dirValues(rel: String): Map[String, String] =
    rel.split('/').dropRight(1).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i > 0)
        Some(seg.substring(0, i) -> ExternalCatalogUtils.unescapePathName(seg.substring(i + 1)))
      else None
    }.toMap

  /** Raw value for `col`; None when the segment is missing (pre-evolution
    * file) or holds the null sentinel.
    */
  def value(rel: String, col: String): Option[String] = value(dirValues(rel), col)

  /** Same, over a pre-parsed segment map (parse once per file). */
  def value(kv: Map[String, String], col: String): Option[String] =
    kv.get(col).filter(_ != NullSentinel)

  /** Types whose hive dir rendering round-trips losslessly through
    * [[cast]]. Timestamps (session-timezone formatting), decimals, and
    * binaries do NOT — values of those types must never drive pruning or
    * partition-key decisions from directory strings.
    */
  def castable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         BooleanType | StringType | DateType => true
    case _ => false
  }

  /** Session-zone catalyst cast for the types hive renders ambiguously
    * (timestamp, decimal, …): correct for SERVING partition values to
    * readers — never for exactness decisions (the rendering depends on
    * the writer's session zone). Null when unparseable (legacy cast).
    */
  def castLenient(v: String, dt: DataType): Any = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
    Cast(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(v), StringType), dt,
      Option(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone),
      EvalMode.LEGACY).eval(null)
  }

  /** Parse to the catalyst internal value; None for uncastable types AND
    * for malformed directory values (a corrupt or foreign dir name must
    * degrade pruning/SPJ to "unknown", not abort planning) — callers
    * choose between declining (exactness paths) and a string fallback
    * (legacy served values).
    */
  def cast(v: String, dt: DataType): Option[Any] = scala.util.Try(dt match {
    case ByteType => v.toByte
    case ShortType => v.toShort
    case IntegerType => v.toInt
    case LongType => v.toLong
    case FloatType => v.toFloat
    case DoubleType => v.toDouble
    case BooleanType => v.toBoolean
    case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
    case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(v)
  }).toOption
}
