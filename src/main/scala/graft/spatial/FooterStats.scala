package graft.spatial

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}

/** Per-file min/max statistics extracted from parquet FOOTERS — no data
  * pass. This is how the reference populates its manifest metrics
  * (`parquet/.../ParquetUtil.java` fileMetrics in /root/reference reads
  * footer statistics); the round-1 implementation re-scanned the written
  * rows with a Spark aggregation, doubling write I/O at scale.
  *
  * Value representations are chosen to match what Catalyst literals carry,
  * so [[FileStats.cmp]] compares like with like: timestamps stay raw INT64
  * (µs for TIMESTAMP(MICROS) — same as `unix_micros`; ns columns are read
  * by Spark as plain longs), dates stay INT32 days, decimals are rescaled
  * to BigDecimal, strings decode UTF-8. Columns whose stats are absent or
  * unmappable in any row group get a null entry → inclusive evaluation
  * treats them as "might match" (never unsound pruning).
  */
object FooterStats {

  /** Read stats for one data file (runs on an executor). */
  def read(dir: String, name: String, conf: Configuration,
      excludeCols: Set[String]): FileStats = {
    val p = new Path(new Path(dir), name)
    val in = HadoopInputFile.fromPath(p, conf)
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val mins = mutable.Map.empty[String, Any]
      val maxs = mutable.Map.empty[String, Any]
      val invalid = mutable.Set.empty[String]
      // null_value_counts tracked independently of value bounds: an
      // all-null column has no min/max yet a perfectly known null count
      val nulls = mutable.Map.empty[String, Long]
      val nullsUnknown = mutable.Set.empty[String]
      // per-column on-disk bytes (compressed chunk sizes, like Iceberg's
      // column_sizes from the writer metrics)
      val sizes = mutable.Map.empty[String, Long]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val key = c.getPath.toDotString
        if (key.count(_ == '.') <= 1)
          sizes(key) = sizes.getOrElse(key, 0L) + c.getTotalSize
        // top-level primitives + one struct level, like the manifest schema;
        // declared geometry columns carry no value stats (bbox shadow does)
        if (key.count(_ == '.') <= 1 && !excludeCols.contains(key.split('.').head)) {
          val st0 = Option(c.getStatistics: Statistics[_])
          st0 match {
            case Some(st) if !st.isEmpty && st.isNumNullsSet && st.getNumNulls >= 0 =>
              nulls(key) = nulls.getOrElse(key, 0L) + st.getNumNulls
            case _ => nullsUnknown += key // one unknown row group poisons it
          }
          val extracted = for {
            st <- st0 if !st.isEmpty && st.hasNonNullValue
            mn <- convert(c.getPrimitiveType, st.genericGetMin.asInstanceOf[AnyRef])
            mx <- convert(c.getPrimitiveType, st.genericGetMax.asInstanceOf[AnyRef])
          } yield (mn, mx)
          extracted match {
            case Some((mn, mx)) if !invalid(key) =>
              mins(key) = merge(mins.get(key), mn, keepMin = true)
              maxs(key) = merge(maxs.get(key), mx, keepMin = false)
            case Some(_) => // already poisoned
            case None if st0.exists(st => !st.isEmpty && !st.hasNonNullValue) =>
              // all-null so far: legitimate absence of bounds, not poison —
              // a later row group's real bounds REPLACE the null
              // placeholder (merge treats a null prev like None), since
              // all-null groups contribute no values to min/max
              if (!mins.contains(key)) { mins(key) = null; maxs(key) = null }
            case None =>
              // one stat-less row group poisons the whole file's entry
              invalid += key
          }
        }
      }
      invalid.foreach { k => mins(k) = null; maxs(k) = null }
      nullsUnknown.foreach(nulls.remove)
      FileStats(name, rows, in.getLength, mins.toMap, maxs.toMap,
        nulls = nulls.toMap, colSizes = sizes.toMap)
    } finally reader.close()
  }

  private def merge(prev: Option[Any], v: Any, keepMin: Boolean): Any = prev match {
    case None | Some(null) => v
    case Some(p) =>
      val c = compare(p, v)
      if ((keepMin && c <= 0) || (!keepMin && c >= 0)) p else v
  }

  private def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: Number, y: Number) => BigDecimal(x.toString).compare(BigDecimal(y.toString))
    case _ => 0
  }

  /** Map a footer stat value to the manifest's literal-compatible repr;
    * None = unmappable (INT96, unknown annotations, NaN bounds).
    */
  private def convert(t: PrimitiveType, v: AnyRef): Option[Any] = {
    import LogicalTypeAnnotation._
    val ann = t.getLogicalTypeAnnotation
    (t.getPrimitiveTypeName, ann, v) match {
      case (_, d: DecimalLogicalTypeAnnotation, i: java.lang.Integer) =>
        Some(BigDecimal(BigInt(i.longValue()), d.getScale))
      case (_, d: DecimalLogicalTypeAnnotation, l: java.lang.Long) =>
        Some(BigDecimal(BigInt(l.longValue()), d.getScale))
      case (_, d: DecimalLogicalTypeAnnotation, b: Binary) =>
        Some(BigDecimal(BigInt(new java.math.BigInteger(b.getBytes)), d.getScale))
      case (_, _: StringLogicalTypeAnnotation, b: Binary) =>
        Some(b.toStringUsingUTF8)
      case (_, _, d: java.lang.Double) => if (d.isNaN) None else Some(d.doubleValue())
      case (_, _, f: java.lang.Float) => if (f.isNaN) None else Some(f.floatValue())
      case (_, _, i: java.lang.Integer) => Some(i.intValue()) // incl. DATE days
      case (_, _, l: java.lang.Long) => Some(l.longValue()) // incl. TIMESTAMP µs/ns
      case _ => None // INT96, plain binary, boolean, unknown
    }
  }
}
