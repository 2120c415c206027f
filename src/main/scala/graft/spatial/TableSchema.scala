package graft.spatial

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Schema evolution for graft tables: add / rename / drop columns without
  * rewriting any data file.
  *
  * The reference gets id-based evolution from Iceberg (fields are matched
  * by field id, so renames are metadata-only — `Schema`/`TypeUtil` in
  * /root/reference). Parquet-by-name matching can't do that directly, so
  * the PHYSICAL column name written in the files plays the role of the
  * field id: `_graft_schema.json` maps each logical column to its physical
  * name, a rename changes only the logical side, and a drop marks the
  * entry hidden. Readers project physical → logical; writers map logical →
  * physical before appending, so every data file ever written stays
  * readable under the current logical schema. A column added later simply
  * doesn't exist in older files — the parquet reader yields nulls there.
  */
object TableSchema {

  val SchemaName = "_graft_schema.json"

  /** (logical, physical, typeJson, dropped) per column, in schema order. */
  case class Entry(logical: String, physical: String, dataType: DataType, dropped: Boolean,
      comment: Option[String] = None)

  def exists(path: String): Boolean = Files.exists(Paths.get(path, SchemaName))

  def read(path: String): Seq[Entry] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val p = Paths.get(path, SchemaName)
    if (!Files.exists(p)) return Nil
    JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)) match {
      case JArray(es) => es.collect {
        case JObject(kv) =>
          val m = kv.toMap
          def str(k: String) = m(k).asInstanceOf[JString].s
          // `type` is stored as DataType.json — re-render the JValue so
          // primitives keep their quotes ("long") and structs stay objects
          val typeJson = JsonMethods.compact(JsonMethods.render(m("type")))
          Entry(str("logical"), str("physical"), DataType.fromJson(typeJson),
            m.get("dropped").contains(JBool(true)),
            m.get("comment").collect { case JString(c) => c })
      }
      case _ => Nil
    }
  }

  private def write(path: String, entries: Seq[Entry]): Unit = {
    // column comments are free text: control chars (newline/tab/anything
    // < 0x20) must be \u-escaped too, or one legal multiline COMMENT makes
    // the schema file unparseable on every subsequent read
    def esc(s: String): String = {
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.toString
    }
    val body = entries.map { e =>
      val comment = e.comment.map(c => s""","comment":"${esc(c)}"""").getOrElse("")
      s"""{"logical":"${esc(e.logical)}","physical":"${esc(e.physical)}",""" +
        s""""type":${e.dataType.json},"dropped":${e.dropped}$comment}"""
    }.mkString("[", ",", "]")
    Files.write(Paths.get(path, SchemaName), body.getBytes(StandardCharsets.UTF_8))
  }

  /** Capture the table's current physical schema as the evolution baseline
    * (logical == physical for every column). Partition columns are
    * excluded — they live in directory names, not files.
    */
  private def ensure(spark: SparkSession, path: String): Seq[Entry] = {
    val cur = read(path)
    if (cur.nonEmpty) cur
    else {
      val parts = GeoTable.readPartitionCols(path).toSet
      val baseline = GeoTable.ensureSchema(spark, path)
      val entries = baseline.fields.toSeq
        .filterNot(f => parts.contains(f.name))
        .map(f => Entry(f.name, f.name, f.dataType, dropped = false))
      write(path, entries)
      entries
    }
  }

  def addColumn(spark: SparkSession, path: String, name: String, dt: DataType): Unit = {
    val entries = ensure(spark, path)
    require(!entries.exists(e => !e.dropped && e.logical == name), s"column exists: $name")
    // physical name must be globally fresh (a dropped column keeps its data)
    val physical = if (entries.exists(_.physical == name)) s"${name}_${entries.size}" else name
    write(path, entries :+ Entry(name, physical, dt, dropped = false))
  }

  def renameColumn(spark: SparkSession, path: String, from: String, to: String): Unit = {
    val entries = ensure(spark, path)
    require(entries.exists(e => !e.dropped && e.logical == from), s"no such column: $from")
    require(!entries.exists(e => !e.dropped && e.logical == to), s"column exists: $to")
    write(path, entries.map(e =>
      if (!e.dropped && e.logical == from) e.copy(logical = to) else e))
  }

  /** Type promotion matrix — exactly Iceberg's WIDENING-only evolution
    * (ref /root/reference/api/src/main/java/org/apache/iceberg/types/TypeUtil.java
    * `isPromotionAllowed`: int→long, float→double, decimal precision
    * widen at fixed scale), extended along Spark's small-integral chain
    * (byte→short→int→long — all INT32-annotated in parquet, so the same
    * metadata-only widening applies). Every promotion is metadata-only:
    * old files keep their narrow physical type and the parquet readers
    * (vectorized and row) up-convert to the declared logical type; new
    * appends write the wide type; manifest min/max stats recorded under
    * the narrow type stay valid because stat comparison is value-exact
    * (BigDecimal), and aggregate pushdown converts folded stats to the
    * CURRENT logical type.
    */
  private def promotable(from: DataType, to: DataType): Boolean = {
    import org.apache.spark.sql.types._
    def rank(t: DataType): Int = t match {
      case ByteType => 0; case ShortType => 1; case IntegerType => 2; case LongType => 3
      case _ => -1
    }
    (from, to) match {
      case (a, b) if a == b => true
      case (a, b) if rank(a) >= 0 && rank(b) >= 0 => rank(a) < rank(b)
      case (FloatType, DoubleType) => true
      case (a: DecimalType, b: DecimalType) => b.scale == a.scale && b.precision >= a.precision
      case _ => false
    }
  }

  /** Widen a column's logical type (no data rewrite). Rejects anything
    * outside the promotion matrix, like the reference's
    * `UpdateSchema.updateColumn`.
    */
  def updateColumnType(spark: SparkSession, path: String, name: String, to: DataType): Unit = {
    val entries = ensure(spark, path)
    val e = entries.find(x => !x.dropped && x.logical == name)
      .getOrElse(throw new IllegalArgumentException(s"no such column: $name"))
    require(promotable(e.dataType, to),
      s"cannot promote $name: ${e.dataType.simpleString} -> ${to.simpleString} " +
        "(allowed: integral widening, float->double, decimal precision widening at fixed scale)")
    if (e.dataType != to)
      write(path, entries.map(x =>
        if (!x.dropped && x.logical == name) x.copy(dataType = to) else x))
  }

  /** Attach / replace a column doc comment (metadata-only). */
  def setColumnComment(spark: SparkSession, path: String, name: String,
      comment: Option[String]): Unit = {
    val entries = ensure(spark, path)
    require(entries.exists(e => !e.dropped && e.logical == name), s"no such column: $name")
    write(path, entries.map(e =>
      if (!e.dropped && e.logical == name) e.copy(comment = comment) else e))
  }

  /** Validate a column exists — for TableChanges whose effect is a no-op
    * (e.g. DROP NOT NULL on an already-nullable column) but that must
    * still fail on a nonexistent column when invoked without the Spark
    * analyzer in front.
    */
  def requireColumn(spark: SparkSession, path: String, name: String): Unit = {
    val entries = ensure(spark, path)
    require(entries.exists(e => !e.dropped && e.logical == name), s"no such column: $name")
  }

  def dropColumn(spark: SparkSession, path: String, name: String): Unit = {
    val entries = ensure(spark, path)
    require(entries.exists(e => !e.dropped && e.logical == name), s"no such column: $name")
    write(path, entries.map(e =>
      if (!e.dropped && e.logical == name) e.copy(dropped = true) else e))
  }

  /** Physical file schema (all non-dropped + dropped columns still present
    * in files) for relation building; None when no evolution happened.
    */
  def physicalSchema(path: String): Option[StructType] = {
    val entries = read(path)
    if (entries.isEmpty) None
    else Some(StructType(entries.map(e => StructField(e.physical, e.dataType))))
  }

  /** Project a physically-named frame to the logical view (hides dropped
    * columns, applies renames). Pass-through columns (partition cols,
    * bbox shadows added after the fact) keep their names.
    */
  def toLogical(df: DataFrame, path: String): DataFrame = {
    val entries = read(path)
    if (entries.isEmpty) df
    else {
      val mapped = entries.filterNot(_.dropped)
        .filter(e => df.columns.contains(e.physical))
        .map { e =>
          // promoted columns: old files surface the narrow physical type —
          // cast up so every snapshot reads under ONE logical type. Cast
          // ONLY when the frame's actual type is a strict widening source
          // of the declared type: a declared-encoding geometry column
          // arrives here already DECODED (wkt string files -> wkb binary
          // frame), so an unconditional cast to the recorded physical
          // type would mangle it. The column comment rides along as
          // standard field metadata.
          val actual = df.schema(e.physical).dataType
          val base =
            if (actual != e.dataType && promotable(actual, e.dataType))
              col(e.physical).cast(e.dataType)
            else col(e.physical)
          e.comment match {
            case Some(c) => base.as(e.logical,
              new org.apache.spark.sql.types.MetadataBuilder().putString("comment", c).build())
            case None => base.as(e.logical)
          }
        }
      val known = entries.map(_.physical).toSet
      val passthrough = df.columns.filterNot(known).map(col(_))
      df.select(mapped ++ passthrough: _*)
    }
  }

  /** Map a logically-named frame back to physical names for writing. */
  def toPhysical(df: DataFrame, path: String): DataFrame = {
    val entries = read(path)
    if (entries.isEmpty) df
    else {
      val byLogical = entries.filterNot(_.dropped).map(e => e.logical -> e.physical).toMap
      df.select(df.columns.map(c => col(c).as(byLogical.getOrElse(c, c))): _*)
    }
  }
}
