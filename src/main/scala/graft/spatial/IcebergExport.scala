package graft.spatial

import java.nio.file.{Files, Paths}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** One-way export of a graft table's CURRENT snapshot as Apache Iceberg
  * v2 table metadata over the EXISTING parquet data files — the
  * cross-format escape hatch (the reference IS Iceberg,
  * `core/.../TableMetadata.java`; graft's own manifest/refs/stats
  * sidecars are its native format). Layout follows the Iceberg
  * HadoopTables convention: `<table>/metadata/v1.metadata.json` +
  * `version-hint.text`, a `snap-*.avro` manifest list, and one
  * `*-m0.avro` manifest, all per the public Iceberg table spec
  * (format version 2). Data files are NOT touched or copied.
  *
  * Because graft parquet files carry no Iceberg field ids, the exported
  * metadata includes `schema.name-mapping.default` — the spec's
  * documented mechanism for reading migrated files by name (the same
  * seam Iceberg's own `add_files`/`migrate` procedures rely on).
  *
  * Boundaries (stated, not silent):
  *  - pending merge-on-read deletes refuse the export — materialize them
  *    first (`rewrite_data_files`); an Iceberg reader cannot apply
  *    graft's predicate deletes, and exporting position deletes over
  *    id-less parquet is not portable;
  *  - only IDENTITY partition fields export into the Iceberg spec:
  *    graft's bucket transform is Spark murmur3(seed 42), not Iceberg's
  *    bucket — exporting it would make Iceberg readers mis-prune, so
  *    derived (bucket/truncate/date-part) fields are dropped from the
  *    exported spec; their SOURCE columns live in the data files, so
  *    results stay correct and only partition pruning is lost. Identity
  *    values (which hive-layout data files omit) export into each
  *    manifest entry's partition record, as the spec requires.
  */
object IcebergExport {

  /** Export `path`'s current main snapshot; returns the metadata.json
    * path. Re-export overwrites the previous export.
    */
  def export(spark: SparkSession, path: String): String = {
    val abs = Paths.get(path).toAbsolutePath.toString
    val v = Snapshots.mainVersion(path)
    require(v > 0, s"no snapshots to export at $path")
    require(Snapshots.readDeletes(path, Some(v)).isEmpty &&
      Snapshots.readPosDeletes(path, Some(v)).isEmpty &&
      Snapshots.readEqDeletes(path, Some(v)).isEmpty,
      s"cannot export $path: pending merge-on-read deletes — run " +
        "rewrite_data_files to materialize them, then export")
    val files = Snapshots.readManifest(path, Some(v))
    val ids = new Ids
    val top = toIStruct(GeoTable.ensureSchema(spark, path), ids)
    val identity = GeoTable.readPartitionSpecs(path)
      .collect { case Transforms.Identity(src) => src }
    val partFields = identity.zipWithIndex.map { case (src, i) =>
      val f = top.fields.find(_.name == src).getOrElse(
        throw new IllegalArgumentException(
          s"identity partition source $src is not a top-level column"))
      PartField(1000 + i, src, f.id, f.t match {
        case IPrim(s) => s
        case _ => throw new IllegalArgumentException(
          s"partition source $src must be a primitive column")
      })
    }
    val snapId = v.toLong
    val now = System.currentTimeMillis()
    val metaDir = Paths.get(abs, "metadata")
    Files.createDirectories(metaDir)
    val nonce = java.util.UUID.randomUUID().toString

    // ---- manifest file (one, all entries ADDED at sequence 1) ----------
    val manifestPath = metaDir.resolve(s"$nonce-m0.avro")
    val entrySchema = new Schema.Parser().parse(manifestEntryAvro(partFields))
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val entries = files.map { f =>
      val part = new GenericData.Record(partSchema)
      partFields.foreach { pf =>
        part.put(pf.name, partitionValue(pf,
          f.dirVals.get(pf.name).orNull))
      }
      val df = new GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", s"$abs/${f.path}")
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", f.rows)
      df.put("file_size_in_bytes", f.sizeBytes)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapId)
      e.put("sequence_number", 1L)
      e.put("file_sequence_number", 1L)
      e.put("data_file", df)
      e
    }
    val schemaJson = structJson(top, Some(0))
    val specFieldsJson = partFields.map(pf =>
      s"""{"name":"${esc(pf.name)}","transform":"identity",""" +
        s""""source-id":${pf.sourceId},"field-id":${pf.fieldId}}""").mkString(",")
    val manifestLen = writeAvro(manifestPath, entrySchema, Map(
      "schema" -> schemaJson,
      "schema-id" -> "0",
      "partition-spec" -> s"[$specFieldsJson]",
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "data"), entries)

    // ---- manifest list -------------------------------------------------
    val listPath = metaDir.resolve(s"snap-$snapId-1-$nonce.avro")
    val listSchema = new Schema.Parser().parse(ManifestListAvro)
    val listEntry = new GenericData.Record(listSchema)
    listEntry.put("manifest_path", manifestPath.toString)
    listEntry.put("manifest_length", manifestLen)
    listEntry.put("partition_spec_id", 0)
    listEntry.put("content", 0)
    listEntry.put("sequence_number", 1L)
    listEntry.put("min_sequence_number", 1L)
    listEntry.put("added_snapshot_id", snapId)
    listEntry.put("added_files_count", files.size)
    listEntry.put("existing_files_count", 0)
    listEntry.put("deleted_files_count", 0)
    listEntry.put("added_rows_count", files.map(_.rows).sum)
    listEntry.put("existing_rows_count", 0L)
    listEntry.put("deleted_rows_count", 0L)
    writeAvro(listPath, listSchema, Map(
      "format-version" -> "2",
      "snapshot-id" -> snapId.toString,
      "sequence-number" -> "1",
      "parent-snapshot-id" -> "null"), Seq(listEntry))

    // ---- metadata.json + version hint ----------------------------------
    val lastPartId = if (partFields.isEmpty) 999 else partFields.map(_.fieldId).max
    val metadata =
      s"""{"format-version":2,"table-uuid":"$nonce","location":"${esc(abs)}",
         |"last-sequence-number":1,"last-updated-ms":$now,
         |"last-column-id":${ids.last},
         |"current-schema-id":0,"schemas":[$schemaJson],
         |"default-spec-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[$specFieldsJson]}],
         |"last-partition-id":$lastPartId,
         |"default-sort-order-id":0,
         |"sort-orders":[{"order-id":0,"fields":[]}],
         |"properties":{"schema.name-mapping.default":"${esc(nameMapping(top))}"},
         |"current-snapshot-id":$snapId,
         |"refs":{"main":{"snapshot-id":$snapId,"type":"branch"}},
         |"snapshots":[{"snapshot-id":$snapId,"sequence-number":1,
         |"timestamp-ms":$now,"manifest-list":"${esc(listPath.toString)}",
         |"summary":{"operation":"append"},"schema-id":0}],
         |"snapshot-log":[{"timestamp-ms":$now,"snapshot-id":$snapId}],
         |"metadata-log":[]}""".stripMargin.replace("\n", "")
    val metaFile = metaDir.resolve("v1.metadata.json")
    Files.write(metaFile, metadata.getBytes("UTF-8"))
    Files.write(metaDir.resolve("version-hint.text"), "1".getBytes("UTF-8"))
    metaFile.toString
  }

  // ---- Iceberg schema model (ids assigned in DFS pre-order, like
  // Iceberg's own fresh-schema assignment) ------------------------------

  private final class Ids { var last = 0; def next(): Int = { last += 1; last } }

  private sealed trait IType
  private final case class IPrim(s: String) extends IType
  private final case class IStruct(fields: Seq[IField]) extends IType
  private final case class IList(elemId: Int, elem: IType, required: Boolean) extends IType
  private final case class IMapT(kId: Int, vId: Int, k: IType, v: IType,
      vRequired: Boolean) extends IType
  private final case class IField(id: Int, name: String, required: Boolean, t: IType)

  private final case class PartField(fieldId: Int, name: String, sourceId: Int,
      icebergType: String)

  private def toIStruct(st: StructType, ids: Ids): IStruct =
    IStruct(st.fields.toSeq.map { f =>
      val id = ids.next()
      IField(id, f.name, !f.nullable, toIType(f.dataType, ids))
    })

  private def toIType(dt: DataType, ids: Ids): IType = dt match {
    case st: StructType => toIStruct(st, ids)
    case ArrayType(e, containsNull) =>
      val id = ids.next()
      IList(id, toIType(e, ids), !containsNull)
    case MapType(k, vv, valueContainsNull) =>
      val kId = ids.next(); val vId = ids.next()
      IMapT(kId, vId, toIType(k, ids), toIType(vv, ids), !valueContainsNull)
    case BooleanType => IPrim("boolean")
    case ByteType | ShortType | IntegerType => IPrim("int")
    case LongType => IPrim("long")
    case FloatType => IPrim("float")
    case DoubleType => IPrim("double")
    case StringType => IPrim("string")
    case _: VarcharType | _: CharType => IPrim("string")
    case BinaryType => IPrim("binary")
    case DateType => IPrim("date")
    case TimestampType => IPrim("timestamptz")
    case TimestampNTZType => IPrim("timestamp")
    case d: DecimalType => IPrim(s"decimal(${d.precision}, ${d.scale})")
    case other => throw new IllegalArgumentException(
      s"type $other has no Iceberg v2 representation")
  }

  private def typeJson(t: IType): String = t match {
    case IPrim(s) => s""""$s""""
    case s: IStruct => structJson(s, None)
    case IList(id, e, req) =>
      s"""{"type":"list","element-id":$id,"element":${typeJson(e)},"element-required":$req}"""
    case IMapT(kId, vId, k, vv, req) =>
      s"""{"type":"map","key-id":$kId,"key":${typeJson(k)},""" +
        s""""value-id":$vId,"value":${typeJson(vv)},"value-required":$req}"""
  }

  private def structJson(s: IStruct, schemaId: Option[Int]): String = {
    val fs = s.fields.map(f =>
      s"""{"id":${f.id},"name":"${esc(f.name)}","required":${f.required},""" +
        s""""type":${typeJson(f.t)}}""").mkString(",")
    val idAttr = schemaId.fold("")(i => s""""schema-id":$i,""")
    s"""{"type":"struct",$idAttr"fields":[$fs]}"""
  }

  /** `schema.name-mapping.default`: field-id ↔ name for every field, the
    * spec's mechanism for data files written without Iceberg field ids.
    */
  private def nameMapping(top: IStruct): String = {
    def fieldEntry(f: IField): String = {
      val nested = nestedMapping(f.t)
      s"""{"field-id":${f.id},"names":["${esc(f.name)}"]""" +
        (if (nested.isEmpty) "}" else s""","fields":[$nested]}""")
    }
    def nestedMapping(t: IType): String = t match {
      case IStruct(fs) => fs.map(fieldEntry).mkString(",")
      case IList(id, e, _) =>
        val nested = nestedMapping(e)
        s"""{"field-id":$id,"names":["element"]""" +
          (if (nested.isEmpty) "}" else s""","fields":[$nested]}""")
      case IMapT(kId, vId, k, vv, _) =>
        val kNested = nestedMapping(k)
        val vNested = nestedMapping(vv)
        s"""{"field-id":$kId,"names":["key"]""" +
          (if (kNested.isEmpty) "}" else s""","fields":[$kNested]}""") + "," +
          s"""{"field-id":$vId,"names":["value"]""" +
          (if (vNested.isEmpty) "}" else s""","fields":[$vNested]}""")
      case _ => ""
    }
    s"[${top.fields.map(fieldEntry).mkString(",")}]"
  }

  // ---- Avro schemas per the Iceberg spec (field-id attributes) --------

  private def avroPrim(icebergType: String): String = icebergType match {
    case "int" => "\"int\""
    case "long" => "\"long\""
    case "string" => "\"string\""
    case "double" => "\"double\""
    case "float" => "\"float\""
    case "boolean" => "\"boolean\""
    case "date" => """{"type":"int","logicalType":"date"}"""
    case other => throw new IllegalArgumentException(
      s"partition source type $other is not exportable")
  }

  /** Hive dir value string → typed Avro partition value. */
  private def partitionValue(pf: PartField, raw: String): Any = {
    if (raw == null || raw == "__HIVE_DEFAULT_PARTITION__") return null
    pf.icebergType match {
      case "int" => raw.toInt
      case "long" => raw.toLong
      case "string" => raw
      case "double" => raw.toDouble
      case "float" => raw.toFloat
      case "boolean" => raw.toBoolean
      case "date" => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case other => throw new IllegalArgumentException(
        s"partition source type $other is not exportable")
    }
  }

  private def manifestEntryAvro(partFields: Seq[PartField]): String = {
    val pf = partFields.map(p =>
      s"""{"name":"${esc(p.name)}","type":["null",${avroPrim(p.icebergType)}],""" +
        s""""default":null,"field-id":${p.fieldId}}""").mkString(",")
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int","field-id":0},
       |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
       |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
       |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
       |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
       |{"name":"content","type":"int","field-id":134},
       |{"name":"file_path","type":"string","field-id":100},
       |{"name":"file_format","type":"string","field-id":101},
       |{"name":"partition","type":{"type":"record","name":"r102","fields":[$pf]},"field-id":102},
       |{"name":"record_count","type":"long","field-id":103},
       |{"name":"file_size_in_bytes","type":"long","field-id":104}
       |]},"field-id":2}
       |]}""".stripMargin
  }

  private val ManifestListAvro =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514},
      |{"name":"partitions","type":["null",{"type":"array","items":
      |{"type":"record","name":"r508","fields":[
      |{"name":"contains_null","type":"boolean","field-id":509},
      |{"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
      |{"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
      |{"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      |]},"element-id":508}],"default":null,"field-id":507}
      |]}""".stripMargin

  private def writeAvro(target: java.nio.file.Path, schema: Schema,
      meta: Map[String, String], rows: Seq[GenericData.Record]): Long = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericData.Record](schema))
    try {
      meta.toSeq.sortBy(_._1).foreach { case (k, v) => w.setMeta(k, v) }
      w.create(schema, target.toFile)
      rows.foreach(w.append)
    } finally w.close()
    Files.size(target)
  }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
