package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{GeoTable, IcebergExport, Snapshots}

/** One-way Iceberg v2 metadata export ([[IcebergExport]]): the emitted
  * metadata.json + avro manifest list + manifest are validated by
  * READING THEM BACK with the Apache Avro library's own
  * DataFileReader/GenericDatumReader and Spark's JSON reader — the
  * writer is never consulted — and cross-checked against the graft
  * manifest they describe (paths, row counts, sizes, identity partition
  * values, name-mapping coverage, spec'd field-ids).
  */
class IcebergExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def readAvro(p: String): (org.apache.avro.Schema, Seq[GenericRecord], Map[String, String]) = {
    val r = new DataFileReader(
      new java.io.File(p), new GenericDatumReader[GenericRecord]())
    try {
      val rows = r.iterator().asScala.toList
      val meta = r.getMetaKeys.asScala.toSeq.collect {
        case k if !k.startsWith("avro.") => k -> r.getMetaString(k)
      }.toMap
      (r.getSchema, rows, meta)
    } finally r.close()
  }

  private def jsonDf(file: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(new String(Files.readAllBytes(Paths.get(file)), "UTF-8")).toDS)
  }

  /** The HEAD snapshot's manifest-list path (exports carry the full
    * ancestry since r15, so `snapshots` holds one entry per version).
    */
  private def headListPath(md: org.apache.spark.sql.DataFrame): String = {
    val cur = md.selectExpr("`current-snapshot-id`").collect().head.getLong(0)
    md.selectExpr("explode(snapshots) AS s").where(s"s.`snapshot-id` = $cur")
      .selectExpr("s.`manifest-list`").collect().head.getString(0)
  }

  test("export: metadata.json + manifest list + manifest conform to the v2 " +
      "spec and describe exactly the graft snapshot's files") {
    val base = Files.createTempDirectory("graft_ice").toString
    val tbl = s"$base/t"
    spark.range(100).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS x",
      "concat('s', id % 3) AS s").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl)
    Snapshots.append(spark.range(100, 130).selectExpr("id",
      "CAST(id % 7 AS DOUBLE) AS x", "concat('s', id % 3) AS s"), tbl)

    val metaFile = IcebergExport.export(spark, tbl)
    assert(Files.exists(Paths.get(metaFile)))
    assert(new String(Files.readAllBytes(
      Paths.get(tbl, "metadata", "version-hint.text")), "UTF-8") == "1")

    val md = jsonDf(metaFile)
    val row = md.selectExpr("`format-version`", "`last-sequence-number`",
      "`current-snapshot-id`", "`current-schema-id`", "`default-spec-id`",
      "location").collect().head
    assert(row.getLong(0) == 2L)
    // two exported snapshots (writeManifest + append) rank to sequences 1, 2
    assert(row.getLong(1) == 2L)
    assert(row.getLong(4) == 0L)
    assert(row.getString(5) == Paths.get(tbl).toAbsolutePath.toString)
    val snapId = row.getLong(2)

    // the FULL ancestry exports: two parent-linked snapshots + snapshot-log
    val snaps = md.selectExpr("explode(snapshots) AS s")
      .selectExpr("s.`snapshot-id`", "s.`parent-snapshot-id`").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(snaps.size == 2, s"history must export: $snaps")
    assert(snaps(snapId) == 1L && snaps(1L) == -1L,
      s"parent links must chain the ancestry: $snaps")
    assert(md.selectExpr("size(`snapshot-log`)").collect().head.getInt(0) == 2)

    // snapshots[] points at a readable manifest LIST whose entries point
    // at readable manifests
    val listPath = md.selectExpr("explode(snapshots) AS s")
      .where(s"s.`snapshot-id` = $snapId")
      .selectExpr("s.`manifest-list`", "s.`snapshot-id`", "s.`sequence-number`")
      .collect().head
    assert(listPath.getLong(1) == snapId && listPath.getLong(2) == 2L)
    val (listSchema, listRows, listMeta) = readAvro(listPath.getString(0))
    assert(listMeta("format-version") == "2")
    assert(listMeta("snapshot-id") == snapId.toString)
    // spec'd field-ids on the wire schema
    assert(listSchema.getField("manifest_path").getObjectProp("field-id") == 500)
    assert(listSchema.getField("sequence_number").getObjectProp("field-id") == 515)
    assert(listRows.size == 1)
    val lr = listRows.head
    assert(lr.get("content") == 0 && lr.get("partition_spec_id") == 0)

    val graftFiles = Snapshots.readManifest(tbl)
    // head manifest = added-at-head + carried-EXISTING = the whole table
    assert(lr.get("added_files_count").asInstanceOf[Int] +
      lr.get("existing_files_count").asInstanceOf[Int] == graftFiles.size)
    assert(lr.get("added_rows_count").asInstanceOf[Long] +
      lr.get("existing_rows_count").asInstanceOf[Long] == graftFiles.map(_.rows).sum)

    val (entrySchema, entryRows, entryMeta) =
      readAvro(lr.get("manifest_path").toString)
    assert(entryMeta("format-version") == "2" && entryMeta("content") == "data")
    assert(entrySchema.getField("data_file").schema()
      .getField("file_path").getObjectProp("field-id") == 100)
    assert(lr.get("manifest_length") ==
      Files.size(Paths.get(lr.get("manifest_path").toString)))

    // every graft file present, absolute, existing on disk, counts equal;
    // files carried from the parent snapshot are EXISTING (status 0) with
    // their ORIGINAL adding snapshot — an Iceberg incremental/changelog
    // consumer must never double-count carried rows
    val byPath = entryRows.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("file_path").toString ->
        (df.get("record_count").asInstanceOf[Long],
          df.get("file_size_in_bytes").asInstanceOf[Long],
          e.get("status"), e.get("snapshot_id"), df.get("file_format").toString)
    }.toMap
    assert(byPath.size == graftFiles.size)
    val absTbl = Paths.get(tbl).toAbsolutePath.toString
    graftFiles.foreach { f =>
      val (rows, size, status, addSnap, fmt) = byPath(s"$absTbl/${f.path}")
      assert(rows == f.rows && size == f.sizeBytes)
      assert(fmt == "PARQUET")
      assert(addSnap == f.addedV.toLong,
        s"snapshot_id must be the ORIGINAL adding snapshot: $addSnap vs ${f.addedV}")
      assert(status == (if (f.addedV.toLong == snapId) 1 else 0),
        s"carried files must be EXISTING in later snapshots: ${f.path} $status")
    }
    // per-snapshot added_rows_count sums to the table total (changelog
    // semantics — no row counted as added twice along the history)
    val addedPerSnap = md.selectExpr("explode(snapshots) AS s")
      .selectExpr("s.`manifest-list`").collect().map(_.getString(0))
      .map(lp => readAvro(lp)._2.map(_.get("added_rows_count").asInstanceOf[Long]).sum)
    assert(addedPerSnap.sum == graftFiles.map(_.rows).sum,
      s"added rows across history must sum to the table total: ${addedPerSnap.toSeq}")

    // the name mapping covers every column with the schema's field ids
    val props = jsonDf(metaFile)
      .selectExpr("properties.`schema.name-mapping.default` AS nm").collect().head
    import spark.implicits._
    val nm = spark.read.json(Seq(props.getString(0)).toDS)
      .selectExpr("`field-id`", "names[0] AS name").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(nm.keySet == Set("id", "x", "s"))
    val schemaFields = md.selectExpr("explode(schemas[0].fields) AS f")
      .selectExpr("f.name", "f.id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nm == schemaFields, "name mapping must mirror the schema's ids")
  }

  test("re-export: table-uuid STABLE (HadoopTableOperations validates uuid " +
      "on refresh), metadata version ADVANCES (staleness via the hint), one " +
      "complete export on disk") {
    val base = Files.createTempDirectory("graft_ice_re").toString
    val tbl = s"$base/t"
    spark.range(50).selectExpr("id", "CAST(id AS DOUBLE) AS x").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl)
    val meta1 = IcebergExport.export(spark, tbl)
    assert(meta1.endsWith("v1.metadata.json"))
    val uuid1 = jsonDf(meta1).selectExpr("`table-uuid`").collect().head.getString(0)
    Snapshots.append(spark.range(50, 60).selectExpr("id",
      "CAST(id AS DOUBLE) AS x"), tbl)
    val meta2 = IcebergExport.export(spark, tbl)
    assert(meta2.endsWith("v2.metadata.json"), meta2)
    assert(new String(Files.readAllBytes(
      Paths.get(tbl, "metadata", "version-hint.text")), "UTF-8") == "2")
    assert(jsonDf(meta2).selectExpr("`table-uuid`").collect().head
      .getString(0) == uuid1, "re-export must keep the table-uuid stable")
    assert(!Files.exists(Paths.get(meta1)),
      "the previous export sweeps (its manifests go with it)")
    // the new export is complete: the HEAD's manifest list + manifest
    // readable, row counts cover both appends
    val lp = headListPath(jsonDf(meta2))
    val (_, listRows, _) = readAvro(lp)
    assert(listRows.map(r => r.get("added_rows_count").asInstanceOf[Long] +
      r.get("existing_rows_count").asInstanceOf[Long]).sum == 60L)
  }

  test("partitioned export: EVERY dir column (identity source or derived) " +
      "exports as an identity field with per-file typed values (hive dirs " +
      "omit the column from data, manifests must carry it); MoR deletes refuse") {
    val base = Files.createTempDirectory("graft_ice_p").toString
    val tbl = s"$base/p"
    spark.range(60).selectExpr("id", "CAST(id % 3 AS INT) AS p",
      "concat('v', id) AS s", "pmod(hash(id), 4) AS id_bucket")
      .write.partitionBy("p", "id_bucket").parquet(tbl)
    GeoTable.writeManifest(spark, tbl, partitionCols = Seq("p", "bucket(4,id)"))
    val metaFile = IcebergExport.export(spark, tbl)

    val md = jsonDf(metaFile)
    val spec = md.selectExpr("explode(`partition-specs`[0].fields) AS f")
      .selectExpr("f.name", "f.transform", "f.`field-id`", "f.`source-id`")
      .collect()
    // EVERY dir column exports as IDENTITY — the bucket TRANSFORM is
    // never exported (graft bucket = Spark murmur3(42), not Iceberg's;
    // readers would mis-prune) but its dir COLUMN must: hive data files
    // omit dir columns, so only the manifest partition record can serve
    // id_bucket values to an Iceberg reader
    assert(spec.map(_.getString(0)).toSeq == Seq("p", "id_bucket"))
    assert(spec.forall(_.getString(1) == "identity"))
    assert(spec.map(_.getLong(2)).toSeq == Seq(1000L, 1001L))
    val schemaIds = md.selectExpr("explode(schemas[0].fields) AS f")
      .selectExpr("f.name", "f.id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spec.head.getLong(3) == schemaIds("p"))
    assert(spec(1).getLong(3) == schemaIds("id_bucket"))

    val listPath = md.selectExpr("explode(snapshots) AS s")
      .selectExpr("s.`manifest-list`").collect().head.getString(0)
    val (_, listRows, _) = readAvro(listPath)
    val (_, entryRows, entryMeta) = readAvro(
      listRows.head.get("manifest_path").toString)
    // partition-spec metadata names both fields, identity only
    assert(entryMeta("partition-spec").contains("\"p\"") &&
      entryMeta("partition-spec").contains("id_bucket") &&
      !entryMeta("partition-spec").contains("bucket("))
    // every entry's partition record carries the typed dir values
    val graftFiles = Snapshots.readManifest(tbl)
    val dirByPath = graftFiles.map(f =>
      s"${Paths.get(tbl).toAbsolutePath}/${f.path}" ->
        (f.dirVals("p").toInt, f.dirVals("id_bucket").toInt)).toMap
    entryRows.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val part = df.get("partition").asInstanceOf[GenericRecord]
      val (p, b) = dirByPath(df.get("file_path").toString)
      assert(part.get("p") == p && part.get("id_bucket") == b,
        s"partition value mismatch for ${df.get("file_path")}")
    }

    // pending MoR PREDICATE deletes (no Iceberg form) refuse the export
    // with a pointer to compaction; pos/eq delete FILES export (see the
    // dedicated delete-export test)
    Snapshots.deleteMoR(spark, tbl, "id < 5")
    assert(Snapshots.readDeletes(tbl).nonEmpty, "fixture must be a predicate delete")
    val err = intercept[IllegalArgumentException] {
      IcebergExport.export(spark, tbl)
    }
    assert(err.getMessage.contains("rewrite_data_files"))
  }

  test("schema evolution exports the LOGICAL view: renames applied in the " +
      "schema, name mapping targets the physical file column, dropped " +
      "columns are excluded; re-export sweeps the previous avro") {
    val base = Files.createTempDirectory("graft_ice_e").toString
    val tbl = s"$base/t"
    spark.range(20).selectExpr("id", "CAST(id AS DOUBLE) AS x",
      "concat('v', id) AS s").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl)
    IcebergExport.export(spark, tbl) // first export, swept by the second
    graft.spatial.TableSchema.renameColumn(spark, tbl, "x", "renamed_x")
    graft.spatial.TableSchema.dropColumn(spark, tbl, "s")
    val metaFile = IcebergExport.export(spark, tbl)
    val md = jsonDf(metaFile)
    val fields = md.selectExpr("explode(schemas[0].fields) AS f")
      .selectExpr("f.name", "f.id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fields.keySet == Set("id", "renamed_x"),
      s"renames applied, dropped columns excluded: $fields")
    import spark.implicits._
    val nmJson = md.selectExpr("properties.`schema.name-mapping.default` AS nm")
      .collect().head.getString(0)
    val nm = spark.read.json(Seq(nmJson).toDS)
      .selectExpr("`field-id`", "names[0] AS name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nm(fields("renamed_x")) == "x",
      "mapping must target the PHYSICAL column name in the data files")
    // re-export swept the first export's nonce-named avro: exactly one
    // manifest list + one data manifest remain (single-version history)
    val metaFiles = Files.list(Paths.get(tbl, "metadata")).toArray
      .map(_.toString.split('/').last)
    assert(metaFiles.count(_.startsWith("snap-")) == 1, metaFiles.toSeq.toString)
    assert(metaFiles.count(_.contains("-m0-")) == 1, metaFiles.toSeq.toString)
  }

  test("evolved PARTITIONED table exports (dir columns appended from the " +
      "baseline schema) and an evolved container keeps its LIST shape " +
      "with the nested rename applied") {
    val base = Files.createTempDirectory("graft_ice_pe").toString
    val tbl = s"$base/t"
    spark.range(30).selectExpr("id", "CAST(id % 2 AS INT) AS p",
      "array(named_struct('a', id, 'b', id * 2)) AS arr")
      .write.partitionBy("p").parquet(tbl)
    GeoTable.writeManifest(spark, tbl, partitionCols = Seq("p"))
    // nested rename inside the array element materializes container
    // children in the evolution log — the export must keep arr a LIST
    graft.spatial.TableSchema.renameColumn(spark, tbl,
      Seq("arr", "element", "a"), "a2")
    val metaFile = IcebergExport.export(spark, tbl)
    val md = jsonDf(metaFile)
    val fields = md.selectExpr("explode(schemas[0].fields) AS f")
      .selectExpr("f.name").collect().map(_.getString(0)).toSet
    assert(fields == Set("id", "arr", "p"),
      s"partition dir column must export on an evolved table: $fields")
    val raw = new String(Files.readAllBytes(Paths.get(metaFile)), "UTF-8")
    assert(raw.contains("\"type\":\"list\""),
      "an evolved array column must still export as a list type")
    assert(raw.contains("\"a2\""), "the nested rename must apply")
    val spec = md.selectExpr("explode(`partition-specs`[0].fields) AS f")
      .selectExpr("f.name", "f.transform").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(spec == Seq(("p", "identity")))
    // mapping: the renamed nested field still targets the PHYSICAL name
    val nmJson = md.selectExpr("properties.`schema.name-mapping.default` AS nm")
      .collect().head.getString(0)
    assert(nmJson.contains("\"element\"") && nmJson.contains("[\"a\"]"),
      s"element-level mapping must target the physical nested name: $nmJson")
  }

  test("MoR pos + eq deletes export as v2 delete files: delete manifest " +
      "(content=1) under an unpartitioned spec, reserved field ids, " +
      "equality_ids, RANK-mapped sequence numbers; import round-trips") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val base = Files.createTempDirectory("graft_ice_del").toString
    val tbl = s"$base/t"
    spark.range(20).selectExpr("id", "id % 5 AS k").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl) // data files at addedV=1
    // eq delete at seq 2 on k=2 — then a post-delete append whose k=2
    // row must STAY visible (sequence scoping)
    Snapshots.deleteByEquality(spark, tbl, Seq(2L).toDF("k"))
    Snapshots.append(
      spark.range(100, 104).selectExpr("id", "id % 5 AS k"), tbl) // addedV=3
    // pos delete of the id=0 row
    val pos0 = spark.read.parquet(tbl) // raw read: _metadata survives
      .select(expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") === 0L).drop("id")
    Snapshots.deleteByPosition(spark, tbl, pos0)
    val expect = Snapshots.read(spark, tbl).selectExpr("CAST(id AS STRING)",
      "CAST(k AS STRING)").collect().map(_.mkString("|")).toSet
    assert(expect.size == 19) // 20 - 4 (k=2@seq1) - 1 (pos) + 4 appended

    val metaFile = IcebergExport.export(spark, tbl)
    val md = jsonDf(metaFile)
    assert(md.selectExpr("`last-sequence-number`").collect().head.getLong(0) == 3L)
    // spec 1 (unpartitioned) rides along for the delete manifest
    assert(md.selectExpr("size(`partition-specs`)").collect().head.getInt(0) == 2)
    val listPath = headListPath(md)
    val (_, listRows, _) = readAvro(listPath)
    assert(listRows.size == 2)
    val dataRow = listRows.find(_.get("content") == 0).get
    val delRow = listRows.find(_.get("content") == 1).get
    assert(delRow.get("partition_spec_id") == 1)
    // one pos (fresh bundle, ADDED at head) + one eq (carried, EXISTING)
    assert(delRow.get("added_files_count") == 1 &&
      delRow.get("existing_files_count") == 1)
    assert(delRow.get("sequence_number") == 3L &&
      delRow.get("min_sequence_number") == 2L)

    // data entries carry their rank-mapped sequences: v1 files → 1,
    // the post-delete append → 3 (the eq delete sits between, at 2)
    val (_, dataEntries, _) = readAvro(dataRow.get("manifest_path").toString)
    val dataSeqs = dataEntries.map(_.get("sequence_number")).toSet
    assert(dataSeqs == Set(1L, 3L), s"data sequences: $dataSeqs")

    val (delSchema, delEntries, delMeta) =
      readAvro(delRow.get("manifest_path").toString)
    assert(delMeta("content") == "deletes" && delMeta("partition-spec-id") == "1")
    val byContent = delEntries.map(e =>
      e.get("data_file").asInstanceOf[GenericRecord]).groupBy(_.get("content"))
    val posE = byContent(1).head
    val eqE = byContent(2).head
    assert(posE.get("record_count") == 1L)
    assert(eqE.get("record_count") == 1L)
    // equality_ids names k's schema field id
    val schemaIds = md.selectExpr("explode(schemas[0].fields) AS f")
      .selectExpr("f.name", "f.id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val eqIds = eqE.get("equality_ids").asInstanceOf[java.util.List[Integer]]
    assert(eqIds.size() == 1 && eqIds.get(0).longValue() == schemaIds("k"))
    // the eq delete's sequence is STRICTLY between the two data sequences
    val eqSeq = delEntries.find(
      _.get("data_file").asInstanceOf[GenericRecord].get("content") == 2)
      .get.get("sequence_number")
    assert(eqSeq == 2L)
    // the rewritten pos-delete parquet carries the reserved field ids and
    // manifest-form unqualified paths
    val posParquet = posE.get("file_path").toString
    val posDf = spark.read.parquet(posParquet)
    assert(posDf.schema("file_path").metadata.getLong("parquet.field.id") == 2147483546L)
    assert(posDf.schema("pos").metadata.getLong("parquet.field.id") == 2147483545L)
    val posPath = posDf.select("file_path").collect().head.getString(0)
    assert(posPath.startsWith("/") && !posPath.contains(":"),
      s"pos delete path must be manifest-form unqualified absolute: $posPath")

    // ROUND TRIP: importing the export reproduces the MoR-applied rows
    val target = s"$base/imported"
    graft.spatial.IcebergImport.importTable(spark, tbl, target)
    val got = Snapshots.read(spark, target).selectExpr("CAST(id AS STRING)",
      "CAST(k AS STRING)").collect().map(_.mkString("|")).toSet
    assert(got == expect, s"round-trip with deletes: $got vs $expect")
  }

  test("timestamp + decimal identity partition dirs export with typed " +
      "partition values (the streaming-table shape) and import round-trips") {
    val base = Files.createTempDirectory("graft_ice_ts").toString
    val tbl = s"$base/t"
    val df = spark.range(30).selectExpr("id",
      "timestamp_seconds(1700000000 + (id % 3) * 86400) AS ts",
      "CAST((id % 2) * 1.5 AS DECIMAL(10,2)) AS d")
    df.write.partitionBy("ts", "d").parquet(tbl)
    // explicit schema: partition-dir string inference would degrade the
    // decimal to double (this is the shape the batch/streaming writers
    // produce — they persist the frame's true schema)
    GeoTable.writeManifest(spark, tbl, partitionCols = Seq("ts", "d"),
      schema = Some(df.schema))
    val metaFile = IcebergExport.export(spark, tbl)
    val md = jsonDf(metaFile)
    val listPath = md.selectExpr("explode(snapshots) AS s")
      .selectExpr("s.`manifest-list`").collect().head.getString(0)
    val (_, listRows, _) = readAvro(listPath)
    val (_, entries, _) = readAvro(listRows.head.get("manifest_path").toString)
    // expected micros per file from the source's own values
    val expected = Snapshots.read(spark, tbl)
      .selectExpr("unix_micros(ts)", "CAST(d AS STRING)").distinct().collect()
      .map(r => (r.getLong(0), BigDecimal(r.getString(1)))).toSet
    val got = entries.map { e =>
      val part = e.get("data_file").asInstanceOf[GenericRecord]
        .get("partition").asInstanceOf[GenericRecord]
      val micros = part.get("ts").asInstanceOf[Long]
      val buf = part.get("d").asInstanceOf[java.nio.ByteBuffer]
      val bytes = new Array[Byte](buf.remaining()); buf.duplicate().get(bytes)
      (micros, BigDecimal(new java.math.BigInteger(bytes), 2))
    }.toSet
    assert(got == expected, s"typed partition values: $got vs $expected")

    val target = s"$base/imported"
    graft.spatial.IcebergImport.importTable(spark, tbl, target)
    assert(GeoTable.readPartitionCols(target).toSet == Set("ts", "d"))
    def rows(p: String) = Snapshots.read(spark, p).selectExpr(
      "CAST(id AS STRING)", "CAST(ts AS STRING)", "CAST(d AS STRING)")
      .collect().map(_.mkString("|")).toSet
    assert(rows(target) == rows(tbl))
  }

  test("the SQL procedure surface: CALL export_iceberg_metadata returns the " +
      "metadata path and the file count") {
    val base = Files.createTempDirectory("graft_ice_sql").toString
    val tbl = s"$base/t"
    spark.range(10).selectExpr("id").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl)
    val out = spark.sql(
      s"CALL graft.system.export_iceberg_metadata('$tbl')").collect().head
    assert(out.getLong(0) == Snapshots.readManifest(tbl).size.toLong)
    assert(out.getString(1).endsWith("v1.metadata.json"))
    assert(Files.exists(Paths.get(out.getString(1))))
  }

  test("mid-ancestry partition-spec EVOLUTION round-trips: pre-evolution " +
      "snapshots' files carry NULL partition values under the current " +
      "spec, and the import serves them as the null partition") {
    val base = Files.createTempDirectory("graft_ice_specevo").toString
    val tbl = s"$base/t"
    spark.range(10).selectExpr("id").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl) // v1: unpartitioned layout
    spark.sql(s"ALTER TABLE '$tbl' ADD PARTITION FIELD bucket(4, id) AS shard")
    Snapshots.append(spark.range(10, 20).selectExpr("id"), tbl) // shard dirs
    val metaFile = IcebergExport.export(spark, tbl)
    // the current spec's shard field rides every exported snapshot; the
    // pre-evolution files' partition records hold NULL for it
    val md = jsonDf(metaFile)
    val listPaths = md.selectExpr("explode(snapshots) AS s")
      .selectExpr("s.`manifest-list`").collect().map(_.getString(0))
    val entries = listPaths.flatMap { lp =>
      readAvro(lp)._2.flatMap(r => readAvro(r.get("manifest_path").toString)._2)
    }
    val partVals = entries.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("file_path").toString ->
        df.get("partition").asInstanceOf[GenericRecord].get("shard")
    }.toMap
    assert(partVals.values.exists(_ == null),
      "pre-evolution files must carry a NULL shard partition value")
    assert(partVals.values.exists(_ != null),
      "post-evolution files must carry their shard dir value")
    val target = s"$base/imported"
    graft.spatial.IcebergImport.importTable(spark, tbl, target)
    val srcAnc = Snapshots.ancestry(tbl, Snapshots.mainVersion(tbl))
    val anc = Snapshots.ancestry(target, Snapshots.mainVersion(target))
    assert(anc.size == srcAnc.size, s"$anc vs $srcAnc")
    srcAnc.zip(anc).foreach { case (sv, tv) =>
      val a = Snapshots.read(spark, tbl, Some(sv))
        .select("id").collect().map(_.getLong(0)).toSet
      val b = Snapshots.read(spark, target, Some(tv))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(a == b, s"source v$sv vs imported v$tv")
    }
    assert(GeoTable.read(spark, target).count() == 20L)
  }

  test("refs targeting the TRUNCATED history prefix (below a pending-" +
      "predicate-delete ancestor) skip loudly; the export carries the " +
      "clean suffix and main") {
    val base = Files.createTempDirectory("graft_ice_trunc").toString
    val tbl = s"$base/t"
    spark.range(10).selectExpr("id").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl) // v1
    Snapshots.createTag(tbl, "genesis", Some(1))
    Snapshots.deleteMoR(spark, tbl, "id < 3") // v2: pending PREDICATE delete
    Snapshots.rewriteDataFiles(spark, tbl) // v3: materialized, head clean
    val metaFile = IcebergExport.export(spark, tbl)
    val md = jsonDf(metaFile)
    // history truncates below v2 (no Iceberg form): only the head exports
    val snapIds = md.selectExpr("explode(snapshots) AS s")
      .selectExpr("s.`snapshot-id`").collect().map(_.getLong(0)).toSet
    assert(!snapIds.contains(1L) && !snapIds.contains(2L),
      s"predicate-delete prefix must truncate: $snapIds")
    // the tag on the truncated prefix is skipped (no dangling snapshot-id
    // — Iceberg validates every ref target exists in snapshots[])
    val refs = md.select("refs.*").columns.toSet
    assert(refs == Set("main"), s"truncated-prefix refs must drop: $refs")
    assert(GeoTable.read(spark, s"$base/t").count() == 7L)
    val target = s"$base/imported"
    graft.spatial.IcebergImport.importTable(spark, tbl, target)
    assert(GeoTable.read(spark, target).count() == 7L)
  }

  test("a ROLLBACK at the exported HEAD keeps sequence numbers parent-" +
      "monotonic: the head serves only old-rank files, so without the " +
      "running max an ANCESTOR would exceed last-sequence-number and real " +
      "Iceberg readers reject the metadata at parse") {
    val base = Files.createTempDirectory("graft_ice_seqmono").toString
    val tbl = s"$base/t"
    spark.range(10).selectExpr("id").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl) // v1
    Snapshots.append(spark.range(10, 25).selectExpr("id"), tbl) // v2
    Snapshots.rollback(spark, tbl, 1) // v3 = HEAD: v1's files, old addedV
    val metaFile = IcebergExport.export(spark, tbl)
    val md = jsonDf(metaFile)
    val lastSeq = md.selectExpr("`last-sequence-number`").collect().head.getLong(0)
    val snaps = md.selectExpr("explode(snapshots) AS s")
      .selectExpr("s.`snapshot-id`", "s.`sequence-number`",
        "s.`parent-snapshot-id`")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(snaps.size == 3)
    // TableMetadata.indexAndValidateSnapshots: every snapshot sequence
    // number must be <= last-sequence-number
    snaps.foreach { case (id, (seq, _)) =>
      assert(seq <= lastSeq, s"snapshot $id sequence $seq > last $lastSeq")
    }
    // and non-decreasing along the parent chain (the v2 commit semantics)
    snaps.foreach { case (id, (seq, parent)) =>
      parent.foreach { p =>
        assert(snaps(p)._1 <= seq,
          s"snapshot $id seq $seq below its parent $p seq ${snaps(p)._1}")
      }
    }
    // the pre-rollback append really does carry a HIGHER rank than the
    // head's own files — the case the running max exists for
    assert(snaps(2L)._1 == snaps(3L)._1,
      "the head must publish at the running max of its ancestry")
    // round-trip: per-version rows survive
    val target = s"$base/imported"
    graft.spatial.IcebergImport.importTable(spark, tbl, target)
    val srcAnc = Snapshots.ancestry(tbl, Snapshots.mainVersion(tbl))
    val anc = Snapshots.ancestry(target, Snapshots.mainVersion(target))
    assert(anc.size == srcAnc.size)
    srcAnc.zip(anc).foreach { case (sv, tv) =>
      val a = Snapshots.read(spark, tbl, Some(sv)).collect().map(_.getLong(0)).toSet
      val b = Snapshots.read(spark, target, Some(tv)).collect().map(_.getLong(0)).toSet
      assert(a == b, s"source v$sv vs imported v$tv")
    }
  }
}
