package graft

import java.nio.file.{Files, Paths}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{GeoTable, GeometryFields, IcebergExport, IcebergImport, Snapshots, TableSchema}

/** Read-direction Iceberg interop ([[IcebergImport]]): export→import
  * round-trips over graft's own exporter, plus imports of FIXTURE
  * layouts hand-built by this spec (metadata.json + Avro manifests the
  * exporter never wrote) — name mapping, sequence-scoped equality
  * deletes, position deletes, partition serving, and the stated loud
  * refusals.
  */
class IcebergImportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"CAST(`$c` AS STRING)"): _*)
      .collect().map(_.mkString("|")).toSet
  }

  // ---- fixture plumbing: Avro + metadata.json written BY THIS SPEC ------

  private def writeAvro(target: String, schemaJson: String,
      meta: Map[String, String], rows: Seq[GenericData.Record]): Unit = {
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new DataFileWriter(new GenericDatumWriter[GenericData.Record](schema))
    try {
      meta.foreach { case (k, v) => w.setMeta(k, v) }
      w.create(schema, new java.io.File(target))
      rows.foreach(w.append)
    } finally w.close()
  }

  /** Manifest entry schema, deliberately NOT the exporter's: explicit
    * nullable entry sequence numbers, an equality_ids seat, and a
    * partition record shaped per test.
    */
  private def entrySchemaJson(partFields: String): String =
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int","field-id":0},
       |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
       |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
       |{"name":"content","type":"int","field-id":134},
       |{"name":"file_path","type":"string","field-id":100},
       |{"name":"file_format","type":"string","field-id":101},
       |{"name":"partition","type":{"type":"record","name":"r102","fields":[$partFields]},"field-id":102},
       |{"name":"record_count","type":"long","field-id":103},
       |{"name":"file_size_in_bytes","type":"long","field-id":104},
       |{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135},
       |{"name":"lower_bounds","type":["null",{"type":"array","items":
       |{"type":"record","name":"k126_v127","fields":[
       |{"name":"key","type":"int","field-id":126},
       |{"name":"value","type":"bytes","field-id":127}]}}],"default":null,"field-id":125},
       |{"name":"upper_bounds","type":["null",{"type":"array","items":
       |{"type":"record","name":"k129_v130","fields":[
       |{"name":"key","type":"int","field-id":129},
       |{"name":"value","type":"bytes","field-id":130}]}}],"default":null,"field-id":128},
       |{"name":"null_value_counts","type":["null",{"type":"array","items":
       |{"type":"record","name":"k121_v122","fields":[
       |{"name":"key","type":"int","field-id":121},
       |{"name":"value","type":"long","field-id":122}]}}],"default":null,"field-id":110},
       |{"name":"nan_value_counts","type":["null",{"type":"array","items":
       |{"type":"record","name":"k138_v139","fields":[
       |{"name":"key","type":"int","field-id":138},
       |{"name":"value","type":"long","field-id":139}]}}],"default":null,"field-id":137}
       |]},"field-id":2}]}""".stripMargin

  private val listSchemaJson =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin

  private case class FixtureEntry(path: String, rows: Long, seq: Long,
      content: Int, partVals: Map[String, Any] = Map.empty,
      eqIds: Seq[Int] = Nil,
      lower: Map[Int, Array[Byte]] = Map.empty,
      upper: Map[Int, Array[Byte]] = Map.empty,
      nullCounts: Map[Int, Long] = Map.empty,
      nanCounts: Map[Int, Long] = Map.empty)

  /** Write one data manifest (+ optional delete manifest), a manifest
    * list, and v1.metadata.json under `dir`/metadata.
    */
  private def writeFixture(dir: String, schemaJson: String, specJson: String,
      props: Map[String, String], partFieldsAvro: String,
      entries: Seq[FixtureEntry]): String = {
    val metaDir = Paths.get(dir, "metadata")
    Files.createDirectories(metaDir)
    val es = new Schema.Parser().parse(entrySchemaJson(partFieldsAvro))
    val dfS = es.getField("data_file").schema()
    val pS = dfS.getField("partition").schema()
    def mkEntries(fs: Seq[FixtureEntry]) = fs.map { fe =>
      val part = new GenericData.Record(pS)
      fe.partVals.foreach { case (k, v) => part.put(k, v) }
      val df = new GenericData.Record(dfS)
      df.put("content", fe.content)
      df.put("file_path", fe.path)
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", fe.rows)
      df.put("file_size_in_bytes", Files.size(Paths.get(fe.path)))
      if (fe.eqIds.nonEmpty) {
        val ids = new java.util.ArrayList[Integer]()
        fe.eqIds.foreach(i => ids.add(Integer.valueOf(i)))
        df.put("equality_ids", ids)
      }
      def kvBytes(field: String, m: Map[Int, Array[Byte]]): Unit = if (m.nonEmpty) {
        val kvS = dfS.getField(field).schema().getTypes.get(1).getElementType
        val l = new java.util.ArrayList[GenericData.Record]()
        m.toSeq.sortBy(_._1).foreach { case (k, v) =>
          val r = new GenericData.Record(kvS)
          r.put("key", k); r.put("value", java.nio.ByteBuffer.wrap(v)); l.add(r)
        }
        df.put(field, l)
      }
      def kvLongs(field: String, m: Map[Int, Long]): Unit = if (m.nonEmpty) {
        val kvS = dfS.getField(field).schema().getTypes.get(1).getElementType
        val l = new java.util.ArrayList[GenericData.Record]()
        m.toSeq.sortBy(_._1).foreach { case (k, v) =>
          val r = new GenericData.Record(kvS)
          r.put("key", k); r.put("value", java.lang.Long.valueOf(v)); l.add(r)
        }
        df.put(field, l)
      }
      kvBytes("lower_bounds", fe.lower)
      kvBytes("upper_bounds", fe.upper)
      kvLongs("null_value_counts", fe.nullCounts)
      kvLongs("nan_value_counts", fe.nanCounts)
      val e = new GenericData.Record(es)
      e.put("status", 1)
      e.put("sequence_number", fe.seq)
      e.put("data_file", df)
      e
    }
    val (dataE, delE) = entries.partition(_.content == 0)
    val dataM = metaDir.resolve("fix-m0.avro").toString
    writeAvro(dataM, entrySchemaJson(partFieldsAvro), Map("content" -> "data"),
      mkEntries(dataE))
    val listRows = Seq.newBuilder[GenericData.Record]
    val ls = new Schema.Parser().parse(listSchemaJson)
    def listRow(p: String, content: Int, seq: Long) = {
      val r = new GenericData.Record(ls)
      r.put("manifest_path", p)
      r.put("manifest_length", Files.size(Paths.get(p)))
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("sequence_number", seq)
      r.put("min_sequence_number", 1L)
      r.put("added_snapshot_id", 99L)
      r
    }
    listRows += listRow(dataM, 0, dataE.map(_.seq).foldLeft(1L)(math.max))
    if (delE.nonEmpty) {
      val delM = metaDir.resolve("fix-m1.avro").toString
      writeAvro(delM, entrySchemaJson(partFieldsAvro), Map("content" -> "deletes"),
        mkEntries(delE))
      listRows += listRow(delM, 1, delE.map(_.seq).foldLeft(1L)(math.max))
    }
    val listPath = metaDir.resolve("snap-99-fix.avro").toString
    writeAvro(listPath, listSchemaJson, Map.empty, listRows.result())
    val propsJson = props.map { case (k, v) =>
      s""""${k.replace("\"", "\\\"")}":"${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.mkString(",")
    val metadata =
      s"""{"format-version":2,"table-uuid":"fixture-uuid","location":"$dir",
         |"last-sequence-number":9,"last-updated-ms":1,
         |"last-column-id":99,
         |"current-schema-id":0,"schemas":[$schemaJson],
         |"default-spec-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[$specJson]}],
         |"last-partition-id":1001,
         |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
         |"properties":{$propsJson},
         |"current-snapshot-id":99,
         |"refs":{"main":{"snapshot-id":99,"type":"branch"}},
         |"snapshots":[{"snapshot-id":99,"sequence-number":9,"timestamp-ms":1,
         |"manifest-list":"$listPath","summary":{"operation":"append"},"schema-id":0}],
         |"snapshot-log":[],"metadata-log":[]}""".stripMargin.replace("\n", "")
    val mf = metaDir.resolve("v1.metadata.json")
    Files.write(mf, metadata.getBytes("UTF-8"))
    Files.write(metaDir.resolve("version-hint.text"), "1".getBytes("UTF-8"))
    mf.toString
  }

  /** Write `df` as exactly ONE parquet file; returns its absolute path. */
  private def oneParquet(dir: String, df: org.apache.spark.sql.DataFrame): String = {
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
  }

  // ---- round trips over the exporter ------------------------------------

  test("round-trip: export → register_iceberg_table reads back identical " +
      "rows, schema-evolved names honored via the name mapping") {
    val base = Files.createTempDirectory("graft_imp_rt").toString
    val tbl = s"$base/src"
    spark.range(40).selectExpr("id", "CAST(id AS DOUBLE) AS x",
      "concat('v', id) AS s").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl)
    Snapshots.append(spark.range(40, 55).selectExpr("id",
      "CAST(id AS DOUBLE) AS x", "concat('v', id) AS s"), tbl)
    TableSchema.renameColumn(spark, tbl, "x", "renamed_x")
    TableSchema.dropColumn(spark, tbl, "s")
    IcebergExport.export(spark, tbl)

    val target = s"$base/imported"
    val v = IcebergImport.importTable(spark, tbl, target)
    assert(v >= 1)
    val got = GeoTable.read(spark, target)
    assert(got.columns.toSet == Set("id", "renamed_x"),
      s"the name mapping must apply: ${got.columns.toSeq}")
    assert(rowsOf(got) == rowsOf(GeoTable.read(spark, tbl)))
    // metadata-only adoption: the import wrote no data files of its own
    assert(Snapshots.readManifest(target).forall(_.path.startsWith("/")),
      "entries must reference the external files in place")
  }

  test("round-trip partitioned: hive-dir identity columns register as graft " +
      "partition columns, values serve, partition filters prune and match") {
    val base = Files.createTempDirectory("graft_imp_part").toString
    val tbl = s"$base/src"
    spark.range(60).selectExpr("id", "CAST(id % 3 AS INT) AS p",
      "concat('v', id) AS s", "pmod(hash(id), 4) AS id_bucket")
      .write.partitionBy("p", "id_bucket").parquet(tbl)
    GeoTable.writeManifest(spark, tbl, partitionCols = Seq("p", "bucket(4,id)"))
    IcebergExport.export(spark, tbl)

    val target = s"$base/imported"
    IcebergImport.importTable(spark, tbl, target)
    assert(GeoTable.readPartitionCols(target).toSet == Set("p", "id_bucket"),
      "hive-dir-served identity fields must register as partition columns")
    val src = GeoTable.read(spark, tbl)
    val got = GeoTable.read(spark, target)
    assert(rowsOf(got) == rowsOf(src))
    assert(rowsOf(got.filter("p = 1")) == rowsOf(src.filter("p = 1")))
  }

  test("round-trip geometry: declared encodings carry over as table " +
      "properties and decode identically") {
    val base = Files.createTempDirectory("graft_imp_geo").toString
    val tbl = s"$base/src"
    spark.range(10).selectExpr("id",
      "concat('POINT (', id, ' ', id + 1, ')') AS geom").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl)
    GeometryFields.setGeometryField(spark, tbl, "geom", "wkt")
    IcebergExport.export(spark, tbl)

    val target = s"$base/imported"
    IcebergImport.importTable(spark, tbl, target)
    assert(GeometryFields.get(target) == Map("geom" -> "wkt"))
    assert(rowsOf(GeoTable.read(spark, target)) == rowsOf(GeoTable.read(spark, tbl)))
  }

  // ---- hand-built fixtures (never written by IcebergExport) -------------

  test("fixture import: name mapping renames a physical column, in-file " +
      "identity partition values serve from the files (no dir registration)") {
    val base = Files.createTempDirectory("graft_imp_fix").toString
    import spark.implicits._
    val f1 = oneParquet(s"$base/d1",
      Seq((1L, "a", 10), (2L, "b", 10)).toDF("id", "val_orig", "p"))
    val f2 = oneParquet(s"$base/d2",
      Seq((3L, "c", 20)).toDF("id", "val_orig", "p"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"val_renamed","required":false,"type":"string"},
        |{"id":3,"name":"p","required":false,"type":"int"}]}"""
        .stripMargin.replace("\n", "")
    val mapping =
      """[{"field-id":1,"names":["id"]},{"field-id":2,"names":["val_orig"]},""" +
        """{"field-id":3,"names":["p"]}]"""
    val spec = """{"name":"p","transform":"identity","source-id":3,"field-id":1000}"""
    val partAvro =
      """{"name":"p","type":["null","int"],"default":null,"field-id":1000}"""
    writeFixture(base, schema, spec,
      Map("schema.name-mapping.default" -> mapping), partAvro, Seq(
        FixtureEntry(f1, 2L, 1L, 0, Map("p" -> 10)),
        FixtureEntry(f2, 1L, 2L, 0, Map("p" -> 20))))

    val target = s"$base/imported"
    IcebergImport.importTable(spark, base, target)
    val got = GeoTable.read(spark, target)
    assert(got.columns.toSet == Set("id", "val_renamed", "p"))
    // p lives IN the files → imported as an ordinary column, not a dir col
    assert(GeoTable.readPartitionCols(target).isEmpty)
    assert(rowsOf(got) == Set("1|10|a", "2|10|b", "3|20|c"))
    assert(got.filter("p = 20").count() == 1L)
  }

  test("fixture deletes: v2 position deletes apply; equality deletes apply " +
      "with Iceberg sequence scoping (strictly-older data files only)") {
    val base = Files.createTempDirectory("graft_imp_del").toString
    import spark.implicits._
    // data: A at seq 1 (k=1,2,3), B at seq 3 (k=3,4)
    val fA = oneParquet(s"$base/dA", Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "k"))
    val fB = oneParquet(s"$base/dB", Seq((4L, 3), (5L, 4)).toDF("id", "k"))
    // position delete: row 0 of A (id=1)
    val fPos = oneParquet(s"$base/dp", Seq((fA, 0L)).toDF("file_path", "pos"))
    // equality delete at seq 2 on k=3: hits A's (3,3), NOT B's (4,3)
    val fEq = oneParquet(s"$base/de", Seq(Tuple1(3)).toDF("k"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"k","required":false,"type":"int"}]}"""
        .stripMargin.replace("\n", "")
    writeFixture(base, schema, "", Map.empty, "", Seq(
      FixtureEntry(fA, 3L, 1L, 0),
      FixtureEntry(fB, 2L, 3L, 0),
      FixtureEntry(fPos, 1L, 4L, 1),
      FixtureEntry(fEq, 1L, 2L, 2, eqIds = Seq(2))))

    val target = s"$base/imported"
    IcebergImport.importTable(spark, base, target)
    // Snapshots.read is the MoR-complete read surface (pos + eq + predicate)
    val got = Snapshots.read(spark, target)
    assert(rowsOf(got) == Set("2|2", "4|3", "5|4"),
      "pos delete drops (1,1); seq-2 eq delete drops A's (3,3) but keeps " +
        s"B's seq-3 (4,3): ${rowsOf(got)}")
  }

  test("fixture partition-SCOPED equality delete: the scope narrows to " +
      "constant identity partition columns — matching keys in OTHER " +
      "partitions stay live; a NULL-partition scope refuses loudly") {
    val base = Files.createTempDirectory("graft_imp_scope").toString
    import spark.implicits._
    // k=3 exists in BOTH partitions; the delete is scoped to p=10 only
    val fA = oneParquet(s"$base/dA", Seq((1L, 3, 10), (2L, 4, 10)).toDF("id", "k", "p"))
    val fB = oneParquet(s"$base/dB", Seq((3L, 3, 20)).toDF("id", "k", "p"))
    val fEq = oneParquet(s"$base/de", Seq(Tuple1(3)).toDF("k"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"k","required":false,"type":"int"},
        |{"id":3,"name":"p","required":false,"type":"int"}]}"""
        .stripMargin.replace("\n", "")
    val spec = """{"name":"p","transform":"identity","source-id":3,"field-id":1000}"""
    val partAvro =
      """{"name":"p","type":["null","int"],"default":null,"field-id":1000}"""
    writeFixture(base, schema, spec, Map.empty, partAvro, Seq(
      FixtureEntry(fA, 2L, 1L, 0, Map("p" -> 10)),
      FixtureEntry(fB, 1L, 1L, 0, Map("p" -> 20)),
      FixtureEntry(fEq, 1L, 2L, 2, Map("p" -> 10), eqIds = Seq(2))))
    val target = s"$base/imported"
    IcebergImport.importTable(spark, base, target)
    assert(rowsOf(Snapshots.read(spark, target)) == Set("2|4|10", "3|3|20"),
      "the p=10 k=3 row deletes; the p=20 k=3 row must stay live")

    // NULL-partition scope: graft's constant-column narrowing would make
    // the delete match NOTHING (SQL null-key joins) — refuse instead
    val b2 = Files.createTempDirectory("graft_imp_nullscope").toString
    val f2 = oneParquet(s"$b2/d", Seq((1L, 3, 10)).toDF("id", "k", "p"))
    val fe2 = oneParquet(s"$b2/de", Seq(Tuple1(3)).toDF("k"))
    writeFixture(b2, schema, spec, Map.empty, partAvro, Seq(
      FixtureEntry(f2, 1L, 1L, 0, Map("p" -> 10)),
      FixtureEntry(fe2, 1L, 2L, 2, Map("p" -> null), eqIds = Seq(2))))
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(spark, b2, s"$b2/t")
    }
    assert(e.getMessage.contains("NULL partition"), e.getMessage)
  }

  test("fixture manifest BOUNDS serve the pruning stats without touching " +
      "data bytes (register_table at O(manifest)); NaN-unsafe double " +
      "bounds drop, string bounds mark truncated, null counts carry") {
    val base = Files.createTempDirectory("graft_imp_bounds").toString
    import spark.implicits._
    val f1 = oneParquet(s"$base/d",
      Seq((1L, 1.5, 2.5, "bb"), (2L, 2.5, 3.5, "cc")).toDF("id", "x", "y", "s"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"x","required":false,"type":"double"},
        |{"id":3,"name":"y","required":false,"type":"double"},
        |{"id":4,"name":"s","required":false,"type":"string"}]}"""
        .stripMargin.replace("\n", "")
    def le8(v: Long) = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    def le8d(v: Double) = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
    // DELIBERATELY wider than the data: if the importer read footers the
    // stats would be tighter — manifest provenance is thus provable
    writeFixture(base, schema, "", Map.empty, "", Seq(
      FixtureEntry(f1, 2L, 1L, 0,
        lower = Map(1 -> le8(0L), 2 -> le8d(1.0), 3 -> le8d(2.0),
          4 -> "aa".getBytes("UTF-8")),
        upper = Map(1 -> le8(100L), 2 -> le8d(9.0), 3 -> le8d(9.0),
          4 -> "zz".getBytes("UTF-8")),
        nullCounts = Map(1 -> 0L, 4 -> 0L),
        nanCounts = Map(2 -> 0L)))) // y (id 3) has NO nan count → no bounds
    val target = s"$base/imported"
    IcebergImport.importTable(spark, base, target)
    val fs = Snapshots.readManifest(target)
    assert(fs.size == 1)
    val st = fs.head
    assert(st.rows == 2L)
    assert(st.mins("id") == 0L && st.maxs("id") == 100L,
      s"manifest bounds (not footer values) must serve: ${st.mins} / ${st.maxs}")
    assert(st.mins("x") == 1.0 && st.maxs("x") == 9.0)
    assert(!st.mins.contains("y"),
      "double bounds without an explicit zero NaN count must drop " +
        "(Spark ranks NaN above every double — such bounds would misprune)")
    assert(st.mins("s") == "aa" && st.maxs("s") == "zz")
    assert(st.truncated.contains("s"),
      "string bounds may be truncated prefixes — MIN/MAX pushdown must decline")
    assert(st.nulls.get("id").contains(0L))
    // rows still read correctly and the wide bounds prune soundly
    val got = Snapshots.read(spark, target)
    assert(got.count() == 2L)
    assert(got.filter("id > 100").count() == 0L)
  }

  test("fixture refusals are loud: record-count mismatch, non-parquet " +
      "format, unknown equality field id") {
    import spark.implicits._
    // record-count mismatch
    val b1 = Files.createTempDirectory("graft_imp_rc").toString
    val f1 = oneParquet(s"$b1/d", Seq((1L, 1)).toDF("id", "k"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"k","required":false,"type":"int"}]}"""
        .stripMargin.replace("\n", "")
    writeFixture(b1, schema, "", Map.empty, "",
      Seq(FixtureEntry(f1, 7L, 1L, 0)))
    val e1 = intercept[IllegalArgumentException] {
      IcebergImport.importTable(spark, b1, s"$b1/t")
    }
    assert(e1.getMessage.contains("partial-file"), e1.getMessage)

    // non-parquet data file
    val b2 = Files.createTempDirectory("graft_imp_fmt").toString
    val f2 = oneParquet(s"$b2/d", Seq((1L, 1)).toDF("id", "k"))
    val metaDir2 = writeFixture(b2, schema, "", Map.empty, "",
      Seq(FixtureEntry(f2, 1L, 1L, 0)))
    // rewrite the manifest with an ORC format marker
    val es = new Schema.Parser().parse(entrySchemaJson(""))
    val dfS = es.getField("data_file").schema()
    val dfr = new GenericData.Record(dfS)
    dfr.put("content", 0)
    dfr.put("file_path", f2)
    dfr.put("file_format", "ORC")
    dfr.put("partition", new GenericData.Record(dfS.getField("partition").schema()))
    dfr.put("record_count", 1L)
    dfr.put("file_size_in_bytes", 1L)
    val er = new GenericData.Record(es)
    er.put("status", 1); er.put("sequence_number", 1L); er.put("data_file", dfr)
    writeAvro(Paths.get(b2, "metadata", "fix-m0.avro").toString,
      entrySchemaJson(""), Map("content" -> "data"), Seq(er))
    val e2 = intercept[IllegalArgumentException] {
      IcebergImport.importTable(spark, metaDir2, s"$b2/t")
    }
    assert(e2.getMessage.contains("ORC"), e2.getMessage)

    // equality delete naming an unknown field id
    val b3 = Files.createTempDirectory("graft_imp_eqid").toString
    val f3 = oneParquet(s"$b3/d", Seq((1L, 1)).toDF("id", "k"))
    val fe3 = oneParquet(s"$b3/de", Seq(Tuple1(3)).toDF("k"))
    writeFixture(b3, schema, "", Map.empty, "", Seq(
      FixtureEntry(f3, 1L, 1L, 0),
      FixtureEntry(fe3, 1L, 2L, 2, eqIds = Seq(42))))
    val e3 = intercept[IllegalArgumentException] {
      IcebergImport.importTable(spark, b3, s"$b3/t")
    }
    assert(e3.getMessage.contains("field id 42"), e3.getMessage)
  }

  test("export of an IMPORTED table resolves its absolute manifest entries " +
      "(no corrupt concatenated paths): import → export → re-import round-trips") {
    val base = Files.createTempDirectory("graft_imp_absexp").toString
    import spark.implicits._
    // external data OUTSIDE the imported table dir → absolute entries
    val f1 = oneParquet(s"$base/ext", Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"s","required":false,"type":"string"}]}"""
        .stripMargin.replace("\n", "")
    writeFixture(s"$base/ice", schema, "", Map.empty, "",
      Seq(FixtureEntry(f1, 2L, 1L, 0)))
    val t1 = s"$base/imported"
    IcebergImport.importTable(spark, s"$base/ice", t1)
    assert(Snapshots.readManifest(t1).forall(_.path.startsWith("/")),
      "precondition: the imported table carries absolute entries")
    IcebergExport.export(spark, t1)
    val t2 = s"$base/again"
    IcebergImport.importTable(spark, t1, t2)
    assert(rowsOf(GeoTable.read(spark, t2)) == Set("1|a", "2|b"),
      "the exported manifest must reference the external files resolvable")
  }

  test("eq-delete partition scope resolves through the spec field's " +
      "source-id: a custom spec-field name (≠ source column) must not " +
      "register a delete on a nonexistent column") {
    val base = Files.createTempDirectory("graft_imp_specname").toString
    import spark.implicits._
    // p lives IN the files; the spec field is named p_part (custom name)
    val fA = oneParquet(s"$base/dA", Seq((1L, 3, 10), (2L, 4, 10)).toDF("id", "k", "p"))
    val fB = oneParquet(s"$base/dB", Seq((3L, 3, 20)).toDF("id", "k", "p"))
    val fEq = oneParquet(s"$base/de", Seq(Tuple1(3)).toDF("k"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"k","required":false,"type":"int"},
        |{"id":3,"name":"p","required":false,"type":"int"}]}"""
        .stripMargin.replace("\n", "")
    val spec = """{"name":"p_part","transform":"identity","source-id":3,"field-id":1000}"""
    val partAvro =
      """{"name":"p_part","type":["null","int"],"default":null,"field-id":1000}"""
    writeFixture(base, schema, spec, Map.empty, partAvro, Seq(
      FixtureEntry(fA, 2L, 1L, 0, Map("p_part" -> 10)),
      FixtureEntry(fB, 1L, 1L, 0, Map("p_part" -> 20)),
      FixtureEntry(fEq, 1L, 2L, 2, Map("p_part" -> 10), eqIds = Seq(2))))
    val target = s"$base/imported"
    IcebergImport.importTable(spark, base, target)
    // the scope narrowed on the SOURCE column p: k=3 deletes in p=10 only,
    // and the table reads (a delete keyed on 'p_part' would throw here)
    assert(rowsOf(Snapshots.read(spark, target)) == Set("2|4|10", "3|3|20"))
  }

  test("duplicate manifest entries: byte-identical dupes collapse to one " +
      "served copy; same-path entries that disagree refuse loudly") {
    val base = Files.createTempDirectory("graft_imp_dup").toString
    import spark.implicits._
    val f1 = oneParquet(s"$base/d", Seq((1L, 1), (2L, 2)).toDF("id", "k"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"k","required":false,"type":"int"}]}"""
        .stripMargin.replace("\n", "")
    writeFixture(base, schema, "", Map.empty, "", Seq(
      FixtureEntry(f1, 2L, 1L, 0),
      FixtureEntry(f1, 2L, 1L, 0))) // identical duplicate
    val target = s"$base/imported"
    IcebergImport.importTable(spark, base, target)
    assert(GeoTable.read(spark, target).count() == 2L,
      "an identical duplicate entry must not serve the file's rows twice")

    val b2 = Files.createTempDirectory("graft_imp_dup2").toString
    val f2 = oneParquet(s"$b2/d", Seq((1L, 1), (2L, 2)).toDF("id", "k"))
    writeFixture(b2, schema, "", Map.empty, "", Seq(
      FixtureEntry(f2, 2L, 1L, 0),
      FixtureEntry(f2, 2L, 3L, 0))) // same path, conflicting sequence
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(spark, b2, s"$b2/t")
    }
    assert(e.getMessage.contains("multiple manifest entries"), e.getMessage)
  }

  test("metrics-suppressed partition-source column: absent from bounds/null " +
      "keys but physically in the files — one footer pass classifies it " +
      "in-file instead of spuriously refusing") {
    val base = Files.createTempDirectory("graft_imp_nometrics").toString
    import spark.implicits._
    // p IS in the file, but the manifest bounds cover only id (metrics
    // mode none for p); files are NOT hive-laid-out, so dir verification
    // cannot rescue the old classification
    val f1 = oneParquet(s"$base/d", Seq((1L, 10), (2L, 20)).toDF("id", "p"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"p","required":false,"type":"int"}]}"""
        .stripMargin.replace("\n", "")
    val spec = """{"name":"p","transform":"identity","source-id":2,"field-id":1000}"""
    val partAvro =
      """{"name":"p","type":["null","int"],"default":null,"field-id":1000}"""
    def le8(v: Long) = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    writeFixture(base, schema, spec, Map.empty, partAvro, Seq(
      FixtureEntry(f1, 2L, 1L, 0, Map("p" -> 10),
        lower = Map(1 -> le8(1L)), upper = Map(1 -> le8(2L)),
        nullCounts = Map(1 -> 0L))))
    val target = s"$base/imported"
    IcebergImport.importTable(spark, base, target)
    // in-file classification: ordinary column, values from the files
    assert(GeoTable.readPartitionCols(target).isEmpty)
    assert(rowsOf(GeoTable.read(spark, target)) == Set("1|10", "2|20"))
  }

  test("delete-file rewrite batches: many source delete files import as " +
      "one pos file and one eq file per (columns, sequence) group") {
    val base = Files.createTempDirectory("graft_imp_batch").toString
    import spark.implicits._
    val fA = oneParquet(s"$base/dA",
      Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4), (5L, 5)).toDF("id", "k"))
    val fP1 = oneParquet(s"$base/p1", Seq((fA, 0L)).toDF("file_path", "pos"))
    val fP2 = oneParquet(s"$base/p2", Seq((fA, 2L)).toDF("file_path", "pos"))
    val fE1 = oneParquet(s"$base/e1", Seq(Tuple1(4)).toDF("k"))
    val fE2 = oneParquet(s"$base/e2", Seq(Tuple1(99)).toDF("k"))
    val fE3 = oneParquet(s"$base/e3", Seq(Tuple1(5)).toDF("k"))
    val schema =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"k","required":false,"type":"int"}]}"""
        .stripMargin.replace("\n", "")
    writeFixture(base, schema, "", Map.empty, "", Seq(
      FixtureEntry(fA, 5L, 1L, 0),
      FixtureEntry(fP1, 1L, 4L, 1),
      FixtureEntry(fP2, 1L, 4L, 1),
      FixtureEntry(fE1, 1L, 2L, 2, eqIds = Seq(2)),
      FixtureEntry(fE2, 1L, 2L, 2, eqIds = Seq(2)), // same (cols, seq) → merges
      FixtureEntry(fE3, 1L, 1L, 2, eqIds = Seq(2)))) // seq 1 ≯ 1: inert, own file
    val target = s"$base/imported"
    IcebergImport.importTable(spark, base, target)
    assert(Snapshots.readPosDeletes(target).size == 1,
      "all position-delete sources must union into ONE rewritten file")
    assert(Snapshots.readEqDeletes(target).size == 2,
      "equality deletes sharing (columns, sequence) must merge")
    assert(rowsOf(Snapshots.read(spark, target)) == Set("2|2", "5|5"),
      "pos deletes drop positions 0,2 (ids 1,3); merged eq seq-2 drops k=4; " +
        "the seq-1 eq delete must NOT apply to the seq-1 data file " +
        "(strictly-older scoping), so (5,5) survives")
  }

  test("snapshot history + refs cross the boundary: 3-deep history, a " +
      "branch and a tag survive export → import; time travel works on the " +
      "imported table") {
    val base = Files.createTempDirectory("graft_imp_hist").toString
    val tbl = s"$base/src"
    spark.range(10).selectExpr("id", "id * 2 AS y").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl) // v1
    Snapshots.append(spark.range(10, 20).selectExpr("id", "id * 2 AS y"), tbl) // v2
    Snapshots.createTag(tbl, "t_old", Some(1))
    Snapshots.createBranch(tbl, "b_mid", Some(2))
    Snapshots.append(spark.range(20, 30).selectExpr("id", "id * 2 AS y"), tbl) // v3
    IcebergExport.export(spark, tbl)

    // the exported metadata carries the chain + refs
    val hint = new String(Files.readAllBytes(
      Paths.get(tbl, "metadata", "version-hint.text")), "UTF-8").trim
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(tbl, "metadata", s"v$hint.metadata.json")), "UTF-8")
    assert("\"snapshot-id\":".r.findAllIn(metaTxt).size >= 3, metaTxt.take(400))
    assert(metaTxt.contains("\"t_old\"") && metaTxt.contains("\"b_mid\""))

    val target = s"$base/imported"
    IcebergImport.importTable(spark, tbl, target)
    // 3 graft versions chain along main
    val anc = Snapshots.ancestry(target, Snapshots.mainVersion(target))
    assert(anc.size == 3, s"3-deep history must import: $anc")
    assert(GeoTable.read(spark, target).count() == 30L)
    assert(Snapshots.read(spark, target, Some(anc.head)).count() == 10L,
      "time travel to the oldest imported snapshot")
    assert(Snapshots.read(spark, target, Some(anc(1))).count() == 20L)
    // refs adopted onto their snapshots' graft versions
    val (brs, tgs) = Snapshots.readRefs(target)
    assert(tgs.get("t_old").contains(anc.head), s"tag must adopt: $tgs")
    assert(brs.get("b_mid").contains(anc(1)), s"branch must adopt: $brs")
    assert(Snapshots.read(spark, target, Some(tgs("t_old"))).count() == 10L)
    // exported snapshot summaries label history honestly (append chain)
    assert("\"operation\":\"append\"".r.findAllIn(metaTxt).size == 3, metaTxt.take(400))
  }

  test("history round-trip WITH MoR deletes: per-version rows survive the " +
      "boundary — sequence scoping stays intact on the imported chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val base = Files.createTempDirectory("graft_imp_histdel").toString
    val tbl = s"$base/src"
    spark.range(20).selectExpr("id", "id % 5 AS k").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl) // v1: 20 rows
    Snapshots.deleteByEquality(spark, tbl, Seq(2L).toDF("k")) // v2: -4 (k=2)
    Snapshots.append(
      spark.range(100, 104).selectExpr("id", "id % 5 AS k"), tbl) // v3: +4, k=2 exempt
    val pos0 = spark.read.parquet(tbl)
      .select(expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") === 0L).drop("id")
    Snapshots.deleteByPosition(spark, tbl, pos0) // v4: -1
    IcebergExport.export(spark, tbl)

    val target = s"$base/imported"
    IcebergImport.importTable(spark, tbl, target)
    val srcAnc = Snapshots.ancestry(tbl, Snapshots.mainVersion(tbl))
    val anc = Snapshots.ancestry(target, Snapshots.mainVersion(target))
    assert(anc.size == srcAnc.size, s"full chain must import: $anc vs $srcAnc")
    // every source version's MoR-complete row set survives at the
    // corresponding imported version (delete state scoped per snapshot)
    srcAnc.zip(anc).foreach { case (sv, tv) =>
      assert(rowsOf(Snapshots.read(spark, target, Some(tv))) ==
        rowsOf(Snapshots.read(spark, tbl, Some(sv))),
        s"source v$sv and imported v$tv must serve identical rows")
    }
    assert(Snapshots.read(spark, target, Some(anc.head)).count() == 20L)
    assert(Snapshots.read(spark, target, Some(anc.last)).count() == 19L)
    // delete rewrites are HISTORY-SHARED: the one eq delete rides three
    // snapshots but rewrites ONCE; pos bundles are per-snapshot
    val delDir = Paths.get(target, "_graft_deletes")
    val eqFiles = Files.list(delDir).toArray.map(_.toString)
      .filter(_.contains("eqdel"))
    assert(eqFiles.length == 1,
      s"the carried eq delete must rewrite once across the chain: ${eqFiles.toSeq}")
  }

  test("history with a ROLLBACK round-trips: the rolled-back snapshot's " +
      "rows serve at its imported version (addedV stamps are not " +
      "monotonic along such an ancestry — rank mapping must still hold)") {
    val base = Files.createTempDirectory("graft_imp_rb").toString
    val tbl = s"$base/src"
    spark.range(10).selectExpr("id").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl) // v1: 10 rows
    Snapshots.append(spark.range(10, 25).selectExpr("id"), tbl) // v2: 25 rows
    Snapshots.rollback(spark, tbl, 1) // v3: back to 10 rows
    Snapshots.append(spark.range(100, 105).selectExpr("id"), tbl) // v4: 15 rows
    IcebergExport.export(spark, tbl)
    val target = s"$base/imported"
    IcebergImport.importTable(spark, tbl, target)
    val srcAnc = Snapshots.ancestry(tbl, Snapshots.mainVersion(tbl))
    val anc = Snapshots.ancestry(target, Snapshots.mainVersion(target))
    assert(anc.size == srcAnc.size, s"$anc vs $srcAnc")
    srcAnc.zip(anc).foreach { case (sv, tv) =>
      assert(rowsOf(Snapshots.read(spark, target, Some(tv))) ==
        rowsOf(Snapshots.read(spark, tbl, Some(sv))),
        s"source v$sv and imported v$tv must serve identical rows")
    }
    assert(GeoTable.read(spark, target).count() == 15L)
  }

  test("a ref outside the importable ancestry refuses LOUDLY; " +
      "ignore_refs => true drops it with a warning (SQL surface)") {
    val base = Files.createTempDirectory("graft_imp_ghostref").toString
    val tbl = s"$base/src"
    spark.range(5).selectExpr("id").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl)
    IcebergExport.export(spark, tbl)
    // graft a ghost ref pointing outside the exported ancestry
    val hint = new String(Files.readAllBytes(
      Paths.get(tbl, "metadata", "version-hint.text")), "UTF-8").trim
    val mf = Paths.get(tbl, "metadata", s"v$hint.metadata.json")
    val txt = new String(Files.readAllBytes(mf), "UTF-8")
    Files.write(mf, txt.replaceFirst("\"refs\":\\{",
      """"refs":{"ghost":{"snapshot-id":999,"type":"tag"},""").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(spark, tbl, s"$base/t1")
    }
    assert(e.getMessage.contains("ghost") && e.getMessage.contains("ignore_refs"),
      e.getMessage)
    val t2 = s"$base/t2"
    spark.sql(s"CALL graft.system.register_iceberg_table('$tbl', " +
      s"target => '$t2', ignore_refs => true)").collect()
    assert(GeoTable.read(spark, t2).count() == 5L)
    val (brs, tgs) = Snapshots.readRefs(t2)
    assert(!brs.contains("ghost") && !tgs.contains("ghost"))
  }

  test("a current-snapshot-id missing from snapshots[] refuses (corrupt " +
      "metadata must not import as an empty table)") {
    val base = Files.createTempDirectory("graft_imp_corrupt").toString
    val tbl = s"$base/src"
    spark.range(5).selectExpr("id").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl)
    IcebergExport.export(spark, tbl)
    val hint = new String(Files.readAllBytes(
      Paths.get(tbl, "metadata", "version-hint.text")), "UTF-8").trim
    val mf = Paths.get(tbl, "metadata", s"v$hint.metadata.json")
    val txt = new String(Files.readAllBytes(mf), "UTF-8")
    Files.write(mf, txt.replace("\"current-snapshot-id\":1",
      "\"current-snapshot-id\":424242").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(spark, tbl, s"$base/t")
    }
    assert(e.getMessage.contains("corrupt"), e.getMessage)
  }

  test("the SQL procedure surface: CALL register_iceberg_table imports and " +
      "the imported table answers SQL") {
    val base = Files.createTempDirectory("graft_imp_sql").toString
    val tbl = s"$base/src"
    spark.range(25).selectExpr("id", "id * 2 AS y").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl)
    IcebergExport.export(spark, tbl)
    val target = s"$base/imported"
    val out = spark.sql(s"CALL graft.system.register_iceberg_table('$tbl', " +
      s"target => '$target')").collect().head
    assert(out.getString(1) == s"target=$target")
    assert(GeoTable.read(spark, target).count() == 25L)
  }

  test("a data file re-registered in a LATER snapshot at a different " +
      "sequence number imports: the conflicting-entry check is scoped per " +
      "snapshot, not over the union of the chain (removed by an overwrite, " +
      "then re-added via add_files — each snapshot is self-consistent)") {
    val base = Files.createTempDirectory("graft_imp_rereg").toString
    val tbl = s"$base/src"
    spark.range(10).selectExpr("id").write.parquet(tbl)
    GeoTable.writeManifest(spark, tbl) // v1: files A
    // v2: full overwrite — A's files drop from the head but stay on disk
    Snapshots.overwrite(spark.range(100, 105).selectExpr("id"), tbl)
    val (_, nAdded) = Snapshots.addFiles(spark, tbl) // v3: A re-registered
    assert(nAdded > 0, "fixture must re-register the overwritten files")
    IcebergExport.export(spark, tbl)
    val target = s"$base/imported"
    IcebergImport.importTable(spark, tbl, target)
    val srcAnc = Snapshots.ancestry(tbl, Snapshots.mainVersion(tbl))
    val anc = Snapshots.ancestry(target, Snapshots.mainVersion(target))
    assert(anc.size == srcAnc.size, s"$anc vs $srcAnc")
    srcAnc.zip(anc).foreach { case (sv, tv) =>
      assert(rowsOf(Snapshots.read(spark, tbl, Some(sv))) ==
        rowsOf(Snapshots.read(spark, target, Some(tv))),
        s"source v$sv and imported v$tv must serve identical rows")
    }
    assert(GeoTable.read(spark, target).count() == 15L)
  }
}
