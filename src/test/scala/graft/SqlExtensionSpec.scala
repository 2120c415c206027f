package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoCodec
import graft.spatial.{GeometryFields, GeoTable, Snapshots}

/** SQL-only exercise of the parser extension: `ALTER TABLE … SET GEOMETRY
  * FIELDS` and `CALL graft.system.*` (the reference's
  * `IcebergSqlExtensions.g4` surface), end-to-end through spark.sql().
  */
class SqlExtensionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkTable(n: Int): String = {
    graft.spatial.Geo.install(spark)
    val dir = Files.createTempDirectory("graft_sql").toString
    val rows = (0 until n).map { i =>
      Row(i.toLong, GeoCodec.writeWkb(GeoCodec.point(i % 50 + 1.0, i % 40 + 1.0)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("geom", BinaryType))))
    GeoTable.write(df, dir, "geom", res = 8, numFiles = 2)
    dir
  }

  test("ALTER TABLE ... SET GEOMETRY FIELDS promotes and demotes via SQL") {
    val dir = mkTable(20)
    spark.sql(s"ALTER TABLE '$dir' SET GEOMETRY FIELDS geom AS 'wkb'")
    assert(GeometryFields.get(dir) == Map("geom" -> "wkb"))
    // demote
    spark.sql(s"ALTER TABLE '$dir' SET GEOMETRY FIELDS geom AS 'none'")
    assert(GeometryFields.get(dir).isEmpty)
    // physical-type mismatch rejected (binary column can't be wkt)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE '$dir' SET GEOMETRY FIELDS geom AS 'wkt'")
    }
    // unknown statements still parse through the delegate
    assert(spark.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) == 2)
  }

  test("CALL rollback_to_snapshot / set_current_snapshot round-trip") {
    val dir = mkTable(30)
    Snapshots.append(Snapshots.read(spark, dir).limit(5), dir)
    assert(Snapshots.read(spark, dir).count() == 35)
    val out = spark.sql(s"CALL graft.system.rollback_to_snapshot('$dir', 1)").collect()
    assert(out.head.getLong(0) == 3L) // new version
    assert(Snapshots.read(spark, dir).count() == 30)
    spark.sql(s"CALL graft.system.set_current_snapshot(table => '$dir', version => 2)")
    assert(Snapshots.read(spark, dir).count() == 35)
  }

  test("CALL rewrite_data_files + expire_snapshots maintain the table") {
    val dir = mkTable(40)
    Snapshots.append(Snapshots.read(spark, dir), dir) // double it
    val before = Snapshots.readManifest(dir).size
    val v = spark.sql(
      s"CALL graft.system.rewrite_data_files('$dir', 'geom', 2, resolution => 8)")
      .collect().head.getLong(0)
    assert(Snapshots.readManifest(dir).size == 2 && before > 2)
    assert(Snapshots.read(spark, dir).count() == 80)
    val deleted = spark.sql(s"CALL graft.system.expire_snapshots('$dir', 1)")
      .collect().head.getLong(0)
    assert(deleted > 0, "expire must drop the pre-compaction files")
    assert(Snapshots.read(spark, dir).count() == 80)
    assert(Snapshots.currentVersion(dir) == v)
  }

  test("CALL rewrite_data_files strategy surface: binpack, sort, where, target size") {
    // 4000-row base files vs 2-row appends: the size gap must beat parquet
    // per-file metadata overhead for the 0.75× small-file threshold to bite
    val dir = mkTable(4000)
    (0 until 3).foreach(_ => Snapshots.append(Snapshots.read(spark, dir).limit(2), dir))
    val before = Snapshots.readManifest(dir)
    val target = before.map(_.sizeBytes).max
    // binpack via named args: small appends merge, the detail row reports the count
    val out = spark.sql(s"CALL graft.system.rewrite_data_files('$dir', " +
      s"strategy => 'binpack', target_file_size => $target)").collect().head
    assert(out.getString(1) == "rewritten_files=3")
    assert(Snapshots.readManifest(dir).size < before.size)
    assert(Snapshots.read(spark, dir).count() == 4006)
    // sort strategy with a where filter parses and preserves rows
    spark.sql(s"CALL graft.system.rewrite_data_files('$dir', " +
      s"sort_order => 'id desc', where => 'id >= 0', target_file_size => $target)")
    assert(Snapshots.read(spark, dir).count() == 4006)
    // hilbert sort_order routes to the spatial rewrite
    spark.sql(s"CALL graft.system.rewrite_data_files('$dir', " +
      s"sort_order => 'hilbert(geom, 8)', num_files => 2)")
    assert(Snapshots.readManifest(dir).size == 2)
    assert(Snapshots.read(spark, dir).count() == 4006)
  }

  test("CALL cherrypick_snapshot re-applies an append; add_files registers strays") {
    val dir = mkTable(20)
    Snapshots.append(Snapshots.read(spark, dir).limit(3), dir) // v2: +3
    spark.sql(s"CALL graft.system.rollback_to_snapshot('$dir', 1)") // v3 = v1
    assert(Snapshots.read(spark, dir).count() == 20)
    spark.sql(s"CALL graft.system.cherrypick_snapshot('$dir', 2)")
    assert(Snapshots.read(spark, dir).count() == 23)
    // cherry-picking a non-append (the rollback removed files vs its parent) fails
    intercept[Exception] {
      spark.sql(s"CALL graft.system.cherrypick_snapshot('$dir', 3)")
    }
    // add_files: drop a stray parquet into the dir, register it
    val stray = Snapshots.read(spark, dir).limit(2).drop("geom_bbox")
    GeoTable.withBbox(stray, "geom").coalesce(1).write.mode("append").parquet(dir)
    val added = spark.sql(s"CALL graft.system.add_files('$dir')").collect().head.getLong(0)
    assert(added >= 1)
    assert(Snapshots.read(spark, dir).count() == 25)
  }

  test("CALL create_changelog_view exposes row-level diffs to SQL") {
    val dir = mkTable(25)
    Snapshots.append(Snapshots.read(spark, dir).limit(4), dir)
    spark.sql(
      s"CALL graft.system.create_changelog_view('$dir', 1, 2, 'cdc_v12')")
    val counts = spark.sql(
      "SELECT _change_type, count(*) AS n FROM cdc_v12 GROUP BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("insert" -> 4L))
  }

  test("CALL rollback_to_timestamp picks the right snapshot by commit time") {
    val dir = mkTable(10)
    Thread.sleep(1100) // manifest mtime granularity
    val t1 = System.currentTimeMillis()
    Snapshots.append(Snapshots.read(spark, dir).limit(2), dir)
    assert(Snapshots.read(spark, dir).count() == 12)
    val v = spark.sql(s"CALL graft.system.rollback_to_timestamp('$dir', $t1)")
      .collect().head.getLong(0)
    assert(v == 3L)
    assert(Snapshots.read(spark, dir).count() == 10)
  }

  test("branches and tags: isolated branch appends, fixed tags, SQL DDL") {
    val dir = mkTable(30) // v1, main -> 1
    spark.sql(s"ALTER TABLE '$dir' CREATE TAG v1_release")
    spark.sql(s"ALTER TABLE '$dir' CREATE BRANCH dev")
    // branch append: main is isolated
    Snapshots.appendToBranch(
      GeoTable.withBbox(Snapshots.read(spark, dir).limit(5).drop("geom_bbox"), "geom"),
      dir, "dev")
    assert(Snapshots.read(spark, dir).count() == 30) // main untouched
    assert(Snapshots.readRef(spark, dir, "dev").count() == 35)
    assert(Snapshots.readRef(spark, dir, "v1_release").count() == 30)
    // main append: dev is isolated
    Snapshots.append(
      GeoTable.withBbox(Snapshots.read(spark, dir).limit(2).drop("geom_bbox"), "geom"), dir)
    assert(Snapshots.read(spark, dir).count() == 32)
    assert(Snapshots.readRef(spark, dir, "dev").count() == 35)
    // read refs through the format
    assert(spark.read.format("graft").option("branch", "dev").load(dir).count() == 35)
    assert(spark.read.format("graft").option("tag", "v1_release").load(dir).count() == 30)
    // fast-forward main onto dev's head
    val devV = Snapshots.resolveRef(dir, "dev")
    spark.sql(s"CALL graft.system.fast_forward('$dir', 'main', $devV)")
    assert(Snapshots.read(spark, dir).count() == 35)
    // expire keeps every ref target alive
    Snapshots.expireSnapshots(spark, dir, keep = 1)
    assert(Snapshots.readRef(spark, dir, "v1_release").count() == 30)
    // duplicate / drop
    intercept[Exception] { spark.sql(s"ALTER TABLE '$dir' CREATE BRANCH dev") }
    spark.sql(s"ALTER TABLE '$dir' DROP BRANCH dev")
    intercept[Exception] { Snapshots.readRef(spark, dir, "dev") }
    spark.sql(s"ALTER TABLE '$dir' DROP TAG v1_release")
    intercept[Exception] { spark.sql(s"ALTER TABLE '$dir' DROP BRANCH main") }
  }

  test("stored views resolve against the current snapshot") {
    val dir = mkTable(30)
    spark.sql(s"CALL graft.system.create_view('$dir', 'big_ids', " +
      "'SELECT id FROM graft_table WHERE id >= 20')")
    assert(graft.spatial.Views.read(spark, dir, "big_ids").count() == 10)
    // views track the table head: a CoW delete shrinks the view
    Snapshots.delete(spark, dir, col("id") >= 25)
    assert(graft.spatial.Views.read(spark, dir, "big_ids").count() == 5)
    // resolve_views registers temp views for plain SQL
    spark.sql(s"CALL graft.system.resolve_views('$dir')")
    assert(spark.sql("SELECT count(*) FROM big_ids").collect().head.getLong(0) == 5L)
    // invalid SQL is rejected at creation
    intercept[Exception] {
      spark.sql(s"CALL graft.system.create_view('$dir', 'bad', 'SELECT no_col FROM graft_table')")
    }
    spark.sql(s"CALL graft.system.drop_view('$dir', 'big_ids')")
    intercept[Exception] { graft.spatial.Views.read(spark, dir, "big_ids") }
    // MULTI-LINE view SQL survives the sidecar round trip (raw control
    // chars in a JSON string would brick every later read of the file)
    graft.spatial.Views.createOrReplace(spark, dir, "ml",
      "SELECT id\nFROM graft_table\n\tWHERE id < 5")
    assert(graft.spatial.Views.read(spark, dir, "ml").count() == 5)
    assert(graft.spatial.Views.list(dir)("ml").contains("\n"))
  }

  test("CALL argument hygiene: out-of-range integers error loudly; " +
      "doubled quotes unescape; view bodies with apostrophes work") {
    val dir = mkTable(10)
    // an epoch-millis timestamp passed positionally where a small int is
    // expected (the reference's expire_snapshots older_than convention)
    // must ERROR — silent Long→Int truncation once wrapped it into a
    // garbage negative keep that expired the whole history
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.expire_snapshots('$dir', 1700000000000)")
    }
    assert(e.getMessage.contains("out of range"), e.getMessage)
    assert(Snapshots.read(spark, dir).count() == 10, "nothing may be expired")
    intercept[Exception] {
      spark.sql(s"CALL graft.system.expire_snapshots('$dir', keep => 0)")
    }
    // SQL-escaped quotes inside CALL string args: '' = one quote
    spark.sql(s"CALL graft.system.create_view('$dir', 'q', " +
      "'SELECT id, ''x'' AS tag FROM graft_table WHERE id < 3')")
    val v = graft.spatial.Views.read(spark, dir, "q")
    assert(v.count() == 3 && v.where("tag = 'x'").count() == 3)
  }

  test("UPDATE splits SET/WHERE outside string literals") {
    val dir = Files.createTempDirectory("graft_qsplit").toString + "/tbl"
    spark.range(5).selectExpr("id", "'raw' AS v").coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    // the literal contains ' WHERE ' — a naive first-WHERE split would
    // break inside it
    spark.sql(s"UPDATE '$dir' SET v = 'a WHERE b' WHERE id = 1")
    val t = Snapshots.read(spark, dir)
    assert(t.where("id = 1 AND v = 'a WHERE b'").count() == 1)
    assert(t.where("v = 'raw'").count() == 4)
    // UPDATE without WHERE hits every row (standard SQL)
    spark.sql(s"UPDATE '$dir' SET v = 'all'")
    assert(Snapshots.read(spark, dir).where("v = 'all'").count() == 5)
    // backslash-escaped quote inside the literal (Spark's default
    // non-ANSI escaping) must not toggle the quote scan off
    spark.sql(s"UPDATE '$dir' SET v = 'a\\' WHERE b' WHERE id = 2")
    assert(Snapshots.read(spark, dir).where("id = 2").collect()
      .head.getString(1) == "a' WHERE b")
  }

  test("DML clause splitting is paren- and quote-aware: function-call " +
      "commas, WHEN inside literals, phantom tables refused") {
    val dir = Files.createTempDirectory("graft_psplit").toString + "/tbl"
    spark.range(5).selectExpr("id", "id AS a", "'raw' AS v")
      .coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    // a comma INSIDE a function call must not split the SET list
    spark.sql(s"UPDATE '$dir' SET a = coalesce(NULL, 100), v = 'x' WHERE id = 1")
    val t1 = Snapshots.read(spark, dir)
    assert(t1.where("id = 1 AND a = 100 AND v = 'x'").count() == 1)
    // MERGE: function calls in UPDATE SET, a multi-arg INSERT VALUES,
    // and a string literal containing ' WHEN ' in an action
    spark.range(7).selectExpr("id AS sid", "id * 2 AS sa")
      .createOrReplaceTempView("psplit_src")
    spark.sql(
      s"""MERGE INTO '$dir' t USING (SELECT * FROM psplit_src) s ON t.id = s.sid
         |WHEN MATCHED AND s.sid = 3 THEN UPDATE SET a = greatest(t.a, s.sa),
         |  v = 'got WHEN here'
         |WHEN NOT MATCHED THEN INSERT (id, a, v) VALUES (s.sid,
         |  coalesce(s.sa, 0), 'new')""".stripMargin)
    val t2 = Snapshots.read(spark, dir)
    assert(t2.where("id = 3 AND a = 6 AND v = 'got WHEN here'").count() == 1,
      t2.collect().mkString(","))
    assert(t2.where("id IN (5, 6) AND a = id * 2 AND v = 'new'").count() == 2)
    // a typo'd catalog identifier must NOT resolve to its would-be layout
    // path (DDL would materialize a phantom table there)
    val wh = Files.createTempDirectory("graft_phantom_wh").toString
    spark.conf.set("spark.sql.catalog.phcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.phcat.warehouse", wh)
    intercept[Exception] {
      spark.sql("ALTER TABLE phcat.db.nosuch WRITE ORDERED BY id")
    }
    assert(!new java.io.File(wh, "db/nosuch").exists(),
      "a typo'd ALTER must not materialize a phantom table")
    // SET GEOMETRY FIELDS resolves catalog identifiers like every other
    // table DDL (it used to treat them as literal filesystem paths)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS phcat.db")
    spark.sql("CREATE TABLE phcat.db.g (id BIGINT, geom BINARY)")
    spark.sql("ALTER TABLE phcat.db.g SET GEOMETRY FIELDS geom AS 'wkb'")
    assert(graft.spatial.GeometryFields.get(s"$wh/db/g").contains("geom"),
      "the declaration must land on the catalog table's warehouse path")
  }

  test("DROP VIEW removes only the view definition, never nested tables") {
    val wh = Files.createTempDirectory("graft_dv_wh").toString
    spark.conf.set("spark.sql.catalog.dvcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvcat.ns")
    spark.sql("CREATE VIEW dvcat.ns.v AS SELECT 1 AS one")
    // a TABLE whose namespace nests under the view's directory (namespaces
    // are implicit directories, so this layout is legal)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvcat.ns.v")
    spark.sql("CREATE TABLE dvcat.ns.v.t (id BIGINT)")
    spark.sql("INSERT INTO dvcat.ns.v.t SELECT id FROM range(4)")
    spark.sql("DROP VIEW dvcat.ns.v")
    intercept[Exception] { spark.sql("SELECT * FROM dvcat.ns.v").collect() }
    assert(spark.table("dvcat.ns.v.t").count() == 4,
      "dropping the view must not delete the nested table's data")
  }

  test("UPDATE and MERGE assign NESTED struct fields by dot path " +
      "(and MERGE accepts alias-qualified SET keys)") {
    val dir = Files.createTempDirectory("graft_nested_dml").toString + "/tbl"
    spark.range(10).selectExpr("id",
        "named_struct('x', CAST(id AS DOUBLE), 'y', 0D) AS pt", "'raw' AS tag")
      .coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    // CoW UPDATE: one nested field + one top-level column, others untouched
    spark.sql(s"UPDATE '$dir' SET pt.x = pt.x + 100, tag = 'u' WHERE id < 3")
    val t = Snapshots.read(spark, dir)
    assert(t.where("id < 3 AND pt.x = id + 100 AND pt.y = 0 AND tag = 'u'").count() == 3)
    assert(t.where("id >= 3 AND pt.x = id AND tag = 'raw'").count() == 7)
    // full MERGE: nested SET through the target alias
    spark.range(2, 5).selectExpr("id", "CAST(id * 10 AS DOUBLE) AS v")
      .createOrReplaceTempView("ndml_src")
    spark.sql(
      s"""MERGE INTO '$dir' t USING (SELECT * FROM ndml_src) s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET t.pt.y = s.v, t.tag = 'm'""".stripMargin)
    val t2 = Snapshots.read(spark, dir)
    assert(t2.where("id IN (2, 3, 4) AND pt.y = id * 10 AND tag = 'm'").count() == 3)
    // the matched rows keep their pt.x from the earlier UPDATE
    assert(t2.where("id = 2 AND pt.x = 102").count() == 1)
    assert(t2.where("id >= 5 AND pt.y = 0").count() == 5)
    // MoR UPDATE takes the same path
    Snapshots.updateProperties(dir, Map("write.update.mode" -> "merge-on-read"))
    spark.sql(s"UPDATE '$dir' SET pt.y = -1 WHERE id = 7")
    val t3 = Snapshots.read(spark, dir)
    assert(t3.where("id = 7 AND pt.y = -1 AND pt.x = 7").count() == 1)
    assert(t3.count() == 10)
    // a dotted path with no such top-level column fails loudly
    val e = intercept[Exception] {
      spark.sql(s"UPDATE '$dir' SET ghost.x = 1 WHERE id = 0")
    }
    assert(e.getMessage.contains("ghost"), e.getMessage)
  }

  test("row-level DML statements on path tables: DELETE / UPDATE / MERGE") {
    val dir = mkTable(30)
    // DELETE FROM (copy-on-write)
    spark.sql(s"DELETE FROM '$dir' WHERE id < 5")
    assert(Snapshots.read(spark, dir).count() == 25)
    // UPDATE ... SET ... WHERE
    spark.sql(s"UPDATE '$dir' SET id = id + 1000 WHERE id >= 25 AND id < 28")
    val t = Snapshots.read(spark, dir)
    assert(t.count() == 25)
    assert(t.filter(col("id").between(1025, 1027)).count() == 3)
    // MERGE INTO ... USING (query) ON key: update 2 rows + insert 1
    Snapshots.read(spark, dir).filter(col("id").isin(5L, 6L))
      .withColumn("id", col("id") + 500)
      .unionByName(Snapshots.read(spark, dir).filter(col("id") === 7L)
        .withColumn("id", lit(9999L)))
      .createOrReplaceTempView("merge_src")
    spark.sql(s"MERGE INTO '$dir' USING (SELECT * FROM merge_src) ON id")
    val t2 = Snapshots.read(spark, dir)
    assert(t2.count() == 28) // 25 + 3 inserts (505, 506, 9999 are new keys)
    assert(t2.filter(col("id").isin(505L, 506L, 9999L)).count() == 3)
    // catalog-table DML still parses through the delegate (plan analysis
    // fails on the unknown table, not in the parser)
    val e = intercept[Exception] { spark.sql("DELETE FROM no_such_table WHERE x = 1") }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("not found"))
  }

  test("full MERGE: multi-key ON, matched UPDATE/DELETE, not-matched INSERT") {
    val dir = mkTable(30)
    // source: keys 10..14 (match) + 100,101 (new); key = (id)
    spark.range(10, 15).toDF("sid").withColumn("bump", lit(1L))
      .unionByName(spark.range(100, 102).toDF("sid").withColumn("bump", lit(0L)))
      .createOrReplaceTempView("m_src")
    // matched & sid < 12 → DELETE; other matched → UPDATE id; unmatched → INSERT
    val v = spark.sql(
      s"""MERGE INTO '$dir' USING (SELECT * FROM m_src) ON t.id = s.sid
         |WHEN MATCHED AND s.sid < 12 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET id = t.id + 2000
         |WHEN NOT MATCHED THEN INSERT (id) VALUES (s.sid)""".stripMargin)
      .collect().head.getLong(0)
    val t = Snapshots.read(spark, dir)
    assert(t.count() == 30 - 2 /*deleted 10,11*/ + 2 /*inserted*/)
    assert(t.filter(col("id").isin(10L, 11L)).count() == 0, "delete-on-match")
    assert(t.filter(col("id").isin(2012L, 2013L, 2014L)).count() == 3, "update-on-match")
    assert(t.filter(col("id").isin(100L, 101L)).count() == 2, "insert-on-miss")
    // inserted rows carry null for unsupplied columns
    assert(t.filter(col("id") === 100L && col("geom").isNull).count() == 1)
    assert(v == Snapshots.mainVersion(dir).toLong)
    // clause order matters: first matching clause wins
    spark.range(2012, 2013).toDF("sid").createOrReplaceTempView("m_src2")
    spark.sql(
      s"""MERGE INTO '$dir' USING (SELECT * FROM m_src2) ON t.id = s.sid
         |WHEN MATCHED AND s.sid = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET id = 4444""".stripMargin)
    assert(Snapshots.read(spark, dir).filter(col("id") === 4444L).count() == 1)
    // INSERT * maps source columns by name
    val dir2 = mkTable(5)
    spark.sql(s"SELECT CAST(77 AS BIGINT) AS id, CAST(NULL AS BINARY) AS geom")
      .createOrReplaceTempView("m_src3")
    spark.sql(
      s"""MERGE INTO '$dir2' USING (SELECT * FROM m_src3) ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(Snapshots.read(spark, dir2).filter(col("id") === 77L).count() == 1)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: mirror-sync on CoW and MoR") {
    for (mor <- Seq(false, true)) {
      val dir = mkTable(10) // ids 0..9
      if (mor) Snapshots.updateProperties(dir, Map("write.merge.mode" -> "merge-on-read"))
      val before = Snapshots.readManifest(dir).map(_.path).toSet
      // the source has dropped ids 5..9; flag 8..9, delete the rest
      spark.range(0, 5).toDF("sid").createOrReplaceTempView("sync_src")
      spark.sql(
        s"""MERGE INTO '$dir' USING (SELECT * FROM sync_src) ON t.id = s.sid
           |WHEN MATCHED THEN UPDATE SET id = t.id + 100
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 8 THEN UPDATE SET id = t.id + 7000
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val t = Snapshots.read(spark, dir)
      assert(t.count() == 7, s"mor=$mor")
      assert(t.filter(col("id").isin(5L, 6L, 7L)).count() == 0, s"by-source delete (mor=$mor)")
      assert(t.filter(col("id").isin(7008L, 7009L)).count() == 2, s"by-source update (mor=$mor)")
      assert(t.filter(col("id").between(100L, 104L)).count() == 5, s"matched update (mor=$mor)")
      if (mor) assert(before.subsetOf(Snapshots.readManifest(dir).map(_.path).toSet),
        "MoR merge must keep every pre-existing data file")
    }
    // NOT MATCHED BY TARGET is the explicit spelling of plain NOT MATCHED
    val dir2 = mkTable(3)
    spark.range(2, 5).toDF("sid").createOrReplaceTempView("sync_src2")
    spark.sql(
      s"""MERGE INTO '$dir2' USING (SELECT * FROM sync_src2) ON t.id = s.sid
         |WHEN NOT MATCHED BY TARGET THEN INSERT (id) VALUES (s.sid)""".stripMargin)
    assert(Snapshots.read(spark, dir2).count() == 5)
    // invalid clause shapes are parse-time errors
    intercept[Exception] { // BY SOURCE can't INSERT
      spark.sql(s"""MERGE INTO '$dir2' USING (SELECT * FROM sync_src2) ON t.id = s.sid
                   |WHEN NOT MATCHED BY SOURCE THEN INSERT *""".stripMargin)
    }
    intercept[Exception] { // MATCHED takes no BY qualifier
      spark.sql(s"""MERGE INTO '$dir2' USING (SELECT * FROM sync_src2) ON t.id = s.sid
                   |WHEN MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
  }

  test("MERGE cardinality violation: multi-match + MATCHED clause raises; insert-only doesn't") {
    for (mor <- Seq(false, true)) {
      val dir = mkTable(10) // ids 0..9
      if (mor) Snapshots.updateProperties(dir, Map("write.merge.mode" -> "merge-on-read"))
      // two source rows hit target id=3
      spark.sql("SELECT * FROM VALUES (3L, 10L), (3L, 20L), (7L, 30L) AS v(sid, bump)")
        .createOrReplaceTempView("card_src")
      val before = Snapshots.read(spark, dir).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      val e = intercept[Exception] {
        spark.sql(s"""MERGE INTO '$dir' USING (SELECT * FROM card_src) ON t.id = s.sid
                     |WHEN MATCHED THEN UPDATE SET id = t.id + s.bump""".stripMargin)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => Option(c.getMessage).exists(
          _.contains("cardinality"))), s"mor=$mor: $e")
      // the failed MERGE must not have committed anything
      val after = Snapshots.read(spark, dir).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(after == before, s"mor=$mor: failed MERGE must leave the table untouched")
      // insert-only MERGE skips the check even with duplicate source keys
      spark.sql("SELECT * FROM VALUES (55L), (55L) AS v(sid)")
        .createOrReplaceTempView("card_src2")
      spark.sql(s"""MERGE INTO '$dir' USING (SELECT * FROM card_src2) ON t.id = s.sid
                   |WHEN NOT MATCHED THEN INSERT (id) VALUES (s.sid)""".stripMargin)
      assert(Snapshots.read(spark, dir).filter(col("id") === 55L).count() == 2,
        s"mor=$mor: insert-only merge admits duplicate source rows")
      // a unique-match MERGE with MATCHED clauses still works
      spark.sql("SELECT * FROM VALUES (4L, 100L) AS v(sid, bump)")
        .createOrReplaceTempView("card_src3")
      spark.sql(s"""MERGE INTO '$dir' USING (SELECT * FROM card_src3) ON t.id = s.sid
                   |WHEN MATCHED THEN UPDATE SET id = t.id + s.bump""".stripMargin)
      assert(Snapshots.read(spark, dir).filter(col("id") === 104L).count() == 1, s"mor=$mor")
    }
  }

  test("CALL rewrite_manifests / ancestors_of / snapshot / register_table") {
    val dir = mkTable(20)
    Snapshots.append(Snapshots.read(spark, dir).limit(3), dir)
    // rewrite_manifests: stats refresh, content unchanged, addedV preserved
    val before = Snapshots.readManifest(dir).map(f => f.path -> f.addedV).toMap
    val v = spark.sql(s"CALL graft.system.rewrite_manifests('$dir')")
      .collect().head.getLong(0)
    assert(v == 3L)
    assert(Snapshots.readManifest(dir).map(f => f.path -> f.addedV).toMap == before)
    assert(Snapshots.read(spark, dir).count() == 23)
    // ancestors_of: newest-first chain
    val anc = spark.sql(s"CALL graft.system.ancestors_of('$dir')").collect().head
    assert(anc.getLong(0) == 3L && anc.getString(1) == "3,2,1")
    // snapshot: zero-copy clone reads identically, evolves independently
    val clone = Files.createTempDirectory("graft_clone").toString + "/t"
    spark.sql(s"CALL graft.system.snapshot('$dir', target => '$clone')")
    assert(Snapshots.read(spark, clone).count() == 23)
    Snapshots.delete(spark, clone, col("id") < 3)
    assert(Snapshots.read(spark, clone).count() < 23)
    assert(Snapshots.read(spark, dir).count() == 23, "source unaffected by clone DML")
    // register_table: adopt a bare parquet directory
    val bare = Files.createTempDirectory("graft_bare").toString
    spark.range(12).toDF("id").write.mode("overwrite").parquet(bare)
    val rv = spark.sql(s"CALL graft.system.register_table('$bare')").collect().head.getLong(0)
    assert(rv == 1L)
    assert(Snapshots.read(spark, bare).count() == 12)
  }

  test("CALL rewrite_position_delete_files compacts pending pos deletes") {
    import spark.implicits._
    val dir = mkTable(30)
    def posFor(id: Long) = Snapshots.read(spark, dir)
      .select(expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") === id).drop("id")
    Snapshots.deleteByPosition(spark, dir, posFor(1))
    Snapshots.deleteByPosition(spark, dir, posFor(2))
    Snapshots.deleteByPosition(spark, dir, posFor(3))
    assert(Snapshots.readPosDeletes(dir).size == 3)
    assert(Snapshots.read(spark, dir).count() == 27)
    spark.sql(s"CALL graft.system.rewrite_position_delete_files('$dir')")
    assert(Snapshots.readPosDeletes(dir).size == 1)
    assert(Snapshots.read(spark, dir).count() == 27)
  }

  test("CALL remove_orphan_files deletes unreferenced data files behind the age guard") {
    val dir = mkTable(20)
    // stray file never registered in any snapshot
    Snapshots.read(spark, dir).limit(1).write.mode("append").parquet(dir)
    // default 3-day age guard: a FRESH unreferenced file is what a
    // concurrent writer's not-yet-published move looks like — never deleted
    val guarded = spark.sql(s"CALL graft.system.remove_orphan_files('$dir')")
      .collect().head.getLong(0)
    assert(guarded == 0L, "fresh orphans must survive the default age guard")
    // explicit cutoff past now disables the guard for the test
    val cutoff = System.currentTimeMillis() + 3600000
    val removed = spark.sql(
      s"CALL graft.system.remove_orphan_files('$dir', older_than => $cutoff)")
      .collect().head.getLong(0)
    assert(removed == 1L)
    assert(Snapshots.read(spark, dir).count() == 20)
  }

  test("CALL expire_snapshots older_than keeps recent history, retain_last floors it") {
    val dir = mkTable(10)
    Snapshots.append(Snapshots.read(spark, dir).limit(1), dir) // v2
    Thread.sleep(1100) // mtime granularity separates the epochs
    val cut = System.currentTimeMillis()
    Snapshots.append(Snapshots.read(spark, dir).limit(1), dir) // v3 (after cut)
    // older_than = cut expires v1 (v2 survives as retain_last=2's floor)
    spark.sql(s"CALL graft.system.expire_snapshots('$dir', " +
      s"older_than => $cut, retain_last => 2)")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_graft_manifest_v1.json")),
      "v1 is older than the cutoff and beyond retain_last")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_graft_manifest_v2.json")),
      "retain_last=2 must keep v2 even though it predates the cutoff")
    assert(Snapshots.read(spark, dir).count() == 12)
  }

  test("CALL build_vector_index + ann_search: the persisted ANN index is " +
      "reachable from SQL and matches the Scala API's answers") {
    graft.functions.VectorSql.install(spark)
    val base = Files.createTempDirectory("graft_sql_ann").toString
    val corpus = s"$base/vecs.parquet"
    spark.range(500).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 63), i -> cast(sin(id * 0.7 + i) AS FLOAT)) AS embedding")
      .coalesce(1).write.parquet(corpus)
    val loc = s"$base/annindex"
    val out = spark.sql(s"CALL graft.system.build_vector_index('$corpus', " +
      s"location => '$loc')").collect()
    assert(out.head.getLong(0) == 500L, out.head.toString)
    assert(Snapshots.currentVersion(loc) > 0)
    // second CALL on an unchanged corpus is a no-op (no new snapshot)
    val v1 = Snapshots.currentVersion(loc)
    spark.sql(s"CALL graft.system.build_vector_index('$corpus', location => '$loc')")
    assert(Snapshots.currentVersion(loc) == v1, "fresh index must not rebuild")
    // table-valued query surface: ann_search registers the neighbor view
    spark.sql(s"CALL graft.system.ann_search('$corpus', location => '$loc', " +
      "view => 'annv', k => 3, query_filter => 'vec_id % 100 = 0')")
    val viaSql = spark.sql("SELECT * FROM annv ORDER BY qid, vec_id").collect()
      .map(_.toString).toSeq
    assert(viaSql.nonEmpty)
    val viaScala = graft.operators.Similarity
      .queryVectorIndexAt(spark, corpus, loc)
      .orderBy(col("qid"), col("vec_id")).collect().map(_.toString).toSeq
    assert(viaSql == viaScala, "SQL and Scala answers must be identical")
    // the SQL path maintains incrementally too: append corpus rows, CALL
    // again → append snapshot (not a rebuild), new queries answered
    spark.range(1000, 1050).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 63), i -> cast(sin(id * 0.7 + i) AS FLOAT)) AS embedding")
      .coalesce(1).write.mode("append").parquet(corpus)
    val out2 = spark.sql(s"CALL graft.system.build_vector_index('$corpus', " +
      s"location => '$loc')").collect()
    assert(out2.head.getLong(0) == 550L)
    assert(Snapshots.currentVersion(loc) == v1 + 1, "append, not rebuild")
    spark.sql(s"CALL graft.system.ann_search('$corpus', location => '$loc', " +
      "view => 'annv2', query_filter => 'vec_id = 1000')")
    assert(spark.sql("SELECT * FROM annv2").collect()
      .forall(_.getLong(0) == 1000L))
    assert(spark.sql("SELECT count(*) AS n FROM annv2").collect().head.getLong(0) > 0)

    // external query batch (queries => …): vectors that are NOT corpus
    // members probe the index; a query equal to corpus vector j must
    // surface j itself at cos 1.0 (self-exclusion is off for external
    // batches — an external qid is not a corpus vec_id)
    val qsrc = s"$base/queries.parquet"
    spark.sql("SELECT 0 AS qn, 7 AS src UNION ALL SELECT 1, 123 UNION ALL SELECT 2, 250")
      .selectExpr("CAST(qn AS BIGINT) AS vec_id",
        "transform(sequence(0, 63), i -> cast(sin(src * 0.7 + i) AS FLOAT)) AS embedding")
      .coalesce(1).write.parquet(qsrc)
    spark.sql(s"CALL graft.system.ann_search('$corpus', location => '$loc', " +
      s"view => 'annx', k => 1, queries => '$qsrc')")
    val hits = spark.sql("SELECT qid, vec_id, cos FROM annx").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(hits == Map(0L -> (7L, 1.0), 1L -> (123L, 1.0), 2L -> (250L, 1.0)),
      s"external queries must find their corpus twins: $hits")

    // inline literal vectors (query_vector => …): the production "search
    // by a given embedding" shape — identical answers to the querySource
    // path on the same vector; qid = position in the argument
    val inline = (0 until 64).map(i => f"${math.sin(123 * 0.7 + i)}%.9f")
      .mkString(",")
    spark.sql(s"CALL graft.system.ann_search('$corpus', location => '$loc', " +
      s"view => 'anni', k => 1, query_vector => '$inline')")
    val viaInline = spark.sql("SELECT vec_id FROM anni").collect()
      .map(_.getLong(0)).toSeq
    assert(viaInline == Seq(123L),
      s"inline-vector search must find the corpus twin: $viaInline")
    // two ';'-separated vectors → qids 0 and 1
    spark.sql(s"CALL graft.system.ann_search('$corpus', location => '$loc', " +
      s"view => 'anni2', k => 1, query_vector => '$inline;$inline')")
    assert(spark.sql("SELECT DISTINCT qid FROM anni2").collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L))
  }
}
