package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoCodec
import graft.spatial.{GeoTable, Snapshots, TableSchema}

/** Schema evolution without file rewrites: add / rename / drop columns.
  * The physical column name in the files plays the role of Iceberg's
  * field id (the reference's id-based evolution), so renames are
  * metadata-only and every historical file stays readable.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkTable(n: Int): String = {
    graft.spatial.Geo.install(spark)
    val dir = Files.createTempDirectory("graft_evo").toString
    val rows = (0 until n).map { i =>
      Row(i.toLong, s"cat${i % 3}", GeoCodec.writeWkb(GeoCodec.point(i % 50 + 1.0, i % 40 + 1.0)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("category", StringType),
        StructField("geom", BinaryType))))
    GeoTable.write(df, dir, "geom", res = 8, numFiles = 2)
    dir
  }

  test("add column: old files read as null, new appends carry values") {
    val dir = mkTable(20)
    TableSchema.addColumn(spark, dir, "score", DoubleType)
    val t1 = Snapshots.read(spark, dir)
    assert(t1.columns.contains("score"))
    assert(t1.filter(col("score").isNull).count() == 20)
    // append rows WITH the new column
    val add = GeoTable.withBbox(
      spark.createDataFrame(spark.sparkContext.parallelize(
        (100 until 110).map(i => Row(i.toLong, "new", GeoCodec.writeWkb(GeoCodec.point(1.0, 2.0)), i * 0.5)), 1),
        StructType(Seq(StructField("id", LongType), StructField("category", StringType),
          StructField("geom", BinaryType), StructField("score", DoubleType)))), "geom")
    Snapshots.append(add, dir)
    val t2 = Snapshots.read(spark, dir)
    assert(t2.count() == 30)
    assert(t2.filter(col("score").isNotNull).count() == 10)
    assert(t2.filter(col("score") > 52.0).count() == 5) // 52.5 .. 54.5
  }

  test("rename column is metadata-only; old data stays readable; writes round-trip") {
    val dir = mkTable(20)
    TableSchema.renameColumn(spark, dir, "category", "doc_class")
    val t = Snapshots.read(spark, dir)
    assert(t.columns.contains("doc_class") && !t.columns.contains("category"))
    assert(t.filter(col("doc_class") === "cat1").count() > 0)
    // append using the NEW logical name; lands in the old physical column
    val add = GeoTable.withBbox(
      spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(Row(500L, "cat9", GeoCodec.writeWkb(GeoCodec.point(3.0, 3.0)))), 1),
        StructType(Seq(StructField("id", LongType), StructField("doc_class", StringType),
          StructField("geom", BinaryType)))), "geom")
    Snapshots.append(add, dir)
    val t2 = Snapshots.read(spark, dir)
    assert(t2.count() == 21)
    assert(t2.filter(col("doc_class") === "cat9").count() == 1)
    // CoW delete through the renamed column
    Snapshots.delete(spark, dir, col("doc_class") === "cat9")
    assert(Snapshots.read(spark, dir).count() == 20)
  }

  test("drop column hides it without touching files; re-add gets fresh storage") {
    val dir = mkTable(20)
    val before = Snapshots.readManifest(dir).map(_.path).toSet
    TableSchema.dropColumn(spark, dir, "category")
    assert(!Snapshots.read(spark, dir).columns.contains("category"))
    assert(Snapshots.readManifest(dir).map(_.path).toSet == before) // no rewrite
    // re-adding the same logical name maps to a fresh physical column —
    // the dropped data does NOT resurrect
    TableSchema.addColumn(spark, dir, "category", StringType)
    val t = Snapshots.read(spark, dir)
    assert(t.columns.contains("category"))
    assert(t.filter(col("category").isNotNull).count() == 0)
  }

  test("evolution procedures work through SQL") {
    val dir = mkTable(10)
    spark.sql(s"CALL graft.system.add_column('$dir', 'rank', 'int')")
    spark.sql(s"CALL graft.system.rename_column('$dir', 'rank', 'priority')")
    assert(Snapshots.read(spark, dir).columns.contains("priority"))
    spark.sql(s"CALL graft.system.drop_column('$dir', 'priority')")
    assert(!Snapshots.read(spark, dir).columns.contains("priority"))
  }

  /** Table with an INT measure column for promotion tests. */
  private def mkIntTable(n: Int): String = {
    graft.spatial.Geo.install(spark)
    val dir = Files.createTempDirectory("graft_promo").toString
    val rows = (0 until n).map { i =>
      Row(i, GeoCodec.writeWkb(GeoCodec.point(i % 50 + 1.0, i % 40 + 1.0)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("iv", IntegerType), StructField("geom", BinaryType))))
    GeoTable.write(df, dir, "geom", res = 8, numFiles = 2)
    dir
  }

  test("int -> bigint promotion: metadata-only, old files widen, new appends mix") {
    val dir = mkIntTable(20)
    val filesBefore = Snapshots.readManifest(dir).map(_.path).toSet
    TableSchema.updateColumnType(spark, dir, "iv", LongType)
    val t1 = Snapshots.read(spark, dir)
    assert(t1.schema("iv").dataType == LongType)
    assert(t1.agg(sum(col("iv"))).first().getLong(0) == (0 until 20).sum.toLong)
    assert(Snapshots.readManifest(dir).map(_.path).toSet == filesBefore) // no rewrite
    // append values only a long can hold; both generations read together
    val add = GeoTable.withBbox(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L << 40, GeoCodec.writeWkb(GeoCodec.point(3.0, 4.0)))), 1),
        StructType(Seq(StructField("iv", LongType), StructField("geom", BinaryType)))), "geom")
    Snapshots.append(add, dir)
    val t2 = Snapshots.read(spark, dir)
    assert(t2.count() == 21)
    assert(t2.agg(max(col("iv"))).first().getLong(0) == (1L << 40))
    // old-generation int stats still prune files under the long logical type
    assert(t2.filter(col("iv") > Int.MaxValue.toLong).count() == 1)
  }

  test("promotion matrix: widening only, like the reference's UpdateSchema") {
    val dir = mkIntTable(5)
    // no-op same type is fine
    TableSchema.updateColumnType(spark, dir, "iv", IntegerType)
    intercept[IllegalArgumentException] {
      TableSchema.updateColumnType(spark, dir, "iv", ShortType) // narrowing
    }
    intercept[IllegalArgumentException] {
      TableSchema.updateColumnType(spark, dir, "iv", StringType) // cross-family
    }
    intercept[IllegalArgumentException] {
      TableSchema.updateColumnType(spark, dir, "iv", DoubleType) // int -> double not in matrix
    }
    TableSchema.addColumn(spark, dir, "price", DecimalType(7, 2))
    TableSchema.updateColumnType(spark, dir, "price", DecimalType(12, 2)) // precision widen ok
    intercept[IllegalArgumentException] {
      TableSchema.updateColumnType(spark, dir, "price", DecimalType(12, 4)) // scale change
    }
    intercept[IllegalArgumentException] {
      TableSchema.updateColumnType(spark, dir, "missing", LongType)
    }
  }

  test("ALTER COLUMN TYPE / COMMENT / nullability through the catalog") {
    val wh = Files.createTempDirectory("graft_promo_wh").toString
    spark.conf.set("spark.sql.catalog.pcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pcat.warehouse", wh)
    val src = mkIntTable(10)
    val tbl = s"$wh/db/promo"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(src), new java.io.File(tbl))
    spark.sql("ALTER TABLE pcat.db.promo ALTER COLUMN iv TYPE bigint")
    assert(spark.table("pcat.db.promo").schema("iv").dataType == LongType)
    spark.sql("ALTER TABLE pcat.db.promo ALTER COLUMN iv COMMENT 'widened measure'")
    assert(spark.table("pcat.db.promo").schema("iv")
      .metadata.getString("comment") == "widened measure")
    // relaxing to nullable: accepted (no-op); adding NOT NULL: rejected
    spark.sql("ALTER TABLE pcat.db.promo ALTER COLUMN iv DROP NOT NULL")
    // rejected by Spark's analyzer (nullable -> non-nullable) before the
    // catalog; the catalog guard stays for non-SQL TableChange callers
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE pcat.db.promo ALTER COLUMN iv SET NOT NULL")
    }
    assert(e.getMessage.toLowerCase.matches("(?s).*(not null|non-nullable).*"))
    // narrowing: Spark's analyzer rejects it before the catalog
    val n = intercept[Exception] {
      spark.sql("ALTER TABLE pcat.db.promo ALTER COLUMN iv TYPE int")
    }
    assert(n.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    // a direct TableChange (non-SQL caller, no analyzer in front): the
    // catalog's own matrix is the gate — long -> double is a Spark upcast
    // but NOT an Iceberg promotion
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val cat = spark.sessionState.catalogManager.catalog("pcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val d = intercept[IllegalArgumentException] {
      cat.alterTable(Identifier.of(Array("db"), "promo"),
        TableChange.updateColumnType(Array("iv"), DoubleType))
    }
    assert(d.getMessage.contains("cannot promote"))
    val nn = intercept[UnsupportedOperationException] {
      cat.alterTable(Identifier.of(Array("db"), "promo"),
        TableChange.updateColumnNullability(Array("iv"), false))
    }
    assert(nn.getMessage.contains("NOT NULL"))
    // DROP NOT NULL is a no-op but must still validate the column exists
    // for direct TableChange callers (no analyzer in front)
    val ghost = intercept[IllegalArgumentException] {
      cat.alterTable(Identifier.of(Array("db"), "promo"),
        TableChange.updateColumnNullability(Array("no_such_col"), true))
    }
    assert(ghost.getMessage.contains("no such column"))
    // comments are free text: a comment with newlines / tabs / control
    // chars must round-trip (the schema json escapes them; an unescaped
    // control char would make the file unreadable forever after)
    val wild = "line one\nline two\ttabbed\rctl \"quoted\" back\\slash"
    cat.alterTable(Identifier.of(Array("db"), "promo"),
      TableChange.updateColumnComment(Array("iv"), wild))
    assert(spark.table("pcat.db.promo").schema("iv")
      .metadata.getString("comment") == wild)
  }

  test("schema-merging appends: extra columns add as nullable, absent columns read null") {
    val dir = mkTable(10)
    // append WITH a column the table has never seen: merges into the
    // recorded schema as NULLABLE (the reference adds evolved columns as
    // optional) — old files read null, new rows carry values
    val extra = GeoTable.withBbox(
      spark.createDataFrame(spark.sparkContext.parallelize(
        (100 until 105).map(i => Row(i.toLong, "new",
          GeoCodec.writeWkb(GeoCodec.point(1.0, 2.0)), i * 1.5)), 1),
        StructType(Seq(StructField("id", LongType), StructField("category", StringType),
          StructField("geom", BinaryType),
          StructField("score", DoubleType, nullable = false)))), "geom")
    Snapshots.append(extra, dir)
    val t1 = Snapshots.read(spark, dir)
    assert(t1.schema("score").nullable)
    assert(t1.count() == 15)
    assert(t1.filter(col("score").isNull).count() == 10)
    assert(t1.filter(col("score") === 150.0).count() == 1)
    // append MISSING a column the table does have: newest files read null
    val missing = GeoTable.withBbox(
      spark.createDataFrame(spark.sparkContext.parallelize(
        (200 until 203).map(i => Row(i.toLong,
          GeoCodec.writeWkb(GeoCodec.point(3.0, 4.0)))), 1),
        StructType(Seq(StructField("id", LongType),
          StructField("geom", BinaryType)))), "geom")
    Snapshots.append(missing, dir)
    val t2 = Snapshots.read(spark, dir)
    assert(t2.count() == 18)
    assert(t2.filter(col("id") >= 200 && col("category").isNull).count() == 3)
  }

  // ---- nested evolution (ref UpdateSchema.java:56-84,
  // TestAlterTable.java:81,104,129): dot-path ADD/RENAME/DROP/COMMENT on
  // struct fields, incl. structs inside array elements and map values ----

  // one warehouse for the whole suite: Spark's CatalogManager caches the
  // catalog instance with the warehouse it saw first
  private lazy val nestedWh: String = {
    val wh = Files.createTempDirectory("graft_nest_wh").toString
    spark.conf.set("spark.sql.catalog.ncat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ncat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ncat.db")
    wh
  }
  private def mkNestedCatalog(): String = nestedWh

  test("nested ADD: old files read null, appends carry values, siblings keep stats") {
    mkNestedCatalog()
    spark.sql("""CREATE TABLE ncat.db.na (id BIGINT,
      point STRUCT<x: DOUBLE, y: DOUBLE>) USING graft""")
    spark.sql("INSERT INTO ncat.db.na SELECT id, named_struct('x', id * 1.0, 'y', id * 2.0) " +
      "FROM range(10)")
    spark.sql("ALTER TABLE ncat.db.na ADD COLUMNS (point.z DOUBLE)")
    val t1 = spark.table("ncat.db.na")
    assert(t1.schema("point").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("x", "y", "z"))
    assert(t1.filter(col("point.z").isNull).count() == 10, "old files read null for the add")
    assert(t1.filter(col("point.x") === 3.0).count() == 1, "untouched siblings keep values")
    spark.sql("INSERT INTO ncat.db.na SELECT id, " +
      "named_struct('x', id * 1.0, 'y', id * 2.0, 'z', id * 3.0) FROM range(100, 105)")
    val t2 = spark.table("ncat.db.na")
    assert(t2.count() == 15)
    assert(t2.filter(col("point.z").isNotNull).count() == 5)
    assert(t2.filter(col("point.z") >= 303.0).count() == 4) // 303, 306, 309, 312
    spark.sql("DROP TABLE ncat.db.na")
  }

  test("nested RENAME is metadata-only; reads and writes round-trip; old name is gone") {
    mkNestedCatalog()
    spark.sql("""CREATE TABLE ncat.db.nr (id BIGINT,
      point STRUCT<x: DOUBLE, y: DOUBLE>) USING graft""")
    spark.sql("INSERT INTO ncat.db.nr SELECT id, named_struct('x', id * 1.0, 'y', id * 2.0) " +
      "FROM range(10)")
    val files = graft.spatial.Snapshots.readManifest(
      nestedWh + "/db/nr").map(_.path).toSet
    spark.sql("ALTER TABLE ncat.db.nr RENAME COLUMN point.x TO lon")
    val t = spark.table("ncat.db.nr")
    val pf = t.schema("point").dataType.asInstanceOf[StructType]
    assert(pf.fieldNames.contains("lon") && !pf.fieldNames.contains("x"))
    // values survive the rename (metadata-only — same files)
    assert(t.agg(sum(col("point.lon"))).first().getDouble(0) == (0 until 10).sum.toDouble)
    assert(graft.spatial.Snapshots.readManifest(
      nestedWh + "/db/nr").map(_.path).toSet
      == files, "rename must not rewrite data files")
    // writes under the NEW logical name land in the OLD physical field
    spark.sql("INSERT INTO ncat.db.nr SELECT id, named_struct('lon', id * 1.0, 'y', id * 2.0) " +
      "FROM range(50, 52)")
    val t2 = spark.table("ncat.db.nr")
    assert(t2.count() == 12)
    assert(t2.filter(col("point.lon") === 50.0).count() == 1)
    // filter pushdown on the renamed leaf stays CORRECT across generations
    assert(t2.filter(col("point.lon") < 5.0).count() == 5)
    spark.sql("DROP TABLE ncat.db.nr")
  }

  test("nested DROP hides the field without rewrites; re-add reads null (fresh storage)") {
    mkNestedCatalog()
    spark.sql("""CREATE TABLE ncat.db.nd (id BIGINT,
      point STRUCT<x: DOUBLE, y: DOUBLE>) USING graft""")
    spark.sql("INSERT INTO ncat.db.nd SELECT id, named_struct('x', id * 1.0, 'y', id * 2.0) " +
      "FROM range(8)")
    val dir = nestedWh + "/db/nd"
    val before = graft.spatial.Snapshots.readManifest(dir).map(_.path).toSet
    spark.sql("ALTER TABLE ncat.db.nd DROP COLUMN point.y")
    val t = spark.table("ncat.db.nd")
    assert(t.schema("point").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("x"))
    assert(graft.spatial.Snapshots.readManifest(dir).map(_.path).toSet == before)
    assert(t.agg(sum(col("point.x"))).first().getDouble(0) == (0 until 8).sum.toDouble)
    // re-adding the same logical name maps to fresh physical storage: the
    // dropped data must NOT resurrect
    spark.sql("ALTER TABLE ncat.db.nd ADD COLUMNS (point.y DOUBLE)")
    val t2 = spark.table("ncat.db.nd")
    assert(t2.filter(col("point.y").isNotNull).count() == 0,
      "re-added nested field must read null, not the dropped column's data")
    spark.sql("DROP TABLE ncat.db.nd")
  }

  test("nested COMMENT persists as field metadata") {
    mkNestedCatalog()
    spark.sql("""CREATE TABLE ncat.db.nc (id BIGINT,
      point STRUCT<x: DOUBLE, y: DOUBLE>) USING graft""")
    spark.sql("INSERT INTO ncat.db.nc SELECT id, named_struct('x', 1.0, 'y', 2.0) FROM range(3)")
    spark.sql("ALTER TABLE ncat.db.nc ALTER COLUMN point.x COMMENT 'longitude degrees'")
    val pf = spark.table("ncat.db.nc").schema("point").dataType.asInstanceOf[StructType]
    assert(pf("x").metadata.contains("comment") &&
      pf("x").metadata.getString("comment") == "longitude degrees")
    spark.sql("DROP TABLE ncat.db.nc")
  }

  test("struct inside array element and map value evolve; map keys are rejected") {
    mkNestedCatalog()
    spark.sql("""CREATE TABLE ncat.db.nn (id BIGINT,
      tags ARRAY<STRUCT<t: STRING, w: INT>>,
      attrs MAP<STRING, STRUCT<f: DOUBLE>>) USING graft""")
    spark.sql("INSERT INTO ncat.db.nn SELECT id, " +
      "array(named_struct('t', concat('tag', id), 'w', CAST(id AS INT))), " +
      "map('k', named_struct('f', id * 0.5)) FROM range(6)")
    // add + rename inside the array element struct
    spark.sql("ALTER TABLE ncat.db.nn ADD COLUMNS (tags.element.score DOUBLE)")
    spark.sql("ALTER TABLE ncat.db.nn RENAME COLUMN tags.element.w TO weight")
    val t = spark.table("ncat.db.nn")
    val et = t.schema("tags").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(et.fieldNames.toSeq == Seq("t", "weight", "score"))
    assert(t.selectExpr("aggregate(tags, 0L, (a, x) -> a + x.weight) AS s")
      .agg(sum(col("s"))).first().getLong(0) == (0 until 6).sum.toLong)
    assert(t.selectExpr("tags[0].score AS sc").filter(col("sc").isNull).count() == 6)
    // rename inside the map VALUE struct
    spark.sql("ALTER TABLE ncat.db.nn RENAME COLUMN attrs.value.f TO g")
    val t2 = spark.table("ncat.db.nn")
    assert(t2.schema("attrs").dataType.asInstanceOf[MapType]
      .valueType.asInstanceOf[StructType].fieldNames.toSeq == Seq("g"))
    assert(t2.selectExpr("attrs['k'].g AS g").agg(sum(col("g"))).first().getDouble(0)
      == (0 until 6).map(_ * 0.5).sum)
    // appends after element/value evolution round-trip through the writer
    spark.sql("INSERT INTO ncat.db.nn SELECT id, " +
      "array(named_struct('t', 'late', 'weight', CAST(99 AS INT), 'score', 0.9)), " +
      "map('k', named_struct('g', 9.0)) FROM range(100, 101)")
    val t3 = spark.table("ncat.db.nn")
    assert(t3.count() == 7)
    assert(t3.selectExpr("tags[0].score AS sc").filter(col("sc") === 0.9).count() == 1)
    assert(t3.selectExpr("attrs['k'].g AS g").filter(col("g") === 9.0).count() == 1)
    // map KEYS cannot evolve — identity-bearing, like the reference
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE ncat.db.nn ADD COLUMNS (attrs.key.k2 INT)")
    }
    assert(e.getMessage.toLowerCase.matches("(?s).*(map key|key.*map|cannot.*key).*") ||
      e.getMessage.contains("key"), e.getMessage)
    spark.sql("DROP TABLE ncat.db.nn")
  }

  test("nested evolution through the TableSchema API on a path table (multi-level)") {
    graft.spatial.Geo.install(spark)
    val dir = Files.createTempDirectory("graft_nest_path").toString
    val df = spark.range(5).toDF("id")
      .withColumn("meta", struct(
        struct(col("id").cast("double").as("a")).as("inner"),
        lit("s").as("lbl")))
      .withColumn("geom", expr("ST_GeomFromText(concat('POINT (', id, ' ', id, ')'))"))
    GeoTable.write(df, dir, "geom", res = 8, numFiles = 1)
    // two levels down: meta.inner.a -> meta.inner.alpha; add meta.inner.b
    TableSchema.renameColumn(spark, dir, Seq("meta", "inner", "a"), "alpha")
    TableSchema.addColumn(spark, dir, Seq("meta", "inner", "b"), LongType)
    val t = Snapshots.read(spark, dir)
    val innerT = t.schema("meta").dataType.asInstanceOf[StructType]("inner")
      .dataType.asInstanceOf[StructType]
    assert(innerT.fieldNames.toSeq == Seq("alpha", "b"))
    assert(t.agg(sum(col("meta.inner.alpha"))).first().getDouble(0) == 10.0)
    assert(t.filter(col("meta.inner.b").isNull).count() == 5)
    // negative: navigating into a non-struct leaf
    intercept[IllegalArgumentException] {
      TableSchema.addColumn(spark, dir, Seq("id", "sub"), LongType)
    }
    // negative: adding a duplicate nested name
    intercept[IllegalArgumentException] {
      TableSchema.addColumn(spark, dir, Seq("meta", "inner", "alpha"), LongType)
    }
  }

  test("nested TYPE widening: struct leaf int->bigint, array element float->double; " +
      "narrowing rejected; old files up-convert") {
    mkNestedCatalog()
    spark.sql("""CREATE TABLE ncat.db.nt (id BIGINT,
      point STRUCT<x: INT, y: DOUBLE>, vs ARRAY<FLOAT>) USING graft""")
    spark.sql("INSERT INTO ncat.db.nt SELECT id, " +
      "named_struct('x', CAST(id AS INT), 'y', id * 2.0), " +
      "array(CAST(id AS FLOAT), CAST(id + 1 AS FLOAT)) FROM range(10)")
    val dir = nestedWh + "/db/nt"
    val before = graft.spatial.Snapshots.readManifest(dir).map(_.path).toSet
    spark.sql("ALTER TABLE ncat.db.nt ALTER COLUMN point.x TYPE BIGINT")
    spark.sql("ALTER TABLE ncat.db.nt ALTER COLUMN vs.element TYPE DOUBLE")
    val t = spark.table("ncat.db.nt")
    assert(t.schema("point").dataType.asInstanceOf[StructType]("x").dataType == LongType)
    assert(t.schema("vs").dataType.asInstanceOf[ArrayType].elementType == DoubleType)
    // metadata-only: same files, old narrow leaves up-convert on read
    assert(graft.spatial.Snapshots.readManifest(dir).map(_.path).toSet == before)
    assert(t.agg(sum(col("point.x"))).first().getLong(0) == (0 until 10).sum.toLong)
    assert(t.selectExpr("aggregate(vs, 0.0D, (a, x) -> a + x) AS s")
      .agg(sum(col("s"))).first().getDouble(0) == (0 until 10).map(i => 2.0 * i + 1).sum)
    // appends carry the wide type; filters span both generations
    spark.sql("INSERT INTO ncat.db.nt SELECT id, " +
      "named_struct('x', id * 1000000000000, 'y', 0.0), array(CAST(id AS DOUBLE)) " +
      "FROM range(100, 102)")
    val t2 = spark.table("ncat.db.nt")
    assert(t2.count() == 12)
    assert(t2.filter(col("point.x") >= 100000000000000L).count() == 2)
    assert(t2.filter(col("point.x") < 10L).count() == 10)
    // narrowing and cross-family changes are rejected at any depth
    intercept[Exception] {
      spark.sql("ALTER TABLE ncat.db.nt ALTER COLUMN point.y TYPE FLOAT")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE ncat.db.nt ALTER COLUMN point.x TYPE STRING")
    }
    spark.sql("DROP TABLE ncat.db.nt")
  }

  test("declared-encoding geometry survives evolution: decode + rename compose") {
    import graft.spatial.GeometryFields
    import graft.functions.GeoSql
    val dir = Files.createTempDirectory("graft_evo_enc").toString + "/tbl"
    GeoSql.install(spark)
    val src = spark.range(20).toDF("id")
      .withColumn("x", (col("id") % 90 - 45).cast("double"))
      .withColumn("geom", GeoSql.st_point(col("x"), lit(5.0)))
    // WKT storage: the files hold STRINGs, readers decode back to WKB
    GeometryFields.writeGeo(src, dir, "geom", "wkt", res = 8, numFiles = 2)
    // evolution on a sibling column must NOT disturb the decode path
    // (the recorded physical type of geom is STRING; the decoded frame
    // carries BINARY — a type-blind cast here once mangled the geometry)
    TableSchema.renameColumn(spark, dir, "x", "lon")
    val t = Snapshots.read(spark, dir)
    assert(t.columns.contains("lon"))
    // ids 0..19 -> x in [-45, -26]; the envelope catches x in [-45, -36]
    val hits = t.filter(GeoSql.st_intersects(col("geom"),
      GeoSql.st_makeenvelope(lit(-45.0), lit(0.0), lit(-36.0), lit(10.0)))).count()
    assert(hits > 0 && hits < 20, s"decoded geometry must stay queryable, got $hits")
  }

  test("schema-evolve-on-write: accept-any-schema + merge-schema add columns " +
      "(top-level and nested); without merge-schema new columns are rejected") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_msw_wh").toString
    spark.conf.set("spark.sql.catalog.mscat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mscat.warehouse", wh)
    spark.sql("CREATE NAMESPACE mscat.db")
    spark.sql("CREATE TABLE mscat.db.m (id BIGINT, pt STRUCT<x: DOUBLE, y: DOUBLE>) " +
      "USING graft TBLPROPERTIES ('write.spark.accept-any-schema' = 'true')")
    spark.sql("INSERT INTO mscat.db.m SELECT id, named_struct('x', CAST(id AS DOUBLE), " +
      "'y', 0D) FROM range(5)")
    // without merge-schema an unknown column must be rejected by the
    // builder (Spark's own check is disabled by ACCEPT_ANY_SCHEMA)
    val bad = spark.range(5, 8).selectExpr("id",
      "named_struct('x', CAST(id AS DOUBLE), 'y', 0D) AS pt", "'new' AS tag")
    val e = intercept[Exception] { bad.writeTo("mscat.db.m").append() }
    assert(e.getMessage.contains("merge-schema"), e.getMessage)
    // with merge-schema the same write evolves the table: new top-level
    // column AND new nested struct field
    val wider = spark.range(5, 8).selectExpr("id",
      "named_struct('x', CAST(id AS DOUBLE), 'y', 0D, 'z', CAST(id AS DOUBLE)) AS pt",
      "'new' AS tag")
    wider.writeTo("mscat.db.m").option("merge-schema", "true").append()
    val out = spark.table("mscat.db.m")
    assert(out.columns.toSeq == Seq("id", "pt", "tag"))
    assert(out.schema("pt").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("x", "y", "z"))
    // old rows read null for both additions; new rows carry values
    val rows = out.selectExpr("id", "pt.z", "tag").collect().sortBy(_.getLong(0))
    assert(rows.take(5).forall(r => r.isNullAt(1) && r.isNullAt(2)))
    assert(rows.drop(5).forall(r => !r.isNullAt(1) && r.getString(2) == "new"))
    // a write MISSING a column null-fills without any option
    spark.range(8, 10).selectExpr("id").writeTo("mscat.db.m").append()
    assert(spark.table("mscat.db.m").where("id >= 8 AND pt IS NULL AND tag IS NULL")
      .count() == 2)
    // a type-mismatched column is rejected, never silently cast
    val mistyped = spark.range(10, 11).selectExpr("id", "CAST(1 AS INT) AS tag")
    val e2 = intercept[Exception] { mistyped.writeTo("mscat.db.m").append() }
    assert(e2.getMessage.contains("tag"), e2.getMessage)
  }

  test("re-adding a dropped column never collides with a live column's " +
      "physical name (two logical columns must not share storage)") {
    val dir = Files.createTempDirectory("graft_physcol").toString + "/tbl"
    spark.range(3).selectExpr("id", "'a' AS c").coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    import graft.spatial.TableSchema
    // force the collision shape: a live column whose NAME equals the
    // collision-avoidance candidate `c_<k>` for some later add
    TableSchema.addColumn(spark, dir, "c_3", org.apache.spark.sql.types.StringType)
    TableSchema.dropColumn(spark, dir, Seq("c"))
    TableSchema.addColumn(spark, dir, "c", org.apache.spark.sql.types.StringType)
    val phys = TableSchema.read(dir).filterNot(_.dropped).map(_.physical)
    assert(phys.distinct.size == phys.size,
      s"physical names must be unique, got $phys")
    // the re-added column reads null and writes independently of c_3
    Snapshots.append(spark.range(3, 5).selectExpr(
      "id", "'x' AS c_3", "'fresh' AS c"), dir)
    val t = Snapshots.read(spark, dir)
    assert(t.where("id < 3 AND c IS NULL").count() == 3)
    assert(t.where("id >= 3 AND c = 'fresh' AND c_3 = 'x'").count() == 2)
  }

  test("accept-any-schema: a PARTIAL write with an unmatched column name is " +
      "rejected, never resolved positionally into the wrong column") {
    val wh = Files.createTempDirectory("graft_pos_wh").toString
    spark.conf.set("spark.sql.catalog.poscat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.poscat.warehouse", wh)
    spark.sql("CREATE NAMESPACE poscat.db")
    spark.sql("CREATE TABLE poscat.db.p (id BIGINT, a STRING, tag STRING) " +
      "USING graft TBLPROPERTIES ('write.spark.accept-any-schema' = 'true')")
    // FULL-width positional resolution (SQL INSERT with unnamed
    // select-list expressions) is the legitimate positional case
    spark.sql("INSERT INTO poscat.db.p SELECT id, concat('a', id), concat('t', id) " +
      "FROM range(3)")
    assert(spark.table("poscat.db.p").where("a = 'a1' AND tag = 't1'").count() == 1)
    // a PARTIAL frame whose second column ('mytag') is not a table column
    // is ambiguous: positionally it would land in the same-typed 'a'
    // silently — it must error instead
    val partial = spark.range(3, 5).selectExpr("id", "concat('t', id) AS mytag")
    val e = intercept[Exception] { partial.writeTo("poscat.db.p").append() }
    assert(e.getMessage.contains("mytag"), e.getMessage)
    assert(spark.table("poscat.db.p").where("id >= 3").count() == 0,
      "rejected write must not land")
    // a partial frame with MATCHING names still null-fills fine
    spark.range(3, 5).selectExpr("id", "concat('t', id) AS tag").writeTo("poscat.db.p").append()
    assert(spark.table("poscat.db.p").where("id >= 3 AND a IS NULL AND tag = concat('t', id)")
      .count() == 2)
  }

  test("accept-any-schema: a FULL-width write whose names match table columns " +
      "at different positions is rejected, not silently crossed over") {
    val wh = Files.createTempDirectory("graft_mix_wh").toString
    spark.conf.set("spark.sql.catalog.mixcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mixcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE mixcat.db")
    spark.sql("CREATE TABLE mixcat.db.m (a STRING, b STRING, c STRING) " +
      "USING graft TBLPROPERTIES ('write.spark.accept-any-schema' = 'true')")
    // table (a,b,c), frame (b,x,a): full width, all STRING — positional
    // resolution would land b-data in a and a-data in c with no error
    val frame = spark.range(2).selectExpr(
      "concat('B', id) AS b", "concat('X', id) AS x", "concat('A', id) AS a")
    val e = intercept[Exception] { frame.writeTo("mixcat.db.m").append() }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
    assert(spark.table("mixcat.db.m").count() == 0, "rejected write must not land")
    // same guard on the dynamic-overwrite leg
    spark.sql("ALTER TABLE mixcat.db.m SET TBLPROPERTIES " +
      "('write.spark.dynamic-partition-overwrite' = 'true')")
    val e2 = intercept[Exception] { frame.writeTo("mixcat.db.m").overwritePartitions() }
    assert(e2.getMessage.contains("ambiguous"), e2.getMessage)
    // a name matching its OWN positional slot stays legitimate positional
    // (SQL INSERT select-lists routinely carry one passthrough name)
    spark.range(2).selectExpr("concat('A', id) AS a", "concat('B', id) AS q1",
      "concat('C', id) AS q2").writeTo("mixcat.db.m").append()
    assert(spark.table("mixcat.db.m").where("a = 'A1' AND b = 'B1' AND c = 'C1'").count() == 1)
  }

  test("schema evolution REFUSES while a carried MoR predicate delete references " +
      "the column (DSv2 would die unresolved; rename-then-replace would capture " +
      "the new column) — and works again once deletes materialize") {
    import graft.spatial.{GeoTable, Snapshots, TableSchema}
    val dir = java.nio.file.Files.createTempDirectory("graft_evoguard").toString
    spark.range(100).selectExpr("id", "CAST(id % 10 AS DOUBLE) AS x",
      "CAST(id AS DOUBLE) AS keepme").write.mode("overwrite").parquet(dir)
    GeoTable.writeManifest(spark, dir)
    Snapshots.updateProperties(dir, Map("write.delete.mode" -> "merge-on-read"))
    Snapshots.deleteMoR(spark, dir, "x < 3")
    assert(Snapshots.read(spark, dir).count() == 70)
    // rename, drop, and re-add of the referenced column all refuse loudly
    Seq(
      () => TableSchema.renameColumn(spark, dir, "x", "lon"),
      () => TableSchema.dropColumn(spark, dir, "x"),
      () => TableSchema.addColumn(spark, dir, "x",
        org.apache.spark.sql.types.DoubleType)
    ).foreach { op =>
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("merge-on-read predicate delete"), e.getMessage)
    }
    // an UNRELATED column still evolves freely
    TableSchema.renameColumn(spark, dir, "keepme", "kept")
    assert(Snapshots.read(spark, dir).columns.contains("kept"))
    // materializing the pending deletes unblocks the evolution
    Snapshots.rewriteDataFiles(spark, dir)
    TableSchema.renameColumn(spark, dir, "x", "lon")
    val out = Snapshots.read(spark, dir)
    assert(out.columns.contains("lon") && out.count() == 70)
    assert(spark.read.format("graft").load(dir).count() == 70)
  }
}
