package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoSql._
import graft.spatial.{GeometryFields, GeoTable, Snapshots}

/** The DSv2 catalog surface: `SELECT * FROM <catalog>.<db>.<table>` with
  * manifest pruning, MoR-delete fidelity, time travel, and INSERT — the
  * reference's `SparkCatalog`/`SparkTable` shape.
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val warehouse: String = {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.catalog.gcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", wh)
    wh
  }

  /** The GeoSpec quadrant fixture: 4 files, one per quadrant, 20 rows each. */
  private def writeQuadrants(tbl: String): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = for {
      quadrant <- 0 until 4
      k <- 1 to 10
      (cx, cy) = quadrant match {
        case 0 => (k.toDouble, k.toDouble)
        case 1 => (-k.toDouble, k.toDouble)
        case 2 => (-k.toDouble, -k.toDouble)
        case 3 => (k.toDouble, -k.toDouble)
      }
      geom <- Seq(
        graft.functions.GeoCodec.writeWkb(graft.functions.GeoCodec.point(cx, cy)),
        graft.functions.GeoCodec.writeWkb(graft.functions.GeoCodec.point(cx, cy).buffer(0.5)))
    } yield Row((quadrant * 10 + k - 1).toLong, quadrant, geom)
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("part", IntegerType, nullable = false), StructField("geom", BinaryType)))
    (0 until 4).foreach { q =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.filter(_.getInt(1) == q), 1), schema)
      GeoTable.withBbox(df, "geom").coalesce(1).write.mode("append").parquet(tbl)
    }
    GeoTable.writeManifest(spark, tbl)
  }

  test("catalog SQL reads a table with manifest file pruning") {
    val tbl = s"$warehouse/db/quad"
    writeQuadrants(tbl)
    val all = spark.sql("SELECT * FROM gcat.db.quad")
    assert(all.count() == 80)
    assert(all.columns.toSeq == Seq("id", "part", "geom", "geom_bbox"))
    // an attribute filter prunes to the files whose stats might match
    val q = spark.sql("SELECT id FROM gcat.db.quad WHERE geom_bbox.xmin > 0 AND geom_bbox.ymin > 0")
    val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "catalog read should plan a DSv2 BatchScan")
    assert(SparkTestSession.plannedFiles(q) == 1,
      s"quadrant-0 filter must prune to 1 of 4 files, got ${SparkTestSession.plannedFiles(q)}")
    assert(q.count() == 20)
    // clean table → columnar path → vectorized scan feeding codegen
    assert(q.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "clean tables must take the columnar fast path")
  }

  test("catalog read applies MoR deletes and decodes declared encodings") {
    val tbl = s"$warehouse/db/enc"
    val src = spark.range(100).toDF("id")
      .withColumn("x", (col("id") % 90 - 45).cast("double"))
      .withColumn("geom", st_point(col("x"), lit(5.0)))
    GeometryFields.writeGeo(src, tbl, "geom", "wkt", res = 8, numFiles = 2)
    Snapshots.deleteMoR(spark, tbl, "id % 7 = 0")
    val expected = Snapshots.read(spark, tbl).select("id", "x").collect().map(_.getLong(0)).toSet
    val got = spark.sql("SELECT id, x FROM gcat.db.enc").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(!got.exists(_ % 7 == 0))
    // the geometry column decodes from WKT storage to runtime WKB
    val g = spark.sql("SELECT id, st_x(geom) AS gx, x FROM gcat.db.enc")
      .filter(col("gx") =!= col("x")).count()
    assert(g == 0)
    // positional delete: kill one specific row, visible through catalog SQL
    val pos = Snapshots.read(spark, tbl)
      .select(expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") === 11).drop("id")
    Snapshots.deleteByPosition(spark, tbl, pos)
    assert(spark.sql("SELECT id FROM gcat.db.enc WHERE id = 11").count() == 0)
  }

  test("time travel and INSERT through the catalog") {
    val tbl = s"$warehouse/db/tt"
    val base = spark.range(10).toDF("id")
      .withColumn("geom", st_point(lit(1.0), lit(2.0)))
    GeoTable.write(GeoTable.withBbox(base, "geom").drop("geom_bbox"), tbl, "geom",
      res = 8, numFiles = 1)
    Snapshots.append(GeoTable.withBbox(
      spark.range(10, 25).toDF("id").withColumn("geom", st_point(lit(1.0), lit(2.0))),
      "geom"), tbl)
    assert(spark.sql("SELECT * FROM gcat.db.tt").count() == 25)
    assert(spark.sql("SELECT * FROM gcat.db.tt VERSION AS OF 1").count() == 10)
    // INSERT INTO commits a snapshot through the same CAS protocol
    spark.sql("INSERT INTO gcat.db.tt SELECT id, geom, geom_bbox FROM gcat.db.tt WHERE id < 3")
    assert(spark.sql("SELECT * FROM gcat.db.tt").count() == 28)
    assert(Snapshots.mainVersion(tbl) == 3)
  }

  test("CREATE TABLE PARTITIONED BY transforms: layout + pruning + DESCRIBE") {
    val tbl = s"$warehouse/pt/orders"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.pt")
    spark.sql(
      """CREATE TABLE gcat.pt.orders (id BIGINT, cat STRING, ts DATE)
        |PARTITIONED BY (bucket(4, id), years(ts))""".stripMargin)
    spark.sql(
      """INSERT INTO gcat.pt.orders
        |SELECT id, concat('c', id % 3) AS cat,
        |       date_add(date'2020-01-01', cast(id % 730 AS int)) AS ts
        |FROM range(200)""".stripMargin)
    assert(spark.sql("SELECT * FROM gcat.pt.orders").count() == 200)
    // data files landed under transform-derived partition directories
    val dirs = Files.list(java.nio.file.Paths.get(tbl)).iterator()
    val seen = Iterator.continually(dirs).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).filterNot(_.startsWith("_")).toSet
    assert(seen.exists(_.startsWith("id_bucket=")), s"expected bucket dirs, got $seen")
    // a bucket-key equality prunes to the files of one bucket
    val q = spark.sql("SELECT * FROM gcat.pt.orders WHERE id = 42")
    val total = SparkTestSession.plannedFiles(spark.sql("SELECT * FROM gcat.pt.orders"))
    val pruned = SparkTestSession.plannedFiles(q)
    assert(pruned < total, s"bucket filter should prune ($pruned vs $total files)")
    assert(q.count() == 1)
    // partitioning is visible through the DSv2 Table
    val parts = spark.sql("DESCRIBE TABLE gcat.pt.orders").collect().map(_.getString(0))
    assert(parts.contains("Part 0"), parts.mkString(","))
  }

  test("ALTER TABLE: add/rename/drop column + set/unset properties") {
    assert(warehouse.nonEmpty) // force catalog registration
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.alt")
    spark.sql("CREATE TABLE gcat.alt.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gcat.alt.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gcat.alt.t ADD COLUMN score DOUBLE")
    assert(spark.sql("SELECT * FROM gcat.alt.t").columns.toSeq == Seq("id", "name", "score"))
    assert(spark.sql("SELECT score FROM gcat.alt.t").collect().forall(_.isNullAt(0)))
    spark.sql("INSERT INTO gcat.alt.t VALUES (3, 'c', 9.5)")
    spark.sql("ALTER TABLE gcat.alt.t RENAME COLUMN name TO label")
    val got = spark.sql("SELECT label, score FROM gcat.alt.t WHERE id = 3").collect().head
    assert(got.getString(0) == "c" && got.getDouble(1) == 9.5)
    spark.sql("ALTER TABLE gcat.alt.t DROP COLUMN score")
    assert(spark.sql("SELECT * FROM gcat.alt.t").columns.toSeq == Seq("id", "label"))
    // properties commit as metadata-only snapshots and carry forward
    spark.sql("ALTER TABLE gcat.alt.t SET TBLPROPERTIES ('write.target-size' = '512m')")
    val props = spark.sql("SHOW TBLPROPERTIES gcat.alt.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.target-size").contains("512m"))
    spark.sql("ALTER TABLE gcat.alt.t UNSET TBLPROPERTIES ('write.target-size')")
    val after = spark.sql("SHOW TBLPROPERTIES gcat.alt.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!after.contains("write.target-size"))
    // data unaffected by the metadata-only commits
    assert(spark.sql("SELECT * FROM gcat.alt.t").count() == 3)
  }

  test("CTAS, row-level DML on catalog identifiers, TRUNCATE") {
    assert(warehouse.nonEmpty) // force catalog registration
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    // CTAS: createTable + append through V1_BATCH_WRITE
    spark.sql(
      """CREATE TABLE gcat.dml.t AS
        |SELECT id, concat('n', id) AS name, cast(id % 5 AS double) AS score
        |FROM range(100)""".stripMargin)
    assert(spark.sql("SELECT * FROM gcat.dml.t").count() == 100)
    // DELETE with an arbitrary expression (graft parser, CoW rewrite)
    spark.sql("DELETE FROM gcat.dml.t WHERE id % 2 = 1")
    assert(spark.sql("SELECT * FROM gcat.dml.t").count() == 50)
    assert(spark.sql("SELECT max(id % 2) FROM gcat.dml.t").first().getLong(0) == 0)
    // UPDATE
    spark.sql("UPDATE gcat.dml.t SET score = score + 100 WHERE id < 10")
    assert(spark.sql("SELECT count(*) FROM gcat.dml.t WHERE score >= 100").first().getLong(0) == 5)
    // full MERGE on the catalog identifier
    spark.sql(
      """MERGE INTO gcat.dml.t AS t
        |USING (SELECT cast(2 AS bigint) AS id, 'merged' AS name, 7.0 AS score
        |       UNION ALL SELECT 999, 'new', 1.0) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET name = s.name
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val merged = spark.sql("SELECT name FROM gcat.dml.t WHERE id IN (2, 999)")
      .collect().map(_.getString(0)).sorted
    assert(merged.toSeq == Seq("merged", "new"))
    assert(spark.sql("SELECT * FROM gcat.dml.t").count() == 51)
    // DML on a non-graft identifier still reaches Spark's own analysis
    val err = intercept[Exception](spark.sql("DELETE FROM nosuch.db.t WHERE id = 1"))
    assert(!err.getMessage.contains("graft"), err.getMessage)
    // TRUNCATE TABLE goes through SupportsDelete.deleteWhere(AlwaysTrue)
    spark.sql("TRUNCATE TABLE gcat.dml.t")
    assert(spark.sql("SELECT * FROM gcat.dml.t").count() == 0)
    // schema survives truncation; the table accepts new inserts
    spark.sql("INSERT INTO gcat.dml.t VALUES (1, 'a', 0.5)")
    assert(spark.sql("SELECT * FROM gcat.dml.t").count() == 1)
  }

  test("CTAS entries are re-stamped to the PUBLISHED version, so the first " +
      "equality delete on the new table applies") {
    import spark.implicits._
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    spark.sql("CREATE TABLE gcat.dml.ctas_stamp AS SELECT id FROM range(20)")
    val p = s"$warehouse/dml/ctas_stamp"
    val head = graft.spatial.Snapshots.mainVersion(p)
    val entries = graft.spatial.Snapshots.readManifest(p)
    assert(entries.nonEmpty && entries.forall(_.addedV == head),
      s"staging-version stamps must not survive the publish: " +
        s"head=$head stamps=${entries.map(_.addedV).distinct}")
    // the regression this guards: files stamped with the STAGING counter
    // (v2) exempt themselves from the table's first eq-delete (seq=2)
    graft.spatial.Snapshots.deleteByEquality(spark, p, Seq(3L, 5L).toDF("id"))
    assert(spark.sql("SELECT count(*) FROM gcat.dml.ctas_stamp").head.getLong(0) == 18)
  }

  test("metadata tables resolve as catalog identifiers: cat.db.t.files") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.meta")
    spark.sql("CREATE TABLE gcat.meta.m AS SELECT id, id * 2 AS v FROM range(10)")
    spark.sql("INSERT INTO gcat.meta.m VALUES (100, 200)")
    val files = spark.sql("SELECT * FROM gcat.meta.m.files")
    assert(files.count() >= 2)
    assert(files.columns.contains("file_path"))
    // atomic CTAS is ONE staged commit (v1 with files); our INSERT is v2
    assert(spark.sql("SELECT * FROM gcat.meta.m.snapshots").count() == 2)
    assert(spark.sql("SELECT * FROM gcat.meta.m.history").count() == 2)
    assert(spark.sql("SELECT * FROM gcat.meta.m.refs").count() >= 1)
    // full-history changelog: 10 CTAS inserts @ordinal 0 + 1 insert @1
    val ch = spark.sql(
      "SELECT _change_ordinal, count(*) AS n FROM gcat.meta.m.changes GROUP BY 1")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ch == Map(0 -> 10L, 1 -> 1L), s"got $ch")
    // unknown metadata name is a missing table, not an internal error
    val e = intercept[Exception](spark.sql("SELECT * FROM gcat.meta.m.nosuch").collect())
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }

  test("pos-delete state rides the partitions as file metadata, applied executor-side") {
    val tbl = s"$warehouse/db/bigdel"
    // 200k rows in 2 files; delete every even row → a 100k-row delete file
    val src = spark.range(200000).toDF("id")
      .withColumn("geom", st_point(lit(1.0), lit(2.0)))
    GeoTable.write(GeoTable.withBbox(src, "geom").drop("geom_bbox"), tbl, "geom",
      res = 8, numFiles = 2)
    val pos = Snapshots.read(spark, tbl).filter(col("id") % 2 === 0)
      .select(expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"))
    Snapshots.deleteByPosition(spark, tbl, pos)
    val q = spark.sql("SELECT id FROM gcat.db.bigdel")
    val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    val parts = scans.head.inputPartitions
    // the DRIVER plan ships delete-file REFERENCES (path + length), never
    // delete rows — each task resolves its own positions executor-side
    assert(parts.nonEmpty)
    val gps = parts.map(_.asInstanceOf[graft.sources.GraftInputPartition])
    assert(gps.forall(_.slices.forall(_.posDeletes.length == 1)),
      "each file slice must carry exactly its covering delete file ref")
    assert(gps.forall(_.slices.forall(_.posDeletes.forall(_.len > 0))))
    // 100k survivors, all odd: sum of first 100k odd numbers = 100000^2
    assert(q.count() == 100000)
    assert(spark.sql("SELECT sum(id) FROM gcat.db.bigdel").collect().head.getLong(0) ==
      10000000000L)
  }

  test("coverage-cache eviction never detaches still-referenced delete files") {
    import graft.sources.DeleteFiles
    val tbl = s"$warehouse/db/evict"
    val src = spark.range(1000).toDF("id")
      .withColumn("geom", st_point(lit(1.0), lit(2.0)))
    GeoTable.write(GeoTable.withBbox(src, "geom").drop("geom_bbox"), tbl, "geom",
      res = 8, numFiles = 2)
    def posOf(cond: org.apache.spark.sql.Column) =
      Snapshots.read(spark, tbl).filter(cond)
        .select(expr("_metadata.file_path").as("file_path"),
          expr("_metadata.row_index").as("pos"))
    // bound 0 forces a clear() on every recompute; the bug window needs a
    // NEW delete file arriving once others are already cached — the clear
    // then wiped the cached entries and (pre-fix) the result re-read them
    // as Nil, silently resurrecting their deleted rows
    val saved = DeleteFiles.CoverageMaxEntries
    DeleteFiles.CoverageMaxEntries = 0
    try {
      Snapshots.deleteByPosition(spark, tbl, posOf(col("id") < 100))
      Snapshots.deleteByPosition(spark, tbl, posOf(col("id") >= 900))
      assert(spark.read.format("graft").load(tbl).count() == 800L)
      // third delete file: its recompute triggers the clear() while the
      // first two files are served from cache in the same planning call
      Snapshots.deleteByPosition(spark, tbl,
        posOf(col("id") >= 400 && col("id") < 500))
      val counts = (1 to 2).map(_ =>
        spark.read.format("graft").load(tbl).count())
      assert(counts.forall(_ == 700L),
        s"all three delete files must stay attached across eviction, got $counts")
    } finally DeleteFiles.CoverageMaxEntries = saved
  }

  test("executor delete-file cache: LRU byte bound, parse-once across plannings") {
    import graft.sources.DeleteFileCache
    val tbl = s"$warehouse/db/evict2"
    val src = spark.range(600).toDF("id")
      .withColumn("geom", st_point(lit(1.0), lit(2.0)))
    GeoTable.write(GeoTable.withBbox(src, "geom").drop("geom_bbox"), tbl, "geom",
      res = 8, numFiles = 2)
    def posOf(cond: org.apache.spark.sql.Column) =
      Snapshots.read(spark, tbl).filter(cond)
        .select(expr("_metadata.file_path").as("file_path"),
          expr("_metadata.row_index").as("pos"))
    Snapshots.deleteByPosition(spark, tbl, posOf(col("id") < 50))
    Snapshots.deleteByPosition(spark, tbl, posOf(col("id") >= 550))
    Snapshots.deleteByPosition(spark, tbl, posOf(col("id") >= 300 && col("id") < 350))
    val savedBytes = DeleteFileCache.MaxBytes
    try {
      // generous bound: a second planning serves every delete index from
      // cache — zero re-parses (the clear-all predecessor wiped everything
      // once entry count crossed its bound)
      DeleteFileCache.MaxBytes = 256L * 1024 * 1024
      assert(spark.read.format("graft").load(tbl).count() == 450L)
      val p0 = DeleteFileCache.parses.get
      assert(spark.read.format("graft").load(tbl).count() == 450L)
      assert(DeleteFileCache.parses.get == p0, "hot delete indexes must not re-parse")
      // bound smaller than any entry: eviction is incremental (the
      // just-touched entry always survives) and never detaches deletes
      DeleteFileCache.MaxBytes = 1L
      (1 to 2).foreach(_ => assert(spark.read.format("graft").load(tbl).count() == 450L))
      assert(DeleteFileCache.cachedEntries >= 1)
    } finally DeleteFileCache.MaxBytes = savedBytes
  }

  test("branch-scoped SQL writes: INSERT INTO t.branch_x isolates main until fast_forward") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE gcat.br.t (id BIGINT) USING graft")
    spark.sql("INSERT INTO gcat.br.t VALUES (1),(2)")
    val tbl = s"$warehouse/br/t"
    Snapshots.createBranch(tbl, "dev")
    spark.sql("INSERT INTO gcat.br.t.branch_dev VALUES (3),(4)")
    // write-audit: branch sees the append, main is untouched
    assert(spark.sql("SELECT * FROM gcat.br.t").count() == 2)
    assert(spark.sql("SELECT * FROM gcat.br.t.branch_dev").count() == 4)
    assert(spark.sql("SELECT sum(id) FROM gcat.br.t.branch_dev").collect().head.getLong(0) == 10L)
    // publish: fast-forward main to the branch head, both refs now agree
    Snapshots.fastForward(tbl, "main", Snapshots.resolveRef(tbl, "dev"))
    assert(spark.sql("SELECT * FROM gcat.br.t").count() == 4)
    assert(spark.sql("SELECT * FROM gcat.br.t.branch_dev").count() == 4)
    // tags resolve for reads and refuse writes
    Snapshots.createTag(tbl, "v1")
    assert(spark.sql("SELECT * FROM gcat.br.t.tag_v1").count() == 4)
    intercept[Exception] { spark.sql("INSERT INTO gcat.br.t.tag_v1 VALUES (9)") }
    // overwrite of a branch head is rejected (WAP appends only)
    intercept[Exception] { spark.sql("INSERT OVERWRITE gcat.br.t.branch_dev VALUES (9)") }
    assert(spark.sql("SELECT * FROM gcat.br.t.branch_dev").count() == 4)
  }

  test("branch-scoped DML: DELETE/UPDATE/MERGE on t.branch_x isolate main until fast_forward") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE gcat.br.d (id BIGINT, v DOUBLE) USING graft " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql("INSERT INTO gcat.br.d SELECT id, CAST(id AS DOUBLE) FROM range(100)")
    val tbl = s"$warehouse/br/d"
    Snapshots.createBranch(tbl, "dev")
    // MoR DELETE against the branch: main untouched, branch sees it
    spark.sql("DELETE FROM gcat.br.d.branch_dev WHERE id < 10")
    assert(spark.sql("SELECT * FROM gcat.br.d").count() == 100, "main must be isolated")
    assert(spark.sql("SELECT * FROM gcat.br.d.branch_dev").count() == 90)
    // UPDATE against the branch
    spark.sql("UPDATE gcat.br.d.branch_dev SET v = v + 1000 WHERE id = 50")
    assert(spark.sql("SELECT v FROM gcat.br.d.branch_dev WHERE id = 50")
      .collect().head.getDouble(0) == 1050.0)
    assert(spark.sql("SELECT v FROM gcat.br.d WHERE id = 50")
      .collect().head.getDouble(0) == 50.0)
    // full MERGE against the branch
    spark.sql("MERGE INTO gcat.br.d.branch_dev AS t USING " +
      "(SELECT CAST(5000 AS BIGINT) AS id, CAST(1.5 AS DOUBLE) AS v) AS s ON t.id = s.id " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT * FROM gcat.br.d.branch_dev").count() == 91)
    assert(spark.sql("SELECT * FROM gcat.br.d").count() == 100)
    // publish the branch delta
    Snapshots.fastForward(tbl, "main", Snapshots.resolveRef(tbl, "dev"))
    assert(spark.sql("SELECT * FROM gcat.br.d").count() == 91)
    assert(spark.sql("SELECT v FROM gcat.br.d WHERE id = 50").collect().head.getDouble(0) == 1050.0)
    assert(spark.sql("SELECT * FROM gcat.br.d WHERE id < 10").count() == 0)
    // DML against a tag identifier is refused
    Snapshots.createTag(tbl, "rel1")
    intercept[Exception] { spark.sql("DELETE FROM gcat.br.d.tag_rel1 WHERE id = 11") }
    assert(spark.sql("SELECT * FROM gcat.br.d.tag_rel1").count() == 91)
  }

  test("partition-spec evolution: old files keep their layout, pruning spans generations") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.evo")
    spark.sql("CREATE TABLE gcat.evo.t (id BIGINT, cat STRING) PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO gcat.evo.t SELECT id, concat('c', id % 3) FROM range(100)")
    def parts(sql: String): Int =
      SparkTestSession.plannedFiles(spark.sql(sql))
    val genAFiles = parts("SELECT * FROM gcat.evo.t")
    val genAPruned = parts("SELECT * FROM gcat.evo.t WHERE id = 42")
    assert(genAPruned < genAFiles, "bucket pruning must work pre-evolution")

    // evolve: retire the id bucket, partition new files by a cat prefix
    spark.sql("ALTER TABLE gcat.evo.t REPLACE PARTITION FIELD bucket(4, id) WITH truncate(2, cat)")
    spark.sql("INSERT INTO gcat.evo.t SELECT id, concat('c', id % 3) FROM range(100)")
    val total = parts("SELECT * FROM gcat.evo.t")
    assert(spark.sql("SELECT * FROM gcat.evo.t").count() == 200)
    val genBFiles = total - genAFiles

    // predicate on the RETIRED spec's source: old files still prune by
    // their bucket dirs (partitionHistory keeps projecting bucket(4,id)),
    // so at most 1-of-4 gen-A bucket dirs survives; gen-B files (no bucket
    // dir) are only prunable by their id min/max stats — never wrongly
    // dropped (correctness assert below)
    val byId = parts("SELECT * FROM gcat.evo.t WHERE id = 42")
    assert(byId <= genAFiles / 4 + genBFiles,
      s"expected old-generation bucket pruning: $byId of $total (genA=$genAFiles, genB=$genBFiles)")
    assert(spark.sql("SELECT * FROM gcat.evo.t WHERE id = 42").count() == 2)

    // predicate on the NEW spec's source: gen-B files prune to one
    // truncate dir; gen-A files (no truncate dir) conservatively kept
    val byCat = parts("SELECT * FROM gcat.evo.t WHERE cat = 'c1'")
    assert(byCat < total,
      s"expected new-generation truncate pruning: $byCat of $total")
    assert(spark.sql("SELECT * FROM gcat.evo.t WHERE cat = 'c1'").count() == 66)

    // combined predicate prunes BOTH generations at once
    val combined = parts("SELECT * FROM gcat.evo.t WHERE id = 42 AND cat = 'c0'")
    assert(combined <= byId && combined < byCat,
      s"combined predicate must prune both generations: $combined vs $byId / $byCat")
    assert(spark.sql("SELECT * FROM gcat.evo.t WHERE id = 42 AND cat = 'c0'").count() == 2)

    // guardrails: identity evolution and EXPLICIT-name collisions are
    // rejected (an unnamed re-bucket auto-disambiguates instead — see the
    // REPLACE bucket test below)
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE gcat.evo.t ADD PARTITION FIELD cat"))
    assert(e1.getMessage.contains("identity"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE gcat.evo.t ADD PARTITION FIELD bucket(16, id, id_bucket)"))
    assert(e2.getMessage.contains("collides"), e2.getMessage)
  }

  test("REPLACE PARTITION FIELD bucket(4,id) WITH bucket(8,id): generations stay distinct") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.evo")
    spark.sql("CREATE TABLE gcat.evo.rb (id BIGINT, cat STRING) PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO gcat.evo.rb SELECT id, concat('c', id % 3) FROM range(100)")
    def parts(sql: String): Int =
      SparkTestSession.plannedFiles(spark.sql(sql))
    val genAFiles = parts("SELECT * FROM gcat.evo.rb")
    // the primary Iceberg REPLACE shape: widen the bucket on the same col
    spark.sql("ALTER TABLE gcat.evo.rb REPLACE PARTITION FIELD bucket(4, id) WITH bucket(8, id)")
    spark.sql("INSERT INTO gcat.evo.rb SELECT id + 100, concat('c', id % 3) FROM range(100)")
    assert(spark.sql("SELECT * FROM gcat.evo.rb").count() == 200)
    // the new generation lays out under its own derived dir (id_bucket8),
    // never mixing with the retired id_bucket dirs
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(warehouse, "evo", "rb"))
      .iterator()
    var sawOld = false; var sawNew = false
    dirs.forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.startsWith("id_bucket=")) sawOld = true
      if (n.startsWith("id_bucket8=")) sawNew = true
    }
    assert(sawOld && sawNew, "expected both bucket generations on disk")
    // point predicates prune through BOTH generations' own projections
    val total = parts("SELECT * FROM gcat.evo.rb")
    val oldGen = parts("SELECT * FROM gcat.evo.rb WHERE id = 42")
    val newGen = parts("SELECT * FROM gcat.evo.rb WHERE id = 142")
    assert(oldGen < total && newGen < total,
      s"both generations must prune: old=$oldGen new=$newGen total=$total (genA=$genAFiles)")
    assert(spark.sql("SELECT * FROM gcat.evo.rb WHERE id = 42").count() == 1)
    assert(spark.sql("SELECT * FROM gcat.evo.rb WHERE id = 142").count() == 1)
  }

  test("WRITE LOCALLY ORDERED BY sorts within tasks without a range exchange") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lo")
    spark.sql("CREATE TABLE gcat.lo.t (id BIGINT)")
    spark.sql("ALTER TABLE gcat.lo.t WRITE LOCALLY ORDERED BY id")
    assert(Snapshots.readProps(s"$warehouse/lo/t").get("write.order.mode").contains("local"))
    // 4 input tasks each spanning the FULL id range: a global range
    // exchange would produce disjoint per-file ranges; LOCALLY must keep
    // the overlap (sort inside each task only)
    import spark.implicits._
    spark.range(0, 400).map(i => (i % 4) * 1000 + i / 4).toDF("id")
      .repartition(4).createOrReplaceTempView("lo_src")
    spark.sql("INSERT INTO gcat.lo.t SELECT id FROM lo_src")
    val m = Snapshots.readManifest(s"$warehouse/lo/t")
    assert(m.size >= 2, s"need several files, got ${m.size}")
    val ranges = m.map(f => (f.mins("id").toString.toLong, f.maxs("id").toString.toLong))
    val overlapping = ranges.combinations(2).exists {
      case Seq((a1, a2), (b1, b2)) => a1 <= b2 && b1 <= a2
      case _ => false
    }
    assert(overlapping, s"local order must not range-partition globally: $ranges")
    // regular ORDERED BY on the same data DOES disjoint the ranges
    spark.sql("CREATE TABLE gcat.lo.g (id BIGINT)")
    spark.sql("ALTER TABLE gcat.lo.g WRITE ORDERED BY id")
    spark.sql("INSERT INTO gcat.lo.g SELECT id FROM lo_src")
    val g = Snapshots.readManifest(s"$warehouse/lo/g")
      .map(f => (f.mins("id").toString.toLong, f.maxs("id").toString.toLong)).sortBy(_._1)
    g.sliding(2).foreach {
      case Seq((_, amax), (bmin, _)) => assert(amax <= bmin, s"global order overlaps: $g")
      case _ =>
    }
  }

  test("WRITE ORDERED BY hilbert: plain INSERT INTO yields spatially clustered files") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.wo")
    spark.sql(
      """CREATE TABLE gcat.wo.t (id BIGINT, part INT, geom BINARY,
        |geom_bbox STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)""".stripMargin)
    spark.sql("ALTER TABLE gcat.wo.t WRITE ORDERED BY hilbert(geom, 8, -12, -12, 12, 12)")
    // quadrant fixture as a SOURCE view: the insert path must do the clustering
    val rows = for {
      quadrant <- 0 until 4
      k <- 1 to 10
      (cx, cy) = quadrant match {
        case 0 => (k.toDouble, k.toDouble)
        case 1 => (-k.toDouble, k.toDouble)
        case 2 => (-k.toDouble, -k.toDouble)
        case 3 => (k.toDouble, -k.toDouble)
      }
      geom <- Seq(
        graft.functions.GeoCodec.writeWkb(graft.functions.GeoCodec.point(cx, cy)),
        graft.functions.GeoCodec.writeWkb(graft.functions.GeoCodec.point(cx, cy).buffer(0.5)))
    } yield Row((quadrant * 10 + k - 1).toLong, quadrant, geom)
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("part", IntegerType, nullable = false), StructField("geom", BinaryType)))
    // quadrants deliberately INTERLEAVED across the 4 input partitions
    GeoTable.withBbox(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema), "geom")
      .createOrReplaceTempView("wo_src")
    spark.sql("INSERT INTO gcat.wo.t SELECT * FROM wo_src")
    def parts(sql: String): Int =
      SparkTestSession.plannedFiles(spark.sql(sql))
    val total = parts("SELECT * FROM gcat.wo.t")
    assert(total >= 2, s"expected multiple files, got $total")
    assert(spark.sql("SELECT * FROM gcat.wo.t").count() == 80)
    // spatial locality: the quadrant-0 window must not touch every file
    val pruned =
      parts("SELECT * FROM gcat.wo.t WHERE geom_bbox.xmin > 0 AND geom_bbox.ymin > 0")
    assert(pruned < total,
      s"declared hilbert order should cluster quadrants: scanned $pruned of $total")
    assert(spark.sql(
      "SELECT * FROM gcat.wo.t WHERE geom_bbox.xmin > 0 AND geom_bbox.ymin > 0").count() == 20)
    // WRITE UNORDERED clears the declared order
    spark.sql("ALTER TABLE gcat.wo.t WRITE UNORDERED")
    assert(!spark.sql("SHOW TBLPROPERTIES gcat.wo.t").collect()
      .exists(_.getString(0) == "write.order"))
  }

  test("atomic CTAS and REPLACE TABLE: failure leaves nothing, replace all-or-nothing") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.stg")
    spark.sql("CREATE TABLE gcat.stg.ok AS SELECT id, id * 2 AS v FROM range(10)")
    assert(spark.sql("SELECT * FROM gcat.stg.ok").count() == 10)

    // failing CTAS: no table, no dir, no staged debris
    intercept[Exception](spark.sql(
      """CREATE TABLE gcat.stg.bad AS
        |SELECT IF(id < 5, CAST(id AS STRING), raise_error('boom')) AS s FROM range(10)"""
        .stripMargin).collect())
    assert(!spark.sql("SHOW TABLES IN gcat.stg").collect()
      .map(_.getString(1)).contains("bad"), "failed CTAS must leave no table")
    assert(java.nio.file.Files.notExists(java.nio.file.Paths.get(warehouse, "stg", "bad")))
    val leftovers = Files.list(java.nio.file.Paths.get(warehouse, "stg")).iterator()
    val names = Iterator.continually(leftovers).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).toSet
    assert(!names.exists(_.startsWith(".staging")), s"staged debris left: $names")

    // REPLACE swaps schema + contents in one snapshot, history retained
    spark.sql("REPLACE TABLE gcat.stg.ok AS SELECT id AS k FROM range(5)")
    assert(spark.sql("SELECT * FROM gcat.stg.ok").columns.toSeq == Seq("k"))
    assert(spark.sql("SELECT * FROM gcat.stg.ok").count() == 5)
    assert(spark.sql("SELECT * FROM gcat.stg.ok VERSION AS OF 1").count() == 10,
      "REPLACE must retain prior snapshots for time travel")

    // failed REPLACE leaves the current table fully intact
    intercept[Exception](spark.sql(
      """REPLACE TABLE gcat.stg.ok AS
        |SELECT IF(id < 2, CAST(id AS STRING), raise_error('boom')) AS s FROM range(5)"""
        .stripMargin).collect())
    assert(spark.sql("SELECT * FROM gcat.stg.ok").count() == 5)
    assert(spark.sql("SELECT * FROM gcat.stg.ok").columns.toSeq == Seq("k"))

    // CREATE OR REPLACE on a fresh name creates
    spark.sql("CREATE OR REPLACE TABLE gcat.stg.fresh AS SELECT 1 AS one")
    assert(spark.sql("SELECT * FROM gcat.stg.fresh").count() == 1)
  }

  test("view column lists, COMMENT, and TBLPROPERTIES (reference DDL surface)") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.vddl")
    spark.sql("CREATE TABLE gcat.vddl.src AS SELECT id, id * 2 AS dbl FROM range(5)")
    spark.sql(
      """CREATE VIEW gcat.vddl.renamed (key COMMENT 'the id', twice)
        |COMMENT 'a documented view'
        |TBLPROPERTIES ('owner' = 'graft', 'tier' = 'gold')
        |AS SELECT id, dbl FROM gcat.vddl.src""".stripMargin)
    // the declared column list renames the body's output
    val df = spark.sql("SELECT key, twice FROM gcat.vddl.renamed WHERE key >= 3 ORDER BY key")
    assert(df.columns.toSeq == Seq("key", "twice"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 6L), (4L, 8L)))
    // DataFrame-API resolution sees the same aliased schema
    assert(spark.table("gcat.vddl.renamed").columns.toSeq == Seq("key", "twice"))
    // comment + properties persist through the ViewCatalog face
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val v = cat.loadView(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("vddl"), "renamed"))
    assert(v.properties().get("owner") == "graft")
    assert(v.properties().get("tier") == "gold")
    assert(v.properties().get("comment") == "a documented view")
    assert(v.schema().fieldNames.toSeq == Seq("key", "twice"))
    // quote-aware parsing: ')' and ',' inside quoted values must not
    // truncate the parenthesized groups or split entries (r7 advisor)
    spark.sql(
      """CREATE VIEW gcat.vddl.tricky (key COMMENT 'id, the (primary) one', twice)
        |TBLPROPERTIES ('note' = 'contains ) and , chars')
        |AS SELECT id, dbl FROM gcat.vddl.src""".stripMargin)
    val tv = cat.loadView(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("vddl"), "tricky"))
    assert(tv.properties().get("note") == "contains ) and , chars")
    assert(tv.columnComments().toSeq.headOption.contains("id, the (primary) one"))
    spark.sql("ALTER VIEW gcat.vddl.tricky SET TBLPROPERTIES ('note' = 'a)b,c')")
    assert(cat.loadView(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("vddl"), "tricky")).properties().get("note") == "a)b,c")
    // a wrong-arity column list fails at definition time
    val err = intercept[Exception] {
      spark.sql("CREATE VIEW gcat.vddl.bad (only_one) AS SELECT id, dbl FROM gcat.vddl.src")
    }
    assert(err.getMessage.contains("2 columns"))
    // ALTER VIEW SET / UNSET TBLPROPERTIES round-trips the stored map
    spark.sql("ALTER VIEW gcat.vddl.renamed SET TBLPROPERTIES ('tier' = 'silver', 'ttl' = '30d')")
    spark.sql("ALTER VIEW gcat.vddl.renamed UNSET TBLPROPERTIES ('owner')")
    val v2 = cat.loadView(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("vddl"), "renamed"))
    assert(v2.properties().get("tier") == "silver")
    assert(v2.properties().get("ttl") == "30d")
    assert(!v2.properties().containsKey("owner"))
    assert(v2.schema().fieldNames.toSeq == Seq("key", "twice"), "schema survives props DDL")
    assert(spark.sql("SELECT key FROM gcat.vddl.renamed").count() == 5)
  }

  test("catalog-level views: CREATE/SELECT/SHOW/ALTER/RENAME/DROP VIEW") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.vw")
    spark.sql("CREATE TABLE gcat.vw.base AS SELECT id, id % 3 AS grp FROM range(30)")
    spark.sql(
      "CREATE VIEW gcat.vw.bysum AS SELECT grp, sum(id) AS s FROM gcat.vw.base GROUP BY grp")
    val got = spark.sql("SELECT * FROM gcat.vw.bysum ORDER BY grp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 135L), (1L, 145L), (2L, 155L)))
    // substitution is an ANALYZER rule: DataFrame-API reads that never
    // pass through the SQL parser resolve the view too
    val api = spark.table("gcat.vw.bysum").orderBy("grp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(api == got, "spark.table must resolve catalog views")
    // cyclic definitions trip the nesting cap with a clear error instead
    // of running the analyzer to its iteration limit (REPLACE validates
    // against the PRE-replace state, which is how a cycle can form)
    spark.sql("CREATE VIEW gcat.vw.cyc_b AS SELECT 1 AS x")
    spark.sql("CREATE VIEW gcat.vw.cyc_a AS SELECT * FROM gcat.vw.cyc_b")
    spark.sql("CREATE OR REPLACE VIEW gcat.vw.cyc_b AS SELECT * FROM gcat.vw.cyc_a")
    val err = intercept[Throwable](spark.sql("SELECT * FROM gcat.vw.cyc_a").collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("cyclic")),
      s"expected a cyclic-view error, got: $err")
    spark.sql("DROP VIEW gcat.vw.cyc_a")
    spark.sql("DROP VIEW gcat.vw.cyc_b")
    // cycle detection is by in-flight re-entry, not raw depth: a deep but
    // acyclic chain resolves fine
    spark.sql("CREATE VIEW gcat.vw.chain_0 AS SELECT 7 AS x")
    (1 to 12).foreach(i =>
      spark.sql(s"CREATE VIEW gcat.vw.chain_$i AS SELECT x FROM gcat.vw.chain_${i - 1}"))
    assert(spark.sql("SELECT x FROM gcat.vw.chain_12").collect().head.getInt(0) == 7)
    (0 to 12).foreach(i => spark.sql(s"DROP VIEW gcat.vw.chain_$i"))
    // the view tracks base-table changes (stored SQL, not materialized)
    spark.sql("INSERT INTO gcat.vw.base VALUES (99, 0)")
    assert(spark.sql("SELECT s FROM gcat.vw.bysum WHERE grp = 0")
      .collect().head.getLong(0) == 234L)
    // the view resolves relative names in its stored namespace context
    spark.sql("USE gcat.vw")
    try {
      spark.sql("CREATE VIEW rel AS SELECT count(*) AS n FROM base")
      assert(spark.sql("SELECT n FROM rel").collect().head.getLong(0) == 31L)
    } finally spark.sql("USE spark_catalog.default")
    assert(spark.sql("SHOW VIEWS IN gcat.vw").collect()
      .map(_.getString(1)).toSet == Set("bysum", "rel"))
    spark.sql("ALTER VIEW gcat.vw.rel RENAME TO gcat.vw.rel2")
    assert(spark.sql("SELECT n FROM gcat.vw.rel2").collect().head.getLong(0) == 31L)
    spark.sql("DROP VIEW gcat.vw.rel2")
    intercept[Exception](spark.sql("SELECT * FROM gcat.vw.rel2").collect())
    // views never shadow tables in listings
    assert(spark.sql("SHOW TABLES IN gcat.vw").collect()
      .map(_.getString(1)).contains("base"))
  }

  test("views: CTE bodies, subquery references, temp-view precedence, foreign catalogs") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.vx")
    spark.sql("CREATE TABLE gcat.vx.t AS SELECT id, id % 2 AS par FROM range(20)")

    // a WITH clause inside the view body: the CTE reference must stay a
    // CTE reference, not get qualified into gcat.vx.c
    spark.sql(
      """CREATE VIEW gcat.vx.wv AS
        |WITH c AS (SELECT id FROM gcat.vx.t WHERE id < 5)
        |SELECT count(*) AS n FROM c""".stripMargin)
    assert(spark.sql("SELECT n FROM gcat.vx.wv").collect().head.getLong(0) == 5L)

    // a graft view referenced inside a subquery expression substitutes too
    assert(spark.sql(
      "SELECT count(*) AS k FROM gcat.vx.t WHERE id IN (SELECT n FROM gcat.vx.wv)")
      .collect().head.getLong(0) == 1L) // only id=5 matches n=5

    spark.sql("USE gcat.vx")
    try {
      // an outer-query CTE sharing the view's name: the CTE wins
      assert(spark.sql("WITH wv AS (SELECT 42 AS n) SELECT n FROM wv")
        .collect().head.getInt(0) == 42)

      // sequential CTE scoping: inside its own (non-recursive) definition
      // the name is NOT in scope, so it must substitute to the graft view
      // — the standard view-shadowing pattern WITH v AS (SELECT..FROM v..)
      assert(spark.sql("WITH wv AS (SELECT n + 1 AS n FROM wv) SELECT n FROM wv")
        .collect().head.getLong(0) == 6L) // graft view wv yields n=5

      // forward references are not in scope either: `a` is defined before
      // `wv2`, so `FROM wv` inside `a` reads the graft view
      assert(spark.sql(
        "WITH a AS (SELECT n FROM wv), wv2 AS (SELECT 0 AS n) SELECT n FROM a")
        .collect().head.getLong(0) == 5L)

      // session temp views shadow graft views (Spark resolution order);
      // DROP VIEW drops the temp view first, unmasking the graft view
      spark.sql("CREATE VIEW shadowed AS SELECT 1 AS one")
      spark.range(1).selectExpr("CAST(7 AS INT) AS one")
        .createOrReplaceTempView("shadowed")
      assert(spark.sql("SELECT one FROM shadowed").collect().head.getInt(0) == 7)
      spark.sql("DROP VIEW shadowed") // Spark semantics: temp view goes first
      assert(spark.sql("SELECT one FROM shadowed").collect().head.getInt(0) == 1)
      spark.sql("DROP VIEW shadowed")

      // an explicit NON-graft catalog qualifier is never routed into the
      // graft warehouse, even while a graft catalog is current
      spark.sql("CREATE VIEW spark_catalog.default.foreign_v AS SELECT 3 AS three")
      try {
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(warehouse, "spark_catalog", "default", "foreign_v")),
          "foreign-catalog view must not land in the graft warehouse")
        assert(spark.sql("SELECT three FROM spark_catalog.default.foreign_v")
          .collect().head.getInt(0) == 3)
      } finally spark.sql("DROP VIEW spark_catalog.default.foreign_v")
    } finally spark.sql("USE spark_catalog.default")
  }

  test("WRITE DISTRIBUTED BY PARTITION: one shuffle, few files per partition dir") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.wd")
    spark.sql(
      "CREATE TABLE gcat.wd.t (id BIGINT, v STRING) PARTITIONED BY (bucket(4, id))")
    spark.sql("ALTER TABLE gcat.wd.t WRITE DISTRIBUTED BY PARTITION")
    // a 16-partition source would otherwise write up to 16 files per bucket
    spark.range(0, 400, 1, 16).toDF("id")
      .withColumn("v", concat(lit("v"), col("id")))
      .createOrReplaceTempView("wd_src")
    spark.sql("INSERT INTO gcat.wd.t SELECT * FROM wd_src")
    val files = Snapshots.readManifest(s"$warehouse/wd/t")
    assert(files.nonEmpty && files.forall(_.path.contains("id_bucket=")))
    // hash distribution: each bucket dir written by ONE task → 4 files,
    // not tasks × dirs
    assert(files.size <= 4,
      s"expected at most one file per bucket dir, got ${files.size}")
    assert(spark.sql("SELECT * FROM gcat.wd.t").count() == 400)
  }

  test("catalog DDL basics: create, list, rename, drop") {
    import org.apache.spark.sql.types._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ddl")
    spark.sql("CREATE TABLE gcat.ddl.fresh (id BIGINT, name STRING)")
    assert(spark.sql("SELECT * FROM gcat.ddl.fresh").count() == 0)
    spark.sql("INSERT INTO gcat.ddl.fresh VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT * FROM gcat.ddl.fresh").count() == 2)
    assert(spark.sql("SHOW TABLES IN gcat.ddl").collect().map(_.getString(1)).contains("fresh"))
    spark.sql("ALTER TABLE gcat.ddl.fresh RENAME TO ddl.fresh2")
    assert(spark.sql("SELECT * FROM gcat.ddl.fresh2").count() == 2)
    spark.sql("DROP TABLE gcat.ddl.fresh2")
    intercept[Exception](spark.sql("SELECT * FROM gcat.ddl.fresh2").collect())
    // filesystem backend: the directory IS the catalog entry, so a plain
    // DROP removes it with the entry (the reference's HadoopCatalog
    // posture, SparkCatalog.java:372-374) — and a re-CREATE starts empty
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(warehouse, "ddl", "fresh2")))
    spark.sql("CREATE TABLE gcat.ddl.fresh2 (id BIGINT)")
    assert(spark.sql("SELECT * FROM gcat.ddl.fresh2").count() == 0)
    spark.sql("DROP TABLE gcat.ddl.fresh2")
  }

  test("CALL <catalog>.system.<proc> with identifier table args (reference form)") {
    val tbl = s"$warehouse/db/callid"
    writeQuadrants(tbl)
    // identifier relative to the CALL's own catalog
    val r = spark.sql("CALL gcat.system.compute_table_stats('db.callid')").collect()
    assert(r.head.getString(1).startsWith("ndv_columns="))
    assert(graft.spatial.Snapshots.ndvStats(tbl, None).nonEmpty)
    // fully-qualified identifier and literal path keep working
    spark.sql("CALL gcat.system.compute_table_stats('gcat.db.callid')")
    spark.sql(s"CALL graft.system.compute_table_stats('$tbl')")
    // a CALL against a catalog this extension does not own falls through
    // to Spark's parser (and fails there), instead of being swallowed
    intercept[Exception] {
      spark.sql("CALL sparky.system.compute_table_stats('db.callid')")
    }
  }

  test("VERSION AS OF accepts a branch or tag name like the reference") {
    val tbl = s"$warehouse/db/refver"
    writeQuadrants(tbl)
    val v1 = graft.spatial.Snapshots.mainVersion(tbl)
    spark.sql(s"ALTER TABLE '$tbl' CREATE TAG stable")
    spark.sql(s"ALTER TABLE '$tbl' CREATE BRANCH audit")
    // advance the branch past main
    graft.spatial.Snapshots.appendToBranch(
      spark.range(5).selectExpr("id + 1000 AS id", "CAST(0 AS INT) AS part",
        "CAST(NULL AS BINARY) AS geom"), tbl, "audit")
    assert(spark.sql("SELECT * FROM gcat.db.refver VERSION AS OF 'stable'").count() == 80)
    assert(spark.sql("SELECT * FROM gcat.db.refver VERSION AS OF 'audit'").count() == 85)
    assert(spark.sql(s"SELECT * FROM gcat.db.refver VERSION AS OF $v1").count() == 80)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.db.refver VERSION AS OF 'nope'").collect()
    }
    assert(e.getMessage.contains("no such snapshot version, branch, or tag"))
  }

  test("ALTER TABLE is statement-atomic: a failing change rolls back the " +
      "changes applied before it") {
    spark.sql("CREATE TABLE gcat.db.atomic (id BIGINT, v STRING)")
    // the second column collides — the FIRST must not survive the failure
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db.atomic ADD COLUMNS (fresh INT, v INT)")
    }
    assert(e.getMessage.contains("v"), e.getMessage)
    val cols = spark.table("gcat.db.atomic").columns.toSeq
    assert(cols == Seq("id", "v"),
      s"half-applied ALTER: $cols (fresh must have rolled back)")
    // and a clean ALTER still applies
    spark.sql("ALTER TABLE gcat.db.atomic ADD COLUMNS (fresh INT)")
    assert(spark.table("gcat.db.atomic").columns.toSeq == Seq("id", "v", "fresh"))
  }

  test("PARTITIONED BY resolves its source column case-insensitively under " +
      "the default analysis mode, using the schema's canonical casing") {
    spark.sql("CREATE TABLE gcat.db.ci (ts TIMESTAMP, id INT) " +
      "PARTITIONED BY (years(TS))")
    spark.sql("INSERT INTO gcat.db.ci SELECT timestamp'2024-03-01 00:00:00', 1")
    assert(spark.sql("SELECT id FROM gcat.db.ci").collect().map(_.getInt(0)).toSeq == Seq(1))
    // dirs carry the canonical (schema) column casing
    val files = graft.spatial.Snapshots.readManifest(s"$warehouse/db/ci")
    assert(files.forall(_.path.startsWith("ts_year=")),
      s"canonical-cased derived dir expected: ${files.map(_.path)}")
  }
}
