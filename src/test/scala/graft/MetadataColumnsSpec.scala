package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoCodec
import graft.spatial.{GeoTable, Snapshots}

/** Metadata columns in DQL — `SELECT _file, _pos, _deleted FROM t` (the
  * reference's `MetadataColumns.java:33-51`: FILE_PATH / ROW_POSITION /
  * IS_DELETED; test `TestMetaColumnProjectionWithStageScan.java`).
  *
  * Also pins the row-index contract: `_pos` (and positional-delete
  * application) must be file-absolute even when a pushed filter prunes
  * parquet row groups — the reader's row-index generator serves positions,
  * not a read-side counter.
  */
class MetadataColumnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mk(ids: Range) = {
    val rows = ids.map(i => Row(i.toLong, s"cat${i % 3}",
      GeoCodec.writeWkb(GeoCodec.point(i % 50 + 1.0, i % 40 + 1.0))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("category", StringType),
        StructField("geom", BinaryType))))
    GeoTable.withBbox(df, "geom")
  }

  private def mkTable(n: Int): String = {
    graft.spatial.Geo.install(spark)
    val d = Files.createTempDirectory("graft_metacol").toString
    GeoTable.write(mk(0 until n), d, "geom", res = 8, numFiles = 1)
    d
  }

  /** Table whose single file stores rows in id order (no hilbert
    * clustering): id == file row position — the oracle the row-group
    * pruning tests need.
    */
  private def mkOrderedTable(n: Int): String = {
    graft.spatial.Geo.install(spark)
    val d = Files.createTempDirectory("graft_metacol_ord").toString
    mk(0 until n).coalesce(1).write.mode("overwrite").parquet(d)
    GeoTable.writeManifest(spark, d)
    d
  }

  test("path read: _file and _pos match the V1 _metadata oracle") {
    val d = mkTable(100)
    Snapshots.append(mk(100 until 150), d) // second file
    val out = spark.read.format("graft").load(d)
      .select(col("id"), col("_file"), col("_pos")).collect()
    assert(out.length == 150)
    val files = out.map(_.getString(1)).distinct
    assert(files.length == 2, s"expected 2 data files, got ${files.toSeq}")
    assert(files.forall(_.contains(d)), "absolute paths under the table dir")
    // oracle: Spark's own parquet _metadata columns over the same files
    val expect = spark.read.parquet(d).select(col("id"),
        col("_metadata.file_path"), col("_metadata.row_index")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    out.foreach { r =>
      val (ef, ep) = expect(r.getLong(0))
      assert(ef.endsWith(r.getString(1)) || r.getString(1).endsWith(ef.stripPrefix("file:")),
        s"file for id ${r.getLong(0)}: ${r.getString(1)} vs $ef")
      assert(ep == r.getLong(2), s"pos for id ${r.getLong(0)}")
    }
  }

  test("catalog read: SELECT _file, _pos via SQL, pruning intact") {
    val wh = Files.createTempDirectory("graft_metacol_wh").toString
    spark.conf.set("spark.sql.catalog.mcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mcat.warehouse", wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    graft.spatial.Geo.install(spark)
    mk(0 until 80).coalesce(1).write.mode("overwrite").parquet(s"$wh/db/mt")
    GeoTable.writeManifest(spark, s"$wh/db/mt")
    val out = spark.sql("SELECT id, _file, _pos FROM mcat.db.mt WHERE id >= 10")
    val rows = out.collect()
    assert(rows.length == 70)
    assert(rows.forall(r => r.getLong(2) == r.getLong(0)), "ordered file: pos == id")
    // column pruning holds with metadata columns in the projection: the
    // scan reads id + the meta tail, not category/geom
    val scans = out.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    assert(scans.nonEmpty)
    val fields = scans.head.readSchema().fieldNames.toSet
    assert(fields == Set("id", "_file", "_pos"), s"read schema: $fields")
  }

  test("_pos stays file-absolute when a pushed filter prunes row groups") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setInt("parquet.block.size", 4096)
    hc.setInt("parquet.page.size", 1024)
    val d = try mkOrderedTable(2000) finally {
      hc.unset("parquet.block.size"); hc.unset("parquet.page.size")
    }
    // the single data file must actually contain multiple row groups, or
    // this test can't see the counter-vs-row-index difference
    val file = Snapshots.readManifest(d).head.path
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      spark.sparkContext.hadoopConfiguration,
      new org.apache.hadoop.fs.Path(s"$d/$file"))
    assert(footer.getBlocks.size() > 1, s"expected >1 row groups, got ${footer.getBlocks.size()}")
    // ids were written sorted, so id == position; the id >= 1500 filter
    // prunes leading row groups via their min/max stats
    val out = spark.read.format("graft").load(d)
      .where(col("id") >= 1500).select(col("id"), col("_pos")).collect()
    assert(out.length == 500)
    assert(out.forall(r => r.getLong(1) == r.getLong(0)),
      "positions must be file-absolute, not relative to the unpruned groups")
  }

  test("positional delete applies correctly under row-group pruning") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setInt("parquet.block.size", 4096)
    hc.setInt("parquet.page.size", 1024)
    val d = try mkOrderedTable(2000) finally {
      hc.unset("parquet.block.size"); hc.unset("parquet.page.size")
    }
    Snapshots.updateProperties(d, Map("write.delete.mode" -> "merge-on-read"))
    Snapshots.delete(spark, d, col("id") === 1880L)
    assert(Snapshots.readPosDeletes(d, None).nonEmpty, "expected a MoR positional delete")
    val ids = spark.read.format("graft").load(d)
      .where(col("id") >= 1500).select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(1880L), "the deleted row must not survive a row-group-pruned read")
    assert(ids.contains(1879L) && ids.contains(1881L), "neighbors must survive")
    assert(ids.size == 499)
  }

  test("_deleted marks MoR-deleted rows and keeps them in the output") {
    val d = mkTable(50)
    Snapshots.updateProperties(d, Map("write.delete.mode" -> "merge-on-read"))
    Snapshots.delete(spark, d, col("id").isin(7L, 13L))
    // without _deleted: rows are filtered
    assert(spark.read.format("graft").load(d).count() == 48)
    // with _deleted: every row surfaces, deleted ones flagged
    val out = spark.read.format("graft").load(d)
      .select(col("id"), col("_deleted")).collect()
    assert(out.length == 50)
    val deleted = out.filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    assert(deleted == Set(7L, 13L), s"flagged: $deleted")
  }

  test("_partition serves the typed per-file partition key; null for pre-spec files") {
    val wh = Files.createTempDirectory("graft_metacol_part_wh").toString
    spark.conf.set("spark.sql.catalog.mpc", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mpc.warehouse", wh)
    spark.sql("CREATE TABLE mpc.db.pt (id BIGINT, v DOUBLE) USING graft " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO mpc.db.pt SELECT id, CAST(id AS DOUBLE) FROM range(100)")
    val rows = spark.sql("SELECT id, _partition FROM mpc.db.pt").collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val st = r.getStruct(1)
      val expect = Math.floorMod(
        org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
          r.getLong(0), org.apache.spark.sql.types.LongType, 42L).toInt, 4)
      assert(st.getInt(st.fieldIndex("id_bucket")) == expect, s"id=${r.getLong(0)}")
    }
    // an unpartitioned table does not expose _partition at all
    val d = mkTable(10)
    val e = intercept[Exception] {
      spark.read.format("graft").load(d).select("_partition").collect()
    }
    assert(e.getMessage.contains("_partition"), e.getMessage)
  }

  test("_partition after spec evolution: pre-spec files read null") {
    val wh = Files.createTempDirectory("graft_metacol_evo_wh").toString
    spark.conf.set("spark.sql.catalog.mpe", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mpe.warehouse", wh)
    spark.sql("CREATE TABLE mpe.db.et (id BIGINT, v DOUBLE) USING graft")
    spark.sql("INSERT INTO mpe.db.et SELECT id, CAST(id AS DOUBLE) FROM range(20)")
    spark.sql("ALTER TABLE mpe.db.et ADD PARTITION FIELD bucket(4, id)")
    spark.sql("INSERT INTO mpe.db.et SELECT id + 100, CAST(id AS DOUBLE) FROM range(20)")
    val rows = spark.sql("SELECT id, _partition FROM mpe.db.et").collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id < 100) assert(r.isNullAt(1), s"pre-spec row $id must read null _partition")
      else {
        val expect = Math.floorMod(
          org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
            id, org.apache.spark.sql.types.LongType, 42L).toInt, 4)
        assert(r.getStruct(1).getInt(0) == expect, s"id=$id")
      }
    }
  }

  test("a data column named like a metadata column shadows it") {
    val d = mkTable(10)
    // the graft table itself has no _file column; Spark resolves _file as
    // metadata. Renaming a column to _file must shadow the metadata column.
    graft.spatial.TableSchema.renameColumn(spark, d, "category", "_file")
    val out = spark.read.format("graft").load(d).select("_file").collect()
    assert(out.forall(_.getString(0).startsWith("cat")),
      "data column must win over the metadata column")
  }
}
