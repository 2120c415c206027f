package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{GeoTable, Snapshots}

/** The `readable_metrics` derived column on the files / entries metadata
  * tables — the reference's human-readable per-column metrics struct
  * (`TestMetadataTableReadableMetrics`): one nested struct per logical
  * column with `{column_size, value_count, null_value_count,
  * nan_value_count, lower_bound, upper_bound}`, bounds typed as the
  * column itself.
  */
class ReadableMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft_rmet").toString + "/tbl"
    spark.range(100)
      .select(col("id"),
        concat(lit("name_"), format_string("%03d", col("id"))).as("name"),
        when(col("id") % 10 === 0, lit(null)).otherwise(col("id") * 1.5).as("score"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("id").cast("int")).as("d"))
      .coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    dir
  }

  test("files table carries typed per-column readable_metrics") {
    val dir = mkTable()
    val files = Snapshots.metadataTable(spark, dir, "files")
    val rm = files.select("readable_metrics.*")
    // alphabetical column structs, each with the six facets
    assert(rm.columns.toSeq == Seq("d", "id", "name", "score"))
    val row = files.selectExpr(
      "readable_metrics.id.lower_bound", "readable_metrics.id.upper_bound",
      "readable_metrics.id.value_count", "readable_metrics.id.null_value_count",
      "readable_metrics.id.column_size",
      "readable_metrics.score.null_value_count",
      "readable_metrics.name.lower_bound", "readable_metrics.name.upper_bound",
      "readable_metrics.d.lower_bound",
      "readable_metrics.id.nan_value_count").head()
    assert(row.getLong(0) == 0L && row.getLong(1) == 99L)
    assert(row.getLong(2) == 100L, "value_count is the file row count")
    assert(row.getLong(3) == 0L, "id has no nulls")
    assert(row.getLong(4) > 0L, "column_size comes from the footer chunk bytes")
    assert(row.getLong(5) == 10L, "every 10th score is null")
    assert(row.getString(6) == "name_000" && row.getString(7) == "name_099")
    assert(row.getDate(8) == java.sql.Date.valueOf("2024-01-01"))
    assert(row.isNullAt(9), "nan counts are not tracked -> null")
  }

  test("entries table exposes the same struct; mixed selects work") {
    val dir = mkTable()
    Snapshots.append(spark.range(100, 150).select(col("id"),
      concat(lit("zz_"), col("id")).as("name"),
      (col("id") * 1.5).as("score"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("id").cast("int")).as("d")), dir)
    val entries = Snapshots.metadataTable(spark, dir, "entries")
    val rows = entries.selectExpr(
        "status", "readable_metrics.id.lower_bound", "readable_metrics.id.upper_bound")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (added, existing) = rows.partition(_._1 == "added")
    assert(existing.map(r => (r._2, r._3)).toSeq == Seq((0L, 99L)))
    assert(added.nonEmpty && added.map(_._2).min == 100L && added.map(_._3).max == 149L)
  }

  test("catalog SQL: SELECT readable_metrics FROM cat.db.t.files") {
    val wh = Files.createTempDirectory("graft_rmet_wh").toString
    spark.conf.set("spark.sql.catalog.rmcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rmcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rmcat.db")
    spark.sql("CREATE TABLE rmcat.db.rm_t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rmcat.db.rm_t SELECT id, concat('v', id) FROM range(50)")
    val r = spark.sql(
      """SELECT file_path, readable_metrics.id.lower_bound AS lo,
        |       readable_metrics.v.upper_bound AS hi
        |FROM rmcat.db.rm_t.files""".stripMargin).collect()
    assert(r.nonEmpty)
    assert(r.map(_.getLong(1)).min == 0L)
    assert(r.map(_.getString(2)).max == "v9")
    spark.sql("DROP TABLE rmcat.db.rm_t")
  }

  test("column rename: readable_metrics keys by the NEW logical name, stats resolve physically") {
    val dir = mkTable()
    graft.spatial.TableSchema.renameColumn(spark, dir, "name", "title")
    val files = Snapshots.metadataTable(spark, dir, "files")
    val rm = files.select("readable_metrics.*")
    assert(rm.columns.toSeq == Seq("d", "id", "score", "title"),
      s"struct keys follow the rename: ${rm.columns.toSeq}")
    val row = files.selectExpr(
      "readable_metrics.title.lower_bound", "readable_metrics.title.column_size").head()
    assert(row.getString(0) == "name_000",
      "bounds come from the ORIGINAL physical stats key")
    assert(row.getLong(1) > 0L)
  }

  test("legacy manifests (no recorded column sizes) keep null column_size") {
    val dir = mkTable()
    // simulate a legacy entry: strip csizes by rewriting stats without them
    val stats = Snapshots.readManifest(dir).map(_.copy(colSizes = Map.empty))
    val rm = GeoTable.readableMetrics(dir, stats).get
    val perCol = rm._2.values.head
    val idStruct = perCol.getStruct(1) // alphabetical: d, id, name, score
    assert(idStruct.isNullAt(0), "unknown column_size must surface as null")
    assert(idStruct.getLong(1) == 100L, "value_count still known from rows")
  }
}
