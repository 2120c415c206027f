package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GeoQueries

/** Incremental grid maintenance ([[GeoQueries.ensureGridTable]]): the
  * co-gridded materialization follows its SOURCE files like the vector
  * index follows its corpus — fresh serves with zero work, new files
  * APPEND only their own grid rows (one snapshot commit carrying the
  * capture), rewritten files force a rebuild.
  */
class GridLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeBatch(srcRoot: Path, ids: Range, name: String): Unit = {
    val tmp = Files.createTempDirectory("gridsrc_batch")
    val df = spark.createDataFrame(ids.map(i =>
        (i.toLong, (i % 9).toDouble * 5 - 20, (i / 9).toDouble * 5 - 15)))
      .toDF("id", "x", "y")
    df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/out")
    val part = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(srcRoot)
    Files.copy(part.toPath, srcRoot.resolve(name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def mk(files: Seq[String]): DataFrame = {
    graft.spatial.Geo.install(spark)
    graft.spatial.SpatialJoin.gridded(
      spark.read.parquet(files: _*)
        .withColumn("g", expr("st_point(x, y)"))
        .select(col("id"), col("g")),
      "g", cellDeg = 10.0)
  }

  test("grid table follows its source: fresh is a no-op, new files append " +
      "one commit, a rewritten file forces a rebuild") {
    graft.spatial.Geo.install(spark)
    val base = Files.createTempDirectory("graft_gridlife")
    val srcRoot = base.resolve("src.parquet")
    val wh = base.resolve("wh").toString
    val cat = "gridlife"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val tablePath = s"$wh/db/g"
    def ensure(): Unit =
      GeoQueries.ensureGridTable(spark, cat, wh, "g", Seq(srcRoot.toString))(mk)
    def gridRows(): Set[(Long, Long, Long)] =
      spark.table(s"$cat.db.g").select("id", "cell_x", "cell_y")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    writeBatch(srcRoot, 0 until 40, "part-a.parquet")
    ensure()
    assert(graft.spatial.Snapshots.currentVersion(tablePath) == 1)
    val r1 = gridRows()
    assert(r1.map(_._1) == (0 until 40).map(_.toLong).toSet)

    // fresh: no new commit, same rows
    ensure()
    assert(graft.spatial.Snapshots.currentVersion(tablePath) == 1)

    // a NEW source file appends exactly its own grid rows in ONE commit
    writeBatch(srcRoot, 100 until 130, "part-b.parquet")
    ensure()
    assert(graft.spatial.Snapshots.currentVersion(tablePath) == 2,
      "a pure append must be one snapshot commit, not a rebuild")
    val r2 = gridRows()
    assert(r2.filter(_._1 < 100) == r1, "existing grid rows must be untouched")
    assert(r2.map(_._1) ==
      ((0 until 40) ++ (100 until 130)).map(_.toLong).toSet)
    // and equals a from-scratch gridding of the full source (gridded is
    // row-local, so append == rebuild)
    val full = mk(Seq(srcRoot.toString))
      .select("id", "cell_x", "cell_y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r2 == full)

    // v1 data files survive the append (no rewrite)
    val v1Files = graft.spatial.Snapshots.readManifest(tablePath, Some(1)).map(_.path).toSet
    val v2Files = graft.spatial.Snapshots.readManifest(tablePath, Some(2)).map(_.path).toSet
    assert(v1Files.subsetOf(v2Files))

    // a REWRITTEN source file (content change) forces a full rebuild
    writeBatch(srcRoot, 0 until 35, "part-a.parquet")
    ensure()
    assert(graft.spatial.Snapshots.currentVersion(tablePath) == 1,
      "a rewritten source file must rebuild the grid from scratch")
    assert(gridRows().map(_._1) ==
      ((0 until 35) ++ (100 until 130)).map(_.toLong).toSet)

    // the capture property reflects the final state (both files recorded)
    val prop = graft.spatial.Snapshots.readProps(tablePath)(GeoQueries.GridSrcProp)
    assert(prop.contains("part-a.parquet") && prop.contains("part-b.parquet"))
  }
}
