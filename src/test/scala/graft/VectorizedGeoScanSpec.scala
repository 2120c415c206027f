package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoSql._
import graft.spatial.{GeometryEncoding, GeometryFields, Snapshots}

/** The columnar DECODE path (SURVEY §4 "do better with a WKB-vector
  * reader", r17 verdict Next #5): a clean table whose only row-mode reason
  * is a declared geometry storage encoding must keep columnar batches —
  * ColumnarToRow above the scan, only the geometry column paying per-value
  * decode — while delete state still forces the row path, and both paths
  * agree row-for-row.
  */
class VectorizedGeoScanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pts(n: Int) = {
    graft.spatial.Geo.install(spark)
    spark.range(n).select(col("id"),
      st_point((col("id") % 50).cast("double") - 20.5,
        (col("id") % 30).cast("double") - 10.5).as("geom"))
  }

  test("declared-encoding tables decode at the BATCH boundary: ColumnarToRow stays") {
    GeometryEncoding.All.foreach { enc =>
      val dir = Files.createTempDirectory(s"graft_vgs_$enc").toString
      GeometryFields.writeGeo(pts(200), dir, "geom", enc, res = 8, numFiles = 2)
      val back = spark.read.format("graft").load(dir).select(col("id"), col("geom"))
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("ColumnarToRow"),
        s"$enc-encoded scan fell off the columnar path:\n$plan")
      // the decoded geometry is real WKB: every value round-trips through JTS
      val got = back.select(col("id"), st_astext(col("geom")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.size == 200)
      (0 until 200).foreach { i =>
        val x = (i % 50) - 20.5
        val y = (i % 30) - 10.5
        assert(got(i.toLong) == s"POINT ($x $y)", s"$enc id=$i")
      }
      // the vectorization toggle still forces rows, and both paths agree
      val rowPath = spark.read.format("graft")
        .option("vectorization-enabled", "false").load(dir)
        .select(col("id"), col("geom"))
      assert(!rowPath.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
      val a = back.collect().map(r => (r.getLong(0),
        java.util.Arrays.hashCode(r.getAs[Array[Byte]](1)))).sorted
      val b = rowPath.collect().map(r => (r.getLong(0),
        java.util.Arrays.hashCode(r.getAs[Array[Byte]](1)))).sorted
      assert(a.sameElements(b), s"columnar and row decode disagree for $enc")
    }
  }

  test("delete state still forces the row path (per-file scoping lives there)") {
    val dir = Files.createTempDirectory("graft_vgs_del").toString
    GeometryFields.writeGeo(pts(200), dir, "geom", "wkt", res = 8, numFiles = 2)
    Snapshots.deleteMoR(spark, dir, "id % 2 = 0")
    val back = spark.read.format("graft").load(dir).select(col("id"), col("geom"))
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("ColumnarToRow"),
      s"a scan with pending MoR deletes must read row-oriented:\n$plan")
    val ids = back.collect().map(_.getLong(0)).sorted
    assert(ids.length == 100 && ids.forall(_ % 2 == 1))
  }

  test("NULL geometries survive the columnar decode") {
    val dir = Files.createTempDirectory("graft_vgs_null").toString
    val src = spark.range(50).select(col("id"),
      when(col("id") % 5 === 0, lit(null).cast("binary"))
        .otherwise(st_point(col("id").cast("double"), lit(1.0))).as("geom"))
    GeometryFields.writeGeo(src, dir, "geom", "wkt", res = 8, numFiles = 1)
    val back = spark.read.format("graft").load(dir).select(col("id"), col("geom"))
    assert(back.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    val rows = back.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 5 == 0) assert(r.isNullAt(1), s"id=$id should decode to NULL")
      else assert(!r.isNullAt(1), s"id=$id lost its geometry")
    }
  }
}
