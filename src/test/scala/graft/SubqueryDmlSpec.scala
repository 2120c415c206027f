package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoCodec
import graft.spatial.{GeoTable, Snapshots}

/** Row-level DML with IN / EXISTS / scalar subqueries in the
  * condition (reference TestDelete/TestUpdate cover these shapes).
  */
class SubqueryDmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkTable(n: Int): String = {
    graft.spatial.Geo.install(spark)
    val dir = Files.createTempDirectory("graft_subq").toString
    val rows = (0 until n).map { i =>
      Row(i.toLong, GeoCodec.writeWkb(GeoCodec.point(i % 50 + 1.0, i % 40 + 1.0)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("geom", BinaryType))))
    GeoTable.write(df, dir, "geom", res = 8, numFiles = 2)
    dir
  }

  test("DELETE with IN subquery") {
    val dir = mkTable(20)
    import spark.implicits._
    Seq(1L, 3L, 5L).toDF("kill_id").createOrReplaceTempView("kill_list")
    spark.sql(s"DELETE FROM '$dir' WHERE id IN (SELECT kill_id FROM kill_list)")
    val left = Snapshots.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(left == (0L until 20L).toSet -- Set(1L, 3L, 5L))
  }

  test("UPDATE with scalar subquery") {
    val dir = mkTable(10)
    import spark.implicits._
    Seq(7L).toDF("thresh").createOrReplaceTempView("thresh_t")
    spark.sql(s"UPDATE '$dir' SET id = id + 100 WHERE id >= (SELECT max(thresh) FROM thresh_t)")
    val left = Snapshots.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(left == (0L until 7L).toSet ++ Set(107L, 108L, 109L))
  }

  test("DELETE with NOT EXISTS correlated subquery") {
    val dir = mkTable(10)
    import spark.implicits._
    Seq(0L, 2L, 4L, 6L, 8L).toDF("keep_id").createOrReplaceTempView("keep_list")
    spark.sql(
      s"DELETE FROM '$dir' WHERE NOT EXISTS (SELECT 1 FROM keep_list WHERE keep_id = id)")
    val left = Snapshots.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(left == Set(0L, 2L, 4L, 6L, 8L))
  }
}
