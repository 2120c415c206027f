package graft

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftFileSlice, GraftInputPartition, TaskPlanner}

/** Unit invariants of the DSv2 task planner: splits partition a file's
  * byte range exactly, packing respects the max split size, and SPJ key
  * groups never mix within one task.
  */
class TaskPlannerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def item(path: String, len: Long, key: InternalRow = null,
      splittable: Boolean = true): TaskPlanner.Item =
    TaskPlanner.Item(
      PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path), 0, len),
      GraftFileSlice(path, Array.empty, Nil), key, splittable)

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("splits cover an oversized file exactly, in order, without overlap") {
    withConf(
      "spark.sql.files.maxPartitionBytes" -> "1000",
      "spark.sql.files.openCostInBytes" -> "100",
      "spark.sql.files.minPartitionNum" -> "1") {
      val parts = TaskPlanner.plan(spark, Seq(item("/t/a.parquet", 3500)), groupByKey = false)
      val ranges = parts.flatMap(_.asInstanceOf[GraftInputPartition].fp.files)
        .map(f => (f.start, f.length)).sortBy(_._1)
      assert(ranges.length == 4, s"3500B at 1000B max split → 4 ranges, got ${ranges.toSeq}")
      assert(ranges.head._1 == 0)
      ranges.sliding(2).foreach { case Array((s1, l1), (s2, _)) => assert(s1 + l1 == s2) }
      assert(ranges.map(_._2).sum == 3500)
    }
  }

  test("a file with positional deletes is never split") {
    withConf(
      "spark.sql.files.maxPartitionBytes" -> "1000",
      "spark.sql.files.openCostInBytes" -> "100",
      "spark.sql.files.minPartitionNum" -> "1") {
      val parts = TaskPlanner.plan(spark,
        Seq(item("/t/a.parquet", 3500, splittable = false)), groupByKey = false)
      val files = parts.flatMap(_.asInstanceOf[GraftInputPartition].fp.files)
      assert(files.length == 1 && files.head.start == 0 && files.head.length == 3500)
    }
  }

  test("small files pack together; slices stay parallel to the packed files") {
    withConf(
      "spark.sql.files.maxPartitionBytes" -> "1000",
      "spark.sql.files.openCostInBytes" -> "10",
      "spark.sql.files.minPartitionNum" -> "1") {
      val items = (0 until 10).map(i => item(s"/t/f$i.parquet", 200))
      val parts = TaskPlanner.plan(spark, items, groupByKey = false)
        .map(_.asInstanceOf[GraftInputPartition])
      assert(parts.length < 10 && parts.length >= 3,
        s"10×200B at 1000B max split should pack ~4-5 per task, got ${parts.length}")
      parts.foreach { p =>
        assert(p.fp.files.length == p.slices.length)
        p.fp.files.zip(p.slices).foreach { case (pf, s) =>
          assert(pf.filePath.toString == s.rel, "slice must describe its own file")
        }
      }
      assert(parts.flatMap(_.fp.files).length == 10)
    }
  }

  test("packing never crosses SPJ key groups") {
    withConf(
      "spark.sql.files.maxPartitionBytes" -> "10000",
      "spark.sql.files.openCostInBytes" -> "10",
      "spark.sql.files.minPartitionNum" -> "1") {
      val items = (0 until 8).map { i =>
        item(s"/t/f$i.parquet", 100, key = InternalRow(i % 2))
      }
      val parts = TaskPlanner.plan(spark, items, groupByKey = true)
        .map(_.asInstanceOf[GraftInputPartition])
      // max split far above total: packing would merge everything, but key
      // groups must stay separate — exactly one task per key here
      assert(parts.length == 2, s"2 key groups → 2 tasks, got ${parts.length}")
      parts.foreach { p =>
        assert(p.fp.files.length == 4)
        assert(p.key != null)
      }
      assert(parts.map(_.key.getInt(0)).toSet == Set(0, 1))
    }
  }
}
