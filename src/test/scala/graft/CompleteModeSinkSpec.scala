package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.Snapshots

/** Complete-mode (overwrite) streaming sink — the reference's
  * `asStreamingOverwrite` (`SparkWrite.java:181-186`): a streaming
  * aggregation with `outputMode("complete")` produces ONE overwrite
  * snapshot per epoch (the epoch's files replace the table), exactly-once
  * across restart via the same checkpoint-scoped high-water mark as the
  * append sink.
  */
class CompleteModeSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("complete-mode aggregation: one overwrite snapshot per epoch, replay-safe") {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_cm_wh").toString
    spark.conf.set("spark.sql.catalog.cmcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cmcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cmcat.st")
    val ckpt = Files.createTempDirectory("graft_cm_ckpt").toString

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)]
    val counts = input.toDF().toDF("k", "n")
      .groupBy("k").agg(sum("n").as("total"))

    def runOnce(): Unit = {
      val q = counts.writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("cmcat.st.totals")
      try q.awaitTermination() finally q.stop()
    }

    input.addData(("a", 1L), ("b", 2L))
    runOnce()
    val tbl = s"$wh/st/totals"
    def state: Map[String, Long] = spark.sql("SELECT k, total FROM cmcat.st.totals")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state == Map("a" -> 1L, "b" -> 2L))
    val v1 = Snapshots.currentVersion(tbl)

    // second epoch REPLACES the table with the new full aggregate state
    input.addData(("a", 10L), ("c", 5L))
    runOnce()
    assert(state == Map("a" -> 11L, "b" -> 2L, "c" -> 5L),
      "complete mode must serve the replaced aggregate, not an append union")
    assert(Snapshots.mainVersion(tbl) > v1)
    // the table holds ONLY the latest epoch's rows (overwrite, not union)
    assert(spark.sql("SELECT count(*) FROM cmcat.st.totals").head.getLong(0) == 3)

    // restart with nothing new: no duplication, no extra snapshot content
    runOnce()
    assert(state == Map("a" -> 11L, "b" -> 2L, "c" -> 5L))

    // time travel still serves the first epoch's state
    assert(spark.sql(s"SELECT k, total FROM cmcat.st.totals VERSION AS OF $v1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 1L, "b" -> 2L))

    // a replayed epoch id (at or below the mark) is dropped, files cleaned
    val files = Snapshots.readManifest(tbl).size
    Snapshots.commitStreamEpoch(spark, tbl, "sometoken", -1L, Nil, overwrite = true)
    assert(Snapshots.readManifest(tbl).size == files)
  }

  test("update-mode aggregation appends only the changed rows per epoch") {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_um_wh").toString
    spark.conf.set("spark.sql.catalog.umcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.umcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS umcat.st")
    val ckpt = Files.createTempDirectory("graft_um_ckpt").toString

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)]
    val counts = input.toDF().toDF("k", "n").groupBy("k").agg(sum("n").as("total"))

    def runOnce(): Unit = {
      val q = counts.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("umcat.st.updates")
      try q.awaitTermination() finally q.stop()
    }

    input.addData(("a", 1L), ("b", 2L))
    runOnce()
    assert(spark.sql("SELECT count(*) FROM umcat.st.updates").head.getLong(0) == 2)
    // epoch 2 changes only 'a' and adds 'c': exactly those rows append
    // (the reference's SupportsStreamingUpdateAsAppend semantics — the
    // table is an upsert LOG; latest-per-key reconstructs current state)
    input.addData(("a", 10L))
    runOnce()
    val rows = spark.sql("SELECT k, total FROM umcat.st.updates").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.sorted == Seq(("a", 1L), ("a", 11L), ("b", 2L)))
  }
}
