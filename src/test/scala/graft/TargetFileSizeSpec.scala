package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{GeoTable, Snapshots}

/** `write.target-file-size-bytes` — the reference's
  * WRITE_TARGET_FILE_SIZE_BYTES (`TableProperties.java:296`,
  * `RollingDataWriter` lineage) on both write paths: the V1 batch path
  * converts the byte target to a per-file record cap via the manifest's
  * average row size (metadata-only estimate), and the DSv2/streaming
  * ParquetWriter rolls by ACTUAL bytes (`getDataSize`). Without rolling,
  * one task writing 5 GB of a partition emits one 5 GB file at scale.
  */
class TargetFileSizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("batch append rolls files at the declared target size") {
    val dir = Files.createTempDirectory("graft_tfs").toString + "/tbl"
    spark.range(1000).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    val m = Snapshots.readManifest(dir)
    val avg = m.map(_.sizeBytes).sum / m.map(_.rows).sum.toDouble
    // target ≈ 250 incoming rows → a 1000-row single-task append must roll
    Snapshots.updateProperties(dir, Map(
      "write.target-file-size-bytes" -> math.max(1L, (avg * 250).toLong).toString))
    val before = Snapshots.readManifest(dir).size
    Snapshots.append(
      spark.range(1000, 2000).select(col("id"), concat(lit("v"), col("id")).as("v"))
        .coalesce(1), dir)
    val added = Snapshots.readManifest(dir).size - before
    assert(added >= 3,
      s"1000-row single-task append at a ~250-row target should roll, added=$added")
    assert(spark.read.format("graft").load(dir).count() == 2000)
  }

  test("per-write target-file-size-bytes option drives BATCH append rolling " +
      "(V1 write leg, no table property declared)") {
    val wh = Files.createTempDirectory("graft_tfsb_wh").toString
    spark.conf.set("spark.sql.catalog.tfsbcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tfsbcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tfsbcat.st")
    spark.sql("CREATE TABLE tfsbcat.st.b (id BIGINT, v STRING)")
    // priming append: the record-count conversion needs manifest stats
    spark.range(1000).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .coalesce(1).writeTo("tfsbcat.st.b").append()
    val dir = s"$wh/st/b"
    val m = Snapshots.readManifest(dir)
    val avg = m.map(_.sizeBytes).sum / m.map(_.rows).sum.toDouble
    val before = m.size
    spark.range(1000, 2000).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .coalesce(1).writeTo("tfsbcat.st.b")
      .option("target-file-size-bytes", math.max(1L, (avg * 250).toLong).toString)
      .append()
    val added = Snapshots.readManifest(dir).size - before
    assert(added >= 3,
      s"per-write option must roll a 1000-row single-task append, added=$added")
    assert(spark.table("tfsbcat.st.b").count() == 2000)
  }

  test("a table without the property keeps one file per task (no rolling)") {
    val dir = Files.createTempDirectory("graft_tfs0").toString + "/tbl"
    spark.range(1000).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    val before = Snapshots.readManifest(dir).size
    Snapshots.append(
      spark.range(1000, 2000).select(col("id"), concat(lit("v"), col("id")).as("v"))
        .coalesce(1), dir)
    assert(Snapshots.readManifest(dir).size - before == 1)
  }

  test("per-write target-file-size-bytes option overrides the table property") {
    val wh = Files.createTempDirectory("graft_tfso_wh").toString
    spark.conf.set("spark.sql.catalog.tfsocat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tfsocat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tfsocat.st")
    // NO table property: the write OPTION alone must drive the rolling
    spark.sql("CREATE TABLE tfsocat.st.t (id BIGINT, v STRING)")
    val ckpt = Files.createTempDirectory("graft_tfso_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Long]
    input.addData(0L until 4000L: _*)
    val q = input.toDF()
      .select(col("value").as("id"), concat(lit("v"), col("value")).as("v"))
      .coalesce(1)
      .writeStream
      .option("checkpointLocation", ckpt)
      .option("target-file-size-bytes", "2000")
      .trigger(Trigger.AvailableNow())
      .toTable("tfsocat.st.t")
    try q.awaitTermination() finally q.stop()
    val files = Snapshots.readManifest(s"$wh/st/t")
    assert(files.size >= 2,
      s"write option should roll a single-task epoch, files=${files.size}")
    assert(files.map(_.rows).sum == 4000)
  }

  test("DSv2 streaming writer rolls by actual bytes within an epoch") {
    val wh = Files.createTempDirectory("graft_tfs_wh").toString
    spark.conf.set("spark.sql.catalog.tfscat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tfscat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tfscat.st")
    spark.sql("""CREATE TABLE tfscat.st.t (id BIGINT, v STRING)
      TBLPROPERTIES ('write.target-file-size-bytes' = '2000')""")
    val ckpt = Files.createTempDirectory("graft_tfs_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Long]
    input.addData(0L until 4000L: _*)
    val q = input.toDF()
      .select(col("value").as("id"), concat(lit("v"), col("value")).as("v"))
      .coalesce(1) // one task: multiple output files can only come from rolling
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable("tfscat.st.t")
    try q.awaitTermination() finally q.stop()
    val tbl = s"$wh/st/t"
    val files = Snapshots.readManifest(tbl)
    assert(files.size >= 2,
      s"a single-task 4000-row epoch at a 2 KB target should roll, files=${files.size}")
    // every rolled file stayed near the target (generous slack: parquet
    // buffers pages, so the roll check trails the last page boundary)
    assert(files.map(_.rows).sum == 4000)
    assert(spark.sql("SELECT count(*) FROM tfscat.st.t").head.getLong(0) == 4000)
    // distinct names per roll — nothing overwrote anything
    assert(files.map(_.path).distinct.size == files.size)
  }
}
