package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataFrameWriterV2 surface (`df.writeTo(...)`) against the graft
  * catalog — the reference's TestDataFrameWriterV2: create /
  * createOrReplace / partitionedBy on top of the already-exercised
  * append / overwritePartitions forms.
  */
class WriterV2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft_w2_wh").toString
    spark.conf.set("spark.sql.catalog.w2cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.w2cat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS w2cat.db")
    wh
  }

  test("writeTo.create / createOrReplace / append round-trip") {
    assert(warehouse.nonEmpty)
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v")
    df.writeTo("w2cat.db.w2_t").create()
    assert(spark.table("w2cat.db.w2_t").count() == 50)
    df.filter($"id" < 10).writeTo("w2cat.db.w2_t").append()
    assert(spark.table("w2cat.db.w2_t").count() == 60)
    // createOrReplace replaces data AND schema in one atomic snapshot
    (0L until 5L).map(i => (i, i * 2.0)).toDF("id", "score")
      .writeTo("w2cat.db.w2_t").createOrReplace()
    val t = spark.table("w2cat.db.w2_t")
    assert(t.count() == 5 && t.columns.toSeq == Seq("id", "score"))
    spark.sql("DROP TABLE w2cat.db.w2_t")
  }

  test("writeTo.partitionedBy(bucket) creates a hidden-partitioned table that prunes") {
    assert(warehouse.nonEmpty)
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
    df.writeTo("w2cat.db.w2_p").partitionedBy(bucket(4, $"id")).create()
    val t = spark.table("w2cat.db.w2_p")
    assert(t.count() == 100)
    // hidden partitioning: the derived column stays out of the schema
    assert(t.columns.toSeq == Seq("id", "v"))
    val dirs = new java.io.File(s"$warehouse/db/w2_p").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith("_"))
    assert(dirs.nonEmpty && dirs.forall(_.contains("=")),
      s"bucket transform must lay out hive dirs: ${dirs.toSeq}")
    // equality predicates on the source column project to the bucket dir
    val q = t.filter($"id" === 7L)
    assert(SparkTestSession.plannedFiles(q) < SparkTestSession.plannedFiles(t),
      "bucket projection must prune the planned file set")
    assert(q.count() == 1)
    spark.sql("DROP TABLE w2cat.db.w2_p")
  }
}
