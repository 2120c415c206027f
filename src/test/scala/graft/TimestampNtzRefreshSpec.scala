package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.Snapshots

/** TIMESTAMP_NTZ tables (the reference's timestamp-without-zone surface,
  * TestTimestampWithoutZone) and REFRESH TABLE cache invalidation
  * (TestRefreshTable) through the graft catalog.
  */
class TimestampNtzRefreshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft_ntz_wh").toString
    spark.conf.set("spark.sql.catalog.ntzcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ntzcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ntzcat.db")
    wh
  }

  test("TIMESTAMP_NTZ columns round-trip with working stats pruning") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE ntzcat.db.ntz_t (id BIGINT, ts TIMESTAMP_NTZ)")
    // two files with disjoint ts ranges so min/max pruning is observable
    spark.sql("INSERT INTO ntzcat.db.ntz_t SELECT /*+ REPARTITION(1) */ id, " +
      "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP_NTZ '2024-01-01 00:00:00') " +
      "FROM range(24)")
    spark.sql("INSERT INTO ntzcat.db.ntz_t SELECT /*+ REPARTITION(1) */ id, " +
      "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP_NTZ '2024-06-01 00:00:00') " +
      "FROM range(100, 124)")
    val all = spark.table("ntzcat.db.ntz_t")
    assert(all.count() == 48)
    assert(all.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // NTZ values are wall-clock: the stored literal reads back identically
    // regardless of session zone
    val first = spark.sql("SELECT CAST(ts AS STRING) FROM ntzcat.db.ntz_t " +
      "WHERE id = 0 ORDER BY ts LIMIT 1").head().getString(0)
    assert(first == "2024-01-01 00:00:00")
    val q = spark.sql(
      "SELECT id FROM ntzcat.db.ntz_t WHERE ts < TIMESTAMP_NTZ '2024-02-01 00:00:00'")
    assert(SparkTestSession.plannedFiles(q) == 1,
      "ntz min/max stats must prune the June file")
    assert(q.collect().length == 24)
    spark.sql("DROP TABLE ntzcat.db.ntz_t")
  }

  test("REFRESH TABLE invalidates a cached graft table") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE ntzcat.db.ref_t (id BIGINT)")
    spark.sql("INSERT INTO ntzcat.db.ref_t SELECT id FROM range(10)")
    spark.sql("CACHE TABLE ntzcat.db.ref_t")
    try {
      assert(spark.table("ntzcat.db.ref_t").count() == 10)
      // a write through the SAME session refreshes the cache on commit
      spark.sql("INSERT INTO ntzcat.db.ref_t SELECT id FROM range(10, 15)")
      spark.sql("REFRESH TABLE ntzcat.db.ref_t")
      assert(spark.table("ntzcat.db.ref_t").count() == 15)
      // an out-of-band commit (another writer) is invisible to the cache
      // until REFRESH TABLE — then visible
      val dir = s"$warehouse/db/ref_t"
      Snapshots.append(spark.range(100, 103).toDF("id"), dir)
      spark.sql("REFRESH TABLE ntzcat.db.ref_t")
      assert(spark.table("ntzcat.db.ref_t").count() == 18,
        "REFRESH TABLE must drop the cached plan and re-plan from the new snapshot")
    } finally spark.sql("UNCACHE TABLE IF EXISTS ntzcat.db.ref_t")
    spark.sql("DROP TABLE ntzcat.db.ref_t")
  }
}
