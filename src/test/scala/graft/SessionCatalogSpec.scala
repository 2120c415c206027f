package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.GeoTable

/** `spark_catalog` override through [[graft.sources.GraftSessionCatalog]]:
  * graft tables served natively, everything else delegated to the built-in
  * session catalog (the reference's `SparkSessionCatalog` contract).
  */
class SessionCatalogSpec extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark

  // a FRESH session: the catalog conf must be in place before the session's
  // CatalogManager materializes spark_catalog
  private lazy val (spark, wh) = {
    val wh = Files.createTempDirectory("graft_sess_wh").toString
    val s = base.newSession()
    s.conf.set("spark.sql.catalog.spark_catalog",
      classOf[graft.sources.GraftSessionCatalog].getName)
    s.conf.set("spark.sql.catalog.spark_catalog.warehouse", wh)
    graft.spatial.Geo.install(s)
    (s, wh)
  }

  // unique per-run namespaces: the delegate's managed-table locations live
  // under spark-warehouse/ and survive failed runs
  private def freshDb(tag: String): String =
    s"${tag}_${java.util.UUID.randomUUID().toString.take(8)}"

  test("one session serves plain session-catalog tables AND graft tables") {
    val sdb = freshDb("sdb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $sdb")
    // plain table -> delegate (nothing lands in the graft warehouse)
    spark.range(0, 10).toDF("id").write.format("parquet").saveAsTable(s"$sdb.plain")
    assert(spark.sql(s"SELECT count(*) FROM $sdb.plain").head.getLong(0) == 10)
    assert(!Files.exists(Paths.get(wh, sdb, "plain", GeoTable.ManifestName)))
    // CTAS routes by provider: USING graft -> warehouse-backed graft table
    spark.sql(
      s"CREATE TABLE $sdb.g USING graft AS SELECT id, CAST(id AS DOUBLE) AS x FROM $sdb.plain")
    assert(Files.exists(Paths.get(wh, sdb, "g", GeoTable.ManifestName)),
      "graft CTAS must land in the warehouse")
    assert(spark.sql(s"SELECT count(*) FROM $sdb.g").head.getLong(0) == 10)
    // writes + snapshots work through the default catalog name
    spark.sql(s"INSERT INTO $sdb.g SELECT 100L, 1.0D")
    assert(spark.sql(s"SELECT count(*) FROM $sdb.g").head.getLong(0) == 11)
    assert(spark.sql(s"SELECT max(version) FROM $sdb.g.snapshots")
      .head.getAs[Number](0).longValue() >= 2L)
    // SHOW TABLES unions both sides
    val names = spark.sql(s"SHOW TABLES IN $sdb").collect().map(_.getString(1)).toSet
    assert(names.contains("plain") && names.contains("g"), s"got: $names")
    // temp views keep resolving through the delegate
    spark.range(5).createOrReplaceTempView("tv")
    assert(spark.table("tv").count() == 5)
    // the plain table is untouched by graft-side DDL
    spark.sql(s"DROP TABLE $sdb.g")
    assert(spark.sql(s"SELECT count(*) FROM $sdb.plain").head.getLong(0) == 10)
    assert(!Files.exists(Paths.get(wh, sdb, "g")))
  }

  test("non-graft CTAS degrades to the delegate's non-atomic create") {
    val sdb2 = freshDb("sdb2")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $sdb2")
    spark.sql(s"CREATE TABLE $sdb2.p USING parquet AS SELECT 1 AS a")
    assert(spark.sql(s"SELECT a FROM $sdb2.p").head.getInt(0) == 1)
    assert(!Files.exists(Paths.get(wh, sdb2, "p", GeoTable.ManifestName)))
  }

  test("pure delegation without a warehouse conf") {
    val s2 = base.newSession()
    s2.conf.set("spark.sql.catalog.spark_catalog",
      classOf[graft.sources.GraftSessionCatalog].getName)
    // no warehouse: plain tables still work, graft DDL fails loudly
    val ddb = freshDb("ddb")
    s2.sql(s"CREATE DATABASE IF NOT EXISTS $ddb")
    s2.range(3).toDF("id").write.format("parquet").saveAsTable(s"$ddb.t")
    assert(s2.sql(s"SELECT count(*) FROM $ddb.t").head.getLong(0) == 3)
    val e = intercept[Exception] {
      s2.sql(s"CREATE TABLE $ddb.g (id BIGINT) USING graft")
    }
    assert(e.getMessage.contains("warehouse"), e.getMessage)
  }
}
