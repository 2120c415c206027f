package graft

import java.nio.file.Files

import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftCatalog

/** Catalog table-instance caching — the reference's CachingCatalog seam
  * (`SparkCatalog.java` wraps in CachingCatalog under `cache-enabled`,
  * `cache.expiration-interval-ms`; ref TestSparkCatalogCacheExpiration).
  * Deviation, stated in the code: default OFF (reference defaults on) —
  * the filesystem backend's layout is its metadata, so always-fresh is
  * free; metastore-backed catalogs opt in to save round-trips.
  */
class CatalogCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkCatalog(name: String, opts: Map[String, String]): TableCatalog = {
    val wh = Files.createTempDirectory(s"graft_${name}_wh").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.conf.set(s"spark.sql.catalog.$name.backend", "registry")
    opts.foreach { case (k, v) => spark.conf.set(s"spark.sql.catalog.$name.$k", v) }
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    spark.sql(s"CREATE TABLE $name.db.t (id BIGINT, v STRING)")
    spark.sessionState.catalogManager.catalog(name).asInstanceOf[TableCatalog]
  }

  private val ident = Identifier.of(Array("db"), "t")

  test("cache-enabled serves the cached instance; DDL and REFRESH invalidate") {
    val cat = mkCatalog("ccache1", Map("cache-enabled" -> "true"))
    val a = cat.loadTable(ident)
    assert(cat.loadTable(ident) eq a, "second load must hit the cache")
    // ALTER through this catalog invalidates — the new schema is visible
    spark.sql("ALTER TABLE ccache1.db.t ADD COLUMN extra INT")
    val b = cat.loadTable(ident)
    assert(!(b eq a))
    assert(b.schema().fieldNames.contains("extra"))
    // REFRESH TABLE routes through invalidateTable
    assert(cat.loadTable(ident) eq b)
    spark.sql("REFRESH TABLE ccache1.db.t")
    assert(!(cat.loadTable(ident) eq b))
    // RENAME invalidates both idents; the old name stops resolving
    spark.sql("ALTER TABLE ccache1.db.t RENAME TO db.t2")
    intercept[Exception] { cat.loadTable(ident) }
    assert(cat.loadTable(Identifier.of(Array("db"), "t2")) != null)
  }

  test("cache.expiration-interval-ms expires entries; 0 disables caching") {
    val cat = mkCatalog("ccache2",
      Map("cache-enabled" -> "true", "cache.expiration-interval-ms" -> "200"))
    val a = cat.loadTable(ident)
    assert(cat.loadTable(ident) eq a)
    Thread.sleep(350)
    assert(!(cat.loadTable(ident) eq a), "expired entry must re-resolve")
    val off = mkCatalog("ccache3",
      Map("cache-enabled" -> "true", "cache.expiration-interval-ms" -> "0"))
    val x = off.loadTable(ident)
    assert(!(off.loadTable(ident) eq x), "expiration 0 disables caching")
  }

  test("branch-suffix identifiers stay dynamic under cache-enabled " +
      "(a cached pinned head would hide the session's own branch writes)") {
    val cat = mkCatalog("ccache5", Map("cache-enabled" -> "true"))
    assert(cat != null)
    spark.sql("INSERT INTO ccache5.db.t VALUES (1, 'a'), (2, 'b')")
    val wh = spark.conf.get("spark.sql.catalog.ccache5.warehouse")
    graft.spatial.Snapshots.createBranch(s"$wh/db/t", "wip")
    assert(spark.sql("SELECT * FROM ccache5.db.t.branch_wip").count() == 2)
    // a write through the SAME suffix identifier must be visible to the
    // next read — the suffix resolution carries a pinned head version, so
    // caching it freezes the branch at first read
    spark.sql("INSERT INTO ccache5.db.t.branch_wip VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM ccache5.db.t.branch_wip").count() == 3,
      "branch read after branch write must see the new row")
    // while the PLAIN identifier still caches (and main is untouched)
    assert(spark.sql("SELECT * FROM ccache5.db.t").count() == 2)
  }

  test("session catalog: REFRESH TABLE evicts the graft-side cache, not " +
      "just the delegate's") {
    val s = spark.newSession()
    val wh = Files.createTempDirectory("graft_sesscache_wh").toString
    s.conf.set("spark.sql.catalog.spark_catalog",
      classOf[graft.sources.GraftSessionCatalog].getName)
    s.conf.set("spark.sql.catalog.spark_catalog.warehouse", wh)
    s.conf.set("spark.sql.catalog.spark_catalog.cache-enabled", "true")
    graft.spatial.Geo.install(s)
    val db = s"scache_${java.util.UUID.randomUUID().toString.take(8)}"
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    s.sql(s"CREATE TABLE $db.ct (id BIGINT) USING graft")
    // CatalogManager resolves spark_catalog through the thread-active
    // SQLConf — direct (non-SQL) calls need this session active
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      val cat = s.sessionState.catalogManager.catalog("spark_catalog")
        .asInstanceOf[TableCatalog]
      val ci = Identifier.of(Array(db), "ct")
      val a = cat.loadTable(ci)
      assert(cat.loadTable(ci) eq a, "cache must serve the same instance")
      s.sql(s"REFRESH TABLE $db.ct")
      assert(!(cat.loadTable(ci) eq a),
        "REFRESH TABLE must reach GraftCatalog.invalidateTable through the session catalog")
      s.sql(s"DROP TABLE $db.ct")
    } finally prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }

  test("default catalog is uncached: every load resolves fresh") {
    val cat = mkCatalog("ccache4", Map.empty)
    val a = cat.loadTable(ident)
    assert(!(cat.loadTable(ident) eq a))
  }
}
