package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{GeoTable, Views}

/** Edge semantics pinned by the round-14 operator review: the as-of
  * join's NULL-value purchases and stored-view resolution isolation.
  */
class OperatorEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("ev_asof_join pairs the LATEST purchase's id with ITS value — a " +
      "NULL-valued latest purchase returns NULL (ASOF semantics), never " +
      "an earlier purchase's value") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_asof").toString
    // P1(ts=1, value=3.0), P2(ts=2, value=NULL), click at ts=3: the
    // correct answer pairs P2's id with P2's NULL value
    Seq(
      (1L, 1L, 10L, "purchase", Some(3.0), ""),
      (2L, 2L, 10L, "purchase", None, ""),
      (3L, 3L, 10L, "click", Some(0.0), ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.operators.Events.queries("ev_asof_join")(spark, dir)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 3L && r.getLong(2) == 2L,
      s"the click must see purchase 2: $r")
    assert(r.isNullAt(3),
      s"the NULL-valued latest purchase must yield NULL, not an earlier " +
        s"purchase's value: $r")
  }

  test("stored-view resolution binds per call: a user's own `graft_table` " +
      "temp view survives, and views over two different tables answer " +
      "from their own table") {
    val base = Files.createTempDirectory("graft_views_iso").toString
    val tA = s"$base/a"; val tB = s"$base/b"
    spark.range(3).toDF("id").write.parquet(tA)
    spark.range(7).toDF("id").write.parquet(tB)
    GeoTable.writeManifest(spark, tA)
    GeoTable.writeManifest(spark, tB)
    // the user's own temp view of the convention name must not be touched
    spark.range(99).toDF("id").createOrReplaceTempView("graft_table")
    Views.createOrReplace(spark, tA, "v", "SELECT count(*) AS c FROM graft_table")
    Views.createOrReplace(spark, tB, "v", "SELECT count(*) AS c FROM graft_table")
    assert(Views.read(spark, tA, "v").collect().head.getLong(0) == 3L)
    assert(Views.read(spark, tB, "v").collect().head.getLong(0) == 7L)
    assert(spark.sql("SELECT count(*) FROM graft_table").collect().head.getLong(0) == 99L,
      "the user's graft_table temp view must survive view resolution")
    spark.catalog.dropTempView("graft_table")
    // installed views keep answering after the per-call binding is dropped
    val names = Views.installAll(spark, tB)
    assert(names == Seq("v"))
    assert(spark.sql("SELECT * FROM v").collect().head.getLong(0) == 7L)
    // digit-leading names are rejected at CREATE (Spark can't register them)
    val e = intercept[IllegalArgumentException] {
      Views.createOrReplace(spark, tA, "1v", "SELECT 1 AS one")
    }
    assert(e.getMessage.contains("bad view name"))
    spark.catalog.dropTempView("v")
  }
}
