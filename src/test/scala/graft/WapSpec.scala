package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.Snapshots

/** Session-scoped write-audit-publish — the reference's `spark.wap.id` /
  * `spark.wap.branch` confs gated on `write.wap.enabled`, plus
  * `CALL graft.system.publish_changes(t, wap_id)`
  * (`PublishChangesProcedure` in /root/reference): appends stage on an
  * audit branch, reads follow it only while the conf is set, publish
  * promotes onto main and drops the branch.
  */
class WapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val warehouse: String = {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_wpub_wh").toString
    spark.conf.set("spark.sql.catalog.wpubcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wpubcat.warehouse", wh)
    wh
  }

  test("spark.wap.id stages appends; reads follow; publish_changes promotes") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE wpubcat.db.w (id BIGINT) TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.sql("INSERT INTO wpubcat.db.w VALUES (1), (2)") // conf unset: straight to main
    val tbl = s"$warehouse/db/w"
    assert(Snapshots.readRefs(tbl)._1.keySet == Set("main"))

    spark.conf.set("spark.wap.id", "job1")
    try {
      spark.sql("INSERT INTO wpubcat.db.w VALUES (3)")
      spark.sql("INSERT INTO wpubcat.db.w VALUES (4)")
      // staged on the audit branch; session reads follow it
      assert(Snapshots.readRefs(tbl)._1.contains("wap_job1"))
      assert(spark.sql("SELECT count(*) FROM wpubcat.db.w").head.getLong(0) == 4)
    } finally spark.conf.unset("spark.wap.id")
    // conf unset: main is untouched by the staged writes
    assert(spark.sql("SELECT count(*) FROM wpubcat.db.w").head.getLong(0) == 2)

    // publish: both staged appends land on main, the branch drops
    spark.sql(s"CALL graft.system.publish_changes('$tbl', 'job1')")
    assert(spark.sql("SELECT id FROM wpubcat.db.w").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    assert(!Snapshots.readRefs(tbl)._1.contains("wap_job1"))
  }

  test("publish_changes cherry-picks when main advanced concurrently") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE wpubcat.db.c (id BIGINT) TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.sql("INSERT INTO wpubcat.db.c VALUES (1)")
    val tbl = s"$warehouse/db/c"
    spark.conf.set("spark.wap.branch", "audit")
    try spark.sql("INSERT INTO wpubcat.db.c VALUES (2)")
    finally spark.conf.unset("spark.wap.branch")
    // main advances AFTER the staging fork
    spark.sql("INSERT INTO wpubcat.db.c VALUES (9)")
    spark.sql(s"CALL graft.system.publish_changes('$tbl', 'audit')")
    assert(spark.sql("SELECT id FROM wpubcat.db.c").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 9L),
      "staged and concurrent rows must both survive the publish")
  }

  test("row-level DML stages under WAP; overwrites refuse") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE wpubcat.db.dml (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.sql("INSERT INTO wpubcat.db.dml VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val tbl = s"$warehouse/db/dml"
    spark.conf.set("spark.wap.id", "dmljob")
    try {
      spark.sql("DELETE FROM wpubcat.db.dml WHERE id = 3")
      spark.sql("UPDATE wpubcat.db.dml SET v = 'a2' WHERE id = 1")
      // session view sees the staged DML
      assert(spark.sql("SELECT id, v FROM wpubcat.db.dml").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "a2"), (2L, "b")))
      // overwrites refuse instead of silently clobbering main
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE wpubcat.db.dml VALUES (9, 'z')") }
      assert(e.getMessage.contains("WAP"))
    } finally spark.conf.unset("spark.wap.id")
    // main untouched until publish
    assert(spark.sql("SELECT id, v FROM wpubcat.db.dml").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // publish: fast-forward (main did not advance) promotes the DML
    spark.sql(s"CALL graft.system.publish_changes('$tbl', 'dmljob')")
    assert(spark.sql("SELECT id, v FROM wpubcat.db.dml").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "a2"), (2L, "b")))
  }

  test("publish_changes cherry-picks staged MoR delete state when main advanced") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE wpubcat.db.mor (id BIGINT, v STRING) TBLPROPERTIES (" +
      "'write.wap.enabled'='true', 'write.delete.mode'='merge-on-read', " +
      "'write.update.mode'='merge-on-read')")
    spark.sql("INSERT INTO wpubcat.db.mor VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val tbl = s"$warehouse/db/mor"
    spark.conf.set("spark.wap.id", "morjob")
    try {
      // MoR DML on the audit branch: pos-delete entries, no data removed
      spark.sql("DELETE FROM wpubcat.db.mor WHERE id = 3")
      spark.sql("UPDATE wpubcat.db.mor SET v = 'a2' WHERE id = 1")
    } finally spark.conf.unset("spark.wap.id")
    // main advances AFTER the staging fork -> publish must CHERRY-PICK,
    // and the picked snapshots' delete-state deltas must ride along or
    // the audited DELETE/UPDATE silently vanishes (id=3 resurrects)
    spark.sql("INSERT INTO wpubcat.db.mor VALUES (9, 'z')")
    spark.sql(s"CALL graft.system.publish_changes('$tbl', 'morjob')")
    assert(spark.sql("SELECT id, v FROM wpubcat.db.mor").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a2"), (2L, "b"), (9L, "z")),
      "staged MoR delete state must survive a cherry-pick publish")
  }

  test("snapshot-property.* write options commit as snapshot summary properties") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE wpubcat.db.sp (id BIGINT)")
    import spark.implicits._
    Seq(1L, 2L).toDF("id").writeTo("wpubcat.db.sp")
      .option("snapshot-property.ingest-job", "batch-42")
      .option("snapshot-property.source", "s3-drop")
      .append()
    val props = Snapshots.readProps(s"$warehouse/db/sp")
    assert(props.get("ingest-job").contains("batch-42"))
    assert(props.get("source").contains("s3-drop"))
    assert(spark.sql("SELECT count(*) FROM wpubcat.db.sp").head.getLong(0) == 2)
    // the OVERWRITE family honors them too (the reference applies
    // extraSnapshotMetadata to every commit operation, not only appends)
    Seq(7L).toDF("id").writeTo("wpubcat.db.sp")
      .option("snapshot-property.reason", "backfill")
      .overwrite(org.apache.spark.sql.functions.lit(true))
    val p2 = Snapshots.readProps(s"$warehouse/db/sp")
    assert(p2.get("reason").contains("backfill"), s"truncate-overwrite props: $p2")
    spark.sql("CREATE TABLE wpubcat.db.spd (id BIGINT, p INT) PARTITIONED BY (p)")
    Seq((1L, 0), (2L, 1)).toDF("id", "p").writeTo("wpubcat.db.spd").append()
    Seq((3L, 1)).toDF("id", "p").writeTo("wpubcat.db.spd")
      .option("snapshot-property.reason", "partition-refresh")
      .overwritePartitions()
    assert(Snapshots.readProps(s"$warehouse/db/spd")
      .get("reason").contains("partition-refresh"), "dynamic-overwrite props")
  }

  test("WAP conf checks hit the props memo, not the manifest parser") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE wpubcat.db.memo (id BIGINT) " +
      "TBLPROPERTIES ('write.wap.enabled'='true')")
    val tbl = s"$warehouse/db/memo"
    spark.conf.set("spark.wap.id", "memojob")
    try {
      spark.sql("INSERT INTO wpubcat.db.memo VALUES (1)") // warm: branch + caches
      val before = Snapshots.propsParses.get()
      // steady-state statements under an active WAP session: the
      // write.wap.enabled lookup must come from the per-version memo
      (1 to 5).foreach(_ =>
        assert(spark.sql("SELECT count(*) FROM wpubcat.db.memo").head.getLong(0) == 1))
      assert(Snapshots.propsParses.get() == before,
        "read-only WAP statements must not re-parse table properties")
    } finally spark.conf.unset("spark.wap.id")
  }

  test("WAP is inert without the table property or the conf") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE wpubcat.db.plain (id BIGINT)")
    spark.conf.set("spark.wap.id", "ghost")
    try {
      spark.sql("INSERT INTO wpubcat.db.plain VALUES (1)")
      // write.wap.enabled not set: the conf is ignored, main advances
      assert(spark.sql("SELECT count(*) FROM wpubcat.db.plain").head.getLong(0) == 1)
      assert(Snapshots.readRefs(s"$warehouse/db/plain")._1.keySet == Set("main"))
    } finally spark.conf.unset("spark.wap.id")
  }

  test("CTAS under an active WAP session lands ALL rows: staging appends " +
      "must not route onto a WAP branch of the staging dir (commit would " +
      "publish the empty staging main and abort would delete the rows)") {
    assert(warehouse.nonEmpty)
    spark.conf.set("spark.wap.id", "ctasjob")
    try {
      spark.sql("CREATE TABLE wpubcat.db.ctaswap " +
        "TBLPROPERTIES ('write.wap.enabled'='true') " +
        "AS SELECT id FROM range(25)")
      assert(spark.sql("SELECT count(*) FROM wpubcat.db.ctaswap").head.getLong(0) == 25,
        "every CTAS row must survive the staged commit under WAP")
    } finally spark.conf.unset("spark.wap.id")
    assert(spark.sql("SELECT count(*) FROM wpubcat.db.ctaswap").head.getLong(0) == 25)
    // the WAP property still attached to the published table
    val tbl = s"$warehouse/db/ctaswap"
    assert(Snapshots.readProps(tbl).get("write.wap.enabled").contains("true"))
  }

  test("the DIRECT MoR delete APIs reject under an active WAP session like " +
      "every other main-ref mutation (committing mid-audit would vanish " +
      "unaudited rows from main)") {
    assert(warehouse.nonEmpty)
    import spark.implicits._
    spark.sql("CREATE TABLE wpubcat.db.wdel (id BIGINT, k BIGINT) " +
      "TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.sql("INSERT INTO wpubcat.db.wdel SELECT id, id % 5 FROM range(20)")
    val tbl = s"$warehouse/db/wdel"
    spark.conf.set("spark.wap.id", "deljob")
    try {
      // the branch must EXIST for wapBranchFor to engage
      spark.sql("INSERT INTO wpubcat.db.wdel VALUES (100, 0)")
      val e1 = intercept[IllegalArgumentException] {
        Snapshots.deleteMoR(spark, tbl, "id < 5") }
      assert(e1.getMessage.contains("WAP"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        Snapshots.deleteByEquality(spark, tbl, Seq(2L).toDF("k")) }
      assert(e2.getMessage.contains("WAP"), e2.getMessage)
    } finally spark.conf.unset("spark.wap.id")
    // outside the session the APIs work
    assert(Snapshots.deleteMoR(spark, tbl, "id = 19") > 0)
  }
}
