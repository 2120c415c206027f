package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.Snapshots

/** `ALTER TABLE … SET/DROP IDENTIFIER FIELDS` (ref
  * `IcebergSqlExtensions.g4:74-75`): declared row-identity columns,
  * surfaced as the `identifier-fields` table property and consumed by
  * [[Snapshots.upsert]] as the default merge keys.
  */
class IdentifierFieldsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val warehouse: String = {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_idf_wh").toString
    spark.conf.set("spark.sql.catalog.idcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.idcat.warehouse", wh)
    wh
  }

  test("set, surface in properties, drop, and reject missing columns") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE idcat.db.ids (k1 BIGINT, k2 STRING, v DOUBLE)")
    spark.sql("INSERT INTO idcat.db.ids VALUES (1, 'a', 0.5)")
    val tbl = s"$warehouse/db/ids"

    spark.sql("ALTER TABLE idcat.db.ids SET IDENTIFIER FIELDS k1, k2")
    assert(Snapshots.identifierFields(tbl) == Seq("k1", "k2"))
    // visible as a table property (SHOW TBLPROPERTIES face)
    val props = spark.sql("SHOW TBLPROPERTIES idcat.db.ids").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("identifier-fields").contains("k1,k2"))

    spark.sql("ALTER TABLE idcat.db.ids DROP IDENTIFIER FIELDS k2")
    assert(Snapshots.identifierFields(tbl) == Seq("k1"))
    // dropping the last field clears the property
    spark.sql("ALTER TABLE idcat.db.ids DROP IDENTIFIER FIELDS k1")
    assert(Snapshots.identifierFields(tbl).isEmpty)

    // reject: unknown column on SET, undeclared column on DROP
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE idcat.db.ids SET IDENTIFIER FIELDS nope") }
    assert(e1.getMessage.contains("no such column"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE idcat.db.ids DROP IDENTIFIER FIELDS k1") }
    assert(e2.getMessage.contains("not identifier field"))
  }

  test("upsert reads the declared identifier fields as default merge keys") {
    assert(warehouse.nonEmpty)
    spark.sql("CREATE TABLE idcat.db.cdc (k1 BIGINT, k2 STRING, v DOUBLE)")
    spark.sql("INSERT INTO idcat.db.cdc VALUES (1, 'a', 1.0), (1, 'b', 2.0), (2, 'a', 3.0)")
    val tbl = s"$warehouse/db/cdc"
    // no declaration yet → upsert refuses (no silent key guess)
    intercept[Exception] {
      Snapshots.upsert(spark, tbl, spark.sql("SELECT 1L k1, 'a' k2, 9.0 v")) }

    // composite key: (1,'a') updates, (3,'c') inserts, (1,'b') untouched
    spark.sql("ALTER TABLE idcat.db.cdc SET IDENTIFIER FIELDS k1, k2")
    Snapshots.upsert(spark, tbl,
      spark.sql("SELECT * FROM VALUES (1L, 'a', 9.0), (3L, 'c', 4.0) AS s(k1, k2, v)"))
    val rows = spark.sql("SELECT k1, k2, v FROM idcat.db.cdc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, "a", 9.0), (1L, "b", 2.0), (2L, "a", 3.0), (3L, "c", 4.0)))

    // single key routes through mergeUpsert: every k1=1 row is one identity
    spark.sql("ALTER TABLE idcat.db.cdc SET IDENTIFIER FIELDS k1")
    assert(Snapshots.identifierFields(tbl) == Seq("k1"))
    Snapshots.upsert(spark, tbl, spark.sql("SELECT 2L k1, 'z' k2, 7.0 v"))
    val k2s = spark.sql("SELECT k2, v FROM idcat.db.cdc WHERE k1 = 2").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(k2s == Set(("z", 7.0)))
  }

  test("create_changelog_view pairs updates on identifier columns") {
    val dir = Files.createTempDirectory("graft_idf_cdc").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    graft.spatial.GeoTable.writeManifest(spark, dir)
    val v1 = Snapshots.mainVersion(dir)
    spark.sql(s"UPDATE '$dir' SET v = 'a2' WHERE id = 1")
    val v2 = Snapshots.mainVersion(dir)

    // explicit identifier_columns: delete+insert of id=1 pair into updates
    spark.sql(s"CALL graft.system.create_changelog_view('$dir', $v1, $v2, 'cdc_v', " +
      "identifier_columns => 'id')")
    val rows = spark.sql("SELECT id, v, _change_type FROM cdc_v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((1L, "a", "update_before"), (1L, "a2", "update_after")),
      s"got $rows")

    // compute_updates => true reads the DECLARED identifier fields
    spark.sql(s"ALTER TABLE '$dir' SET IDENTIFIER FIELDS id")
    spark.sql(s"CALL graft.system.create_changelog_view('$dir', $v1, $v2, 'cdc_v2', " +
      "compute_updates => true)")
    val rows2 = spark.sql("SELECT _change_type FROM cdc_v2").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(rows2 == Seq("update_after", "update_before"))
    // without a declaration and without columns, compute_updates refuses
    val bare = Files.createTempDirectory("graft_idf_cdc2").toString
    Seq((1L, "x")).toDF("id", "v").write.mode("overwrite").parquet(bare)
    graft.spatial.GeoTable.writeManifest(spark, bare)
    intercept[Exception] {
      spark.sql(s"CALL graft.system.create_changelog_view('$bare', 1, 1, 'cdc_v3', " +
        "compute_updates => true)")
    }
  }

  test("computeUpdates pairs ordinally; surplus rows keep their tags") {
    import spark.implicits._
    // 2 deletes + 1 insert sharing id=1: ONE pair relabels, the surplus
    // delete stays a delete (ref ChangelogIterator.computeUpdates pairs
    // one-to-one; the old whole-group window invented a second
    // update_before with no update_after partner)
    val unbalanced = Seq(
      (1L, "a", "delete"), (1L, "b", "delete"), (1L, "c", "insert"),
      (2L, "x", "delete"), (2L, "y", "insert"), (2L, "z", "insert"),
      (3L, "only", "delete"))
      .toDF("id", "v", "_change_type")
    val out = Snapshots.computeUpdates(unbalanced, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    def tally(id: Long) = out.filter(_._1 == id).map(_._2).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(tally(1L) == Map("update_before" -> 1, "update_after" -> 1, "delete" -> 1))
    assert(tally(2L) == Map("update_before" -> 1, "update_after" -> 1, "insert" -> 1))
    assert(tally(3L) == Map("delete" -> 1))
  }

  test("changelog is per-commit with ordinal and commit-snapshot metadata") {
    val dir = Files.createTempDirectory("graft_idf_ord").toString
    import spark.implicits._
    Seq((1L, "base")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    graft.spatial.GeoTable.writeManifest(spark, dir)
    val v1 = Snapshots.mainVersion(dir)
    Snapshots.append(Seq((2L, "transient")).toDF("id", "v"), dir)
    val v2 = Snapshots.mainVersion(dir)
    spark.sql(s"DELETE FROM '$dir' WHERE id = 2")
    val v3 = Snapshots.mainVersion(dir)
    // the PLAIN changelog shows both events (the reference's changelog
    // scan), with 0-based ordinals and the committing snapshot id — an
    // endpoint diff would net them to nothing
    spark.sql(s"CALL graft.system.create_changelog_view('$dir', $v1, $v3, 'ord_v')")
    val rows = spark.sql(
      "SELECT id, _change_type, _change_ordinal, _commit_snapshot_id FROM ord_v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(rows == Set(
      (2L, "insert", 0, v2.toLong),
      (2L, "delete", 1, v3.toLong)), s"got $rows")
    // survivors of the net pass keep the metadata of the surviving event
    Snapshots.append(Seq((2L, "back")).toDF("id", "v"), dir)
    val v4 = Snapshots.mainVersion(dir)
    spark.sql(s"CALL graft.system.create_changelog_view('$dir', $v1, $v4, 'ord_net', " +
      "net_changes => true)")
    val net = spark.sql(
      "SELECT id, v, _change_type, _commit_snapshot_id FROM ord_net").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // ins('transient')@v2 cancels del('transient')@v3? No — net pass groups
    // by row CONTENT: 'transient' ins+del cancel; 'back' survives from v4
    assert(net == Set((2L, "back", "insert", v4.toLong)), s"got $net")
  }

  test("create_changelog_view(net_changes => true) collapses carry-overs") {
    val dir = Files.createTempDirectory("graft_idf_net").toString
    import spark.implicits._
    Seq((1L, "keep")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    graft.spatial.GeoTable.writeManifest(spark, dir)
    val v1 = Snapshots.mainVersion(dir)
    // insert id=2 then delete it again inside the range: net effect zero
    Snapshots.append(Seq((2L, "transient")).toDF("id", "v"), dir)
    spark.sql(s"DELETE FROM '$dir' WHERE id = 2")
    Snapshots.append(Seq((3L, "stays")).toDF("id", "v"), dir)
    val v2 = Snapshots.mainVersion(dir)
    spark.sql(s"CALL graft.system.create_changelog_view('$dir', $v1, $v2, 'net_v', " +
      "net_changes => true)")
    val rows = spark.sql("SELECT id, _change_type FROM net_v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((3L, "insert")), s"got $rows")
    // the direct net pass also collapses an explicit carry-over frame
    val carry = Seq((9L, "t", "insert"), (9L, "t", "delete"), (8L, "s", "insert"))
      .toDF("id", "v", "_change_type")
    val net = Snapshots.removeNetCarryovers(carry).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(net == Set((8L, "insert")))
    // ref CreateChangelogViewProcedure: net_changes + update pairing rejected
    intercept[Exception] {
      spark.sql(s"CALL graft.system.create_changelog_view('$dir', $v1, $v2, 'net_bad', " +
        "net_changes => true, identifier_columns => 'id')")
    }
  }

  test("path-addressed DDL form works too") {
    val dir = Files.createTempDirectory("graft_idf_path").toString
    import spark.implicits._
    Seq((1L, 2.0)).toDF("id", "v").write.mode("overwrite").parquet(dir)
    graft.spatial.GeoTable.writeManifest(spark, dir)
    spark.sql(s"ALTER TABLE '$dir' SET IDENTIFIER FIELDS id")
    assert(Snapshots.identifierFields(dir) == Seq("id"))
  }
}
