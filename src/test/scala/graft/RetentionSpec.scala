package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.Snapshots

/** Branch/tag retention (`CREATE BRANCH b RETAIN n DAYS WITH SNAPSHOT
  * RETENTION k SNAPSHOTS`, ref `IcebergSqlExtensions.g4:110,118` and
  * `SnapshotRef` retention fields): policies store per-ref and
  * `expire_snapshots` honors them — an aged-out ref disappears, a branch
  * keeps only its retained ancestry window.
  */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkTable(name: String): String = {
    graft.spatial.Geo.install(spark)
    val dir = Files.createTempDirectory(s"graft_ret_$name").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    graft.spatial.GeoTable.writeManifest(spark, dir)
    dir
  }

  test("expired tag and branch disappear on expire_snapshots; props cleaned") {
    val dir = mkTable("tag")
    spark.sql(s"ALTER TABLE '$dir' CREATE TAG archived RETAIN 0 MINUTES")
    spark.sql(s"ALTER TABLE '$dir' CREATE BRANCH stale RETAIN 0 MINUTES")
    spark.sql(s"ALTER TABLE '$dir' CREATE TAG keeper RETAIN 1000 DAYS")
    val (bs0, ts0) = Snapshots.readRefs(dir)
    assert(ts0.contains("archived") && ts0.contains("keeper") && bs0.contains("stale"))
    Snapshots.expireSnapshots(spark, dir, keep = 10)
    val (bs, ts) = Snapshots.readRefs(dir)
    assert(!ts.contains("archived"), "expired tag must disappear")
    assert(!bs.contains("stale"), "expired branch must disappear")
    assert(ts.contains("keeper"), "unexpired tag must survive")
    val props = Snapshots.readProps(dir)
    assert(!props.keys.exists(_.startsWith("ref.archived.")),
      "expired ref's retention properties must be cleaned")
    assert(props.keys.exists(_.startsWith("ref.keeper.")))
  }

  test("branch snapshot retention keeps exactly the declared ancestry window") {
    val dir = mkTable("win")
    import spark.implicits._
    spark.sql(
      s"ALTER TABLE '$dir' CREATE BRANCH dev RETAIN 100 DAYS WITH SNAPSHOT RETENTION 2 SNAPSHOTS")
    // grow the branch chain: 3 branch appends beyond the fork
    (0 until 3).foreach { k =>
      Snapshots.appendToBranch(Seq((10L + k, s"b$k")).toDF("id", "v"), dir, "dev")
    }
    val devHead = Snapshots.resolveRef(dir, "dev")
    val chain = Snapshots.ancestorsOf(dir, devHead).reverse // oldest → newest
    assert(chain.length >= 4, s"fixture needs a chain, got $chain")
    Snapshots.expireSnapshots(spark, dir, keep = 1)
    // the branch survives; exactly its last 2 ancestry snapshots remain
    val (bs, _) = Snapshots.readRefs(dir)
    assert(bs.contains("dev"))
    val surviving = chain.filter(v =>
      Files.exists(Paths.get(dir, s"_graft_manifest_v$v.json")))
    val expectKept = chain.takeRight(2).toSet ++
      Set(Snapshots.mainVersion(dir)) // main's own head stays
    assert(surviving.toSet == expectKept.intersect(chain.toSet),
      s"branch must keep exactly its retained window: chain=$chain surviving=$surviving")
    // the retained branch head still reads
    assert(Snapshots.read(spark, dir, Some(devHead)).count() == 4)
  }

  test("CREATE OR REPLACE / REPLACE / IF NOT EXISTS / DROP IF EXISTS ref forms") {
    val dir = mkTable("forms")
    import spark.implicits._
    spark.sql(s"ALTER TABLE '$dir' CREATE TAG v1")
    val v1 = Snapshots.resolveRef(dir, "v1")
    Snapshots.append(Seq((2L, "b")).toDF("id", "v"), dir)
    // plain CREATE refuses an existing name; IF NOT EXISTS no-ops
    intercept[Exception] { spark.sql(s"ALTER TABLE '$dir' CREATE TAG v1") }
    spark.sql(s"ALTER TABLE '$dir' CREATE TAG IF NOT EXISTS v1")
    assert(Snapshots.resolveRef(dir, "v1") == v1, "IF NOT EXISTS must not move the tag")
    // CREATE OR REPLACE moves it to the new head
    spark.sql(s"ALTER TABLE '$dir' CREATE OR REPLACE TAG v1")
    assert(Snapshots.resolveRef(dir, "v1") == Snapshots.mainVersion(dir))
    // plain REPLACE requires existence
    intercept[Exception] { spark.sql(s"ALTER TABLE '$dir' REPLACE BRANCH nope") }
    spark.sql(s"ALTER TABLE '$dir' CREATE BRANCH dev AS OF VERSION $v1")
    spark.sql(s"ALTER TABLE '$dir' REPLACE BRANCH dev")
    assert(Snapshots.resolveRef(dir, "dev") == Snapshots.mainVersion(dir))
    // a branch name cannot be REPLACEd as a tag
    intercept[Exception] { spark.sql(s"ALTER TABLE '$dir' CREATE OR REPLACE TAG dev") }
    // DROP IF EXISTS no-ops on a missing ref; plain DROP errors
    spark.sql(s"ALTER TABLE '$dir' DROP TAG IF EXISTS ghost")
    intercept[Exception] { spark.sql(s"ALTER TABLE '$dir' DROP TAG ghost") }
    spark.sql(s"ALTER TABLE '$dir' DROP BRANCH IF EXISTS dev")
    assert(!Snapshots.readRefs(dir)._1.contains("dev"))
  }

  test("WITH SNAPSHOT RETENTION age and combined forms; age window honored by expire") {
    val dir = mkTable("age")
    import spark.implicits._
    spark.sql(
      s"ALTER TABLE '$dir' CREATE BRANCH aged RETAIN 100 DAYS WITH SNAPSHOT RETENTION 1000 DAYS")
    assert(Snapshots.readProps(dir).get("ref.aged.max-snapshot-age-ms")
      .contains((1000L * 86400000L).toString))
    spark.sql(s"ALTER TABLE '$dir' CREATE BRANCH both " +
      "RETAIN 100 DAYS WITH SNAPSHOT RETENTION 2 SNAPSHOTS 1000 DAYS")
    assert(Snapshots.readProps(dir).get("ref.both.min-snapshots-keep").contains("2"))
    assert(Snapshots.readProps(dir).get("ref.both.max-snapshot-age-ms").isDefined)
    // a 1000-day age window keeps the WHOLE young chain despite keep=1
    (0 until 3).foreach(k =>
      Snapshots.appendToBranch(Seq((10L + k, "x")).toDF("id", "v"), dir, "aged"))
    val chain = Snapshots.ancestorsOf(dir, Snapshots.resolveRef(dir, "aged")).reverse
    Snapshots.expireSnapshots(spark, dir, keep = 1)
    assert(chain.forall(v => java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, s"_graft_manifest_v$v.json"))),
      "age-retained branch ancestry must survive expire")
    // ref grammar: a bare WITH SNAPSHOT RETENTION (neither k SNAPSHOTS nor
    // an age) is an error, not a silent no-op retention clause
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE '$dir' CREATE BRANCH bare WITH SNAPSHOT RETENTION")
    }
    assert(e.getMessage.contains("SNAPSHOT RETENTION"), e.getMessage)
    // an aged-out ref drop clears ALL its policy props, incl. the age
    // window — a recreated same-name branch must not inherit it
    spark.sql(s"ALTER TABLE '$dir' CREATE BRANCH ghost " +
      "RETAIN 0 MINUTES WITH SNAPSHOT RETENTION 999 DAYS")
    Snapshots.expireSnapshots(spark, dir, keep = 1)
    assert(!Snapshots.readRefs(dir)._1.contains("ghost"))
    assert(!Snapshots.readProps(dir).contains("ref.ghost.max-snapshot-age-ms"),
      "expired ref must not leave a stale age window behind")
  }

  test("ADD/REPLACE PARTITION FIELD accepts AS <name> for bucket/truncate") {
    graft.spatial.Geo.install(spark)
    val dir = Files.createTempDirectory("graft_ret_asname").toString
    import spark.implicits._
    (1L to 20L).map(i => (i, s"r$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    graft.spatial.GeoTable.writeManifest(spark, dir)
    spark.sql(s"ALTER TABLE '$dir' ADD PARTITION FIELD bucket(4, id) AS shard")
    val specs = graft.spatial.GeoTable.readPartitionSpecs(dir)
    assert(specs.exists(_.derivedName == "shard"), s"got ${specs.map(_.spec)}")
    spark.sql(s"ALTER TABLE '$dir' REPLACE PARTITION FIELD bucket(4, id, shard) " +
      "WITH bucket(8, id) AS shard8")
    val specs2 = graft.spatial.GeoTable.readPartitionSpecs(dir)
    assert(specs2.exists(_.derivedName == "shard8") && !specs2.exists(_.derivedName == "shard"))
    // identity/date transforms refuse an explicit name
    intercept[Exception] {
      spark.sql(s"ALTER TABLE '$dir' ADD PARTITION FIELD days(id) AS d") }
  }

  test("tags reject SNAPSHOT RETENTION; catalog identifiers resolve") {
    val dir = mkTable("neg")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE '$dir' CREATE TAG t1 RETAIN 1 DAYS WITH SNAPSHOT RETENTION 2 SNAPSHOTS")
    }
    // catalog ident form
    val wh = Files.createTempDirectory("graft_ret_wh").toString
    spark.conf.set("spark.sql.catalog.retcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.retcat.warehouse", wh)
    spark.sql("CREATE TABLE retcat.db.r (id BIGINT)")
    spark.sql("INSERT INTO retcat.db.r VALUES (1)")
    spark.sql("ALTER TABLE retcat.db.r CREATE BRANCH dev RETAIN 5 DAYS")
    val tbl = s"$wh/db/r"
    assert(Snapshots.readRefs(tbl)._1.contains("dev"))
    assert(Snapshots.readProps(tbl).contains("ref.dev.retain-ms"))
  }

  test("bare expire_snapshots takes its defaults from history.expire.* properties") {
    import spark.implicits._
    val dir = mkTable("propdef")
    (2 to 5).foreach(i =>
      Snapshots.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir))
    // min-snapshots-to-keep=3: the bare call must keep 3, not the
    // hardcoded 1 (the reference's RemoveSnapshots property seam)
    Snapshots.updateProperties(dir,
      Map("history.expire.min-snapshots-to-keep" -> "3"))
    spark.sql(s"CALL graft.system.expire_snapshots('$dir')")
    val kept = Snapshots.metadataTable(spark, dir, "snapshots").count()
    assert(kept >= 3, s"min-snapshots-to-keep=3 must keep 3 ancestry snapshots, kept $kept")
    assert(kept < 6, "older snapshots beyond the floor must expire")
    // a declared age window protects EVERYTHING younger than it
    val dir2 = mkTable("propage")
    (2 to 4).foreach(i =>
      Snapshots.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir2))
    Snapshots.updateProperties(dir2,
      Map("history.expire.max-snapshot-age-ms" -> (24L * 3600 * 1000).toString))
    spark.sql(s"CALL graft.system.expire_snapshots('$dir2')")
    assert(Snapshots.metadataTable(spark, dir2, "snapshots").count() >= 4,
      "snapshots younger than the declared age window must survive the bare call")
    // an explicit older_than overrides the declared window (the property
    // is the DEFAULT for the absent arg, reference semantics)
    spark.sql(s"CALL graft.system.expire_snapshots('$dir2', 1, " +
      s"older_than => ${System.currentTimeMillis() + 1000})")
    assert(Snapshots.metadataTable(spark, dir2, "snapshots").count() < 4)
  }
}
