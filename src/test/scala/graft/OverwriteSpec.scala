package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.Snapshots

/** INSERT OVERWRITE / overwritePartitions on the catalog surface: dynamic
  * partition overwrite replaces ONLY the partitions present in the
  * incoming data (one snapshot, untouched partitions byte-identical);
  * static-mode `PARTITION (p = v)` replaces exactly the named partition
  * without rewriting any other file; plain INSERT OVERWRITE truncates —
  * the reference's SparkWriteBuilder mode surface
  * (`SparkWrite.java:161-186` asDynamicOverwrite in /root/reference).
  */
class OverwriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val warehouse: String = {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_ow_wh").toString
    spark.conf.set("spark.sql.catalog.owcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.owcat.warehouse", wh)
    wh
  }

  /** (relative path, size) of every data file, per partition dir. */
  private def dataFiles(tbl: String): Map[String, Set[(String, Long)]] = {
    val base = Paths.get(tbl)
    Files.walk(base).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map { p =>
        val rel = base.relativize(p).toString
        val dir = rel.lastIndexOf('/') match {
          case -1 => ""
          case i => rel.substring(0, i)
        }
        dir -> (rel, Files.size(p))
      }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .filter { case (d, _) => !d.split('/').exists(_.startsWith("_")) }
  }

  private def mkPartitioned(name: String): String = {
    val tbl = s"$warehouse/db/$name"
    spark.sql(s"CREATE TABLE owcat.db.$name (id BIGINT, v DOUBLE, p STRING) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO owcat.db.$name VALUES " +
      (1 to 30).map(i => s"($i, ${i * 1.5}, '${Seq("a", "b", "c")(i % 3)}')").mkString(", "))
    tbl
  }

  test("dynamic INSERT OVERWRITE replaces only the incoming partitions") {
    val tbl = mkPartitioned("dyn1")
    val before = dataFiles(tbl)
    val beforeVersion = Snapshots.mainVersion(tbl)
    val keepA = spark.sql("SELECT id, v FROM owcat.db.dyn1 WHERE p = 'a'").collect().toSet
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE owcat.db.dyn1 VALUES (100, 9.5, 'b'), (101, 10.5, 'b')")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    // partition b holds exactly the new rows; a and c are untouched
    assert(spark.sql("SELECT id FROM owcat.db.dyn1 WHERE p = 'b'")
      .collect().map(_.getLong(0)).toSet == Set(100L, 101L))
    assert(spark.sql("SELECT id, v FROM owcat.db.dyn1 WHERE p = 'a'").collect().toSet == keepA)
    assert(spark.sql("SELECT count(*) FROM owcat.db.dyn1 WHERE p = 'c'").head.getLong(0) == 10)

    // untouched partition dirs keep their files byte-identical; the old
    // p=b files stay ON DISK for time travel but leave the manifest
    val after = dataFiles(tbl)
    assert(after("p=a") == before("p=a"), "partition a must be untouched")
    assert(after("p=c") == before("p=c"), "partition c must be untouched")
    val refd = Snapshots.readManifest(tbl).map(_.path).toSet
    assert(before("p=b").forall { case (rel, _) => !refd(rel) },
      "old partition-b files must leave the manifest")
    assert(refd.exists(_.startsWith("p=b/")), "new partition-b files must be referenced")

    // ONE snapshot; time travel serves the pre-overwrite state
    assert(Snapshots.mainVersion(tbl) == beforeVersion + 1)
    assert(spark.sql(
      s"SELECT count(*) FROM owcat.db.dyn1 VERSION AS OF $beforeVersion WHERE p = 'b'")
      .head.getLong(0) == 10)
  }

  test("overwritePartitions() API routes through the same dynamic write") {
    val tbl = mkPartitioned("dyn2")
    val before = dataFiles(tbl)
    spark.sql("SELECT CAST(200 AS BIGINT) id, 1.0 v, 'c' p")
      .writeTo("owcat.db.dyn2").overwritePartitions()
    assert(spark.sql("SELECT id FROM owcat.db.dyn2 WHERE p = 'c'")
      .collect().map(_.getLong(0)).toSet == Set(200L))
    assert(spark.sql("SELECT count(*) FROM owcat.db.dyn2").head.getLong(0) == 21)
    val after = dataFiles(tbl)
    assert(after("p=a") == before("p=a") && after("p=b") == before("p=b"))
  }

  test("dynamic overwrite clusters rows: one task per partition dir") {
    val tbl = s"$warehouse/db/dyn3"
    spark.sql("CREATE TABLE owcat.db.dyn3 (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO owcat.db.dyn3 VALUES (0, 'a'), (0, 'b')")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // 8 input partitions of rows into 2 dirs: the clustered write
      // distribution must shuffle rows to their partition, not let every
      // task spill a sliver into every dir
      import spark.implicits._
      spark.range(0, 800, 1, 8).map(i => (i, if (i % 2 == 0) "a" else "b"))
        .toDF("id", "p").writeTo("owcat.db.dyn3").overwritePartitions()
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    assert(spark.sql("SELECT count(*) FROM owcat.db.dyn3").head.getLong(0) == 800)
    val after = dataFiles(tbl)
    assert(after("p=a").size <= 2, s"expected few files per dir, got ${after("p=a").size}")
    assert(after("p=b").size <= 2, s"expected few files per dir, got ${after("p=b").size}")
  }

  test("dynamic overwrite of an unpartitioned table replaces everything") {
    spark.sql("CREATE TABLE owcat.db.dynu (id BIGINT)")
    spark.sql("INSERT INTO owcat.db.dynu VALUES (1), (2), (3)")
    spark.sql("SELECT CAST(9 AS BIGINT) id").writeTo("owcat.db.dynu").overwritePartitions()
    assert(spark.sql("SELECT id FROM owcat.db.dynu").collect().map(_.getLong(0)).toSet == Set(9L))
  }

  test("static INSERT OVERWRITE PARTITION replaces one partition, rewrites nothing else") {
    val tbl = mkPartitioned("stat1")
    val before = dataFiles(tbl)
    val beforeVersion = Snapshots.mainVersion(tbl)
    spark.sql("INSERT OVERWRITE owcat.db.stat1 PARTITION (p = 'a') VALUES (300, 0.5)")
    assert(spark.sql("SELECT id FROM owcat.db.stat1 WHERE p = 'a'")
      .collect().map(_.getLong(0)).toSet == Set(300L))
    assert(spark.sql("SELECT count(*) FROM owcat.db.stat1").head.getLong(0) == 21)
    val after = dataFiles(tbl)
    assert(after("p=b") == before("p=b") && after("p=c") == before("p=c"),
      "untouched partitions must keep their files byte-identical")
    // one snapshot; old state time-travels
    assert(Snapshots.mainVersion(tbl) == beforeVersion + 1)
    assert(spark.sql(
      s"SELECT count(*) FROM owcat.db.stat1 VERSION AS OF $beforeVersion").head.getLong(0) == 30)
  }

  test("filter overwrite straddling files rewrites copy-on-write") {
    // unpartitioned: the condition id <= 2 straddles the single file, so
    // the overwrite must CoW-rewrite survivors in the same snapshot
    spark.sql("CREATE TABLE owcat.db.statcow (id BIGINT, v STRING)")
    spark.sql("INSERT INTO owcat.db.statcow VALUES (1, 'x'), (2, 'y'), (3, 'z')")
    spark.sql("SELECT CAST(10 AS BIGINT) id, 'new' v")
      .writeTo("owcat.db.statcow").overwrite(org.apache.spark.sql.functions.col("id") <= 2)
    assert(spark.sql("SELECT id, v FROM owcat.db.statcow").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((3L, "z"), (10L, "new")))
  }

  test("plain INSERT OVERWRITE truncates the table") {
    val tbl = mkPartitioned("trunc1")
    val beforeVersion = Snapshots.mainVersion(tbl)
    spark.sql("INSERT OVERWRITE owcat.db.trunc1 VALUES (400, 1.0, 'z')")
    assert(spark.sql("SELECT id, p FROM owcat.db.trunc1").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((400L, "z")))
    // previous snapshot still time-travels
    assert(spark.sql(
      s"SELECT count(*) FROM owcat.db.trunc1 VERSION AS OF $beforeVersion").head.getLong(0) == 30)
  }

  test("dynamic overwrite on a bucket-partitioned table lands in bucket dirs") {
    val tbl = s"$warehouse/db/dynbk"
    spark.sql("CREATE TABLE owcat.db.dynbk (id BIGINT, v STRING) PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO owcat.db.dynbk VALUES " +
      (1 to 20).map(i => s"($i, 'r$i')").mkString(", "))
    val total = spark.sql("SELECT count(*) FROM owcat.db.dynbk").head.getLong(0)
    assert(total == 20)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // id=1 hashes to one bucket: that whole bucket is replaced, others kept
      spark.sql("INSERT OVERWRITE owcat.db.dynbk VALUES (1, 'replaced')")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    val ids = spark.sql("SELECT id FROM owcat.db.dynbk").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L))
    assert(ids.size < 20 && ids.size > 1,
      s"one bucket replaced, the rest kept; got ${ids.size} ids")
    // every id outside id=1's bucket survives
    val bucketOf1 = graft.spatial.Transforms.parse("bucket(4,id)")
    val b1 = {
      import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      import org.apache.spark.sql.types.LongType
      val h = Murmur3HashFunction.hash(1L, LongType, 42L).toInt
      ((h % 4) + 4) % 4
    }
    val expectedSurvivors = (2 to 20).filter { i =>
      import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      import org.apache.spark.sql.types.LongType
      val h = Murmur3HashFunction.hash(i.toLong, LongType, 42L).toInt
      ((h % 4) + 4) % 4 != b1
    }.map(_.toLong).toSet + 1L
    assert(ids == expectedSurvivors, s"bucket $b1 replaced exactly")
    assert(bucketOf1.isInstanceOf[graft.spatial.Transforms.Bucket])
  }

  test("INSERT OVERWRITE on a branch is rejected") {
    spark.sql("CREATE TABLE owcat.db.brow (id BIGINT)")
    spark.sql("INSERT INTO owcat.db.brow VALUES (1)")
    Snapshots.createBranch(s"$warehouse/db/brow", "dev")
    intercept[Exception] {
      spark.sql("INSERT OVERWRITE owcat.db.brow.branch_dev VALUES (9)")
    }
  }
}
