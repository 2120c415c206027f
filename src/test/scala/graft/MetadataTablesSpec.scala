package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoCodec
import graft.spatial.{GeoTable, Snapshots}

/** Metadata tables over the snapshot layer: snapshots / manifests /
  * partitions / entries (+ pre-existing files / history), matching the
  * reference's `MetadataTableType` surface
  * (`core/src/main/java/org/apache/iceberg/MetadataTableType.java:23-38`).
  */
class MetadataTablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mk(ids: Range, q: Int) = {
    val rows = ids.map { i =>
      Row(i.toLong, q, GeoCodec.writeWkb(GeoCodec.point(
        (if (q == 1 || q == 2) -1 else 1) * (i % 50 + 1.0),
        (if (q >= 2) -1 else 1) * (i % 40 + 1.0))))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("part", IntegerType),
        StructField("geom", BinaryType))))
    GeoTable.withBbox(df, "geom")
  }

  private lazy val dir: String = {
    graft.spatial.Geo.install(spark)
    val d = Files.createTempDirectory("graft_meta").toString
    GeoTable.write(mk(0 until 40, 0).coalesce(1), d, "geom", res = 8,
      partitionBy = Seq("part"))               // v1: 1 file in part=0
    Snapshots.append(mk(100 until 140, 2), d)  // v2: +1 file in part=2
    Snapshots.delete(spark, d, col("id") < 5)  // v3: CoW rewrite of part=0 file
    d
  }

  test("snapshots table reports commit lineage with operations and deltas") {
    val snaps = Snapshots.snapshotsTable(spark, dir).collect()
      .map(r => r.getInt(r.fieldIndex("version")) -> r).toMap
    def str(v: Int, c: String) = snaps(v).getString(snaps(v).fieldIndex(c))
    def int(v: Int, c: String) = snaps(v).getInt(snaps(v).fieldIndex(c))
    def lng(v: Int, c: String) = snaps(v).getLong(snaps(v).fieldIndex(c))
    assert(snaps.keySet == Set(1, 2, 3))
    assert(str(1, "operation") == "append" && lng(1, "record_count") == 40L)
    assert(str(2, "operation") == "append" && lng(2, "record_count") == 80L)
    assert(int(2, "added_files") == 1 && int(2, "removed_files") == 0)
    assert(str(3, "operation") == "overwrite" && lng(3, "record_count") == 75L)
    assert(int(3, "removed_files") == 1) // CoW removed the rewritten file
    // parent lineage: roots have null parents, children point at their
    // predecessor (the reference's snapshots.parent_id)
    assert(snaps(1).isNullAt(snaps(1).fieldIndex("parent_version")))
    assert(int(2, "parent_version") == 1 && int(3, "parent_version") == 2)
    // commit times are monotonic
    val ts = (1 to 3).map(v =>
      snaps(v).getTimestamp(snaps(v).fieldIndex("committed_at")).getTime)
    assert(ts == ts.sorted)
  }

  test("changes table: full-history and windowed changelog reads") {
    // full history via the metadata-table name (also `cat.db.t.changes`):
    // 40 inserts @v1, 40 inserts @v2, 5 deletes + re-inserts? no — CoW
    // delete removes 5 rows of part=0: delete events @v3
    val full = spark.read.format("graft")
      .option("metadata", "changes").load(dir)
    val byOrd = full.groupBy("_change_ordinal", "_change_type").count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byOrd == Map((0, "insert") -> 40L, (1, "insert") -> 40L,
      (2, "delete") -> 5L), s"got $byOrd")
    // commit ids line up with the snapshot versions
    val commits = full.select("_change_ordinal", "_commit_snapshot_id").distinct()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(commits == Map(0 -> 1L, 1 -> 2L, 2 -> 3L))
    // windowed: start-version is exclusive, end-version inclusive
    val win = spark.read.format("graft")
      .option("metadata", "changes")
      .option("start-version", "1").option("end-version", "2").load(dir)
    assert(win.count() == 40 &&
      win.select("_change_type").distinct().collect().head.getString(0) == "insert")
  }

  test("manifests table lists every retained manifest") {
    val ms = Snapshots.manifestsTable(spark, dir).collect()
    assert(ms.length == 3)
    assert(ms.forall(_.getString(0).startsWith("_graft_manifest_v")))
    assert(ms.forall(_.getLong(2) > 0))
  }

  test("partitions table groups the current snapshot by partition dir") {
    val ps = Snapshots.partitionsTable(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ps == Map("part=0" -> 35L, "part=2" -> 40L))
  }

  test("entries table marks files added vs existing in the current snapshot") {
    val es = Snapshots.entriesTable(spark, dir).collect()
      .map(r => r.getString(1) -> r.getString(0)).toMap
    assert(es.size == 2)
    // v3 rewrote the part=0 file (added); the part=2 file carried over
    val byStatus = es.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    assert(byStatus("added").forall(_.startsWith("part=0")))
    assert(byStatus("existing").forall(_.startsWith("part=2")))
  }

  test("refs / delete_files / metadata_log / all_* tables") {
    // refs: implicit main + an explicit branch and tag
    val d2 = Files.createTempDirectory("graft_meta2").toString
    GeoTable.write(mk(0 until 30, 0), d2, "geom", res = 8, numFiles = 1)
    Snapshots.append(mk(30 until 60, 1), d2)
    Snapshots.createBranch(d2, "dev")
    Snapshots.createTag(d2, "v1", Some(1))
    val refs = Snapshots.metadataTable(spark, d2, "refs").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(refs("main") == ("BRANCH", 2))
    assert(refs("dev") == ("BRANCH", 2))
    assert(refs("v1") == ("TAG", 1))
    // delete_files: one of each delete kind, all metadata-only
    import spark.implicits._
    Snapshots.deleteMoR(spark, d2, "id = 7")
    val posTarget = Snapshots.read(spark, d2)
      .select(expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") === 9).drop("id")
    Snapshots.deleteByPosition(spark, d2, posTarget)
    Snapshots.deleteByEquality(spark, d2, Seq(8L).toDF("id"))
    val dels = Snapshots.metadataTable(spark, d2, "delete_files").collect()
      .map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(dels == Map("POSITION_DELETES" -> 1, "EQUALITY_DELETES" -> 1,
      "PREDICATE_DELETES" -> 1))
    assert(Snapshots.metadataTable(spark, d2, "position_deletes").count() == 1)
    // metadata_log_entries: manifests + refs generations, times monotonic
    val log = Snapshots.metadataTable(spark, d2, "metadata_log_entries")
    assert(log.filter(col("kind") === "manifest").count() == 5)
    assert(log.filter(col("kind") === "refs").count() > 0)
    // all_*: every retained snapshot's view, not just the head
    val allFiles = Snapshots.metadataTable(spark, d2, "all_files")
    assert(allFiles.filter(col("version") === 1).count() == 1)
    assert(allFiles.filter(col("version") === 2).count() == 2)
    val allEntries = Snapshots.metadataTable(spark, d2, "all_entries").collect()
    assert(allEntries.count(r => r.getString(1) == "added") == 2)
    val allDels = Snapshots.metadataTable(spark, d2, "all_delete_files")
    assert(allDels.filter(col("version") === 5).count() == 3)
    assert(allDels.filter(col("version") === 2).count() == 0)
    // data_files / all_data_files aliases resolve
    assert(Snapshots.metadataTable(spark, d2, "data_files").count() == 2)
    assert(Snapshots.metadataTable(spark, d2, "all_data_files").count() ==
      allFiles.count())
  }

  test("metadata tables are reachable through format(graft)") {
    val snaps = spark.read.format("graft")
      .option("metadata", "snapshots").load(dir)
    assert(snaps.count() == 3)
    val parts = spark.read.format("graft")
      .option("metadata", "partitions").load(dir)
      .collect().map(_.getString(0)).toSet
    assert(parts == Set("part=0", "part=2"))
    intercept[Exception] {
      spark.read.format("graft").option("metadata", "nope").load(dir).collect()
    }
  }

  test("metadata tables time-travel: VERSION AS OF scopes the snapshot-shaped " +
      "tables; whole-history tables reject it") {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_mtt_wh").toString
    spark.conf.set("spark.sql.catalog.mttcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mttcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mttcat.db")
    spark.sql("CREATE TABLE mttcat.db.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mttcat.db.t SELECT id, concat('a', id) FROM range(10)")
    spark.sql("INSERT INTO mttcat.db.t SELECT id, concat('b', id) FROM range(10, 30)")
    val d = s"$wh/db/t"
    val head = Snapshots.mainVersion(d)
    val prev = head - 1
    // files table at the PREVIOUS snapshot sees only the first append
    val oldFiles = spark.sql(
      s"SELECT * FROM mttcat.db.t.files VERSION AS OF $prev").collect()
    val newFiles = spark.sql("SELECT * FROM mttcat.db.t.files").collect()
    assert(oldFiles.length < newFiles.length)
    assert(oldFiles.map(r => r.getLong(r.fieldIndex("record_count"))).sum == 10)
    assert(newFiles.map(r => r.getLong(r.fieldIndex("record_count"))).sum == 30)
    // partitions + entries scope too (record counts reflect the snapshot)
    val oldParts = spark.sql(
      s"SELECT * FROM mttcat.db.t.partitions VERSION AS OF $prev").collect()
    assert(oldParts.map(r => r.getLong(r.fieldIndex("record_count"))).sum == 10)
    val oldEntries = Snapshots.metadataTable(spark, d, "entries", Some(prev)).collect()
    assert(oldEntries.map(r => r.getLong(r.fieldIndex("record_count"))).sum == 10)
    // the same scope through the path API: format("graft") version option
    assert(spark.read.format("graft").option("metadata", "files")
      .option("version", prev.toString).load(d).count() == oldFiles.length)
    // whole-history tables reject a version scope instead of ignoring it
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM mttcat.db.t.history VERSION AS OF $prev").collect()
    }
    assert(e.getMessage.contains("does not apply") ||
      Option(e.getCause).exists(_.getMessage.contains("does not apply")))
    // a nonexistent snapshot fails loudly
    intercept[Exception] {
      spark.sql("SELECT * FROM mttcat.db.t.files VERSION AS OF 999").collect()
    }
    // an UNKNOWN metadata-table name under VERSION AS OF reports
    // table-not-found (not a misleading "whole-history" scope error that
    // implies the name is valid)
    val eu = intercept[Exception] {
      spark.sql(s"SELECT * FROM mttcat.db.t.nope VERSION AS OF $prev").collect()
    }
    def all(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ all(x.getCause)
    assert(all(eu).exists(m => m.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      m.contains("cannot be found") || m.contains("not found")),
      s"want not-found, got: ${all(eu).mkString(" | ")}")
    assert(!all(eu).exists(_.contains("does not apply")),
      "unknown name must not surface the whole-history scope error")
  }

  test("partition_stats: persisted snapshot-stamped file, manifest-derived, " +
      "MoR position deletes attributed, stale file serves until recompute") {
    graft.spatial.Geo.install(spark)
    val d = Files.createTempDirectory("graft_pstats").toString
    GeoTable.write(mk(0 until 40, 0).coalesce(1), d, "geom", res = 8,
      partitionBy = Seq("part"))
    Snapshots.append(mk(100 until 140, 2), d)
    // never computed → empty with the declared schema
    val empty = Snapshots.metadataTable(spark, d, "partition_stats")
    assert(empty.columns.toSeq == Seq("partition", "data_file_count",
      "record_count", "total_size_bytes", "position_delete_count",
      "last_updated_snapshot"))
    assert(empty.count() == 0)
    // CALL computes + registers; result row carries version + partition count
    val res = spark.sql(s"CALL graft.system.compute_partition_stats('$d')").collect()
    assert(res.head.getString(1) == "partitions=2")
    val ps = Snapshots.metadataTable(spark, d, "partition_stats").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    val v1 = Snapshots.mainVersion(d)
    assert(ps == Map("part=0" -> (1L, 40L, v1.toLong),
      "part=2" -> (1L, 40L, v1.toLong)))
    // MoR positional deletes attribute to the deleted file's partition
    val victims = Snapshots.read(spark, d)
      .filter(col("id").isin(101L, 103L, 105L))
      .select(expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"))
    Snapshots.deleteByPosition(spark, d, victims)
    // stale rule: the v1-stamped file still serves (never travels forward)
    val stale = Snapshots.metadataTable(spark, d, "partition_stats").collect()
    assert(stale.forall(_.getLong(5) == v1.toLong))
    spark.sql(s"CALL graft.system.compute_partition_stats('$d')")
    val ps2 = Snapshots.metadataTable(spark, d, "partition_stats").collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(ps2 == Map("part=0" -> 0L, "part=2" -> 3L))
    // both versioned stats files persist on disk
    assert(Files.list(java.nio.file.Paths.get(d, "_graft_partition_stats"))
      .count() == 2)
  }
}
