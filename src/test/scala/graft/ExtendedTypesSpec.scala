package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{ExtendedTypes, GeoTable, Snapshots}

/** Iceberg's `uuid` / `fixed[n]` / `time` primitives mapped onto Spark
  * physical types (ref Types.java:50-58): string / binary / long-µs with
  * a declared-type sidecar, write-path validation + canonicalization,
  * and the physical type's stats feeding pruning as usual. Promotions:
  * none, matching `TypeUtil.isPromotionAllowed`.
  */
class ExtendedTypesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def uuidOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = md5(encode(c.cast("string"), "UTF-8"))
    concat(substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
      substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"), substring(h, 21, 12))
  }

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft_xt").toString + "/tbl"
    spark.range(50).select(col("id"),
        uuidOf(col("id")).as("u"),
        ((col("id") * 104729L) % ExtendedTypes.MicrosPerDay).as("t"),
        encode(format_string("%04d", col("id")), "UTF-8").as("f"))
      .coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    ExtendedTypes.declare(dir, "u", ExtendedTypes.Uuid)
    ExtendedTypes.declare(dir, "t", ExtendedTypes.Time)
    ExtendedTypes.declare(dir, "f", ExtendedTypes.Fixed(4))
    dir
  }

  test("spec parse + sidecar round-trip") {
    assert(ExtendedTypes.parse("uuid").contains(ExtendedTypes.Uuid))
    assert(ExtendedTypes.parse("fixed(16)").contains(ExtendedTypes.Fixed(16)))
    assert(ExtendedTypes.parse("fixed[8]").contains(ExtendedTypes.Fixed(8)))
    assert(ExtendedTypes.parse("time").contains(ExtendedTypes.Time))
    assert(ExtendedTypes.parse("bigint").isEmpty)
    // a width past Int.MaxValue is "not an extended type", not a raw NFE
    assert(ExtendedTypes.parse("fixed(99999999999)").isEmpty)
    val dir = mkTable()
    val declared = ExtendedTypes.get(dir)
    assert(declared == Map("u" -> ExtendedTypes.Uuid, "t" -> ExtendedTypes.Time,
      "f" -> ExtendedTypes.Fixed(4)))
    // exotic column names survive the sidecar round trip (JSON escaping)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_xt_esc").toString
    ExtendedTypes.declare(dir2, "a\"b\\c", ExtendedTypes.Uuid)
    assert(ExtendedTypes.get(dir2) == Map("a\"b\\c" -> ExtendedTypes.Uuid))
  }

  test("appends canonicalize uuids (uppercase in, lowercase stored) and accept valid rows") {
    val dir = mkTable()
    Snapshots.append(spark.range(100, 105).select(col("id"),
      upper(uuidOf(col("id"))).as("u"),
      lit(123L).as("t"),
      encode(lit("abcd"), "UTF-8").as("f")), dir)
    val t = Snapshots.read(spark, dir)
    assert(t.count() == 55)
    // every stored uuid is canonical lowercase, including the appended ones
    assert(t.filter(col("u") =!= lower(col("u"))).count() == 0)
    assert(t.filter(col("id") === 101 && col("u") === lower(col("u"))).count() == 1)
  }

  test("invalid values are rejected at write time: uuid shape, fixed length, time range") {
    val dir = mkTable()
    def fails(df: org.apache.spark.sql.DataFrame, needle: String): Unit = {
      val e = intercept[Exception] { Snapshots.append(df, dir) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(needle)), s"want '$needle' in ${msgs(e)}")
    }
    fails(spark.range(1).select(col("id"), lit("not-a-uuid").as("u"),
      lit(1L).as("t"), encode(lit("abcd"), "UTF-8").as("f")), "invalid uuid")
    fails(spark.range(1).select(col("id"), uuidOf(col("id")).as("u"),
      lit(1L).as("t"), encode(lit("toolong"), "UTF-8").as("f")), "fixed(4)")
    fails(spark.range(1).select(col("id"), uuidOf(col("id")).as("u"),
      lit(ExtendedTypes.MicrosPerDay).as("t"),
      encode(lit("abcd"), "UTF-8").as("f")), "time out of range")
    // nulls pass every gate
    Snapshots.append(spark.range(1).select(col("id"),
      lit(null).cast("string").as("u"), lit(null).cast("bigint").as("t"),
      lit(null).cast("binary").as("f")), dir)
    assert(Snapshots.read(spark, dir).filter(col("u").isNull).count() == 1)
  }

  test("add_column with uuid/fixed/time specs; rename/drop keep the sidecar in step") {
    val dir = mkTable()
    spark.sql(s"CALL graft.system.add_column('$dir', 'u2', 'uuid')")
    spark.sql(s"CALL graft.system.add_column('$dir', 'fx', 'fixed(8)')")
    spark.sql(s"CALL graft.system.add_column('$dir', 'tm', 'time')")
    val t = Snapshots.read(spark, dir)
    assert(t.schema("u2").dataType == org.apache.spark.sql.types.StringType)
    assert(t.schema("fx").dataType == org.apache.spark.sql.types.BinaryType)
    assert(t.schema("tm").dataType == org.apache.spark.sql.types.LongType)
    assert(ExtendedTypes.get(dir)("u2") == ExtendedTypes.Uuid)
    assert(ExtendedTypes.get(dir)("fx") == ExtendedTypes.Fixed(8))
    assert(ExtendedTypes.get(dir)("tm") == ExtendedTypes.Time)
    spark.sql(s"CALL graft.system.rename_column('$dir', 'u2', 'uid')")
    assert(ExtendedTypes.get(dir).get("u2").isEmpty)
    assert(ExtendedTypes.get(dir)("uid") == ExtendedTypes.Uuid)
    spark.sql(s"CALL graft.system.drop_column('$dir', 'uid')")
    assert(ExtendedTypes.get(dir).get("uid").isEmpty)
    // write-path validation matches top-level frame columns, so an
    // extended type on a nested path would sit inert — rejected up front
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.add_column('$dir', 'pt.z', 'uuid')")
    }
    assert(e.getMessage.contains("top-level"), e.getMessage)
  }

  test("CREATE TABLE declares extended types via the graft.xtypes property; " +
      "CTAS canonicalizes during the staged insert; typos fail the CREATE") {
    val wh = Files.createTempDirectory("graft_xt_wh").toString
    spark.conf.set("spark.sql.catalog.xtc", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.xtc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS xtc.db")
    spark.sql("""CREATE TABLE xtc.db.xt (id BIGINT, u STRING, t BIGINT) USING graft
      TBLPROPERTIES ('graft.xtypes' = 'u:uuid, t:time')""")
    assert(ExtendedTypes.get(s"$wh/db/xt") ==
      Map("u" -> ExtendedTypes.Uuid, "t" -> ExtendedTypes.Time))
    // inserts canonicalize (uppercase in, lowercase stored) and validate
    spark.sql("INSERT INTO xtc.db.xt VALUES " +
      "(1, 'ABCDEF01-2345-6789-ABCD-EF0123456789', 42)")
    assert(spark.table("xtc.db.xt").filter(
      col("u") === "abcdef01-2345-6789-abcd-ef0123456789").count() == 1)
    intercept[Exception] {
      spark.sql("INSERT INTO xtc.db.xt VALUES (2, 'nope', 1)")
    }
    // CTAS: the staged insert already validates + canonicalizes, and the
    // declaration survives the staging-dir move
    spark.sql("""CREATE TABLE xtc.db.xt2 USING graft
      TBLPROPERTIES ('graft.xtypes' = 'u:uuid')
      AS SELECT id, upper(u) AS u FROM xtc.db.xt""")
    assert(ExtendedTypes.get(s"$wh/db/xt2") == Map("u" -> ExtendedTypes.Uuid))
    assert(spark.table("xtc.db.xt2").filter(col("u") =!= lower(col("u"))).count() == 0)
    // schema mismatches fail the CREATE itself
    intercept[Exception] {
      spark.sql("""CREATE TABLE xtc.db.bad1 (id BIGINT, u BIGINT) USING graft
        TBLPROPERTIES ('graft.xtypes' = 'u:uuid')""")
    }
    intercept[Exception] {
      spark.sql("""CREATE TABLE xtc.db.bad2 (id BIGINT) USING graft
        TBLPROPERTIES ('graft.xtypes' = 'ghost:time')""")
    }
    spark.sql("DROP TABLE xtc.db.xt")
    spark.sql("DROP TABLE xtc.db.xt2")
  }

  test("a CREATE failing graft.xtypes validation leaves no table behind") {
    val wh = Files.createTempDirectory("graft_xtv_wh").toString
    spark.conf.set("spark.sql.catalog.xtv", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.xtv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS xtv.db")
    // physical-type mismatch fails the CREATE…
    intercept[Exception] {
      spark.sql("""CREATE TABLE xtv.db.t (id BIGINT, u BIGINT) USING graft
        TBLPROPERTIES ('graft.xtypes' = 'u:uuid')""")
    }
    // …and must NOT leave a half-created table: the corrected retry works
    // (the filesystem backend's layout dir IS the registration, so a
    // manifest committed before validation would brick the identifier)
    spark.sql("""CREATE TABLE xtv.db.t (id BIGINT, u STRING) USING graft
      TBLPROPERTIES ('graft.xtypes' = 'u:uuid')""")
    spark.sql("INSERT INTO xtv.db.t VALUES " +
      "(1, 'ABCDEF01-2345-6789-ABCD-EF0123456789')")
    assert(spark.table("xtv.db.t").filter(col("u") === lower(col("u"))).count() == 1)
    spark.sql("DROP TABLE xtv.db.t")
  }

  test("DSv2 ALTER TABLE RENAME/DROP COLUMN keeps the xtypes sidecar in step") {
    val wh = Files.createTempDirectory("graft_xta_wh").toString
    spark.conf.set("spark.sql.catalog.xta", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.xta.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS xta.db")
    spark.sql("""CREATE TABLE xta.db.t (id BIGINT, u STRING) USING graft
      TBLPROPERTIES ('graft.xtypes' = 'u:uuid')""")
    val dir = s"$wh/db/t"
    spark.sql("ALTER TABLE xta.db.t RENAME COLUMN u TO uid")
    assert(ExtendedTypes.get(dir) == Map("uid" -> ExtendedTypes.Uuid),
      s"sidecar must follow the rename: ${ExtendedTypes.get(dir)}")
    // the renamed column still validates + canonicalizes
    spark.sql("INSERT INTO xta.db.t VALUES " +
      "(1, 'ABCDEF01-2345-6789-ABCD-EF0123456789')")
    assert(spark.table("xta.db.t").filter(col("uid") === lower(col("uid"))).count() == 1)
    intercept[Exception] { spark.sql("INSERT INTO xta.db.t VALUES (2, 'nope')") }
    spark.sql("ALTER TABLE xta.db.t DROP COLUMN uid")
    assert(ExtendedTypes.get(dir).isEmpty, "drop must retire the declaration")
    // re-adding a column under the ORIGINAL name carries no stale
    // declaration: a non-uuid string must append cleanly
    spark.sql("ALTER TABLE xta.db.t ADD COLUMN u STRING")
    spark.sql("INSERT INTO xta.db.t VALUES (3, 'plain text')")
    assert(spark.table("xta.db.t").filter(col("u") === "plain text").count() == 1)
    spark.sql("DROP TABLE xta.db.t")
  }

  test("streaming writes validate + canonicalize extended types " +
      "(the DSv2 writer path, not just V1 writeBack)") {
    val wh = Files.createTempDirectory("graft_xts_wh").toString
    spark.conf.set("spark.sql.catalog.xts", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.xts.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS xts.db")
    spark.sql("""CREATE TABLE xts.db.s (id BIGINT, u STRING) USING graft
      TBLPROPERTIES ('graft.xtypes' = 'u:uuid')""")
    val srcDir = Files.createTempDirectory("graft_xts_src").toString + "/data"
    spark.range(10).select(col("id"), upper(uuidOf(col("id"))).as("u"))
      .coalesce(1).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val ckpt = Files.createTempDirectory("graft_xts_ckpt").toString
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("graft").start(s"$wh/db/s")
    try q.awaitTermination() finally q.stop()
    val t = spark.table("xts.db.s")
    assert(t.count() == 10)
    assert(t.filter(col("u") =!= lower(col("u"))).count() == 0,
      "streamed uuids must store canonical lowercase")
    // an invalid value fails the stream instead of committing silently
    val badDir = Files.createTempDirectory("graft_xts_bad").toString + "/data"
    spark.range(1).select(col("id"), lit("not-a-uuid").as("u"))
      .coalesce(1).write.parquet(badDir)
    val ckpt2 = Files.createTempDirectory("graft_xts_ckpt2").toString
    val q2 = spark.readStream.schema(schema).parquet(badDir)
      .writeStream.option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("graft").start(s"$wh/db/s")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.awaitTermination() finally q2.stop()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("invalid uuid")), msgs(e).mkString(" | "))
    assert(spark.table("xts.db.s").count() == 10, "failed epoch must not commit")
    spark.sql("DROP TABLE xts.db.s")
  }

  test("uuid and time columns carry manifest min/max stats (pruning as physical types)") {
    val dir = mkTable()
    val f = Snapshots.readManifest(dir).head
    assert(f.mins.contains("u") && f.maxs.contains("u"), s"uuid stats: ${f.mins.keySet}")
    assert(f.mins.contains("t") && f.maxs.contains("t"))
    // filters on the physical representations evaluate correctly
    val t = Snapshots.read(spark, dir)
    val lo = t.agg(min(col("u"))).first().getString(0)
    assert(t.filter(col("u") === lo).count() == 1)
    assert(t.filter(col("t") < ExtendedTypes.MicrosPerDay).count() == t.count())
  }
}
