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
    val dir = mkTable()
    val declared = ExtendedTypes.get(dir)
    assert(declared == Map("u" -> ExtendedTypes.Uuid, "t" -> ExtendedTypes.Time,
      "f" -> ExtendedTypes.Fixed(4)))
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
