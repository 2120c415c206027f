package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{GeoTable, MetricsModes, Snapshots}

/** `write.metadata.metrics.*` modes — the reference's per-column manifest
  * metrics control (TableProperties METRICS_MODE_*, MetricsModes.java,
  * TestWriteMetricsConfig): none / counts / truncate(n) / full. Truncated
  * bounds stay sound for inclusive pruning; MIN/MAX aggregate pushdown
  * declines flagged columns.
  */
class MetricsModesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("truncMin / truncMax produce sound string bounds") {
    assert(MetricsModes.truncMin("abcdef", 3) == "abc")
    assert(MetricsModes.truncMin("ab", 3) == "ab")
    assert(MetricsModes.truncMax("abcdef", 3).contains("abd"))
    assert(MetricsModes.truncMax("ab", 3).contains("ab"))
    // incremented bound is ≥ every string sharing the prefix
    assert("abd" > "abczzzz")
    // the surrogate gap is skipped: U+D7FF increments to U+E000
    assert(MetricsModes.truncMax("ab\uD7FFzz", 3).contains("ab\uE000"))
    intercept[IllegalArgumentException](MetricsModes.parse("bogus"))
  }

  test("counts mode drops bounds, keeps null counts; reads stay exact") {
    val dir = Files.createTempDirectory("graft_mm_counts").toString + "/tbl"
    spark.range(100).select(col("id"),
        when(col("id") % 5 === 0, lit(null)).otherwise(concat(lit("v"), col("id"))).as("v"))
      .coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    Snapshots.updateProperties(dir, Map("write.metadata.metrics.default" -> "counts"))
    Snapshots.append(spark.range(100, 200).select(col("id"),
      concat(lit("v"), col("id")).as("v")), dir)
    val entries = Snapshots.readManifest(dir)
    val newFiles = entries.filter(_.addedV > 1)
    assert(newFiles.nonEmpty)
    newFiles.foreach { f =>
      assert(!f.mins.contains("id") && !f.maxs.contains("v"),
        s"counts mode records no bounds: ${f.mins.keySet}")
      assert(f.nulls.get("v").contains(0L), "null counts stay")
    }
    assert(Snapshots.read(spark, dir).count() == 200)
    assert(Snapshots.read(spark, dir).filter(col("id") === 150).count() == 1)
  }

  test("non-finite doubles: bounds decline, the manifest stays parseable, " +
      "reads and aggregates stay exact") {
    val dir = Files.createTempDirectory("graft_mm_inf").toString + "/tbl"
    spark.range(10).select(col("id"),
        when(col("id") === 3, lit(Double.PositiveInfinity))
          .when(col("id") === 4, lit(Double.NegativeInfinity))
          .when(col("id") === 5, lit(Double.NaN))
          .otherwise(col("id").cast("double")).as("d"))
      .coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    // the manifest must parse — a bare Infinity token would brick it
    val entries = Snapshots.readManifest(dir)
    assert(entries.nonEmpty)
    entries.foreach { f =>
      // declined bounds are recorded as the null placeholder ("no usable
      // bounds"), never as a bare Infinity/NaN token
      assert(f.mins.get("d").forall(_ == null) && f.maxs.get("d").forall(_ == null),
        s"non-finite bounds must decline: ${f.mins.get("d")} / ${f.maxs.get("d")}")
      assert(f.mins.get("id").exists(_ != null), "finite sibling keeps its stats")
    }
    val t = Snapshots.read(spark, dir)
    assert(t.count() == 10)
    // MIN/MAX can't rewrite from stats (absent) — the real scan answers
    assert(t.agg(min("d")).collect().head.getDouble(0) == Double.NegativeInfinity)
    assert(t.filter(col("d") === Double.PositiveInfinity).count() == 1)
    // finite band: ids 1,2,6,7,8,9 (0.0 excluded; ±Inf and NaN outside)
    assert(t.filter(col("d") > 0.0 && col("d") < 100.0).count() == 6)
  }

  test("none mode drops every value metric") {
    val dir = Files.createTempDirectory("graft_mm_none").toString + "/tbl"
    spark.range(50).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .coalesce(1).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    Snapshots.updateProperties(dir, Map("write.metadata.metrics.default" -> "none"))
    Snapshots.append(spark.range(50, 80).select(col("id"),
      concat(lit("v"), col("id")).as("v")), dir)
    val newFiles = Snapshots.readManifest(dir).filter(_.addedV > 1)
    assert(newFiles.nonEmpty)
    newFiles.foreach { f =>
      assert(f.mins.isEmpty && f.maxs.isEmpty && f.nulls.isEmpty,
        s"none mode records nothing: ${f.mins.keySet} ${f.nulls.keySet}")
    }
    assert(Snapshots.read(spark, dir).filter(col("v").isNotNull).count() == 80)
  }

  test("geometry bbox shadow stats are exempt from metrics modes") {
    graft.spatial.Geo.install(spark)
    val dir = Files.createTempDirectory("graft_mm_geo").toString
    val mk = (ids: Range) => {
      import spark.implicits._
      ids.map(i => (i.toLong, s"POINT ($i $i)")).toDF("id", "wkt")
        .withColumn("geom", expr("ST_GeomFromText(wkt)")).drop("wkt")
    }
    // declared encoding → appends derive the bbox shadow themselves
    GeoTable.write(mk(0 until 20), dir, "geom", res = 8,
      storageEncoding = Some("wkb"))
    Snapshots.updateProperties(dir, Map("write.metadata.metrics.default" -> "none"))
    // appends carry the bbox shadow like every geo write path
    Snapshots.append(GeoTable.withBbox(mk(100 until 120), "geom"), dir)
    val newFile = Snapshots.readManifest(dir).filter(_.addedV > 1).head
    assert(!newFile.mins.contains("id"), "none mode drops user-column stats")
    assert(newFile.mins.keys.exists(_.contains("_bbox")),
      s"bbox shadow stats must survive a blanket none mode: ${newFile.mins.keySet}")
  }

  test("a USER column named *_bbox honors its metrics mode; only real geometry " +
      "shadows are exempt") {
    graft.spatial.Geo.install(spark)
    val dir = Files.createTempDirectory("graft_mm_userbbox").toString
    val mk = (ids: Range) => {
      import spark.implicits._
      ids.map(i => (i.toLong, s"POINT ($i $i)", s"user_$i")).toDF("id", "wkt", "x_bbox")
        .withColumn("geom", expr("ST_GeomFromText(wkt)")).drop("wkt")
    }
    GeoTable.write(mk(0 until 20), dir, "geom", res = 8, storageEncoding = Some("wkb"))
    Snapshots.updateProperties(dir, Map("write.metadata.metrics.default" -> "counts"))
    Snapshots.append(GeoTable.withBbox(mk(100 until 120), "geom"), dir)
    val newFile = Snapshots.readManifest(dir).filter(_.addedV > 1).head
    // the user column matches the substring but is NOT a geometry shadow:
    // counts mode applies (bounds dropped, null count kept)
    assert(!newFile.mins.contains("x_bbox") && !newFile.maxs.contains("x_bbox"),
      s"user *_bbox column must honor the declared mode: ${newFile.mins.keySet}")
    assert(newFile.nulls.contains("x_bbox"))
    // the real shadow struct keeps full bounds
    assert(newFile.mins.keys.exists(_.startsWith("geom_bbox.")),
      s"geometry shadow stats stay exempt: ${newFile.mins.keySet}")
  }

  test("truncate(n): sound pruning bounds, MIN/MAX pushdown declines, " +
      "per-column override beats default") {
    val wh = Files.createTempDirectory("graft_mm_wh").toString
    spark.conf.set("spark.sql.catalog.mmcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mmcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mmcat.db")
    spark.sql(
      """CREATE TABLE mmcat.db.tr (id BIGINT, name STRING, other STRING)
        |TBLPROPERTIES (
        | 'write.metadata.metrics.default' = 'full',
        | 'write.metadata.metrics.column.name' = 'truncate(4)')""".stripMargin)
    spark.sql("INSERT INTO mmcat.db.tr SELECT /*+ REPARTITION(1) */ id, " +
      "concat('alpha_', format_string('%03d', id)), concat('o', id) FROM range(100)")
    val dir = s"$wh/db/tr"
    val f = Snapshots.readManifest(dir).head
    assert(f.mins("name") == "alph", s"lower bound truncates to a prefix: ${f.mins}")
    assert(f.maxs("name") == "alpi", s"upper bound increments the prefix: ${f.maxs}")
    assert(f.truncated == Seq("name"), s"flagged: ${f.truncated}")
    // the 'other' column keeps full bounds (per-column override semantics)
    assert(f.mins("other") == "o0" && f.maxs("other") == "o99")
    // inclusive pruning with truncated bounds stays sound
    assert(spark.sql(
      "SELECT count(*) FROM mmcat.db.tr WHERE name >= 'alpha_050'").head().getLong(0) == 50)
    // MIN/MAX over the truncated column must NOT answer from the manifest…
    val q = spark.sql("SELECT min(name) AS lo, max(name) AS hi FROM mmcat.db.tr")
    // the aggregate plan sits under an AQE wrapper here, so match the
    // plan string rather than collecting exec nodes
    assert(q.queryExecution.executedPlan.toString.contains("BatchScan"),
      "truncated bounds must decline aggregate pushdown (bounds are not extremes)")
    val r = q.collect().head
    assert(r.getString(0) == "alpha_000" && r.getString(1) == "alpha_099")
    // …while the full-stat sibling still folds to a local scan
    val q2 = spark.sql("SELECT min(other) AS lo FROM mmcat.db.tr")
    assert(q2.queryExecution.executedPlan.collect {
      case l: LocalTableScanExec => l }.nonEmpty)
    assert(q2.head().getString(0) == "o0")
    spark.sql("DROP TABLE mmcat.db.tr")
  }
}
