package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GeoCodec, GeoSql}
import graft.spatial.{Geo, GeoTable, Snapshots}

/** Partitioned graft tables: identity partition pruning combined with
  * per-file bbox pruning — the reference's partitioned spatial matrix
  * (`data/src/test/java/org/apache/iceberg/havasu/TestGeometryReadersAndWriters.java:266-315`
  * in /root/reference: partition predicate + spatial predicate → 1-of-4
  * files). Same quadrant fixture as GeoSpec, but laid out as hive
  * partition directories `part=<q>/`.
  */
class PartitionedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import GeoSql._

  private lazy val tableDir: String = {
    Geo.install(spark)
    val dir = Files.createTempDirectory("graft_part_tbl").toString
    val rows = for {
      quadrant <- 0 until 4
      k <- 1 to 10
      (cx, cy) = quadrant match {
        case 0 => (k.toDouble, k.toDouble)
        case 1 => (-k.toDouble, k.toDouble)
        case 2 => (-k.toDouble, -k.toDouble)
        case 3 => (k.toDouble, -k.toDouble)
      }
      geom <- Seq(
        GeoCodec.writeWkb(GeoCodec.point(cx, cy)),
        GeoCodec.writeWkb(GeoCodec.point(cx, cy).buffer(0.5)))
    } yield Row((quadrant * 10 + k - 1).toLong, quadrant, geom)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("part", IntegerType, nullable = false),
      StructField("geom", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    // coalesce(1) → exactly one data file per partition directory
    GeoTable.write(df.coalesce(1), dir, "geom", res = 8, partitionBy = Seq("part"))
    dir
  }

  private def table: DataFrame = GeoTable.read(spark, tableDir)

  private def validateScan(df: DataFrame): (Long, Long) = {
    val n = df.collect().length.toLong
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val files = plan.collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
    (files, n)
  }

  private def env(minX: Double, minY: Double, maxX: Double, maxY: Double) =
    st_makeenvelope(lit(minX), lit(minY), lit(maxX), lit(maxY))

  test("partitioned write produces hive layout + manifest with partition col") {
    val names = Snapshots.readManifest(tableDir).map(_.path)
    assert(names.length == 4)
    assert(names.forall(_.matches("part=\\d/.*\\.parquet")), names.toString)
    assert(GeoTable.readPartitionCols(tableDir) == Seq("part"))
  }

  test("full read returns all rows with partition values restored") {
    assert(table.count() == 80)
    val perPart = table.groupBy("part").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perPart == Map(0 -> 20L, 1 -> 20L, 2 -> 20L, 3 -> 20L))
  }

  // the reference's partitioned matrix: partition + spatial predicates
  test("partition predicate alone prunes to that partition's files") {
    assert(validateScan(table.filter(col("part") === 0)) == ((1L, 20L)))
    assert(validateScan(table.filter(col("part").isin(0, 2))) == ((2L, 40L)))
  }

  test("spatial predicate alone prunes on bbox stats across partitions") {
    val (f, r) = validateScan(table.filter(
      st_intersects(col("geom"), env(0.5, -1.1, 1.1, 1.1))))
    assert((f, r) == ((2L, 4L))) // quadrants 0 and 3 overlap the window
  }

  test("partition + spatial predicate combine to 1-of-4 files") {
    val (f, r) = validateScan(table.filter(
      col("part") === 0 && st_intersects(col("geom"), env(0.5, -1.1, 1.1, 1.1))))
    assert((f, r) == ((1L, 2L)))
  }

  test("contradicting partition and bbox predicates scan nothing") {
    val (f, r) = validateScan(table.filter(
      col("part") === 1 && st_intersects(col("geom"), env(0.5, -1.1, 1.1, 1.1))))
    assert((f, r) == ((0L, 0L)))
  }

  test("bucket transform: hash-scattered dirs, equality projects to one bucket") {
    val dir = Files.createTempDirectory("graft_bucket").toString
    val rows = (0 until 80).map { i =>
      Row(i.toLong, GeoCodec.writeWkb(GeoCodec.point(i % 50 + 1.0, i % 40 + 1.0)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("geom", BinaryType))))
    GeoTable.write(df.coalesce(1), dir, "geom", res = 8, partitionBy = Seq("bucket(4, id)"))
    val names = Snapshots.readManifest(dir).map(_.path)
    assert(names.forall(_.startsWith("id_bucket=")), names.toString)
    val dirs = names.map(_.split('/').head).distinct
    assert(dirs.size == 4, s"expected 4 bucket dirs, got $dirs")
    val t = GeoTable.read(spark, dir)
    assert(t.count() == 80)
    // partition projection: id = 7 reads only bucket(7)'s files — file
    // stats can't prune hash-scattered buckets, projection can
    val bucketFiles = names.groupBy(_.split('/').head).view.mapValues(_.size).toMap
    val (f, r) = validateScan(t.filter(col("id") === 7L))
    assert(r == 1L)
    assert(f < names.size, s"projection should prune buckets, scanned $f of ${names.size}")
    // IN over two ids prunes to at most two buckets' files
    val (f2, r2) = validateScan(t.filter(col("id").isin(7L, 13L)))
    assert(r2 == 2L && f2 <= bucketFiles.values.max.toLong * 2)
    // appends through the snapshot layer land in bucket dirs
    Snapshots.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1000L, GeoCodec.writeWkb(GeoCodec.point(2.0, 2.0)))), 1),
      StructType(Seq(StructField("id", LongType), StructField("geom", BinaryType))))
      .transform(d => GeoTable.withBbox(d, "geom")), dir)
    assert(Snapshots.read(spark, dir).count() == 81)
    assert(Snapshots.readManifest(dir).map(_.path).forall(_.startsWith("id_bucket=")))
  }

  test("truncate transform groups string prefixes and projects equality") {
    val dir = Files.createTempDirectory("graft_trunc").toString
    val rows = (0 until 60).map { i =>
      Row(i.toLong, s"cat${i % 3}_x$i", GeoCodec.writeWkb(GeoCodec.point(i % 50 + 1.0, 1.0)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("category", StringType),
        StructField("geom", BinaryType))))
    GeoTable.write(df.coalesce(1), dir, "geom", res = 8,
      partitionBy = Seq("truncate(4, category)"))
    val names = Snapshots.readManifest(dir).map(_.path)
    assert(names.map(_.split('/').head).distinct.sorted ==
      Seq("category_trunc=cat0", "category_trunc=cat1", "category_trunc=cat2"))
    val t = GeoTable.read(spark, dir)
    // equality on the SOURCE column projects to its prefix directory
    val (f, r) = validateScan(t.filter(col("category") === "cat1_x4"))
    assert(r == 1L)
    val cat1Files = names.count(_.startsWith("category_trunc=cat1"))
    assert(f <= cat1Files.toLong, s"expected <= $cat1Files files, scanned $f")
  }

  test("bucketed graft tables join with ZERO exchanges (storage-partitioned join)") {
    def mkBucketed(n: Int): String = {
      val dir = Files.createTempDirectory("graft_spj").toString
      val rows = (0 until n).map { i =>
        Row(i.toLong, GeoCodec.writeWkb(GeoCodec.point(i % 50 + 1.0, i % 40 + 1.0)))
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
        StructType(Seq(StructField("id", LongType), StructField("geom", BinaryType))))
      GeoTable.write(df, dir, "geom", res = 8, partitionBy = Seq("bucket(4, id)"))
      dir
    }
    val d1 = mkBucketed(100)
    val d2 = mkBucketed(60)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = GeoTable.read(spark, d1).select(col("id"))
      val b = GeoTable.read(spark, d2).select(col("id").as("id2"))
      val j = a.join(b, col("id") === col("id2"))
      assert(j.count() == 60)
      val plan = j.queryExecution.executedPlan.toString
      // the scans report HashPartitioning(id, 4) from the bucket layout —
      // the join needs no shuffle on either side
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("year transform prunes date-range predicates via monotonic projection") {
    val dir = Files.createTempDirectory("graft_year").toString
    val rows = (0 until 80).map { i =>
      Row(i.toLong, java.sql.Date.valueOf(f"${2020 + i % 4}%d-${i % 9 + 1}%02d-15"),
        GeoCodec.writeWkb(GeoCodec.point(i % 50 + 1.0, i % 40 + 1.0)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("d", DateType),
        StructField("geom", BinaryType))))
    GeoTable.write(df.coalesce(1), dir, "geom", res = 8, partitionBy = Seq("year(d)"))
    val names = Snapshots.readManifest(dir).map(_.path)
    assert(names.map(_.split('/').head).distinct.sorted ==
      Seq("d_year=2020", "d_year=2021", "d_year=2022", "d_year=2023"))
    val t = GeoTable.read(spark, dir)
    val perYear = names.groupBy(_.split('/').head).view.mapValues(_.size).toMap
    // range predicate: only 2022 + 2023 directories are opened
    val (f, r) = validateScan(t.filter(col("d") >= lit(java.sql.Date.valueOf("2022-01-01"))))
    assert(r == 40L)
    assert(f == (perYear("d_year=2022") + perYear("d_year=2023")).toLong,
      s"expected 2 years' files, scanned $f")
    // equality on the source date projects to a single year
    val (f2, r2) = validateScan(t.filter(col("d") === lit(java.sql.Date.valueOf("2021-02-15"))))
    assert(r2 > 0)
    assert(f2 == perYear("d_year=2021").toLong)
    // BETWEEN inside one year
    val (f3, _) = validateScan(t.filter(
      col("d").between(java.sql.Date.valueOf("2023-01-01"), java.sql.Date.valueOf("2023-12-31"))))
    assert(f3 == perYear("d_year=2023").toLong)
  }

  test("NaN / Infinity identity-partition values never crash planning; " +
      "pruning keeps them conservatively and rows stay correct") {
    val dir = Files.createTempDirectory("graft_part_nonfinite").toString
    val rows = Seq(
      Row(1L, 1.0, GeoCodec.writeWkb(GeoCodec.point(1, 1))),
      Row(2L, -1.0, GeoCodec.writeWkb(GeoCodec.point(2, 2))),
      Row(3L, Double.NaN, GeoCodec.writeWkb(GeoCodec.point(3, 3))),
      Row(4L, Double.PositiveInfinity, GeoCodec.writeWkb(GeoCodec.point(4, 4))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("d", DoubleType),
        StructField("geom", BinaryType))))
    GeoTable.write(df.coalesce(1), dir, "geom", res = 8, partitionBy = Seq("d"))
    val t = GeoTable.read(spark, dir)
    assert(t.count() == 4)
    // range predicate: planning must not throw (BigDecimal can't parse
    // NaN/Infinity); Spark semantics rank NaN and +Inf above 0
    assert(t.filter(col("d") > lit(0.0)).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L))
    // equality against the non-finite values themselves
    assert(t.filter(col("d") === lit(Double.PositiveInfinity))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(t.filter(col("d").isNaN).count() == 1)
    // a finite equality still prunes to one partition dir
    val (f, r) = validateScan(t.filter(col("d") === lit(1.0)))
    assert(r == 1L && f == 1L, s"files=$f rows=$r")
  }

  test("string partition range pruning uses UTF-8 binary order " +
      "(supplementary characters must not be pruned below BMP chars)") {
    val dir = Files.createTempDirectory("graft_part_utf8").toString
    val rows = Seq(
      Row(1L, "a", GeoCodec.writeWkb(GeoCodec.point(1, 1))),
      Row(2L, "", GeoCodec.writeWkb(GeoCodec.point(2, 2))),
      // U+1F600: UTF-16 surrogates (0xD83D…) sort BELOW U+E000, but
      // UTF-8 binary (Spark's string order) puts it ABOVE
      Row(3L, "😀", GeoCodec.writeWkb(GeoCodec.point(3, 3))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("s", StringType),
        StructField("geom", BinaryType))))
    GeoTable.write(df.coalesce(1), dir, "geom", res = 8, partitionBy = Seq("s"))
    val t = GeoTable.read(spark, dir)
    val got = t.filter(col("s") >= lit("")).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L), s"UTF-16 ordering would have pruned the emoji partition: $got")
  }

  test("append and CoW delete preserve the partition layout") {
    val dir = Files.createTempDirectory("graft_part_cow").toString
    val mk = (ids: Range, q: Int) => {
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
    GeoTable.write(mk(0 until 40, 0).coalesce(1), dir, "geom", res = 8,
      partitionBy = Seq("part"))
    Snapshots.append(mk(100 until 140, 2), dir)
    assert(Snapshots.read(spark, dir).count() == 80)
    assert(Snapshots.readManifest(dir).map(_.path).forall(_.startsWith("part=")))
    // CoW delete rewrites only stats-matching files, back into partition dirs
    Snapshots.delete(spark, dir, col("id") < 5)
    val t = Snapshots.read(spark, dir)
    assert(t.count() == 75)
    assert(t.filter(col("id") < 5).count() == 0)
    assert(Snapshots.readManifest(dir).map(_.path).forall(_.startsWith("part=")))
    // partition pruning still works after the rewrite
    val (f, _) = validateScan(t.filter(col("part") === 2))
    val p2files = Snapshots.readManifest(dir).count(_.path.startsWith("part=2"))
    assert(f == p2files.toLong)
  }
}
