package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{GeoTable, Snapshots}

/** Parquet compression from table properties / session conf — the
  * reference's `write.parquet.compression-codec` / `-level` table
  * properties with the `spark.sql.iceberg.*` session-conf override on top
  * (TableProperties.PARQUET_COMPRESSION, SparkSQLProperties
  * COMPRESSION_CODEC/LEVEL, TestCompressionSettings): precedence is
  * session conf > table property > engine default (snappy), and MoR
  * delete files read their own `write.delete.parquet.*` family first.
  */
class CompressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Distinct column-chunk codecs across every row group of one file. */
  private def codecs(file: String): Set[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        .map(_.getCodec.name()).toSet
    } finally r.close()
  }

  private def dataFiles(dir: String): Seq[String] =
    Snapshots.readManifest(dir).map(e => s"$dir/${e.path}")

  test("compression-codec table property applies to appends; level rides zstd") {
    val dir = Files.createTempDirectory("graft_comp").toString + "/tbl"
    spark.range(200).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    Snapshots.updateProperties(dir, Map(
      "write.parquet.compression-codec" -> "gzip"))
    Snapshots.append(
      spark.range(200, 400).select(col("id"), concat(lit("v"), col("id")).as("v")), dir)
    val byFile = dataFiles(dir).map(f => f -> codecs(f)).toMap
    assert(byFile.values.exists(_ == Set("GZIP")),
      s"append after the property must write gzip: $byFile")
    // zstd + level
    Snapshots.updateProperties(dir, Map(
      "write.parquet.compression-codec" -> "zstd",
      "write.parquet.compression-level" -> "1"))
    Snapshots.append(
      spark.range(400, 600).select(col("id"), concat(lit("v"), col("id")).as("v")), dir)
    assert(dataFiles(dir).map(codecs).exists(_ == Set("ZSTD")))
    // reads stay exact across the mixed-codec generations
    assert(Snapshots.read(spark, dir).count() == 600)
    assert(Snapshots.read(spark, dir).filter(col("id") === 450).count() == 1)
  }

  test("session conf overrides the table property") {
    val dir = Files.createTempDirectory("graft_comp_sess").toString + "/tbl"
    spark.range(100).select(col("id")).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    Snapshots.updateProperties(dir, Map(
      "write.parquet.compression-codec" -> "gzip"))
    spark.conf.set("spark.sql.graft.parquet.compression-codec", "snappy")
    try Snapshots.append(spark.range(100, 200).select(col("id")), dir)
    finally spark.conf.unset("spark.sql.graft.parquet.compression-codec")
    val all = dataFiles(dir).map(codecs)
    assert(all.nonEmpty && all.forall(_ == Set("SNAPPY")),
      "the conf-era append must be snappy despite the gzip property " +
        s"(and the original files already were): $all")
  }

  test("MoR delete files read write.delete.parquet.compression-codec first") {
    val dir = Files.createTempDirectory("graft_comp_del").toString + "/tbl"
    spark.range(100).select(col("id"), (col("id") % 10).as("k"))
      .write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    Snapshots.updateProperties(dir, Map(
      "write.delete.mode" -> "merge-on-read",
      "write.delete.parquet.compression-codec" -> "gzip"))
    Snapshots.delete(spark, dir, col("k") === 3)
    val delFiles = Snapshots.readPosDeletes(dir).map(p => s"$dir/$p")
    assert(delFiles.nonEmpty, "MoR DELETE must stage a positional delete file")
    assert(delFiles.map(codecs).forall(_ == Set("GZIP")),
      s"delete files must honor the delete codec family: ${delFiles.map(codecs)}")
    assert(Snapshots.read(spark, dir).count() == 90)
  }

  test("DSv2 staged writers (dynamic overwrite) honor the declared codec") {
    val wh = Files.createTempDirectory("graft_comp_wh").toString
    spark.conf.set("spark.sql.catalog.ccat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ccat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ccat.db")
    spark.sql(
      """CREATE TABLE ccat.db.comp_t (id BIGINT, p INT)
        |PARTITIONED BY (p)
        |TBLPROPERTIES ('write.parquet.compression-codec' = 'gzip')""".stripMargin)
    spark.sql("INSERT INTO ccat.db.comp_t SELECT id, CAST(id % 4 AS INT) FROM range(100)")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(
      "INSERT OVERWRITE ccat.db.comp_t SELECT id, CAST(1 AS INT) FROM range(500, 520)")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val tdir = s"$wh/db/comp_t"
    val files = Snapshots.readManifest(tdir).map(e => s"$tdir/${e.path}")
    assert(files.nonEmpty)
    assert(files.map(codecs).forall(_ == Set("GZIP")),
      s"both the V1 insert and the DSv2 dynamic-overwrite staging must be gzip: " +
        s"${files.map(f => f -> codecs(f))}")
    assert(spark.table("ccat.db.comp_t").count() == 95)
    spark.sql("DROP TABLE ccat.db.comp_t")
  }
}
