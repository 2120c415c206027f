package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{GeoTable, Snapshots}

/** Parquet bloom filters from table properties — the reference inherits
  * Iceberg's `write.parquet.bloom-filter-enabled.column.<col>` property
  * (TableProperties PARQUET_BLOOM_FILTER_*): writes after the property is
  * set carry a bloom filter for the column in every row group, so point
  * lookups on scattered high-cardinality keys prune row groups that
  * min/max ranges cannot.
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Row-group bloom presence per column of one parquet file. */
  private def bloomColumns(file: String): Set[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        .filter(_.getBloomFilterOffset >= 0)
        .map(_.getPath.toDotString).toSet
    } finally r.close()
  }

  private def dataFiles(dir: String): Seq[String] =
    Snapshots.readManifest(dir).map(e => s"$dir/${e.path}")

  test("bloom-filter property applies to appends; point lookups stay correct") {
    val dir = Files.createTempDirectory("graft_bloom").toString + "/tbl"
    val mk = (from: Long, n: Long) => spark.range(from, from + n)
      .select(col("id"), (xxhash64(col("id")) % 1000000).as("k"),
        concat(lit("v"), col("id")).as("v"))
    mk(0, 1000).write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    // before the property: no blooms anywhere
    assert(dataFiles(dir).flatMap(bloomColumns).isEmpty)
    Snapshots.updateProperties(dir, Map(
      "write.parquet.bloom-filter-enabled.column.k" -> "true"))
    Snapshots.append(mk(1000, 1000), dir)
    val withBloom = dataFiles(dir).map(f => f -> bloomColumns(f))
    // the appended file carries a bloom for k only; the original has none
    val (bloomed, plain) = withBloom.partition(_._2.nonEmpty)
    assert(bloomed.nonEmpty, s"append after the property must write blooms: $withBloom")
    assert(bloomed.forall(_._2 == Set("k")), s"only k was declared: $withBloom")
    assert(plain.nonEmpty, "the pre-property file keeps its plain footer")
    // point lookup across both generations stays exact
    val probe = spark.range(500, 1500).select((xxhash64(col("id")) % 1000000).as("k"))
      .limit(3).collect().map(_.getLong(0))
    probe.foreach { k =>
      val hits = Snapshots.read(spark, dir).filter(col("k") === k).count()
      assert(hits >= 1)
    }
  }

  test("bloom property survives rename: the physical column gets the filter") {
    val dir = Files.createTempDirectory("graft_bloom_ren").toString + "/tbl"
    spark.range(100).select(col("id"), (col("id") * 7).as("key0"))
      .write.parquet(dir)
    GeoTable.writeManifest(spark, dir)
    graft.spatial.TableSchema.renameColumn(spark, dir, "key0", "user_key")
    Snapshots.updateProperties(dir, Map(
      "write.parquet.bloom-filter-enabled.column.user_key" -> "true"))
    Snapshots.append(
      spark.range(100, 200).select(col("id"), (col("id") * 7).as("user_key")), dir)
    val newest = dataFiles(dir).flatMap(f => bloomColumns(f))
    // files store the original physical name
    assert(newest.toSet == Set("key0"), s"got: $newest")
    assert(Snapshots.read(spark, dir).filter(col("user_key") === 7 * 150).count() == 1)
  }
}
