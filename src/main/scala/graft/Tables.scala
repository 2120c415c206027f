package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * The reference exposes tables through an Iceberg catalog
  * (`/root/reference` spark/v3.5 `SparkCatalog`); here the storage layer is
  * plain parquet and the capability surface (scan, filter/projection
  * pushdown, pruning) is Spark's DSv2 parquet source.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
      // to TimestampType; read it as a nanos-since-epoch long instead.
      // Queries derive µs timestamps via timestamp_micros(ts div 1000).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def views(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
