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
      // generator-version drift: events.ts has been written both as parquet
      // TIMESTAMP(NANOS) (Spark 4 refuses to map it to TimestampType — read
      // as nanos-since-epoch long) and as timestamp[us] (arrives as
      // TIMESTAMP_NTZ). Normalize BOTH to the ns-epoch long every event
      // query and oracle comparison is built on; sessions pin UTC, so the
      // NTZ wall clock IS the epoch clock DuckDB's epoch() sees.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType != org.apache.spark.sql.types.LongType) {
      import org.apache.spark.sql.functions.{col, unix_micros}
      df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    } else df
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def views(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Table row count from parquet footers only — O(#files) driver work,
    * zero executors, no data pages read. The plan-choice input for
    * adaptive operators (e.g. [[graft.operators.Relational]]'s
    * percentiles): the number is exact, available before any job runs,
    * and at 100 TB costs one metadata round-trip per file.
    */
  /** Recursive parquet data-file lister shared by the footer-metadata
    * gates below: partitioned layouts nest data files under partition
    * dirs — an undercount would silently pick the wrong adaptive plan —
    * and hidden/marker entries are excluded like `spark.read.parquet`.
    */
  private def parquetDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    def files(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq(p)
      else fs.listStatus(p).toSeq
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .flatMap(s =>
          if (s.isDirectory) files(s.getPath)
          else if (s.getPath.getName.endsWith(".parquet")) Seq(s.getPath)
          else Nil)
    }
    files(root)
  }

  def metaRowCount(spark: SparkSession, sfDir: String, name: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
    val fs = root.getFileSystem(conf)
    parquetDataFiles(fs, root).map { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try reader.getRecordCount finally reader.close()
    }.sum
  }

  /** Footer-only UPPER BOUND on the distinct whitespace-token count of a
    * string column: (total uncompressed column bytes)/2 + rows — driver
    * metadata, zero jobs. Sound because tokens are disjoint nonempty
    * substrings separated by at least one character (a value of n bytes
    * holds at most n/2 + 1 tokens), and dictionary pages count toward the
    * uncompressed size, so repeated values cannot shrink the bound below
    * the distinct text actually stored. The broadcast-OOM pre-gate input:
    * a corpus whose bound fits the model-row cap can skip the exact
    * count-the-model job entirely.
    */
  def metaTokenBound(spark: SparkSession, sfDir: String, name: String,
      column: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
    val fs = root.getFileSystem(conf)
    parquetDataFiles(fs, root).map { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        import scala.jdk.CollectionConverters._
        val footer = reader.getFooter
        val chunks = footer.getBlocks.asScala.flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == column)
        // the n/2+1-tokens-per-n-bytes argument needs every value's FULL
        // bytes on disk; DELTA_BYTE_ARRAY (v2 pages, common from
        // non-Spark writers) stores shared prefixes once, so uncompressed
        // size can undercount the text and the "bound" would no longer
        // bound — refuse (Long.MaxValue = "doesn't provably fit"), the
        // caller falls back to the exact count job
        val prefixCompressed = chunks.exists(_.getEncodings.asScala.exists(e =>
          e == org.apache.parquet.column.Encoding.DELTA_BYTE_ARRAY))
        if (prefixCompressed) return Long.MaxValue
        val bytes = chunks.map(_.getTotalUncompressedSize).sum
        bytes / 2 + reader.getRecordCount
      } finally reader.close()
    }.sum
  }
}
