package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * Hilbert-clustered geo-table write → manifest → pruned spatial read.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.GeoQueries.queries("geo_table_roundtrip")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.GeoQueries.queries ++
      operators.TextPipeline.queries ++ operators.Similarity.queries ++
      operators.Multimodal.queries ++ operators.Events.queries ++
      operators.Curation.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++ operators.GeoQueries.oracleSql ++
      operators.TextPipeline.oracleSql ++ operators.Similarity.oracleSql ++
      operators.Multimodal.oracleSql ++ operators.Events.oracleSql ++
      operators.Curation.oracleSql
}
