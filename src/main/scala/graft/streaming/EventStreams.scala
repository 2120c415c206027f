package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface. The reference's streaming capability is an
  * Iceberg micro-batch source/sink (`SparkMicroBatchStream.java:68,117-184`,
  * `SparkWrite.java:181-186` in /root/reference) with no event-time
  * operators of its own — watermarks/windows/state are Spark built-ins
  * (SURVEY.md §2.8). Here the micro-batch source is Spark's file stream
  * over the same parquet tables, and the event-time/stateful layer is the
  * part we expose as API.
  */
object EventStreams {

  /** events as a micro-batch stream; `ts` arrives either as a nanos long
    * (TIMESTAMP(NANOS) parquet under the legacy flag) or as TIMESTAMP_NTZ
    * (timestamp[us] parquet) depending on generator version — surfaced
    * uniformly as a proper µs TimestampType column `ets`.
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      stream.withColumn("ets", timestamp_micros(expr("ts div 1000")))
    else stream.withColumn("ets", col("ts").cast("timestamp"))
  }

  /** Watermarked tumbling-window aggregation (event time). */
  def windowedCounts(events: DataFrame, window_ : String = "6 hours",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Custom per-key state: running per-user totals via mapGroupsWithState —
    * the `KeyValueGroupedDataset` stateful path SURVEY.md §2.8 names.
    */
  def userTotals(spark: SparkSession, events: DataFrame): Dataset[UserAgg] = {
    import spark.implicits._
    events.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserAgg(uid, n, tot)
          state.update(next)
          next
      }
  }
}
