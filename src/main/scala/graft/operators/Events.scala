package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-sequence operators over the `events` table: sessionization and
  * as-of join — the "custom operator Spark lacks" family (SURVEY.md §2.5),
  * composed from window functions rather than a custom physical node
  * (preference (a) of the extension ladder: built-ins express the
  * semantics, so Catalyst keeps planning freedom).
  *
  * `ts` is a nanosecond epoch long (see Tables.load); window ordering uses
  * (ts, event_id) so results are deterministic under equal timestamps.
  */
object Events {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // sessionization: a session breaks after a 30-minute silence
    "ev_sessionize" -> ((s, dir) => {
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sess = ev(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("session_value"))
    }),

    // as-of join: each click joined to the user's most recent prior-or-equal
    // purchase (composed as tagged-union + running last_value — one shuffle)
    "ev_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val tagged = e.select(col("user_id"), col("ts"), col("event_id"), col("value"),
        col("event_type"), (col("event_type") === "purchase").cast("int").as("is_p"))
        .filter(col("event_type").isin("click", "purchase"))
      // purchases sort before clicks at equal ts → ">= purchase.ts" semantics
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_p").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_purchase_id",
          last(when(col("is_p") === 1, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("last_purchase_value",
          round(last(when(col("is_p") === 1, col("value")), ignoreNulls = true).over(w), 4))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          col("last_purchase_id"), col("last_purchase_value"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ev_sessionize" ->
      """WITH g AS (SELECT user_id, ts, event_id, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |m AS (SELECT user_id, ts, event_id, value,
        |  CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_sess FROM g),
        |se AS (SELECT user_id, event_id, value,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        | FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        | round(sum(value), 4) AS session_value
        |FROM se GROUP BY 1, 2""".stripMargin,

    "ev_asof_join" ->
      """SELECT c.event_id, c.user_id,
        | p.event_id AS last_purchase_id,
        | round(p.value, 4) AS last_purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin
  )
}
