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
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          lit(0).as("is_p"))
      // ONE purchase row per (user_id, ts): DuckDB's ASOF pick among
      // equal-ts matches is unspecified, so determinism must come from
      // the data — keep the max event_id (map-side-combinable aggregate,
      // mirrored by `first(value ORDER BY event_id DESC)` in the oracle:
      // NOT arg_max, which SKIPS rows whose value is NULL while max_by
      // honestly returns the chosen row's NULL — the ASOF semantics the
      // struct-last construction below preserves)
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("event_id"),
          max_by(col("value"), col("event_id")).as("value"))
        .withColumn("is_p", lit(1))
      val tagged = clicks.unionByName(purchases.select(
        col("user_id"), col("ts"), col("event_id"), col("value"), col("is_p")))
      // purchases sort before clicks at equal ts → ">= purchase.ts" semantics
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_p").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // id and value travel as ONE struct: two independent ignoreNulls
      // last() calls would pair the latest purchase's id with an EARLIER
      // purchase's value whenever the latest purchase has a NULL value
      // (ASOF semantics return that NULL) — the struct is non-null for
      // every purchase row, so ignoreNulls only skips non-purchases
      tagged
        .withColumn("__lp", last(
          when(col("is_p") === 1, struct(col("event_id"), col("value"))),
          ignoreNulls = true).over(w))
        .filter(col("is_p") === 0)
        .select(col("event_id"), col("user_id"),
          col("__lp.event_id").as("last_purchase_id"),
          round(col("__lp.value"), 4).as("last_purchase_value"))
    }),

    // Cohort retention: users grouped by their first-seen week; for each
    // (cohort_week, week_offset) the count of users still active. The
    // cohort assignment is a min-aggregate rather than a window (cheaper:
    // partial min map-side), joined back on user_id — at scale a standard
    // shuffle join on the user key, then one distinct-count aggregation.
    "ev_retention" -> ((s, dir) => {
      val weekNs = 7L * 86400L * 1000000000L
      val e = ev(s, dir).select(col("user_id"), expr(s"ts div $weekNs").as("week"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      e.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // Conversion funnel (the windowFunnel shape): purchases preceded by a
    // click from the same user within one hour. One running-max window
    // over the user's event sequence carries the latest click timestamp
    // to every row — a single shuffle on user_id, no self-join of the
    // event stream against itself.
    "ev_funnel" -> ((s, dir) => {
      val hourNs = 3600L * 1000000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("last_click_ts",
          max(when(col("event_type") === "click", col("ts"))).over(w))
        .filter(col("event_type") === "purchase" &&
          col("last_click_ts").isNotNull &&
          col("ts") - col("last_click_ts") <= hourNs)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_conversions"),
          round(sum(col("value")), 4).as("conv_value"))
    }),

    // RANGE JOIN with no equality key: events against 40 overlapping,
    // variable-length global time windows. Spark plans a bare interval
    // predicate as BroadcastNestedLoopJoin (every row × every window);
    // bucketing both sides on a day grid turns it into an EQUI-join on
    // the bucket — each event lands in exactly one day bucket, windows
    // explode onto every day they touch (≤ 2 here), so each matching
    // (event, window) pair meets exactly once and no dedup is needed.
    // The tiny exploded window side broadcasts: the corpus side stays
    // map-only, the classic interval-join shape at 100 TB.
    "ev_range_join" -> ((s, dir) => {
      val nsPerDay = 86400L * 1000000000L
      val base = 1704067200L // 2024-01-01T00:00:00Z, the corpus epoch
      val win = s.range(0, 40).toDF("w")
        .withColumn("start_ns", (lit(base) + col("w") * (17L * 3600)) * lit(1000000000L))
        .withColumn("end_ns",
          col("start_ns") + (lit(5L) + col("w") % 20) * lit(3600L * 1000000000L))
      val winDays = win.withColumn("day",
        explode(sequence(expr(s"start_ns div $nsPerDay"), expr(s"(end_ns - 1) div $nsPerDay"))))
      ev(s, dir)
        .withColumn("day", expr(s"ts div $nsPerDay"))
        .join(broadcast(winDays), Seq("day"))
        .filter(col("ts") >= col("start_ns") && col("ts") < col("end_ns"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 4).as("sum_value"))
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
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, max(event_id) AS event_id,
        |         first(value ORDER BY event_id DESC) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "ev_retention" ->
      """WITH e AS (SELECT user_id,
        |  CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1)
        |SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
        | count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,

    "ev_funnel" ->
      """WITH e AS (SELECT * FROM events WHERE event_type IN ('click', 'purchase')),
        |lc AS (SELECT *,
        |  max(CASE WHEN event_type = 'click' THEN ts END) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        | FROM e)
        |SELECT user_id, count(*) AS n_conversions,
        | round(sum(value), 4) AS conv_value
        |FROM lc
        |WHERE event_type = 'purchase' AND last_click_ts IS NOT NULL
        |  AND ts - last_click_ts <= INTERVAL 1 HOUR
        |GROUP BY user_id""".stripMargin,

    "ev_range_join" ->
      """WITH w AS (SELECT w,
        |  TIMESTAMP '2024-01-01 00:00:00' + to_hours(w * 17) AS start_ts,
        |  TIMESTAMP '2024-01-01 00:00:00' + to_hours(w * 17 + 5 + w % 20) AS end_ts
        | FROM generate_series(0, 39) t(w))
        |SELECT w, count(*) AS n_events,
        | count(DISTINCT user_id) AS n_users,
        | round(sum(value), 4) AS sum_value
        |FROM events e JOIN w ON e.ts >= w.start_ts AND e.ts < w.end_ts
        |GROUP BY w""".stripMargin
  )
}
