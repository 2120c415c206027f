package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The vanilla-Spark relational surface ("S" rows of SURVEY.md §2.4/§2.5):
  * aggregations, joins (broadcast/semi/anti), windows, sorts/limits, set
  * ops, rollup/cube, scalar functions. The reference implements none of
  * these itself — they are what Spark provides on top of its connector —
  * so here they are expressed DataFrame-first and tuned for scale:
  * dimension joins broadcast, aggregates partial+final, filters/projections
  * pushed to the parquet scan.
  *
  * Every query has a DuckDB-1.0 oracle in [[oracleSql]] with identical
  * column names and types (doubles rounded to absorb summation-order ULP
  * noise; integer sums cast to BIGINT because DuckDB widens to HUGEINT).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: single scan, partial+final hash agg.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // Filter + projection; both should reach the parquet scan (PushedFilters).
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("2000-04-01").cast("timestamp") &&
          col("l_quantity") > lit(45))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
    }),

    // TPC-H Q3-style shipping priority: fact-fact join + top-N. NO
    // explicit broadcast hints: orders and customer grow WITH the corpus
    // (a hint bypasses autoBroadcastJoinThreshold entirely and would
    // collect a scale-proportional table to the driver at 100 TB) — the
    // size-based planner / AQE broadcasts them while they fit and
    // shuffles when they don't.
    "q03_top_revenue" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-style: 6-table join. Only the CONSTANT-size dims (nation:
    // 25 rows, region: 5) carry broadcast hints — supplier/customer/
    // orders grow with the corpus, so their join strategy is left to the
    // size-based planner / AQE (hinting them would force a driver
    // collect of scale-proportional tables at 100 TB).
    "q04_nation_revenue" -> ((s, dir) => {
      val region = t(s, dir, "region")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      // Join order KEPT supplier-first after an r19 interleaved A-B-A
      // REJECTED the orders-first spelling: pulling the ~29%-selective
      // o_orderdate filter ahead of the supplier join is the textbook
      // §3 reorder for the 100 TB SMJ plan (one fewer full-lineitem
      // shuffle), but at bench scale every join is a BHJ and the
      // measured effect of probing the larger filtered-orders hash map
      // first was a consistent LOSS (adjacent legs: old mins
      // 0.678/0.680/0.782 vs new 0.827/0.803; old won or tied 7 of 7
      // comparisons). Results are identical either way (inner-join
      // commutativity — OptimizationR19Spec pins the rejected spelling
      // result-equal); a stats-fed CBO deployment reorders this join
      // itself, which is the right seat for the at-scale version.
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Window: rank rows within group (top-3 orders per customer).
    "q05_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // Window: running sum per key ordered by a unique column.
    "q06_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_value", round(sum(col("value")).over(w), 4))
        .select(col("event_id"), col("user_id"), col("running_value"))
    }),

    // Left-semi join (EXISTS).
    "q07_semi_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      t(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // Left-anti join (NOT EXISTS).
    "q08_anti_join" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Set operations: INTERSECT / EXCEPT / UNION (disjoint branches).
    "q09_setops" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val building = cust.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val machinery = cust.filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("custkey"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      building.intersect(urgent).union(machinery.except(urgent))
    }),

    // ROLLUP grouping sets.
    "q10_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // Distinct aggregates.
    "q11_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // Conditional (CASE) aggregation by derived year.
    "q12_case_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0))), 2).as("sum_f"),
          round(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(lit(0.0))), 2).as("sum_o"),
          count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("n_urgent"))
    }),

    // Global sort + limit with deterministic tie-break.
    "q13_topn" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(20)
    }),

    // Aggregation + HAVING.
    "q14_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .filter(col("sum_qty") > 500.0)
    }),

    // Fact⋈dim + group on dim attribute. part is scale-proportional, so
    // no explicit hint — the size-based planner broadcasts while it fits.
    "q15_brand_revenue" -> ((s, dir) => {
      val part = t(s, dir, "part").filter(col("p_size") <= 25)
      t(s, dir, "lineitem")
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Scalar function surface (string/date/math) — codegen'd, no UDFs.
    "q16_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("pri_upper"),
          substring(col("o_orderpriority"), 1, 1).as("pri_code"),
          length(col("o_orderpriority")).as("pri_len"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          to_date(col("o_orderdate")).as("o_date"),
          round(col("o_totalprice") / 1000.0, 3).as("price_k"),
          (col("o_orderkey") % 7).as("key_mod"))
    }),

    // Correlated-style scalar subquery expressed as join-agg:
    // customers whose account balance is above their nation's average.
    "q17_above_avg" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val natAvg = cust.groupBy(col("c_nationkey").as("nk"))
        .agg(avg(col("c_acctbal")).as("nation_avg"))
      cust.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("acctbal"))
    }),

    // CUBE grouping sets.
    "q18_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
    }),

    // Event-time daily aggregation (batch form of the streaming windowed agg).
    "q19_events_daily" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(to_date(timestamp_micros(expr("ts div 1000"))).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // Semi-structured extraction from a JSON-ish string column.
    "q20_props_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          regexp_extract(col("props"), "[0-9]+", 0).cast("int").as("k_val"))
        .filter(col("k_val") >= 50)
    }),

    // TPC-H Q4-style: EXISTS-driven aggregation.
    "q21_priority_count" -> ((s, dir) => {
      val late = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // TPC-H Q2-style: per-group minimum via self-join on the aggregate.
    "q22_min_cost_supplier" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val minBal = sup.groupBy(col("s_nationkey").as("nk"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      sup.join(broadcast(minBal),
          col("s_nationkey") === col("nk") && col("s_acctbal") === col("min_bal"))
        .select(col("s_nationkey"), col("s_suppkey"), col("s_name"),
          round(col("s_acctbal"), 2).as("acctbal"))
    }),

    // TPC-H Q13-style: order counts per customer including zeros → histogram.
    "q23_order_histogram" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // lag/lead window: day-over-day revenue delta.
    "q24_daily_delta" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice")).as("rev"))
      val w = Window.orderBy(col("day"))
      daily
        .withColumn("prev_rev", lag(col("rev"), 1).over(w))
        .select(col("day"), round(col("rev"), 2).as("rev"),
          round(col("rev") - col("prev_rev"), 2).as("delta"))
    }),

    // RANGE-frame window: revenue within a sliding 7-day value window.
    "q26_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice")).as("rev"))
        .withColumn("d", datediff(col("day"), lit("1995-01-01").cast("date")))
      val w = Window.orderBy(col("d")).rangeBetween(-6, 0)
      daily
        .withColumn("rev7", round(sum(col("rev")).over(w), 2))
        .select(col("day"), round(col("rev"), 2).as("rev"), col("rev7"))
    }),

    // exact interpolated percentiles per group.
    // exact type-7 quantiles via a sort-based two-phase plan: built-in
    // `percentile` buffers EVERY group value in the agg buffer (OOM on a
    // skewed group at scale); the ranked plan spills through the sorter
    // instead. The SHAPE of the rank stage is picked at BUILD time from
    // metadata row counts — see [[percentiles]].
    "q25_percentiles" -> ((s, dir) => {
      val bigGroups =
        Tables.metaRowCount(s, dir, "lineitem") > PercentileWindowMaxRows
      percentiles(t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").as("v")), bigGroups)
    })
  )

  /** An upper bound on any group's size is the table's row count: below
    * this many rows a per-group single-task sort (the window plan) is a
    * few hundred MB through one core's sorter — fast, one exchange. Above
    * it, a group might not fit one executor, so the extra jobs of the
    * range-partitioned global rank buy away the scale cliff.
    */
  private[graft] val PercentileWindowMaxRows: Long = 20L * 1000 * 1000

  /** Exact type-7 (quantile_cont) p50/p90/p99 of `v` per `l_returnflag`.
    *
    * Two rank-stage shapes, chosen by the caller from METADATA row counts
    * (never a data scan):
    *
    *  - `bigGroups = false`: group-partitioned window rank — one exchange,
    *    but each group sorts on ONE task (|groups| partitions). The right
    *    plan while every group fits an executor's sorter; measured 40-90%
    *    faster than the alternative at bench scale.
    *  - `bigGroups = true`: the two-phase global-rank construction —
    *    range-partition by the full (group, v) sort key (a PARALLEL sort
    *    across all shuffle partitions), build a tiny per-(partition,
    *    group) offset table, and global rank = offset + local row_number
    *    within the (partition, group) cell. Linear at ANY group size; the
    *    partition id feeds both branches off one pinned checkpoint so
    *    range boundaries can never disagree.
    */
  private[graft] def percentiles(src: DataFrame, bigGroups: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked =
      if (!bigGroups) {
        val wOrd = Window.partitionBy("l_returnflag").orderBy("v")
        val wAll = Window.partitionBy("l_returnflag")
        // KEPT as a second window pass after an r19 A-B-A (VERDICT r18
        // next #5 examined): attaching n as a broadcast pre-aggregate
        // (one extra l_returnflag-only scan + BHJ, one fewer WindowExec)
        // measured a focused 9-pass LOSER — med 1.35 s vs 1.14/1.17,
        // min 1.24 vs 0.86/0.90 interleaved — the extra scan + per-row
        // probe costs more than re-walking the already-sorted window
        // buffer. The scale concern does not apply on this branch: it is
        // the bigGroups=false (metadata-proven small) path, and the big
        // path's offset table already derives n without a data-sized
        // window. OptimizationR19Spec pins the two spellings identical.
        src
          .withColumn("rn", row_number().over(wOrd).cast("long") - 1)
          .withColumn("n", count(lit(1)).over(wAll))
      } else {
        val P = src.sparkSession.sessionState.conf.numShufflePartitions
        val parted = src
          .repartitionByRange(P, col("l_returnflag"), col("v"))
          .withColumn("pid", spark_partition_id())
          // pid feeds BOTH the offset table and the ranked frame: pin the
          // partitioning once so the two branches can never disagree on
          // boundaries (exchange reuse makes them agree in practice; the
          // checkpoint makes it a guarantee, and the blocks feed both
          // branches with one scan)
          .localCheckpoint(true)
        val offsets = parted.groupBy(col("pid"), col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"))
          // tiny frame: P x |groups| rows — this per-group window is over
          // the aggregate, never the data
          .withColumn("off", coalesce(sum(col("cnt")).over(
            Window.partitionBy("l_returnflag").orderBy("pid")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("n", sum(col("cnt")).over(Window.partitionBy("l_returnflag")))
          .select(col("pid"), col("l_returnflag"), col("off"), col("n"))
        val wLocal = Window.partitionBy("pid", "l_returnflag").orderBy("v")
        parted
          .withColumn("lrn", row_number().over(wLocal).cast("long") - 1)
          .join(broadcast(offsets), Seq("pid", "l_returnflag"))
          .withColumn("rn", col("off") + col("lrn"))
      }
    def lo(p: Double) = floor((col("n") - 1) * lit(p))
    def hi(p: Double) = ceil((col("n") - 1) * lit(p))
    def pick(p: Double, tag: String) = Seq(
      max(when(col("rn") === lo(p), col("v"))).as(s"lo$tag"),
      max(when(col("rn") === hi(p), col("v"))).as(s"hi$tag"))
    val agg = ranked.groupBy(col("l_returnflag")).agg(
      first(col("n")).as("n"),
      (pick(0.5, "50") ++ pick(0.9, "90") ++ pick(0.99, "99")): _*)
    // lower + frac * (upper - lower): same arithmetic as quantile_cont
    def interp(p: Double, tag: String) = {
      val r = (col("n") - 1) * lit(p)
      round(col(s"lo$tag") + (r - floor(r)) * (col(s"hi$tag") - col(s"lo$tag")), 4)
    }
    agg.select(col("l_returnflag"),
      interp(0.5, "50").as("p50"),
      interp(0.9, "90").as("p90"),
      interp(0.99, "99").as("p99"))
  }

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00'
        |  AND l_quantity > 45""".stripMargin,

    "q03_top_revenue" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q04_nation_revenue" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY r_name, n_name""".stripMargin,

    "q05_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   CAST(row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q06_window_running" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS running_value
        |FROM events""".stripMargin,

    "q07_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,

    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q09_setops" ->
      """(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT
        | SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        | EXCEPT
        | SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,

    "q10_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "q11_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q12_case_agg" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END),2) AS sum_f,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END),2) AS sum_o,
        | count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent
        |FROM orders GROUP BY 1""".stripMargin,

    "q13_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q14_having" ->
      """SELECT l_suppkey, round(sum(l_quantity),2) AS sum_qty, count(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey
        |HAVING round(sum(l_quantity),2) > 500.0""".stripMargin,

    "q15_brand_revenue" ->
      """SELECT p_brand, p_type,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 25
        |GROUP BY p_brand, p_type""".stripMargin,

    "q16_scalar_funcs" ->
      """SELECT o_orderkey,
        | upper(o_orderpriority) AS pri_upper,
        | substr(o_orderpriority, 1, 1) AS pri_code,
        | CAST(length(o_orderpriority) AS INTEGER) AS pri_len,
        | CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | CAST(month(o_orderdate) AS INTEGER) AS o_month,
        | CAST(o_orderdate AS DATE) AS o_date,
        | round(o_totalprice/1000.0, 3) AS price_k,
        | o_orderkey % 7 AS key_mod
        |FROM orders""".stripMargin,

    "q17_above_avg" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal,2) AS acctbal
        |FROM customer c
        |JOIN (SELECT c_nationkey AS nk, avg(c_acctbal) AS nation_avg
        |      FROM customer GROUP BY c_nationkey) a ON c.c_nationkey = a.nk
        |WHERE c_acctbal > nation_avg""".stripMargin,

    "q18_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | count(*) AS n_rows, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q19_events_daily" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        | count(*) AS n_events,
        | round(sum(value),4) AS sum_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q20_props_extract" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '[0-9]+') AS INTEGER) AS k_val
        |FROM events
        |WHERE CAST(regexp_extract(props, '[0-9]+') AS INTEGER) >= 50""".stripMargin,

    "q21_priority_count" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY o_orderpriority""".stripMargin,

    "q22_min_cost_supplier" ->
      """SELECT s_nationkey, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
        |FROM supplier s
        |JOIN (SELECT s_nationkey AS nk, min(s_acctbal) AS min_bal
        |      FROM supplier GROUP BY 1) m
        |  ON s.s_nationkey = m.nk AND s.s_acctbal = m.min_bal""".stripMargin,

    "q23_order_histogram" ->
      """SELECT c_count, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q24_daily_delta" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  sum(o_totalprice) AS rev FROM orders GROUP BY 1)
        |SELECT day, round(rev, 2) AS rev,
        | round(rev - lag(rev) OVER (ORDER BY day), 2) AS delta
        |FROM daily""".stripMargin,

    "q26_range_frame" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  sum(o_totalprice) AS rev FROM orders GROUP BY 1),
        |dd AS (SELECT day, rev, datediff('day', DATE '1995-01-01', day) AS d FROM daily)
        |SELECT day, round(rev, 2) AS rev,
        | round(sum(rev) OVER (ORDER BY d RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev7
        |FROM dd""".stripMargin,

    "q25_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
