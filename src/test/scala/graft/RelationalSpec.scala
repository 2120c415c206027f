package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Data FILES a DSv2 graft scan planned — tasks may bin-pack several
    * files ([[graft.sources.TaskPlanner]]), so pruning assertions count
    * the per-task file slices, not the task partitions.
    */
  def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .head.inputPartitions
      .map(_.asInstanceOf[graft.sources.GraftInputPartition].slices.length).sum
}

class RelationalSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("every declared query has an oracle or is rows-only by intent") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o.diff(q)}")
  }

  test("all relational queries execute and return rows at sf0.001") {
    val expectEmpty = Set("q08_anti_join") // every customer has orders at this sf
    operators.Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      if (expectEmpty(name)) assert(n >= 0, s"$name failed")
      else assert(n > 0, s"$name returned no rows")
    }
  }

  test("fixed cardinalities at sf0.001 (regression guard)") {
    def n(q: String) = operators.Relational.queries(q)(spark, sf).count()
    assert(n("q01_pricing_summary") == 6L)
    assert(n("q03_top_revenue") == 10L)
    assert(n("q13_topn") == 20L)
    assert(n("q05_window_topk") == 449L)
    assert(n("q19_events_daily") == 150L)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q02 filter is pushed down to the parquet scan") {
    val df = operators.Relational.queries("q02_filter_project")(spark, sf)
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan found")
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThan(l_quantity,45.0)") &&
      pushed.contains("l_shipdate"), s"filters not pushed: $pushed")
    // column pruning: only the 5 needed columns reach the scan
    assert(scans.head.requiredSchema.fieldNames.length == 5,
      s"scan reads too many columns: ${scans.head.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q03/q04 broadcast their dimension sides") {
    val p3 = operators.Relational.queries("q03_top_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastHashJoin"), "q03 should broadcast dims")
    val p4 = operators.Relational.queries("q04_nation_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p4.contains("BroadcastHashJoin"), "q04 should broadcast dims")
  }

  test("ev_range_join buckets the interval predicate into an equi-join") {
    val p = operators.Events.queries("ev_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    // the day-grid bucketing must turn the bare range predicate into a
    // broadcast HASH join — a nested-loop plan means every event is
    // compared against every window
    assert(p.contains("BroadcastHashJoin"), s"expected bucketed equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"range join fell back to NLJ:\n$p")
  }

  test("q25 percentiles: big-group plan equals the window plan, with no single-task group sort") {
    import org.apache.spark.sql.functions.col
    val src = operators.Relational.queries("q25_percentiles") // ensure registered
    assert(src != null)
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    val small = operators.Relational.percentiles(li, bigGroups = false).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    val big = operators.Relational.percentiles(li, bigGroups = true)
    val bigRows = big.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(bigRows == small, s"plans disagree:\nbig=$bigRows\nwin=$small")
    // no single-task per-group sort: the rank window over the DATA is
    // partitioned by (pid, group) — pid fans the sort across the range
    // partitions — and the checkpointed rank input has >1 partition
    // AQE wraps stages behind leaf QueryStageExec nodes — descend them
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    val nodes = flatten(big.queryExecution.executedPlan)
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"no WindowExec found:\n${big.queryExecution.executedPlan}")
    val dataWindow = windows.filter(_.partitionSpec.exists(_.toString.contains("pid")))
    assert(dataWindow.nonEmpty,
      s"rank window must be partitioned by (pid, group), not the group alone")
    val rddParts = nodes.collect {
      case r: org.apache.spark.sql.execution.RDDScanExec => r.inputRDD.getNumPartitions
    }
    assert(rddParts.nonEmpty && rddParts.forall(_ > 1),
      s"rank stage must fan across >1 partitions, got $rddParts")
    // the plan choice itself comes from metadata row counts, no scan
    assert(Tables.metaRowCount(spark, sf, "lineitem") ==
      Tables.load(spark, sf, "lineitem").count())
  }
}
