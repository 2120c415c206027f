package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Scale-path mechanics testable locally: bucketed co-located joins
  * (the storage-partitioned-join assist of SURVEY.md §2.5) and salted
  * skew joins.
  */
class ScaleSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("bucketed tables join without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val wh = Files.createTempDirectory("graft_wh").toString
      val li = Tables.load(spark, sf, "lineitem")
      val ord = Tables.load(spark, sf, "orders")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS buckets LOCATION '$wh'")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("buckets.li_b")
      ord.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("buckets.ord_b")
      val joined = spark.table("buckets.li_b")
        .join(spark.table("buckets.ord_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // heavy tail: 10k rows on key 1, a few on others
    val left = ((1 to 10000).map(i => (1L, i)) ++ (1 to 50).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val right = (1 to 60).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
    val plain = left.join(right, Seq("k"))
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
