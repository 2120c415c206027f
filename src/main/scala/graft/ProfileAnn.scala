package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for sim_pq_topk: driver training vs ADC scan vs
  * window ranking. Measurement tool only.
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorSql.install(spark)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val df = time("build (training incl)") {
        operators.Similarity.queries("sim_pq_topk")(spark, sfDir)
      }
      time("planning (explain)") { df.queryExecution.executedPlan }
      time("execute (noop)") { df.write.format("noop").mode("overwrite").save() }
      val df2 = time("sq8 build") {
        operators.Similarity.queries("sim_sq8_topk")(spark, sfDir)
      }
      time("sq8 execute (noop)") { df2.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
