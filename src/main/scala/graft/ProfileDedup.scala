package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the jaccard/CC dedup family — the
  * optimization round's measurement tool (guide §1/§7): the queries'
  * heavy work is EAGER (checkpoints, counts, collects) so explain() of
  * the returned frame sees only the cheap tail; this replays the
  * construction step by step with labeled timings.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorSql.install(spark)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm shared infra once
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val reps = sys.env.getOrElse("PROF_REPS", "2").toInt
    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val d = time("load+filter") {
        Tables.load(spark, sfDir, "documents").filter(col("text").isNotNull)
      }
      val maxDf = math.max(64L, Tables.metaRowCount(spark, sfDir, "documents") / 8)
      val sh = time("shingle checkpoint") {
        operators.Par.widen(d)
          .withColumn("h", functions.VectorSql.shingle_hashes(col("text")))
          .select(col("doc_id"), size(col("h")).as("n"), explode(col("h")).as("s"))
          .localCheckpoint(true)
      }
      val hot = time("hot checkpoint") {
        sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("s")).localCheckpoint(true)
      }
      val hasHot = time("hot isEmpty")(!hot.isEmpty)
      println(s"[prof] hasHot=$hasHot")
      val rare = if (hasHot) sh.join(broadcast(hot), Seq("s"), "left_anti") else sh
      val pairsFull = rare.as("a").join(rare.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.n").as("n1"), col("b.n").as("n2"))
        .agg(count(lit(1)).as("common_rare"))
        .withColumn("common", col("common_rare"))
        .withColumn("jac", col("common") / (col("n1") + col("n2") - col("common")))
        .filter(col("jac") >= 0.4)
        .select(col("d1"), col("d2"), round(col("jac"), 4).as("jac"))
      val pairs = time("pairs checkpoint") {
        pairsFull.select(col("d1"), col("d2")).localCheckpoint(true)
      }
      val edgeCount = time("pairs count")(pairs.count())
      println(s"[prof] edges=$edgeCount")
      val chunks = time("edge collect") {
        pairs.rdd.mapPartitions { it =>
          val buf = new scala.collection.mutable.ArrayBuilder.ofLong
          it.foreach { r => buf += r.getLong(0); buf += r.getLong(1) }
          Iterator.single(buf.result())
        }.collect()
      }
      println(s"[prof] chunks=${chunks.length}")
      // the final tail job of dedup_clusters (labels + anti-join + union)
      time("noop tail (labels)") {
        operators.TextPipeline.clusterLabels(d, maxDf)
          .write.format("noop").mode("overwrite").save()
      }
      time("noop full pipeline_curate") {
        operators.TextPipeline.queries("pipeline_curate")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
