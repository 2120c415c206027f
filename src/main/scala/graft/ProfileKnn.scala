package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for sim_knn_graph (signature checkpoint vs
  * candidate join vs exact re-rank) and text_boilerplate_scrub (line
  * checkpoint vs heavy-hitter aggregate vs scrub). Measurement tool only
  * (VERDICT r18 next #4/#7).
  */
object ProfileKnn {
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
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (rep <- 1 to 3) {
      println(s"--- rep $rep knn")
      // mirror sim_knn_graph's internals stage by stage
      val e0 = Tables.load(spark, sfDir, "embeddings")
        .selectExpr("vec_id", "transform(embedding, x -> cast(x AS DOUBLE)) AS v")
      val n = Tables.metaRowCount(spark, sfDir, "embeddings")
      val bits = graft.operators.Similarity.sizedBits(n)
      val ps = graft.operators.Similarity.planes(4 * bits, 64)
      val sigs = time("sigs checkpoint") {
        e0.withColumn("sigs",
            graft.functions.VectorSql.vec_band_sig(col("v"), typedlit(ps), 4, bits))
          .select(col("vec_id"), posexplode(col("sigs")).as(Seq("band", "sig")))
          .localCheckpoint(true)
      }
      val cand = sigs.as("a").join(sigs.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
        .dropDuplicates("src", "dst")
      time("cand join+dedup (noop)") { noop(cand) }
      time("full query (noop)") {
        noop(operators.Similarity.queries("sim_knn_graph")(spark, sfDir))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println(s"--- rep $rep boilerplate")
      time("bp full query (noop)") {
        noop(operators.Curation.queries("text_boilerplate_scrub")(spark, sfDir))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
