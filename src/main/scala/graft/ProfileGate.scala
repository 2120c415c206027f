package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorSql

/** Micro A/B for the pipeline_curate language/quality gate: multi-
  * reference kernel conjuncts (texthits evaluated once per conjunct
  * after filter pushdown inlines the alias) vs the single-eval lambda
  * binding (`exists(array(kernel), h -> ...)`). Measurement tool only.
  */
object ProfileGate {
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
    VectorSql.install(spark)
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
    val langs = typedlit(Seq(
      Seq("the", "a", "of", "and"), Seq("el", "la", "de", "y"),
      Seq("le", "les", "et", "une"), Seq("der", "die", "und", "das")))
    val d = Tables.load(spark, sfDir, "documents").filter(col("text").isNotNull)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def variantA() = { // current shape
      d.withColumn("st", VectorSql.text_stats(col("text"), typedlit(stopwords)))
        .withColumn("h", VectorSql.lang_hits(col("text"), langs))
        .withColumn("n_tokens", col("st.n_tokens"))
        .withColumn("is_en",
          col("h").getItem(0) >= col("h").getItem(1) &&
            col("h").getItem(0) >= col("h").getItem(2) &&
            col("h").getItem(0) >= col("h").getItem(3) && col("h").getItem(0) > 0)
        .filter(col("is_en") && col("n_tokens") >= 20)
        .select(col("doc_id"), col("n_tokens"))
    }
    def variantB() = { // single-eval lambda binding
      val isEn = exists(array(VectorSql.lang_hits(col("text"), langs)),
        h => h.getItem(0) >= h.getItem(1) && h.getItem(0) >= h.getItem(2) &&
          h.getItem(0) >= h.getItem(3) && h.getItem(0) > 0)
      d.withColumn("n_tokens",
          VectorSql.text_stats(col("text"), typedlit(stopwords)).getField("n_tokens"))
        .filter(isEn && col("n_tokens") >= 20)
        .select(col("doc_id"), col("n_tokens"))
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("A multi-ref")(variantA().write.format("noop").mode("overwrite").save())
      time("B lambda-bound")(variantB().write.format("noop").mode("overwrite").save())
    }
    // sanity: identical results
    val diff = variantA().exceptAll(variantB()).count() +
      variantB().exceptAll(variantA()).count()
    println(s"[prof] diff rows = $diff")
    spark.stop()
  }
}
