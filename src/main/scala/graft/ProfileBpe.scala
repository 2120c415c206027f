package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for tokenizer_bpe_encode: per-char cell expansion vs the
  * 24-merge replace chain. Measurement tool only.
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val d = Tables.load(spark, sfDir, "documents").filter(col("text").isNotNull)
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("norm only") {
        d.select(col("doc_id"), length(norm).as("l"))
          .write.format("noop").mode("overwrite").save()
      }
      time("norm + cells regex") {
        d.withColumn("__norm", norm)
          .select(col("doc_id"),
            length(regexp_replace(col("__norm"), "(.)", " $1\n")).as("l"))
          .write.format("noop").mode("overwrite").save()
      }
      time("full encode query") {
        operators.Curation.queries("tokenizer_bpe_encode")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      // in-session A/B: chained replace() vs the bpe_apply kernel over
      // the same merges (both downstream of identical cells)
      locally {
        graft.functions.VectorSql.install(spark)
        val merges = operators.Curation.bpeMerges(sfDir, 24)(cap =>
          operators.Curation.trainBpeFromCorpus(spark, sfDir, 24, cap))
        val cells = regexp_replace(norm, "(.)", " $1\n")
        val chained = merges.foldLeft(cells) { case (e, (l, r, _)) =>
          org.apache.spark.sql.functions.replace(e,
            lit(s" $l\n $r\n"), lit(s" $l$r\n"))
        }
        val kernel = graft.functions.VectorSql.bpe_apply(cells,
          typedlit(merges.map { case (l, r, _) => s" $l\n $r\n" }),
          typedlit(merges.map { case (l, r, _) => s" $l$r\n" }))
        time("chain replace x24") {
          d.select(length(chained).as("l"))
            .write.format("noop").mode("overwrite").save()
        }
        time("bpe_apply kernel") {
          d.select(length(kernel).as("l"))
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
