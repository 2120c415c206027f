package graft
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, sf).write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"$q: ${(System.nanoTime()-t0)/1e9}%.2f s (warm)")
    }
    spark.stop()
  }
}
