package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorSql
import graft.operators.TextPipeline

/** Focused nets for the round-19 optimization rewrites — same discipline
  * as OptimizationR18Spec: each test pins the EQUIVALENCE argument an
  * optimization leaned on, so a later edit that breaks the argument fails
  * here by name instead of surfacing as an oracle diff.
  */
class OptimizationR19Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- shingle max-df pre-gate (jaccardPairs dfBound) ----

  test("shingleDfBound dominates the true max shingle df on a multi-file corpus") {
    VectorSql.install(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_r19_dfbound").toFile
    try {
      // multi-file layout: the bound sums PER-FILE maxima, so this is the
      // case where bound > true max is possible and dominance is the claim
      val d = spark.range(120).selectExpr("id AS doc_id",
        """concat_ws(' ', 'alpha', 'beta', concat('w', cast(id % 7 AS STRING)),
          |  'gamma', concat('u', cast(id AS STRING)), 'delta') AS text""".stripMargin,
        "'en' AS lang", "'s0' AS source", "cast(32 AS INT) AS n_chars")
      d.repartition(3).write.parquet(s"$tmp/documents.parquet")
      val bound = TextPipeline.shingleDfBound(spark, tmp.getAbsolutePath)
      val trueMax = d
        .select(col("doc_id"), explode(VectorSql.shingle_hashes(col("text"))).as("s"))
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
        .agg(max(col("df"))).first().getLong(0)
      assert(bound >= trueMax,
        s"per-file max-df sketch ($bound) must bound the true max df ($trueMax)")
    } finally {
      graft.spatial.Snapshots.walkDir(tmp.toPath)(_.toSeq).reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("jaccardPairs with a proving dfBound equals the exact-df-pass result " +
    "(clean corpus: the skip path)") {
    VectorSql.install(spark)
    val d = Tables.load(spark, sf, "documents").filter(col("text").isNotNull)
    val maxDf = math.max(64L, Tables.metaRowCount(spark, sf, "documents") / 8)
    val bound = TextPipeline.shingleDfBound(spark, sf)
    assume(bound <= maxDf, "fixture corpus must be boilerplate-free for this net")
    val gated = TextPipeline.jaccardPairs(d, maxDf, Some(bound))
    val exact = TextPipeline.jaccardPairs(d, maxDf, None)
    assert(gated.exceptAll(exact).isEmpty && exact.exceptAll(gated).isEmpty,
      "the dfBound skip path diverged from the exact df pass")
  }

  test("jaccardPairs with a NON-proving dfBound falls back to the exact df " +
    "pass (hot corpus: results identical to the ungated spelling)") {
    VectorSql.install(spark)
    import spark.implicits._
    // hot fixture: 'alpha beta gamma' occurs in EVERY doc (df = 12 > maxDf
    // = 3); each pair also shares a rarer shingle so pairs survive the cap
    val docs = (0L until 12L).map { i =>
      val grp = i / 2
      (i, s"alpha beta gamma shared$grp token$grp filler$grp alpha beta gamma")
    }.toDF("doc_id", "text")
    val gated = TextPipeline.jaccardPairs(docs, maxDf = 3, dfBound = Some(12L))
    val exact = TextPipeline.jaccardPairs(docs, maxDf = 3, dfBound = None)
    assert(gated.exceptAll(exact).isEmpty && exact.exceptAll(gated).isEmpty,
      "the dfBound fallback path diverged from the ungated spelling")
    assert(gated.count() > 0, "hot fixture must produce surviving pairs")
  }

  // ---- q25_percentiles: the broadcast-pre-agg alternative (examined,
  // measured as a focused A-B-A loser, NOT adopted — this net records
  // that the rejected spelling was result-identical, so the verdict was
  // purely a performance call) ----

  test("q25's count-window n equals the broadcast-pre-agg construction " +
    "(the examined-and-rejected r19 alternative)") {
    import org.apache.spark.sql.expressions.Window
    val src = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    // the examined alternative: n attached by a broadcast pre-aggregate
    val wOrd = Window.partitionBy("l_returnflag").orderBy("v")
    val nAgg = src.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val ranked = src
      .withColumn("rn", row_number().over(wOrd).cast("long") - 1)
      .join(broadcast(nAgg), Seq("l_returnflag"))
    def lo(p: Double) = floor((col("n") - 1) * lit(p))
    def hi(p: Double) = ceil((col("n") - 1) * lit(p))
    def pick(p: Double, tag: String) = Seq(
      max(when(col("rn") === lo(p), col("v"))).as(s"lo$tag"),
      max(when(col("rn") === hi(p), col("v"))).as(s"hi$tag"))
    val agg = ranked.groupBy(col("l_returnflag")).agg(
      first(col("n")).as("n"),
      (pick(0.5, "50") ++ pick(0.9, "90") ++ pick(0.99, "99")): _*)
    def interp(p: Double, tag: String) = {
      val r = (col("n") - 1) * lit(p)
      round(col(s"lo$tag") + (r - floor(r)) * (col(s"hi$tag") - col(s"lo$tag")), 4)
    }
    val alt = agg.select(col("l_returnflag"),
      interp(0.5, "50").as("p50"),
      interp(0.9, "90").as("p90"),
      interp(0.99, "99").as("p99"))
    val cur = operators.Relational.queries("q25_percentiles")(spark, sf)
    assert(cur.exceptAll(alt).isEmpty && alt.exceptAll(cur).isEmpty,
      "count-window percentiles diverged from the broadcast-pre-agg construction")
  }

  // ---- pipeline_curate: keep-policy via the losers complement ----

  test("pipeline_curate's losers anti-join equals the labels inner-join + " +
    "doc_id === cluster construction") {
    VectorSql.install(spark)
    val d = Tables.load(spark, sf, "documents").filter(col("text").isNotNull)
    val maxDf = math.max(64L, Tables.metaRowCount(spark, sf, "documents") / 8)
    // the pre-r19 construction, verbatim: full labels frame inner-joined,
    // canonicality tested per row
    val labels = TextPipeline.clusterLabels(d, maxDf)
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
    val isEn = exists(array(VectorSql.lang_hits(col("text"), typedlit(Seq(
        Seq("the", "a", "of", "and"), Seq("el", "la", "de", "y"),
        Seq("le", "les", "et", "une"), Seq("der", "die", "und", "das"))))),
      h => h.getItem(0) >= h.getItem(1) && h.getItem(0) >= h.getItem(2) &&
        h.getItem(0) >= h.getItem(3) && h.getItem(0) > 0)
    val old = d.withColumn("n_tokens",
        VectorSql.text_stats(col("text"), typedlit(stopwords)).getField("n_tokens"))
      .join(labels, "doc_id")
      .filter(isEn && col("n_tokens") >= 20 && col("doc_id") === col("cluster"))
      .select(col("doc_id"), col("n_tokens"))
    val neu = TextPipeline.queries("pipeline_curate")(spark, sf)
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty,
      "losers-anti-join curate diverged from the labels-join construction")
    // and the complement really is the complement: losers ∪ keepers
    // partition the corpus
    val (losers, _) = TextPipeline.dupLosers(d, maxDf)
    val keepers = TextPipeline.clusterLabels(d, maxDf)
      .filter(col("doc_id") === col("cluster")).select(col("doc_id"))
    assert(losers.intersect(keepers).isEmpty)
    assert(losers.count() + keepers.count() == d.count())
  }

  // ---- text_boilerplate_scrub: metadata pre-gate for the broadcast call ----

  test("boilerplate line bound: metaTokenBound/8 + rows is a TRUE upper bound " +
    "on the corpus's distinct 8-token line count") {
    VectorSql.install(spark)
    val tb = Tables.metaTokenBound(spark, sf, "documents", "text")
    val bound =
      if (tb == Long.MaxValue) Long.MaxValue
      else tb / 8 + Tables.metaRowCount(spark, sf, "documents")
    val d = Tables.load(spark, sf, "documents").filter(col("text").isNotNull)
      .withColumn("tk", split(lower(trim(col("text"))), "\\s+"))
    val distinctLines = d.select(col("doc_id"),
        explode(transform(
          sequence(lit(0), greatest(ceil(size(col("tk")) / lit(8.0))
            .cast("int") - 1, lit(0))),
          i => concat_ws(" ", slice(col("tk"), i * 8 + 1, lit(8))))).as("line"))
      .select(col("line")).distinct().count()
    assert(bound >= distinctLines,
      s"line bound $bound must dominate the true distinct line count $distinctLines")
  }

  // ---- q04_nation_revenue: the orders-first join order (examined,
  // measured as an interleaved A-B-A loser at bench scale, NOT adopted —
  // this net records that the rejected spelling was result-identical,
  // so the verdict was purely a performance call; see the comment in
  // Relational.scala) ----

  test("q04's supplier-first spelling equals the examined-and-rejected " +
    "orders-first join order") {
    val region = Tables.load(spark, sf, "region")
    val nation = Tables.load(spark, sf, "nation")
    val cust = Tables.load(spark, sf, "customer")
    val sup = Tables.load(spark, sf, "supplier")
    val ord = Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.load(spark, sf, "lineitem")
    // the examined-and-rejected alternative: date-filtered orders first
    val old = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
    val neu = operators.Relational.queries("q04_nation_revenue")(spark, sf)
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty,
      "supplier-first q04 diverged from the rejected orders-first spelling")
  }

  // ---- dedup_keep_best: unfiltered n_chars lookup ----

  test("dedup_keep_best's raw-table n_chars lookup equals the docs()-filtered " +
    "lookup, null-text doc included") {
    VectorSql.install(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_r19_keepbest").toFile
    try {
      // corpus WITH a null-text doc (id 99): the optimization's claim is
      // that the lookup side may drop the text-IS-NOT-NULL filter because
      // pair doc_ids only ever come from shingled (non-null) text — a
      // null-text doc must change NOTHING even though the raw lookup now
      // carries its row
      val d0 = spark.range(12).selectExpr("id AS doc_id",
        """concat_ws(' ', 'alpha beta gamma delta', concat('tok', cast(id % 3 AS STRING)),
          |  'epsilon zeta eta theta iota kappa') AS text""".stripMargin,
        "'en' AS lang", "'s0' AS source", "(100 - id) AS n_chars")
      val nullRow = spark.sql(
        "SELECT 99L AS doc_id, CAST(NULL AS STRING) AS text, " +
          "'en' AS lang, 's0' AS source, 7L AS n_chars")
      d0.unionByName(nullRow).write.parquet(s"$tmp/documents.parquet")
      val dir = tmp.getAbsolutePath
      val d = Tables.load(spark, dir, "documents").filter(col("text").isNotNull)
      val pairs = TextPipeline.jaccardPairs(d, maxDf = 64).localCheckpoint(true)
      assert(pairs.count() > 0, "fixture must produce near-dup pairs")
      def losersWith(q: org.apache.spark.sql.DataFrame) = pairs
        .join(q.select(col("doc_id").as("d1"), col("n_chars").as("c1")), Seq("d1"))
        .join(q.select(col("doc_id").as("d2"), col("n_chars").as("c2")), Seq("d2"))
        .select(when(col("c1") < col("c2"), col("d1")).otherwise(col("d2"))
          .as("doc_id"))
        .distinct()
      val filtered = losersWith(d.select(col("doc_id"), col("n_chars")))
      val raw = losersWith(Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")))
      assert(raw.exceptAll(filtered).isEmpty && filtered.exceptAll(raw).isEmpty,
        "raw-table n_chars lookup diverged from the docs()-filtered lookup")
      // and the null-text doc never reaches the pair graph at all
      assert(pairs.filter(col("d1") === 99L || col("d2") === 99L).isEmpty)
    } finally {
      graft.spatial.Snapshots.walkDir(tmp.toPath)(_.toSeq).reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("a warm dfBound memo removes the per-query df-aggregate jobs " +
    "(gated construction runs strictly fewer jobs than the exact pass)") {
    VectorSql.install(spark)
    // count ONLY this test's jobs: suites run concurrently on the shared
    // session, so an unfiltered listener would count their jobs too —
    // job groups are thread-local, so the group id isolates this thread
    val group = "r19-dfgate-jobcount"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(j.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group))
          jobs.incrementAndGet()
    }
    // listener delivery is async: poll the counter to a fixed point
    def settle(): Int = {
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val cur = jobs.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      jobs.get()
    }
    val d = Tables.load(spark, sf, "documents").filter(col("text").isNotNull)
    val maxDf = math.max(64L, Tables.metaRowCount(spark, sf, "documents") / 8)
    val bound = TextPipeline.shingleDfBound(spark, sf) // warm the memo
    assume(bound <= maxDf)
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "r19 df-gate job-count net")
    try {
      TextPipeline.jaccardPairs(d, maxDf, Some(bound)) // construction only
      val gatedJobs = settle()
      jobs.set(0)
      TextPipeline.jaccardPairs(d, maxDf, None) // construction only
      val exactJobs = settle()
      // the gated construction runs only the shingle checkpoint; the
      // exact pass adds the hot-set checkpoint aggregate + isEmpty probe
      // (absolute counts vary with AQE's per-stage jobs — compare shapes)
      assert(gatedJobs < exactJobs,
        s"warm-gated construction ran $gatedJobs jobs vs exact $exactJobs — " +
          "the df pass is back on the gated path")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
