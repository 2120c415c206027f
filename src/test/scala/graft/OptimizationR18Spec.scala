package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorSql

/** Focused nets for the round-18 optimization rewrites: each test pins
  * the EQUIVALENCE argument an optimization leaned on, so a later edit
  * that breaks the argument fails here by name instead of surfacing as
  * an oracle diff.
  */
class OptimizationR18Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("vec_nearest returns DISTINCT cells, including on the NaN fallback path " +
    "(the argument behind dropping the IVF joins' pair dedup)") {
    VectorSql.install(spark)
    val cents = typedlit(Seq.tabulate(6)(c => Seq.tabulate(8)(i =>
      math.sin(c * 8 + i.toDouble))))
    val vecs = spark.range(200).selectExpr(
      "id",
      // every 17th vector is all-NaN: the kernel's fallback must still
      // yield distinct cells (it would otherwise return nProbe copies
      // of cell 0 and the equi-join could match one pair twice)
      """CASE WHEN id % 17 = 0
        |  THEN transform(sequence(1, 8), i -> cast('NaN' AS DOUBLE))
        |  ELSE transform(sequence(1, 8), i -> cast(id * i % 13 AS DOUBLE))
        |END AS v""".stripMargin)
    val probes = vecs.select(VectorSql.vec_nearest(col("v"), cents, 3).as("p"))
      .collect().map(_.getSeq[Int](0))
    probes.foreach { p =>
      assert(p.size == 3 && p.distinct.size == p.size, s"duplicate probe cells: $p")
    }
  }

  test("dedup_span_exact's aggregate-only shape equals the old span-keyed join-back") {
    VectorSql.install(spark)
    val d = Tables.load(spark, sf, "documents").filter(col("text").isNotNull)
    // the pre-r18 construction, verbatim
    val sp = d.select(col("doc_id"),
      explode(VectorSql.shingle_hashes_n(col("text"), 8)).as("s"))
    val df = sp.groupBy(col("s")).agg(count(lit(1)).as("nd"))
    val old = sp.join(df, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum((col("nd") >= 2).cast("long")).as("n_dup_spans"))
      .withColumn("dup_ratio", round(col("n_dup_spans") / col("n_spans"), 4))
    val neu = operators.TextPipeline.queries("dedup_span_exact")(spark, sf)
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty,
      "aggregate-only span dedup diverged from the join-back construction")
  }

  test("sim_kmeans_update computes the nearest-centroid cell BELOW the explode") {
    val df = operators.Similarity.queries("sim_kmeans_update")(spark, sf)
    // formatted explain survives the AQE wrapper; the Generate node's
    // Input list names the columns arriving FROM BELOW
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val genInput = txt.linesIterator.dropWhile(!_.matches("""\(\d+\) Generate\s*"""))
      .drop(1).take(1).toSeq.headOption.getOrElse("")
    assert(genInput.startsWith("Input") && genInput.contains("cell"),
      "the cell column must be computed below the Generate — a Project " +
        s"above it re-evaluates the k-cosine chain once per exploded row " +
        s"(Generate input line: '$genInput')")
  }

  test("bpe_apply equals the chained replace() construction byte-for-byte") {
    VectorSql.install(spark)
    // real merge shapes plus adversarial ones: the l==r run case, a merge
    // whose output feeds the next merge, and patterns absent entirely
    val merges = Seq(("a", "a"), ("aa", "b"), ("t", "h"), ("th", "e"),
      ("x", "y"), ("e", " "))
    val searches = merges.map { case (l, r) => s" $l\n $r\n" }
    val repls = merges.map { case (l, r) => s" $l$r\n" }
    val cellsOf = regexp_replace(
      regexp_replace(lower(trim(col("text"))), "\\s+", " "), "(.)", " $1\n")
    val base = Tables.load(spark, sf, "documents").filter(col("text").isNotNull)
      .select(col("doc_id"), cellsOf.as("cells"))
      // append crafted rows: aaaa runs, overlapping-adjacent, empty,
      // supplementary-plane code points
      .unionByName(spark.createDataFrame(Seq(
        (900001L, " a\n a\n a\n a\n"), (900002L, ""),
        (900003L, " t\n h\n t\n h\n e\n"),
        (900004L, " 😀\n a\n a\n"))).toDF("doc_id", "cells"))
    val chained = merges.foldLeft(col("cells")) { case (e, (l, r)) =>
      org.apache.spark.sql.functions.replace(e,
        lit(s" $l\n $r\n"), lit(s" $l$r\n"))
    }
    val diff = base.select(col("doc_id"),
        VectorSql.bpe_apply(col("cells"), typedlit(searches), typedlit(repls)).as("k"),
        chained.as("c"))
      .filter(col("k") =!= col("c") || col("k").isNull =!= col("c").isNull)
      .count()
    assert(diff == 0, "bpe_apply diverged from the chained replace() construction")
  }

  test("codegen'd ADC / subspace-distance forms equal the HOF spellings bit-for-bit") {
    VectorSql.install(spark)
    val books: Seq[Seq[Seq[Double]]] = Seq.tabulate(4)(sub =>
      Seq.tabulate(16)(c => Seq.tabulate(16)(i =>
        math.cos(sub * 257 + c * 17 + i.toDouble))))
    val rows = spark.range(300).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 63), i -> cast(sin(id * 64 + i) AS DOUBLE)) AS v",
      "transform(sequence(0, 3), i -> cast((id + i) % 16 AS INT)) AS codes",
      """transform(sequence(0, 3), s ->
        |  transform(sequence(0, 15), c -> cast(cos(s * 16 + c + id) AS DOUBLE)))
        |  AS luts""".stripMargin)
    // vec_sub_l2 vs transform(cb, aggregate(zip_with(slice(v), c, ...)))
    books.zipWithIndex.foreach { case (book, sub) =>
      val cb = typedlit(book)
      val sv = slice(col("v"), sub * 16 + 1, 16)
      val hof = transform(cb, c => aggregate(
        zip_with(sv, c, (x, y) => (x - y) * (x - y)),
        lit(0.0d), (a, x) => a + x))
      val diff = rows.select(
          VectorSql.vec_sub_l2(col("v"), cb, sub * 16).as("k"), hof.as("h"))
        .filter(col("k") =!= col("h")).count()
      assert(diff == 0, s"vec_sub_l2 diverged from the HOF spelling in subspace $sub")
    }
    // explicit element_at chain vs aggregate(zip_with(codes, luts, ...))
    val explicitAdc = (0 until 4).map(i =>
        element_at(col("luts").getItem(i), col("codes").getItem(i) + 1))
      .foldLeft(lit(0.0d))(_ + _)
    val hofAdc = aggregate(
      zip_with(col("codes"), col("luts"), (c, lut) => element_at(lut, c + 1)),
      lit(0.0d), (a, x) => a + x)
    val adcDiff = rows.select(explicitAdc.as("e"), hofAdc.as("h"))
      .filter(col("e") =!= col("h")).count()
    assert(adcDiff == 0, "explicit ADC chain diverged from the HOF spelling")
  }

  test("temperature_resample's window-derived rates equal the " +
    "agg-then-crossJoin construction") {
    val d = Tables.load(spark, sf, "documents").filter(col("text").isNotNull)
    // the pre-r18 construction, verbatim: tot and mx as separate
    // aggregates broadcast back over the per-source counts
    val srcCnt = d.groupBy("source").agg(count(lit(1)).as("cnt"))
    val tot = srcCnt.agg(sum(col("cnt")).as("tot"))
    val rates = srcCnt.crossJoin(broadcast(tot))
      .withColumn("raw_rate", lit(1.0) / sqrt(col("cnt") / col("tot")))
    val maxRate = rates.agg(max(col("raw_rate")).as("mx"))
    val normedOld = rates.crossJoin(broadcast(maxRate))
      .withColumn("rate", round(col("raw_rate") / col("mx"), 6))
      .select(col("source"), col("rate"))
    val h = md5(col("doc_id").cast("string"))
    val u = ((ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 1000)
      .cast("double") / lit(1000.0d)
    val old = d.join(broadcast(normedOld), "source")
      .withColumn("keep", (u < col("rate")).cast("int"))
      .groupBy("source", "rate")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("keep")).cast("int").as("n_kept"))
      .select(col("source"), col("rate"), col("n_docs"), col("n_kept"))
    val neu = operators.Curation.queries("curate_temperature_resample")(spark, sf)
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty,
      "window-derived resample rates diverged from the crossJoin construction")
  }

  test("mix_epochs' window-derived mean equals the agg-then-crossJoin construction") {
    val d = Tables.load(spark, sf, "documents").filter(col("text").isNotNull)
    val tok = d.select(col("doc_id"), col("lang"),
      size(split(lower(trim(col("text"))), "\\s+")).as("toks"))
    // the pre-r18 construction, verbatim
    val mass = tok.groupBy(col("lang")).agg(sum(col("toks")).as("mass"))
    val mean = mass.agg(avg(col("mass")).as("mean"))
    val mixOld = mass.crossJoin(broadcast(mean))
      .select(col("lang"), least(lit(4L), greatest(lit(1L),
        ceil(col("mean") / col("mass")).cast("long"))).as("epochs"))
    val old = tok.join(broadcast(mixOld), Seq("lang"))
      .withColumn("epoch", explode(sequence(lit(1L), col("epochs"))))
      .select(col("doc_id"), col("lang"), col("epoch"), col("epochs"))
    val neu = operators.Curation.queries("curate_mix_epochs")(spark, sf)
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty,
      "window-derived epoch mix diverged from the crossJoin construction")
  }

  test("domain_drift's dictionary-derived totals equal the per-branch " +
    "token-frame aggregates") {
    VectorSql.install(spark)
    val d = Tables.load(spark, sf, "documents").filter(col("text").isNotNull)
    val tk = d.select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    // the pre-r18 construction: each total aggregates the exploded token
    // frame directly
    val st = tk.groupBy("source", "tok").agg(count(lit(1)).as("cs"))
    val v = tk.groupBy("tok").agg(count(lit(1)).as("c"))
    val srcTot = tk.groupBy("source").agg(count(lit(1)).as("ts"))
    val tot = tk.agg(count(lit(1)).as("t"))
    val old = st.join(v, "tok")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(round(sum((col("cs") / col("ts")) *
          log((col("cs") / col("ts")) / (col("c") / col("t")))), 6).as("kl_div"),
        max(col("ts")).cast("int").as("n_toks"))
    val neu = operators.TextPipeline.queries("text_domain_drift")(spark, sf)
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty,
      "dictionary-derived drift totals diverged from the token-frame aggregates")
  }
}
