package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-operator properties of the dedup / similarity / multimodal family:
  * the approximate operators (minhash, simhash) must recover most of the
  * exact n-gram Jaccard near-duplicates, and everything must be
  * deterministic run-to-run (driver re-executes queries for hashing).
  */
class PipelineSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def pairs(q: String): Set[(Long, Long)] =
    SparkEntry.queries(q)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] = pairs("dedup_ngram_jaccard")

  test("planted near-duplicates exist in the corpus") {
    assert(exact.size >= 10, s"expected planted near-dups, got ${exact.size}")
  }

  test("minhash LSH recovers most exact-jaccard near-dups") {
    val mh = pairs("dedup_minhash")
    val recall = (exact & mh).size.toDouble / exact.size
    assert(recall >= 0.8, s"minhash recall $recall over ${exact.size} pairs")
  }

  test("simhash recovers a majority of near-dups with high precision") {
    val sh = pairs("dedup_simhash")
    val recall = (exact & sh).size.toDouble / exact.size
    val precision = (exact & sh).size.toDouble / sh.size
    assert(recall >= 0.5, s"simhash recall $recall")
    assert(precision >= 0.5, s"simhash precision $precision")
  }

  test("brute-force cosine top-k returns k rows per query") {
    val df = SparkEntry.queries("sim_cosine_topk")(spark, sf)
    val perQ = df.groupBy("qid").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == 5L))
  }

  test("semantic dedup: cluster-bounded, keep-one per near-dup group, plan has no all-pairs join") {
    val kept = SparkEntry.queries("sim_semdedup")(spark, sf)
    val rows = kept.collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter("vec_id >= 8").count()
    assert(rows.length < total, "the corpus has planted near-dups; some must drop")
    assert(rows.length > total / 2, "most rows are unique; most must survive")
    // the pairwise stage must be keyed on the cluster cell — an all-pairs
    // cross product would have no equi-join condition
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"semdedup pairwise stage must be cell-keyed, not all-pairs:\n$plan")
  }

  test("chunking is map-only; boilerplate scrub broadcasts only the heavy hitters") {
    // RAG chunking: zero exchanges — the whole operator is explode + project
    val chunks = SparkEntry.queries("curate_chunk_overlap")(spark, sf)
    val cPlan = chunks.queryExecution.executedPlan.toString
    assert(!cPlan.contains("Exchange"), s"chunking must be map-only:\n$cPlan")
    // every chunk covers <= 64 tokens; consecutive chunks overlap by 16
    val rows = chunks.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(3) <= 64))
    assert(rows.forall(r => r.getInt(3) > 0))
    // boilerplate scrub: the line-frequency side joins BROADCAST (the
    // heavy hitters are tiny), never a corpus-vs-corpus shuffle join
    val scrub = SparkEntry.queries("text_boilerplate_scrub")(spark, sf)
    val sPlan = scrub.queryExecution.executedPlan.toString
    assert(sPlan.contains("BroadcastHashJoin") || sPlan.contains("BroadcastExchange"),
      s"boiler side must broadcast:\n$sPlan")
    assert(!sPlan.contains("SortMergeJoin"), s"no corpus-keyed merge join:\n$sPlan")
  }

  test("boilerplate scrub size gate: an oversized heavy-hitter set falls back to a " +
      "shuffled anti-join with identical results") {
    val keyOf = (r: org.apache.spark.sql.Row) => r.toSeq.toList
    val small = SparkEntry.queries("text_boilerplate_scrub")(spark, sf)
      .collect().map(keyOf).toSet
    try {
      // force the web-scale path: every heavy-hitter set is "too big" to
      // broadcast, and the join must not be hinted into one either way
      spark.conf.set("spark.sql.graft.curation.boilerplate.broadcast-max-lines", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("text_boilerplate_scrub")(spark, sf)
      val rows = df.collect().map(keyOf).toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"the gated path must not force a broadcast of the unbounded aggregate:\n$plan")
      assert(rows == small, "both gate paths must produce identical results")
    } finally {
      spark.conf.unset("spark.sql.graft.curation.boilerplate.broadcast-max-lines")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("DSIR vocab size gate: an oversized raw-corpus unigram model falls " +
      "back to a shuffled scoring join with identical results; a malformed " +
      "knob fails with the property named") {
    val keyOf = (r: org.apache.spark.sql.Row) => r.toSeq.toList
    val small = SparkEntry.queries("curate_dsir_weights")(spark, sf)
      .collect().map(keyOf).toSet
    try {
      spark.conf.set("spark.sql.graft.curation.dsir.broadcast-max-vocab", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("curate_dsir_weights")(spark, sf)
      val rows = df.collect().map(keyOf).toSet
      // the MODEL join must not be hinted into a broadcast (the tiny
      // 1-row totals frame legitimately broadcasts either way)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(rows == small, "both gate paths must produce identical results")
      assert(plan.contains("tok"), plan.take(200))
      spark.conf.set("spark.sql.graft.curation.dsir.broadcast-max-vocab", "lots")
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("curate_dsir_weights")(spark, sf).collect()
      }
      assert(e.getMessage.contains("dsir.broadcast-max-vocab"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.graft.curation.dsir.broadcast-max-vocab")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("LM-model size gate (lm_perplexity / ccnet_buckets / domain_drift " +
      "share one seat): oversized corpus-trained vocab falls back to a " +
      "shuffled scoring join with identical results; malformed knob named") {
    val keyOf = (r: org.apache.spark.sql.Row) => r.toSeq.toList
    val names = Seq("text_lm_perplexity", "text_ccnet_buckets", "text_domain_drift")
    val small = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(keyOf).toSet).toMap
    try {
      spark.conf.set("spark.sql.graft.text.broadcast-max-model-rows", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      names.foreach { n =>
        val rows = SparkEntry.queries(n)(spark, sf).collect().map(keyOf).toSet
        assert(rows == small(n), s"$n: both gate paths must produce identical results")
      }
      spark.conf.set("spark.sql.graft.text.broadcast-max-model-rows", "lots")
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("text_lm_perplexity")(spark, sf).collect()
      }
      assert(e.getMessage.contains("broadcast-max-model-rows"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.graft.text.broadcast-max-model-rows")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("single-task-window gate: the two-phase (block-decomposed / salted) " +
      "plans produce results IDENTICAL to the plain windows for all six " +
      "ranked/cumulative operators") {
    val names = Seq("curate_pack_sequences", "curate_sample_stratified",
      "curate_domain_mix", "curate_shuffle_index", "text_ccnet_buckets",
      "geo_knn_join")
    val keyOf = (r: org.apache.spark.sql.Row) => r.toSeq.toList
    val plain = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(keyOf).toSet).toMap
    try {
      // force every stratum "too big": all five take the two-phase path
      spark.conf.set("spark.sql.graft.curation.single-window-max-rows", "0")
      names.foreach { n =>
        val rows = SparkEntry.queries(n)(spark, sf).collect().map(keyOf).toSet
        assert(rows == plain(n), s"$n: two-phase must equal the plain window")
      }
      spark.conf.set("spark.sql.graft.curation.single-window-max-rows", "huge")
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("curate_pack_sequences")(spark, sf).collect()
      }
      assert(e.getMessage.contains("single-window-max-rows"), e.getMessage)
    } finally spark.conf.unset("spark.sql.graft.curation.single-window-max-rows")
  }

  test("skew-proof single-task-window gate: a mega-stratum whose AVERAGE " +
      "passes the gate forces the two-phase path; the cheap tiers decide " +
      "without running the max-stratum aggregate") {
    import graft.operators.Curation
    val gateKey = "spark.sql.graft.curation.single-window-max-rows"
    val total = Tables.metaRowCount(spark, sf, "documents")
    val boom: Option[() => Long] =
      Some(() => fail("max-stratum aggregate must not run in a cheap tier"))
    try {
      // tier 1: total <= gate — even a 100%-skewed stratum fits, zero jobs
      spark.conf.set(gateKey, total.toString)
      assert(Curation.singleWindowFits(spark, sf, 4, maxStratum = boom))
      // tier 2: mean > gate — the max is at least the mean, zero jobs
      spark.conf.set(gateKey, (total / 8).toString)
      assert(!Curation.singleWindowFits(spark, sf, 4, maxStratum = boom))
      // ambiguous band (total > gate, mean <= gate): the EXACT max decides
      // — this is the mega-stratum case the old average-based gate missed
      spark.conf.set(gateKey, (total - 1).toString)
      assert(!Curation.singleWindowFits(spark, sf, 4,
        maxStratum = Some(() => total)),
        "a mega-stratum above the gate must force the two-phase path " +
          "even though the AVERAGE stratum passes")
      assert(Curation.singleWindowFits(spark, sf, 4,
        maxStratum = Some(() => total - 1)))
      // hash/modulo strata carry no callback: conservative 8x imbalance
      assert(!Curation.singleWindowFits(spark, sf, 4))
      assert(Curation.singleWindowFits(spark, sf, 64))
      // the real callback measures the actual lang distribution
      val mx = Curation.maxStratumOf(
        Tables.load(spark, sf, "documents").filter("text IS NOT NULL"), "lang")()
      assert(mx > 0 && mx < total)
      // end-to-end: in the ambiguous band the REAL gate (lang max-stratum)
      // picks a path whose answer equals the default plan's
      spark.conf.unset(gateKey)
      val dflt = SparkEntry.queries("curate_sample_stratified")(spark, sf)
        .collect().map(_.toSeq.toList).toSet
      spark.conf.set(gateKey, (total - 1).toString)
      val amb = SparkEntry.queries("curate_sample_stratified")(spark, sf)
        .collect().map(_.toSeq.toList).toSet
      assert(amb == dflt)
    } finally spark.conf.unset(gateKey)
  }

  test("BPE encoder equals an independent per-word array rewrite: the " +
      "whole-doc replace-chain encoding (spaces as merge barriers) and a " +
      "word-by-word greedy apply agree on every document") {
    import graft.operators.Curation
    val got = SparkEntry.queries("tokenizer_bpe_encode")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // independent reimplementation: train the same merge table, then
    // apply merges per WORD over symbol ARRAYS (no strings, no replace)
    val d = Tables.load(spark, sf, "documents").filter("text IS NOT NULL")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val dictRows = d.flatMap(_._2.toLowerCase.trim.split("\\s+"))
      .filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toArray
    val dict = dictRows.sortBy { case (w, f) => (-f, w) }.take(65536)
    val merges = Curation.bpeTrain(dict, 24)
    def encodeWord(w: String): Int = {
      var syms = w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      merges.foreach { case (l, r, _) =>
        if (syms.length >= 2) {
          val b = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          syms = b.toArray
        }
      }
      syms.length
    }
    assert(got.size == d.length)
    d.foreach { case (id, text) =>
      val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
      val words = if (norm.isEmpty) Array.empty[String] else norm.split(" ")
      val want = words.map(encodeWord).sum
      val (tokens, chars) = got(id)
      assert(chars == norm.codePointCount(0, norm.length), s"doc $id chars")
      assert(tokens == want,
        s"doc $id: replace-chain encoding $tokens != per-word apply $want")
    }
  }

  test("BPE encoder survives an adversarial corpus: supplementary-plane code " +
      "points train and APPLY as single symbols, delimiter-class characters " +
      "normalize, and the replace-chain equals the per-word apply") {
    import org.apache.spark.sql.functions._
    import graft.operators.Curation
    val dir = java.nio.file.Files.createTempDirectory("graft_bpeadv").toString
    // U+1D54F (surrogate pair in UTF-16) repeated enough to win a merge;
    // tabs/newlines/CR collapse to single spaces; a char-based trainer
    // would emit surrogate-half merges the encoder can never apply
    val texts = Seq(
      1L -> "\uD835\uDD4F\uD835\uDD4F \uD835\uDD4F\uD835\uDD4F \uD835\uDD4F\uD835\uDD4F\uD835\uDD4F",
      2L -> "aa\tbb\naa  bb\raa",
      3L -> "\uD835\uDD4Fa \uD835\uDD4Fa a\uD835\uDD4F",
      4L -> "mixed \uD835\uDD4F\uD835\uDD4F words mixed words",
      5L -> "x",
      6L -> "")
    import spark.implicits._
    texts.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("tokenizer_bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // independent per-word apply over CODE-POINT symbol arrays
    val dict = texts.flatMap(_._2.toLowerCase.trim.split("\\s+"))
      .filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toArray
      .sortBy { case (w, f) => (-f, w) }
    val merges = Curation.bpeTrain(dict, 24)
    // the corpus must actually exercise a supplementary merge, or this
    // test pins nothing
    assert(merges.exists { case (l, r, _) =>
      (l + r).codePoints().toArray.exists(_ > 0xFFFF) }, s"merges: $merges")
    def encodeWord(w: String): Int = {
      var syms = w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      merges.foreach { case (l, r, _) =>
        if (syms.length >= 2) {
          val b = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          syms = b.toArray
        }
      }
      syms.length
    }
    assert(got.size == texts.size)
    texts.foreach { case (id, text) =>
      val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
      val words = if (norm.isEmpty) Array.empty[String] else norm.split(" ")
      val want = words.map(encodeWord).sum
      val (tokens, chars) = got(id)
      assert(chars == norm.codePointCount(0, norm.length), s"doc $id chars")
      assert(tokens == want,
        s"doc $id: replace-chain $tokens != per-word apply $want (merges $merges)")
    }
  }

  test("manifest-served max stratum: an identity-partitioned graft table " +
      "answers the window gate's ambiguous band with ZERO jobs") {
    import graft.operators.Curation
    graft.spatial.Geo.install(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_stratum").toString
    val cat = "mstrat"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    import org.apache.spark.sql.functions._
    spark.range(300).toDF("id")
      .withColumn("lang", concat(lit("l"), (col("id") % 3 === 0).cast("int")
        + (col("id") % 7 === 0).cast("int")))
      .writeTo(s"$cat.db.strata").partitionedBy(col("lang")).create()
    val t = spark.table(s"$cat.db.strata")
    val want = t.groupBy("lang").count()
      .agg(max("count")).first().getLong(0)
    // make the DATA unreadable: any fallback aggregate job now throws, so
    // a correct answer PROVES the manifest served it without a job (the
    // throwing-callback posture of the gate-tier spec)
    val tblDir = java.nio.file.Paths.get(dir, "db", "strata")
    graft.spatial.Snapshots.walkDir(tblDir)(_.toSeq)
      .filter(p => p.toString.endsWith(".parquet") &&
        java.nio.file.Files.isRegularFile(p))
      .foreach(p => java.nio.file.Files.write(p, Array[Byte](0, 1, 2, 3)))
    val mx = Curation.maxStratumOf(spark.table(s"$cat.db.strata"), "lang")()
    assert(mx == want, s"manifest max stratum $mx must equal the true max $want")
    // a filter above the scan keeps the metadata path (upper bound stays
    // sound for the gate: filters only shrink strata)
    val mxF = Curation.maxStratumOf(
      spark.table(s"$cat.db.strata").filter(col("id") >= 0), "lang")()
    assert(mxF == want)
    // a NON-partition stratum column cannot be manifest-served: the
    // fallback aggregate runs and hits the corrupted data — loud, never a
    // silent wrong answer
    intercept[Exception] {
      Curation.maxStratumOf(spark.table(s"$cat.db.strata"), "id")()
    }
    // a row-EXPANDING plan shape (join/generate) declines the metadata
    // path even though exactly one graft relation is present — the base
    // table's manifest would UNDERCOUNT the frame's real strata
    intercept[Exception] {
      Curation.maxStratumOf(
        spark.table(s"$cat.db.strata").crossJoin(spark.range(2)), "lang")()
    }
  }

  test("LM-model broadcast pre-gate: the footer token bound is a TRUE upper " +
      "bound on the distinct-token count and fits the default cap at this " +
      "scale — the exact count job is provably skipped") {
    val bound = Tables.metaTokenBound(spark, sf, "documents", "text")
    val actual = Tables.load(spark, sf, "documents")
      .filter("text IS NOT NULL")
      .selectExpr("explode(split(lower(trim(text)), '\\\\s+')) AS tok")
      .filter("tok <> ''").distinct().count()
    assert(bound >= actual, s"footer bound $bound below actual vocab $actual")
    assert(bound <= 1000000L,
      s"pre-gate must fire at test scale (bound $bound vs default cap 1M)")

    // DELTA_BYTE_ARRAY (parquet v2 pages) stores shared prefixes once, so
    // uncompressed size no longer bounds the stored text — the bound must
    // REFUSE (Long.MaxValue ⇒ the caller runs the exact count) rather than
    // under-bound and force-broadcast an over-cap model
    val v2dir = java.nio.file.Files.createTempDirectory("graft_v2pages").toString
    Tables.load(spark, sf, "documents").select("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .option("parquet.writer.version", "PARQUET_2_0")
      .parquet(s"$v2dir/documents.parquet")
    val conf = spark.sessionState.newHadoopConf()
    val f = new java.io.File(s"$v2dir/documents.parquet").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString), conf))
    val encs = try {
      import scala.jdk.CollectionConverters._
      reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        .filter(_.getPath.toDotString == "text").flatMap(_.getEncodings.asScala).toSet
    } finally reader.close()
    assert(encs.contains(org.apache.parquet.column.Encoding.DELTA_BYTE_ARRAY),
      s"precondition: v2 writer must emit DELTA_BYTE_ARRAY for text, got $encs")
    assert(Tables.metaTokenBound(spark, v2dir, "documents", "text") == Long.MaxValue,
      "a prefix-compressed column must refuse the footer bound")
  }

  test("trained-family oracle capture: running each query materializes its " +
      "trained state into a DuckDB oracle entry (literal lists, no Spark refs)") {
    val names = Seq("sim_ann_ivf", "sim_pq_topk", "sim_sq8_topk", "sim_ivf_pq",
      "sim_index_topk", "sim_pca_project")
    names.foreach(n => SparkEntry.queries(n)(spark, sf).collect())
    val oracles = SparkEntry.oracleSql
    names.foreach { n =>
      val sql = oracles.getOrElse(n,
        fail(s"$n must have an oracle entry after its query ran"))
      assert(sql.contains("["), s"$n oracle must embed literal trained state")
      assert(sql.toLowerCase.contains("from embeddings"),
        s"$n oracle must replay from the source table, not the Spark result")
    }
    // the capture reflects the trained state of the LAST run: re-running
    // the same query over the same corpus is deterministic, so the entry
    // is byte-stable (the driver re-executes queries before hashing)
    val before = oracles("sim_ann_ivf")
    SparkEntry.queries("sim_ann_ivf")(spark, sf).collect()
    assert(SparkEntry.oracleSql("sim_ann_ivf") == before,
      "deterministic trainer ⇒ byte-stable captured oracle")
  }

  test("ANN-LSH results are a subset of true neighbors' ranking universe") {
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, sf).collect()
    assert(ann.nonEmpty)
    // every reported cos must equal the exact cosine for that pair (re-rank is exact)
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ann.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-9)
      }
    }
  }

  test("IVF ANN: exact re-rank, bounded fanout, usable recall vs brute force") {
    val ivf = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    val perQ = ivf.groupBy(_.getLong(0))
    assert(perQ.values.forall(_.length <= 3))
    // re-rank is EXACT: every reported cos equals the brute-force cosine
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
    val bruteMap = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { r =>
      bruteMap.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-9)
      }
    }
    // probing 2 of the k cells recovers a usable share of true top-3
    val top3 = brute.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(-_.getDouble(2)).take(3).map(_.getLong(1)).toSet).toMap
    val hits = ivf.count(r => top3.get(r.getLong(0)).exists(_.contains(r.getLong(1))))
    val total = top3.values.map(_.size).sum
    assert(hits.toDouble / total >= 0.3, s"IVF recall ${hits.toDouble / total}")
  }

  test("PQ ANN: exact re-rank, compressed codes, usable recall vs brute force") {
    val pq = SparkEntry.queries("sim_pq_topk")(spark, sf).collect()
    assert(pq.nonEmpty)
    assert(pq.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    // re-rank is EXACT: every reported cos equals the brute-force cosine
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
    val bruteMap = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pq.foreach { r =>
      bruteMap.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-9)
      }
    }
    // 4x16-centroid codes + ADC top-16 candidates recover a usable share
    // of the true top-3
    val top3 = brute.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(-_.getDouble(2)).take(3).map(_.getLong(1)).toSet).toMap
    val hits = pq.count(r => top3.get(r.getLong(0)).exists(_.contains(r.getLong(1))))
    val total = top3.values.map(_.size).sum
    assert(hits.toDouble / total >= 0.3, s"PQ recall ${hits.toDouble / total}")
  }

  test("persisted IVF-PQ index: build once / query many, partition-pruned " +
      "probes, exact re-rank, usable recall") {
    import org.apache.spark.sql.functions.col
    import graft.spatial.{GeoTable, Snapshots}
    val idx = java.nio.file.Files.createTempDirectory("graft_vidx").toString + "/index"
    operators.Similarity.buildVectorIndex(spark, sf, idx)
    assert(operators.Similarity.indexValid(idx, sf))
    val r1 = operators.Similarity.queryVectorIndex(spark, sf, idx).collect()
    assert(r1.nonEmpty)
    assert(r1.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    // exact re-rank parity with brute force
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
    val bruteMap = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    r1.foreach { r =>
      bruteMap.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-9)
      }
    }
    val top3 = brute.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(-_.getDouble(2)).take(3).map(_.getLong(1)).toSet).toMap
    val hits = r1.count(r => top3.get(r.getLong(0)).exists(_.contains(r.getLong(1))))
    val total = top3.values.map(_.size).sum
    assert(hits.toDouble / total >= 0.25, s"index recall ${hits.toDouble / total}")
    // query AGAIN without rebuilding: trainer state loads from the table
    // properties — identical answer, zero retraining drift
    val r2 = operators.Similarity.queryVectorIndex(spark, sf, idx).collect()
    assert(r1.map(_.toString).sorted.toSeq == r2.map(_.toString).sorted.toSeq)
    // the inverted lists ARE partition dirs: a probed-cell literal filter
    // opens strictly fewer data files than the whole index
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.metrics("numFiles").value).sum
    }
    val full = GeoTable.read(spark, idx)
    val cell0 = full.select(col("cell")).distinct().limit(1).collect().head.getInt(0)
    val totalFiles = Snapshots.readManifest(idx).size.toLong
    val pruned = scannedFiles(GeoTable.read(spark, idx).filter(col("cell") === cell0))
    assert(pruned < totalFiles,
      s"probe filter must partition-prune the codes scan ($pruned/$totalFiles)")
  }

  test("IVF-PQ: composed index keeps exact re-rank and usable recall; " +
      "refactored IVF and PQ queries still agree with brute force") {
    val ivfpq = SparkEntry.queries("sim_ivf_pq")(spark, sf).collect()
    assert(ivfpq.nonEmpty)
    assert(ivfpq.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
    val bruteMap = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // re-rank is EXACT despite the PQ compression in the candidate stage
    ivfpq.foreach { r =>
      bruteMap.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-9)
      }
    }
    // cell-bounded + code-compressed candidates still recover a usable
    // share of the true top-3 (the compounding of the two approximations)
    val top3 = brute.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(-_.getDouble(2)).take(3).map(_.getLong(1)).toSet).toMap
    val hits = ivfpq.count(r => top3.get(r.getLong(0)).exists(_.contains(r.getLong(1))))
    val total = top3.values.map(_.size).sum
    assert(hits.toDouble / total >= 0.25, s"IVF-PQ recall ${hits.toDouble / total}")
    // every reported neighbor is also reachable by plain IVF with the
    // same coarse quantizer (cell routing really bounds the scan)
    val ivfAll = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfAll.nonEmpty)
  }

  test("SQ8 ANN: exact re-rank, per-dimension byte codes keep high recall") {
    val sq = SparkEntry.queries("sim_sq8_topk")(spark, sf).collect()
    assert(sq.nonEmpty)
    assert(sq.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
    val bruteMap = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // re-rank is EXACT: every reported cos equals the brute-force cosine
    sq.foreach { r =>
      bruteMap.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-9)
      }
    }
    // 256 levels PER dimension distort far less than PQ's shared
    // subspace centroids — SQ8 recall should beat the PQ floor clearly
    val top3 = brute.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(-_.getDouble(2)).take(3).map(_.getLong(1)).toSet).toMap
    val hits = sq.count(r => top3.get(r.getLong(0)).exists(_.contains(r.getLong(1))))
    val total = top3.values.map(_.size).sum
    assert(hits.toDouble / total >= 0.6, s"SQ8 recall ${hits.toDouble / total}")
  }

  test("BPE training: hand-checked merges; iteration #1 = pair-counts top-1") {
    // classic worked example: overlapping pairs count, greedy rewrite
    val merges = graft.operators.Curation.bpeTrain(
      Array(("aaab", 10L), ("ab", 5L)), 3)
    // round 1: (a,a) appears twice in "aaab" (overlapping) → 20
    assert(merges.head == ("a", "a", 20L))
    // after greedy left-to-right rewrite "aaab" → [aa, a, b]: pairs
    // (aa,a)=10, (a,b)=10+5 across both words → (a,b) wins
    assert(merges(1) == ("a", "b", 15L))
    // rewrite → [aa, ab] and [ab]; the only remaining pair is (aa, ab)
    assert(merges(2) == ("aa", "ab", 10L))
    // ties break lexicographically: (a,b) before (b,a) at equal freq
    val tied = graft.operators.Curation.bpeTrain(
      Array(("ab", 3L), ("ba", 3L)), 1)
    assert(tied.head == ("a", "b", 3L))
    // trained merge #1 on the corpus equals the oracle-checked
    // tokenizer_pair_counts top row (same dictionary-first counting)
    val first = SparkEntry.queries("tokenizer_bpe_train")(spark, sf).collect()
      .sortBy(_.getInt(0)).head
    val topPair = SparkEntry.queries("tokenizer_pair_counts")(spark, sf).collect().head
    assert(first.getString(1) + first.getString(2) == topPair.getString(0))
    assert(first.getLong(4) == topPair.getLong(1))
  }

  test("html extract and url dedup plan map-only / single-aggregate shapes") {
    // extraction is one codegen'd projection: no exchange anywhere
    val ex = SparkEntry.queries("text_html_extract")(spark, sf)
    assert(!ex.queryExecution.executedPlan.toString.contains("Exchange"),
      "html extract should be map-only")
    // url dedup: canonicalization is map-side; the only shuffle is the
    // single hash aggregate on the canonical key
    val ud = SparkEntry.queries("curate_url_dedup")(spark, sf)
    val plan = ud.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    // canonicalizer converges the planted variants: every canonical URL
    // is lowercase-host, fragment-free, utm-free
    val urls = ud.collect().map(_.getString(0))
    assert(urls.nonEmpty)
    urls.foreach { u =>
      assert(u.startsWith("https://src"), u)
      assert(!u.contains("#") && !u.contains("utm_") && !u.contains("WWW"), u)
      assert(!u.contains(":443"), u)
    }
  }

  test("mm_features is deterministic and correctly shaped") {
    val a = SparkEntry.queries("mm_features")(spark, sf).collect()
    val b = SparkEntry.queries("mm_features")(spark, sf).collect()
    assert(a.length == 500)
    val fa = a.map(r => (r.getLong(0), r.getString(2))).toMap
    b.foreach { r => assert(fa(r.getLong(0)) == r.getString(2)) }
    // digest carries 8 fixed-format feature values
    a.foreach(r => assert(r.getString(2).split(",").length == 8))
  }

  test("dedup clusters: near-dup pairs share a cluster; canonical = min id") {
    val labels = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 500)
    exact.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    // each cluster's canonical id is a member of the cluster
    assert(labels.values.toSet.forall(c => labels(c) == c))
    // keep-policy: docs where doc_id == cluster form the deduped corpus
    val kept = labels.count { case (id, c) => id == c }
    assert(kept == labels.values.toSet.size && kept < 500)
  }

  test("hot-shingle cap excludes hot keys from candidates but keeps exact jaccard") {
    import spark.implicits._
    // "alpha beta gamma" appears in EVERY doc (the hot run); each near-dup
    // pair additionally shares rare shingles
    val boiler = "alpha beta gamma"
    val docs = (0 until 12).map { i =>
      val pairId = i / 2 // docs 2k and 2k+1 are near-dups
      (i.toLong, s"$boiler unique$pairId word$pairId tail$pairId extra$i")
    }.toDF("doc_id", "text")
    val capped = graft.operators.TextPipeline.jaccardPairs(docs, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val uncapped = graft.operators.TextPipeline.jaccardPairs(docs, maxDf = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped.nonEmpty)
    // identical pair set AND identical exact jaccard values
    assert(capped == uncapped, s"capped=$capped uncapped=$uncapped")
  }

  test("ngram novelty: no shingle-keyed join (de-skewed), results equal the " +
      "naive full-df join-back on a hot-shingle fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.VectorSql.install(spark)
    // the jaccardPairs hot-shingle fixture: "alpha beta gamma" runs in
    // EVERY doc (the skew key the old join-back partitioned on)
    val boiler = "alpha beta gamma delta epsilon"
    val docs = (0 until 12).map { i =>
      val pairId = i / 2
      (i.toLong, s"$boiler unique$pairId word$pairId tail$pairId extra$i more$i")
    }.toDF("doc_id", "text")
    val got = graft.operators.TextPipeline.ngramNovelty(docs, 5)
    // naive reference: the r11 full-df join-back shape
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.VectorSql.shingle_hashes_n(col("text"), 5)).as("sh"))
    val dfc = sh.groupBy("sh").agg(count(lit(1)).as("ndocs"))
    val want = sh.join(dfc, Seq("sh")).groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_shingles"),
        sum(when(col("ndocs") === 1, 1L).otherwise(0L)).cast("int").as("unique_shingles"),
        round(avg(when(col("ndocs") === 1, 1.0).otherwise(0.0)), 4).as("novelty"))
    val g = got.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    val w = want.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(g == w, s"got=$g want=$w")
    assert(g.values.exists(_._2 > 0), "fixture must have unique shingles")
    // plan quality: the ONLY join is doc_id-keyed — a join on the raw
    // shingle column is the unbounded skew key this operator must avoid
    val joins = got.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 1, s"expected one doc_id join, got ${joins.size}")
    val cond = joins.head.condition.map(_.references.map(_.name).toSet).getOrElse(Set.empty)
    assert(cond.forall(_.startsWith("doc_id")) && !cond.exists(_.contains("sh")),
      s"join must be doc_id-keyed, got $cond")
  }

  test("text kernels run inside WholeStageCodegen (no interpreted fallback)") {
    // fallback=false makes janino compile errors throw instead of silently
    // reverting to the interpreted path
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      Seq("text_tokens", "text_quality", "text_langid", "text_repetition").foreach { q =>
        val df = SparkEntry.queries(q)(spark, sf)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("*("), s"$q should be whole-stage-codegen'd:\n$plan")
        assert(df.collect().length == 500)
      }
      // vector kernels: same check through the cosine top-k path
      assert(SparkEntry.queries("sim_cosine_topk")(spark, sf).collect().nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("pipeline single-pass ops contain no shuffle (map-only plans)") {
    Seq("text_tokens", "text_quality", "text_langid", "text_fingerprint", "mm_meta",
      "text_repetition", "text_quality_classifier")
      .foreach { q =>
        val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"$q should be map-only:\n$plan")
      }
    // pii_scrub carries Par.widen (measured 2x: three regex passes per row
    // dwarf one narrow-frame exchange) — the ONLY allowed exchange is that
    // leading round-robin repartition; the op itself must stay map-only
    val pii = SparkEntry.queries("text_pii_scrub")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pii.split("Exchange").length <= 2 && !pii.contains("hashpartitioning"),
      s"text_pii_scrub should shuffle only for the parallelism widen:\n$pii")
  }

  test("text_tokens_bpe: pre-tokenizer counts match hand-derived matches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // mirror the query's pattern on a constructed row with every branch:
    // contraction suffix, letter runs, digit run, punctuation run, ws runs
    val bpe = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"
    val got = Seq((1L, "it's 42 ok!"), (2L, "plain words"), (3L, "a1b2"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(bpe), lit(0))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // "it's 42 ok!" -> [it]['s][ 42][ ok][!]
    assert(got(1L) == 5, s"got ${got(1L)}")
    // "plain words" -> [plain][ words]
    assert(got(2L) == 2)
    // "a1b2" -> [a][1][b][2]
    assert(got(3L) == 4)
    // the full query: map-only, one row per doc, byte/ws counts consistent
    val df = SparkEntry.queries("text_tokens_bpe")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"text_tokens_bpe should be map-only:\n$plan")
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getInt(1) >= r.getInt(2), "BPE-ish tokens >= whitespace tokens")
      assert(r.getInt(3) > 0)
    }
  }

  test("text_gopher_filter: flags are 0/1, keep is their conjunction, gates agree") {
    val rows = SparkEntry.queries("text_gopher_filter")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val flags = (1 to 5).map(r.getInt)
      assert(flags.forall(f => f == 0 || f == 1))
      assert(r.getInt(6) == flags.product)
    }
    // ok_len must agree with the independently-computed token count
    val toks = SparkEntry.queries("text_tokens")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val n = toks(r.getLong(0))
      assert(r.getInt(1) == (if (n >= 20 && n <= 2000) 1 else 0))
    }
    // the gate must actually split the corpus (not vacuous)
    val kept = rows.count(_.getInt(6) == 1)
    assert(kept > 0 && kept < 500, s"gopher gate kept $kept of 500")
  }

  test("sim_centroid_assign: map-only plan; assignment matches brute force") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("sim_centroid_assign")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"centroid assignment should be one codegen'd scan:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 492) // 500 vectors minus the 8 centroids
    // brute-force oracle in-test: exact cosine against each centroid
    val e = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (vid, cid, c) =>
      val scored = (0L until 8L).map(k => k -> cos(e(vid), e(k)))
      val best = scored.maxBy { case (k, s) => (s, -k) }
      assert(best._1 == cid, s"vec $vid assigned $cid, brute force says ${best._1}")
      assert(math.abs(best._2 - c) < 1e-9, s"vec $vid cos $c vs ${best._2}")
    }
  }

  test("dedup_incremental: batch-vs-corpus pairs, cross-parity, exact jaccard") {
    val rows = SparkEntry.queries("dedup_incremental")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty, "fixture should plant cross-parity near-dups")
    // batch side is odd ids, corpus side even (the snapshot split)
    rows.foreach { case (b, c, jac) =>
      assert(b % 2 == 1 && c % 2 == 0, s"($b, $c) crosses the wrong way")
      assert(jac >= 0.4)
    }
    // every emitted pair is one of the full self-join's near-dup pairs
    // with the identical exact jaccard value
    val full = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))) -> r.getDouble(2)).toMap
    rows.foreach { case (b, c, jac) =>
      val k = (math.min(b, c), math.max(b, c))
      assert(full.get(k).exists(v => math.abs(v - jac) < 1e-9),
        s"pair $k jac $jac not in the full self-join (${full.get(k)})")
    }
    // and it finds EVERY cross-parity pair the full self-join knows
    val cross = full.keys.filter { case (a, b) => a % 2 != b % 2 }.toSet
    assert(rows.map { case (b, c, _) =>
      (math.min(b, c), math.max(b, c)) }.toSet == cross)
  }

  test("rep_stats kernel: exact counts incl. tokenizer boundary semantics") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a a a b"),            // top token a×3, bigram "a a"×2 of 3
      (2L, "x y x y x"),          // bigrams: "x y"×2, "y x"×2 of 4
      (3L, "unique words only"),  // all distinct
      (4L, " padded  with   runs "), // space-trimmed, runs collapse
      (5L, "\tlead"),             // leading non-space ws -> empty first token
      (6L, "CaSe case CASE"))     // lowercased before counting
      .toDF("doc_id", "text")
      .createOrReplaceTempView("rep_docs")
    val got = spark.sql(
      "SELECT doc_id, rep_stats(text) AS r FROM rep_docs ORDER BY doc_id")
      .selectExpr("doc_id", "r.n_tokens", "r.distinct_tokens", "r.top_tok_n", "r.top_bigram_n")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got(0) == ((1L, 4, 2, 3, 2)))
    assert(got(1) == ((2L, 5, 2, 3, 2)))
    assert(got(2) == ((3L, 3, 3, 1, 1)))
    assert(got(3) == ((4L, 3, 3, 1, 1)))
    // split(lower(trim(s)), "\\s+", -1) on "\tlead": trim strips SPACES
    // only, so the leading tab yields an empty boundary token
    assert(got(4) == ((5L, 2, 2, 1, 1)))
    assert(got(5) == ((6L, 3, 1, 3, 2)))
  }

  test("sim_kmeans_update: one Lloyd step; iterating it converges") {
    import org.apache.spark.sql.functions._
    // the query output is one (cell, dim) mean per centroid dimension
    val step = SparkEntry.queries("sim_kmeans_update")(spark, sf).collect()
    val k = step.map(_.getLong(0)).distinct.length
    assert(k >= 2 && k <= 8)
    assert(step.map(r => (r.getLong(0), r.getInt(1))).distinct.length == step.length)
    // every cell's mean vector has all 64 dims and a consistent count
    step.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (0 until 64))
      assert(rows.map(_.getLong(3)).distinct.length == 1)
    }
    // iterate the same update driver-side: within-cluster cost (1 - cos
    // to assigned centroid, summed) must be non-increasing across Lloyd
    // iterations — the convergence property the distributed step must
    // preserve to be a usable trainer
    val e = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    var cents: Map[Long, Array[Double]] = (0L until 8L).map(i => i -> e(i)).toMap
    def assign(v: Array[Double]) =
      cents.toSeq.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }
    val costs = (0 until 4).map { _ =>
      val asg = e.toSeq.map { case (id, v) => (assign(v)._1, v) }
      val cost = asg.map { case (c, v) => 1.0 - cos(v, cents(c)) }.sum
      cents = asg.groupBy(_._1).map { case (c, vs) =>
        val m = new Array[Double](64)
        vs.foreach { case (_, v) => for (i <- 0 until 64) m(i) += v(i) }
        c -> m.map(_ / vs.length)
      }
      cost
    }
    costs.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9, s"$costs") }
  }

  test("new corpus ops keep scale-shaped plans: top-k heap, hash joins only") {
    // BPE pair counting must plan as partial-aggregated counts feeding a
    // per-partition top-k heap (TakeOrdered), never a global sort of the
    // full pair histogram
    val bpe = SparkEntry.queries("text_bpe_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(bpe.contains("TakeOrderedAndProject"), s"expected top-k heap:\n$bpe")
    assert(!bpe.matches("(?s).*Sort \\[n.*DESC.*global=true.*"),
      s"top-50 must not globally sort the histogram:\n$bpe")
    // span dedup joins by span hash — any nested-loop/cartesian shape
    // means the hash-keyed discipline broke
    val span = SparkEntry.queries("dedup_span_exact")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!span.contains("CartesianProduct") && !span.contains("BroadcastNestedLoop"),
      s"span dedup must stay hash-keyed:\n$span")
    // kmeans update: assignment is map-side (no join); the only exchange
    // feeds the (cell, dim) aggregate
    val km = SparkEntry.queries("sim_kmeans_update")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!km.contains("Join"), s"assignment must fold centroids into the scan:\n$km")
  }

  test("PCA projection: components decorrelate, variance descends, " +
      "projection is map-only, and reruns are bit-identical") {
    val q = SparkEntry.queries("sim_pca_project")(spark, sf)
    val rows = q.collect()
    val k = rows.head.length - 1
    val n = rows.length.toDouble
    val cols = (0 until k).map(c => rows.map(_.getDouble(c + 1)))
    val means = cols.map(_.sum / n)
    def cov(a: Int, b: Int): Double =
      cols(a).zip(cols(b)).map { case (x, y) => (x - means(a)) * (y - means(b)) }.sum / n
    val vars = (0 until k).map(c => cov(c, c))
    // variance descends component-to-component
    vars.sliding(2).foreach { case Seq(hi, lo) =>
      assert(hi >= lo - 1e-9, s"variance must descend: $vars")
    }
    assert(vars.head > 0, "first component must carry variance")
    // off-diagonal covariance ~ 0 relative to the component scales
    for (a <- 0 until k; b <- (a + 1) until k) {
      val rel = math.abs(cov(a, b)) / math.sqrt(vars(a) * vars(b) + 1e-300)
      assert(rel < 0.01, s"components $a,$b correlate: rel=$rel")
    }
    // centered: projected means ~ 0
    means.foreach(m => assert(math.abs(m) < 1e-3, s"projection must center: $means"))
    // the projection stage is map-only over the scan (the Gram pass is a
    // separate bounded job at build time)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must be map-only:\n$plan")
    // determinism: the driver re-executes queries for hashing
    val again = SparkEntry.queries("sim_pca_project")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "PCA projection must be bit-identical run-to-run")
  }

  test("PCA bounded fan-in: >1024 input partitions route through the coalesce " +
      "combine level, and rounded projections match the flat-collect answer") {
    // 1500 two-row partitions force the fan-in path (FanIn = 1024); the
    // same rows in 8 partitions take the flat path — rounded projections
    // must agree (the determinism contract under partition-layout change)
    val wide = spark.range(0, 3000, 1, 1500)
      .selectExpr("id AS vec_id",
        "transform(sequence(0, 63), i -> cast((id * 37 + i * i) % 101 AS DOUBLE) / 101) AS v")
    val narrow = spark.range(0, 3000, 1, 8)
      .selectExpr("id AS vec_id",
        "transform(sequence(0, 63), i -> cast((id * 37 + i * i) % 101 AS DOUBLE) / 101) AS v")
    val a = graft.operators.Similarity.pcaProject(wide, 64, 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getDouble)).toMap
    val b = graft.operators.Similarity.pcaProject(narrow, 64, 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getDouble)).toMap
    assert(a.size == 3000 && a == b,
      "fan-in combine must not change the rounded projection")
    // and reruns of the fan-in path itself stay bit-identical
    val a2 = graft.operators.Similarity.pcaProject(wide, 64, 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getDouble)).toMap
    assert(a == a2, "fan-in PCA must be deterministic run-to-run")
  }

  test("domain cap: salted two-phase top-K equals the single-window answer, " +
      "and no single-partition stage touches the data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val capped = SparkEntry.queries("curate_domain_cap")(spark, sf)
    // direct single-window construction (what a mega-domain could NOT run)
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    val direct = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
    assert(capped.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet,
      "two-phase salted top-K must be EXACTLY the single-window top-K")
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"per-domain cap must never gather to one partition:\n$plan")
  }

  test("tokenizer pair counts: pairs come from the word DICTIONARY, not the corpus; " +
      "top-k is a heap, not a global sort") {
    val q = SparkEntry.queries("tokenizer_pair_counts")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k heap:\n$plan")
    // the dictionary-first shape shows as an aggregate (word freq) BELOW
    // the pair-explode generator: the generator's input must carry the
    // aggregated freq column, not raw text
    val gen = plan.linesIterator.filter(_.contains("Generate")).mkString("\n")
    assert(gen.contains("freq"), s"pair explode must run over the word dictionary:\n$plan")
    // hand-check one pair count: 'er' in word w contributes freq(w) per occurrence
    val er = q.collect().find(_.getString(0) == "er")
    val words = graft.Tables.load(spark, sf, "documents")
      .selectExpr("explode(split(lower(trim(text)), '\\\\s+')) AS word")
      .where("length(word) >= 2").collect().map(_.getString(0))
    val expected = words.map(w => (0 until w.length - 1).count(i => w.substring(i, i + 2) == "er").toLong).sum
    // (guard: 'er' could fall outside the top-100 on a tiny corpus)
    er.foreach(r => assert(r.getLong(1) == expected,
      s"er count mismatch: got ${r.getLong(1)}, expected $expected"))
    assert(q.count() > 0)
  }

  test("mm_phash_dedup groups exact and near payload duplicates (planted) " +
      "and the LSH band join is exact for hamming <= 7") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_phash").toString
    // 640-byte payloads over 64 blocks of 10 bytes: 'z' blocks sit above
    // the payload mean, 'a' blocks below → a crisp 32-ones bit pattern
    val base = ("z" * 10) * 32 + ("a" * 10) * 32
    val near = ("z" * 10) * 33 + ("a" * 10) * 31 // ONE block flipped → hamming 1
    val far = "m" * 640 // uniform → all bits 0 → hamming 32 from base
    Seq((1L, base), (2L, base), (3L, near), (4L, far))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("mm_phash_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) == (1L, false), s"canonical self: ${out(1L)}")
    assert(out(2L) == (1L, true), "exact duplicate must collapse to the rep")
    assert(out(3L) == (1L, true), "hamming-1 near duplicate must be caught")
    assert(out(4L) == (4L, false), "a distant payload must stay canonical")
  }
}
