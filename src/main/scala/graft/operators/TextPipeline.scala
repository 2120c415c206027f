package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorSql

/** Text-analysis + deduplication operators for a training-data pipeline over
  * the `documents` table. All single-pass shapes are pure codegen'd column
  * expressions (no UDFs); the pairwise dedups are expressed as shingle
  * self-joins so they scale as shuffles, never driver-side loops.
  *
  * Scale posture (100 TB): tokenize/fingerprint/quality are map-only —
  * they pipeline inside WholeStageCodegen with zero shuffles. The dedup
  * family shuffles on shingle/band/chunk keys whose cardinality grows with
  * corpus size (no global broadcast); hot shingles (stopword runs) are the
  * known skew risk and are capped by document frequency in
  * `dedup_ngram_jaccard` (excluded from candidate generation, re-counted
  * exactly for surviving pairs).
  */
object TextPipeline {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-(tag, sfDir) scratch table dir, wiped per invocation so bench /
    * verify re-runs are deterministic. Keyed on GeoQueries' md5 path
    * digest, NOT String.hashCode — colliding 32-bit input dirs would
    * share one scratch table and concurrent invocations could interleave
    * (the r14 GeoQueries finding; this seat was missed).
    */
  private def scratch(tag: String, dir: String): String = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_${tag}_${GeoQueries.pathDigest(dir)}")
    if (f.exists()) {
      graft.spatial.Snapshots.walkDir(f.toPath)(_.toSeq).reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    f.getAbsolutePath
  }

  private def docs(s: SparkSession, dir: String): DataFrame = {
    VectorSql.install(s)
    // NULL-text documents are NOT text: excluded on BOTH engines (the
    // paired oracles drop them too) — a NULL row would otherwise diverge
    // per query (kernels emit null rows, SQL unnest drops them)
    Tables.load(s, dir, "documents").filter(col("text").isNotNull)
  }

  /** SIZE-GATE a corpus-derived model frame that must already be
    * checkpointed: broadcast below the row cap (the reference-model
    * shape — at 100 TB these models train ONCE on a bounded reference
    * corpus), shuffled join above it (a corpus-TRAINED vocabulary is
    * unbounded at web scale — billions of distinct tokens — and a forced
    * broadcast there is a driver OOM, not a plan; AQE may still pick
    * broadcast from runtime stats). The curate_dsir_weights /
    * boilerplate-scrub posture, one seat for the three LM-model queries.
    */
  private def sizeGatedModel(s: SparkSession, dir: String, ck: DataFrame): DataFrame = {
    val key = "spark.sql.graft.text.broadcast-max-model-rows"
    val mx = s.conf.getOption(key).map { v =>
      try v.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be a count, got '$v'")
      }
    }.getOrElse(1000000L)
    // metadata PRE-gate: the corpus footers bound the vocab (distinct
    // tokens <= text bytes / 2 + rows, zero jobs) — a small corpus skips
    // the exact count job entirely; only a corpus whose BOUND exceeds the
    // cap pays the count to decide precisely (trivial next to the scoring
    // join it guards; `ck` arrives checkpointed, so the count job scans
    // materialized blocks — for domain_drift's |sources|x|vocab| st frame
    // that count is a small shuffle over dictionary rows, still
    // vocab-bounded)
    if (Tables.metaTokenBound(s, dir, "documents", "text") <= mx ||
      ck.count() <= mx) broadcast(ck) else ck
  }

  private def toks: Column = split(lower(trim(col("text"))), "\\s+")

  /** distinct word-3-gram shingles per doc (needs >= 3 tokens), as 64-bit
    * HASHES from the one-pass codegen'd `shingle_hashes` kernel: no regex
    * split, no concat'd shingle strings, per-doc dedup inside the kernel —
    * so no DISTINCT exchange here — and every downstream join/groupBy
    * shuffles longs instead of strings. Hash identity stands in for
    * shingle equality (collision ~n²/2⁶⁵ — the xxhash64 contract this
    * pipeline already carries; the DuckDB oracles compare COUNTS, which
    * collisions would perturb only at those odds).
    */
  private def shingles(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(VectorSql.shingle_hashes(col("text"))).as("s"))

  /** In-JVM content-stamped upper bound on the corpus-wide MAXIMUM 3-gram
    * shingle document frequency — the metadata-level pre-gate for the
    * hot-shingle df pass (r19, VERDICT r18 next #2). Per input FILE the
    * sketch takes max_s df_f(s) (the within-file df of that file's most
    * repeated shingle); since every shingle is distinct per doc (kernel
    * contract), the global df decomposes as df(s) = Σ_f df_f(s), so
    * Σ_f max_s df_f(s) bounds max_s df(s) from above. When that bound is
    * ≤ maxDf NO shingle can cross the cap and [[jaccardPairs]] skips the
    * exact df aggregate + emptiness probe outright (plan-provably
    * identical: the skipped sub-DAG only ever fed the hasHot=false
    * branch). Keyed on the corpus CONTENT stamp — the vector-index /
    * grid-warehouse freshness seat — so any regeneration recomputes.
    *
    * Deliberately memo-ONLY, no disk layer: the input is driver-written
    * plain parquet (no custom footer stats to ride), and persisting a
    * corpus-derived sidecar would blur the no-persisted-intermediates
    * line for a number one unshuffled aggregate recomputes per process.
    * Cost: ONE job, map-side-combined (file, shingle-hash) counts — the
    * same order of work as the df pass it replaces, paid once per
    * (process, corpus) instead of once per query invocation. The bench
    * does NOT pre-build it in the untimed warmup: the first dedup
    * query's COLD number carries the build honestly (it is not a
    * persisted artifact, so "once per ingest" is really "once per
    * process"), and the warm passes measure the memo-served steady
    * state.
    */
  private[graft] val dfBoundMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private[graft] def shingleDfBound(s: SparkSession, dir: String): Long = {
    val fp = graft.Stamps.tableFingerprint(Seq(s"$dir/documents.parquet"))
    dfBoundMemo.computeIfAbsent(fp, _ =>
      docs(s, dir)
        .select(input_file_name().as("f"),
          explode(VectorSql.shingle_hashes(col("text"))).as("sh"))
        .groupBy(col("f"), col("sh")).agg(count(lit(1)).as("dff"))
        .groupBy(col("f")).agg(max(col("dff")).as("m"))
        .agg(coalesce(sum(col("m")), lit(0L)))
        .first().getLong(0))
  }

  /** Jaccard near-dup pairs (jac >= 0.4) with the hot-shingle candidate
    * cap: shingles in more than `maxDf` documents are excluded from the
    * candidate self-join (the skew key), then re-counted exactly for the
    * surviving pairs — reported values are identical to the uncapped
    * computation for every pair that shares at least one sub-cap shingle.
    * Exposed for the cap spec.
    *
    * `dfBound`: optional [[shingleDfBound]] upper bound on the max
    * shingle df. When it proves `<= maxDf`, the exact df pass cannot find
    * a hot shingle and is skipped (same plan as the measured-empty hot
    * set); when it can't prove, the exact pass runs unchanged — the
    * fallback direction, pinned by OptimizationR19Spec.
    *
    * Contract: what the cap trades away is RECALL on hot-only pairs — a
    * pair whose common shingles are ALL above `maxDf` (e.g. documents made
    * entirely of shared boilerplate) never becomes a candidate. Reported
    * Jaccard values for emitted pairs are always exact. With the default
    * `maxDf = max(64, N/8)` a shingle must appear in >12.5% of the corpus
    * to be capped, so any pair at jac >= 0.4 that is NOT pure boilerplate
    * still shares rarer shingles and is found; corpora where that
    * assumption fails should route through `dedup_minhash`, whose banding
    * is df-insensitive.
    */
  private[graft] def jaccardPairs(d: DataFrame, maxDf: Long,
      dfBound: Option[Long] = None): DataFrame = {
    // the shingle frame feeds THREE branches (df counts, candidate
    // generation, hot re-count); un-materialized, every branch re-ran
    // tokenize+explode+distinct — 14 corpus scans in the final plan, zero
    // exchange reuse (one side always sat under a broadcast). One eager
    // localCheckpoint = one scan; blocks feed every branch (at 100 TB the
    // same shape persists the shingle frame to cluster storage once).
    // The per-doc shingle count rides ALONG each shingle row (`n` is
    // map-side arithmetic on the same kernel array) instead of being a
    // separate groupBy(doc_id) frame: the old shape joined the
    // million-plus-row candidate-pair aggregate against that sz frame
    // TWICE — two extra shuffles of the widest frame in the query — where
    // a functionally-dependent grouping column costs 8 bytes per shingle
    // row and nothing downstream.
    // widen FIRST: the checkpoint freezes whatever partitioning it sees,
    // and a single-file scan would pin the self-join probe to one core
    val sh = Par.widen(d).withColumn("h", VectorSql.shingle_hashes(col("text")))
      .select(col("doc_id"), size(col("h")).as("n"), explode(col("h")).as("s"))
      .localCheckpoint(true)
    // hot shingles are few by construction (df > maxDf) — checkpoint the
    // tiny frame so (a) the broadcast below re-reads blocks and (b) the
    // emptiness probe is metadata-cheap. When NO shingle crosses the cap
    // (the common case off boilerplate-free corpora) the whole hot
    // re-count sub-DAG — two joins and an aggregate over the candidate
    // frame — drops out of the plan instead of running against an empty
    // broadcast. The [[shingleDfBound]] pre-gate (r19) can prove that
    // emptiness from the content-stamped sketch, dropping the df
    // aggregate + probe too — identical plan to the measured-empty case.
    val hotOpt: Option[DataFrame] =
      if (dfBound.exists(_ <= maxDf)) None
      else {
        val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("s")).localCheckpoint(true)
        if (hot.isEmpty) None else Some(hot)
      }
    val rare = hotOpt match {
      case Some(hot) => sh.join(broadcast(hot), Seq("s"), "left_anti")
      case None => sh
    }
    // candidate pairs by SELF-JOIN on the shingle hash: the checkpoint
    // above makes this safe (round 3's self-join pathology was the whole
    // shingle pipeline recomputing under a broadcast — a materialized
    // frame just re-reads blocks), and fully-codegen'd join + count beats
    // per-bucket collect_list + interpreted higher-order pair expansion
    // by ~40% measured. The df cap still bounds the join's per-key fanout.
    val pairs = rare.as("a").join(rare.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(count(lit(1)).as("common_rare"))
    // exact common counts: add hot-shingle matches for candidates only
    val withCommon = hotOpt match {
      case Some(hot) =>
        val shHot = sh.join(broadcast(hot), Seq("s"))
        val hotCommon = pairs.select(col("d1"), col("d2"))
          .join(shHot.as("x"), col("d1") === col("x.doc_id"))
          .join(shHot.as("y"), col("d2") === col("y.doc_id") && col("x.s") === col("y.s"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("common_hot"))
        pairs.join(hotCommon, Seq("d1", "d2"), "left")
          .withColumn("common", col("common_rare") + coalesce(col("common_hot"), lit(0L)))
      case None => pairs.withColumn("common", col("common_rare"))
    }
    withCommon
      .withColumn("jac", col("common") / (col("n1") + col("n2") - col("common")))
      .filter(col("jac") >= 0.4)
      .select(col("d1"), col("d2"), round(col("jac"), 4).as("jac"))
  }

  /** Per-doc n-gram novelty: the fraction of a doc's 5-gram shingles
    * that appear in NO other document. The r11 shape joined the full
    * shingle frame back to its df aggregate on the RAW shingle key — the
    * unbounded skew key `jaccardPairs` df-caps (a stopword-run shingle
    * present in every doc lands its whole left side in one partition at
    * 100 TB). This shape has NO shingle-keyed join at all: `min(doc_id)`
    * rides the df aggregate, so a df=1 shingle already knows its only
    * document; the unique-per-doc counts come from regrouping the
    * (df=1)-filtered AGGREGATE — a frame with one row per distinct
    * shingle, hot keys already collapsed map-side — and the only join is
    * doc_id-keyed (skew-free: one row per doc per side).
    */
  private[graft] def ngramNovelty(d: DataFrame, n: Int): DataFrame = {
    // NO checkpoint and NO widen: both consumers are aggregations that
    // shuffle anyway (map-side combined), so materializing the exploded
    // frame — or round-robin-shuffling the full text first — only adds
    // IO (measured +0.5 s at sf0.1); recomputing the map-only shingle
    // explode per branch is cheaper than storing it
    val sh = d.select(col("doc_id"),
      explode(VectorSql.shingle_hashes_n(col("text"), n)).as("sh"))
    val perDoc = sh.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_shingles"))
    val uniqPerDoc = sh.groupBy("sh")
      .agg(count(lit(1)).as("ndocs"), min(col("doc_id")).as("only_doc"))
      .filter(col("ndocs") === 1)
      .groupBy(col("only_doc").as("doc_id"))
      .agg(count(lit(1)).cast("int").as("unique_shingles"))
    perDoc.join(uniqPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("unique_shingles"), lit(0)).as("unique_shingles"),
        round(coalesce(col("unique_shingles"), lit(0)) / col("n_shingles"), 4)
          .as("novelty"))
  }

  /** Connected components over the near-dup pair graph by iterative
    * min-label propagation (one join + agg per round, lineage truncated
    * per round, converges in O(cluster diameter) rounds — tiny for dup
    * clusters). Every doc gets cluster = smallest reachable doc_id;
    * keeping rows where doc_id == cluster is the dedup KEEP policy.
    */
  /** Edge-count ceiling for the driver-local terminal solve: 4M edges =
    * 64 MB of packed longs — comfortably broadcast-sized. NOT a coverage
    * cap: graphs above it route through the distributed loop below.
    */
  private val LocalSolveMaxEdges = 4L * 1000 * 1000

  /** Default hot-shingle df cap: >12.5% of the corpus means stopword-run
    * shingles, the unbounded skew key of the self-join at scale. Footer
    * row count only (driver-side, no scan). ONE definition — four query
    * closures share this contract, and the recall trade-off comment on
    * [[jaccardPairs]] documents it.
    */
  private def defaultMaxDf(s: SparkSession, dir: String): Long =
    math.max(64L, graft.Tables.metaRowCount(s, dir, "documents") / 8)

  /** Min-label connected components over the EDGE-CONNECTED vertices
    * only, as ((doc_id, cluster) frame, broadcastable): the local
    * union-find under the edge budget (broadcastable by the same bound
    * that admitted the collect), the iterative pointer-doubling
    * propagation above it (unbounded — no hint; AQE decides from runtime
    * size). Shared core of [[clusterLabels]] (which rejoins isolated
    * docs as their own cluster) and the r19 keep-policy complement
    * [[dupLosers]].
    */
  private def connectedLabels(d: DataFrame, maxDf: Long,
      dfBound: Option[Long]): (DataFrame, Boolean) = {
    val pairs = jaccardPairs(d, maxDf, dfBound).select(col("d1"), col("d2"))
      .localCheckpoint(true)
    // The near-dup pair graph is SMALL relative to the corpus by
    // construction (each edge is a >=0.4-Jaccard duplicate pair — a
    // corpus that is mostly duplicate of itself has already left dedup
    // territory), so the standard two-phase connected-components design
    // applies: solve locally (union-find over the collected edge list)
    // once the materialized edge count fits a broadcast-sized budget, and
    // keep the iterative distributed propagation as the path for graphs
    // that don't. GraphFrames' CC runs the same terminal local step once
    // the contracted graph fits; this is that shape with one phase,
    // size-gated on the exact count the checkpoint just made free. The
    // win is real at every scale: the loop costs O(diameter) jobs of
    // 3 stages each, pure scheduling overhead when the graph is tiny.
    val edgeCount = pairs.count()
    if (edgeCount <= LocalSolveMaxEdges) {
      // honest memory math for the gate: the edges come back as PACKED
      // LONGS (one Array[Long] per partition — 16 B/edge, 64 MB at the
      // 4M gate), never as collect()ed Row objects (~100 B/edge, a
      // ~400 MB transient spike); the union-find map is the remaining
      // boxed cost (≤ 2·edges entries ≈ 60 B each, ~480 MB worst case) —
      // the gate is sized for a driver with gigabytes, not the default
      // heap, which is why the distributed loop below exists at all
      val chunks: Array[Array[Long]] = pairs.rdd.mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { r => buf += r.getLong(0); buf += r.getLong(1) }
        Iterator.single(buf.result())
      }.collect()
      val parent = new java.util.HashMap[Long, Long](
        math.min(edgeCount * 2, Int.MaxValue / 2).toInt)
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x
        while (parent.getOrDefault(c, c) != c) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
        r
      }
      chunks.foreach { chunk =>
        var i = 0
        while (i < chunk.length) {
          val (a, b) = (find(chunk(i)), find(chunk(i + 1)))
          if (a != b) { if (a < b) parent.put(b, a) else parent.put(a, b) }
          i += 2
        }
      }
      import scala.jdk.CollectionConverters._
      val touched = parent.keySet.asScala.toSet ++ parent.values.asScala
      val resolved = touched.toSeq.map(v => (v, find(v)))
      val spark = d.sparkSession
      import spark.implicits._
      val connected = resolved.toDF("doc_id", "cluster")
      return (connected, true)
    }
    val edges = pairs.union(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .localCheckpoint(true)
    // propagate ONLY over edge-connected vertices: isolated docs are their
    // own cluster by definition, and at any realistic near-dup rate they
    // are the overwhelming majority of the corpus — having them ride every
    // round's join + groupBy multiplies each round's shuffle by N/|V|
    // for rows whose label can never change. They rejoin at the end.
    var labels = edges.select(col("d1").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster")).localCheckpoint(true)
    // (row count, label checksum): labels only ever DECREASE under min-
    // propagation, so an unchanged (count, xor-of-hash) pair across rounds
    // means a fixed point — no second join+count job per round. bit_xor
    // (not sum) so the agg can't overflow under ANSI mode. A 64-bit
    // checksum collision between rounds would exit one round early
    // (astronomically unlikely: 2^-64 per round, and the NEXT round's
    // identical checksum would still terminate at the true fixed point).
    def checksum(l: DataFrame): (Long, Long) = {
      val r = l.agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id, cluster))")).first()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = checksum(labels)
    var changed = true
    var iter = 0
    while (changed) {
      val viaNeighbor = edges.join(labels, edges("d2") === labels("doc_id"))
        .select(edges("d1").as("doc_id"), col("cluster"))
      // POINTER DOUBLING (label-of-label): halves the remaining distance
      // to the component minimum each round, so rounds = O(log diameter)
      // — neighbor propagation alone is O(diameter) and a chain-shaped
      // component longer than any fixed cap would exit unconverged,
      // silently splitting one duplicate cluster into several
      val viaLabel = labels.as("a").join(labels.as("b"),
          col("a.cluster") === col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"), col("b.cluster").as("cluster"))
      val next = labels.unionByName(viaNeighbor).unionByName(viaLabel)
        .groupBy(col("doc_id")).agg(min(col("cluster")).as("cluster"))
        .localCheckpoint(eager = false)
      // ONE action per round: the checksum agg materializes the lazy
      // checkpoint (truncating lineage for the next round) AND detects
      // convergence in the same job.
      val cur = checksum(next)
      changed = cur != prev
      prev = cur
      labels = next
      iter += 1
      // with doubling, 64 rounds covers diameters beyond any physical
      // graph; hitting the cap means a bug, and a LOUD failure beats
      // returning labels that silently split a duplicate cluster
      if (changed && iter >= 64) throw new IllegalStateException(
        s"connected-components propagation did not converge after $iter rounds")
    }
    (labels, false)
  }

  private[graft] def clusterLabels(d: DataFrame, maxDf: Long,
      dfBound: Option[Long] = None): DataFrame = {
    val (core, small) = connectedLabels(d, maxDf, dfBound)
    val coreIds = core.select(col("doc_id"))
    // isolated docs: cluster = self (one anti-join, not O(rounds) of them)
    d.select(col("doc_id"))
      .join(if (small) broadcast(coreIds) else coreIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster"))
      .unionByName(core)
  }

  /** doc_ids that LOSE the near-dup keep policy — edge-connected docs
    * whose component minimum is a DIFFERENT doc (r19). The tiny
    * complement of clusterLabels' keep set: a keep-policy consumer that
    * only needs "is this doc its cluster's canonical?" anti-joins this
    * frame instead of inner-joining the CORPUS-sized labels frame — at
    * scale that swaps a corpus⋈corpus doc_id join for corpus⋈(dup
    * count), and drops the isolated-docs anti-join + union entirely
    * (isolated docs are never losers by definition). Returns
    * (frame, broadcastable) with the same hint discipline as the labels
    * path.
    */
  private[graft] def dupLosers(d: DataFrame, maxDf: Long,
      dfBound: Option[Long] = None): (DataFrame, Boolean) = {
    val (core, small) = connectedLabels(d, maxDf, dfBound)
    (core.filter(col("cluster") =!= col("doc_id")).select(col("doc_id")), small)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting (whitespace tokenizer; one-pass kernel, no token array)
    "text_tokens" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        VectorSql.text_stats(col("text"), typedlit(Seq.empty[String]))
          .getField("n_tokens").as("n_tokens"))
    }),

    // quality scoring: punctuation / stopword / token-length signals — all
    // four outputs derive from ONE text_stats pass (codegen CSE dedups the
    // struct call after Project collapse)
    "text_quality" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("st", VectorSql.text_stats(col("text"), typedlit(stopwords)))
        .select(col("doc_id"),
          col("st.n_tokens").as("n_tokens"),
          col("st.punct_n").as("punct_n"),
          round(col("st.stop_hits") / col("st.n_tokens"), 4).as("stop_ratio"),
          round(col("st.nonws_len") / col("st.n_tokens"), 4).as("avg_tok_len"))
    }),

    // BPE merge-candidate counting — the first step of vocabulary
    // induction (byte-pair / WordPiece training): corpus-wide frequencies
    // of ADJACENT token pairs, top candidates by count. One explode +
    // one partially-aggregated groupBy + TakeOrdered — at 100 TB the
    // pair counts combine map-side and only the top-k heap crosses the
    // wire per partition. (Full BPE training iterates this with merges
    // applied; each round is exactly this query over the rewritten
    // corpus.)
    "text_bpe_pairs" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("tk", split(lower(trim(col("text"))), "\\s+"))
        .select(explode(expr(
          """transform(slice(tk, 1, greatest(size(tk) - 1, 0)),
            | (x, i) -> concat(x, ' ', tk[i + 1]))""".stripMargin)).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(50)
    }),

    // exact-substring span dedup report (the within-corpus repeated-span
    // detection of "Deduplicating Training Data Makes Language Models
    // Better": long token spans appearing verbatim in 2+ documents are
    // cut candidates). Spans are DISTINCT word-8-gram rolling hashes from
    // the one-pass kernel; span document-frequency comes from one
    // hash-keyed aggregate and joins back by span hash — never an
    // all-pairs comparison, so the shape survives corpus scale (the same
    // df-keyed discipline as the jaccard candidate join). Output: per-doc
    // span counts + fraction of spans shared with another document.
    "dedup_span_exact" -> ((s, dir) => {
      val d = docs(s, dir)
      // NO span-keyed join back (r18): a doc's dup-span count is its span
      // count minus its UNIQUE-span count, and a df=1 span already knows
      // its only document — min(doc_id) rides the df aggregate (the
      // ngramNovelty construction). The old shape joined the full span
      // frame against its df aggregate on the span hash — the widest
      // join in the query, on the key class the df-cap discipline exists
      // for (hot boilerplate spans). Now the span frame only ever
      // AGGREGATES (map-side combined, hot keys collapse before the
      // wire) and the one join is doc_id-keyed, one row per doc per
      // side. No checkpoint either — both consumers aggregate, so
      // recomputing the map-only explode per branch beats materializing
      // it (the measured ngramNovelty trade).
      // sp is distinct per (doc, span) by kernel construction, so the
      // span's row count IS its document frequency
      val sp = d.select(col("doc_id"),
        explode(VectorSql.shingle_hashes_n(col("text"), 8)).as("s"))
      val perDoc = sp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
      val uniqPerDoc = sp.groupBy(col("s"))
        .agg(count(lit(1)).as("nd"), min(col("doc_id")).as("only_doc"))
        .filter(col("nd") === 1)
        .groupBy(col("only_doc").as("doc_id"))
        .agg(count(lit(1)).as("n_uniq"))
      perDoc.join(uniqPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          (col("n_spans") - coalesce(col("n_uniq"), lit(0L))).as("n_dup_spans"))
        .withColumn("dup_ratio", round(col("n_dup_spans") / col("n_spans"), 4))
    }),

    // linear quality-classifier INFERENCE (the fasttext/CCNet-style gate a
    // pretraining pipeline runs after heuristic filters): each token maps
    // through the hashing trick to a weight, the document score is
    // sigmoid(mean token weight), label = score >= 0.5. Map-only and fully
    // codegen'd — at 100 TB this is one scan with the weight table as
    // broadcast state. A real deployment broadcasts a LEARNED weight
    // array; here the weight of a token is derived deterministically from
    // its md5 (two hex chars -> integer -> [-1, 1) bucket value) so the
    // DuckDB oracle reproduces the identical model — the plumbing (tokener
    // -> hashed lookup -> mean -> sigmoid) is exactly the deployed shape.
    "text_quality_classifier" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("w", expr(
          """transform(split(lower(trim(text)), '\\s+'),
            | t -> ((ascii(substr(md5(encode(t, 'UTF-8')), 1, 1)) * 256
            |        + ascii(substr(md5(encode(t, 'UTF-8')), 2, 1))) % 200 - 100)
            |      / 100.0d)""".stripMargin))
        .withColumn("score", round(
          lit(1.0) / (lit(1.0) + exp(-(expr("aggregate(w, 0.0d, (a, x) -> a + x)")
            / size(col("w"))))), 6))
        .select(col("doc_id"), col("score"),
          (col("score") >= 0.5).cast("int").as("keep"))
    }),

    // language-ID: stopword-profile heuristic (argmax of profile hits);
    // all four profiles counted in a single tokenizer pass
    "text_langid" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("h", VectorSql.lang_hits(col("text"), typedlit(Seq(
          Seq("the", "a", "of", "and"), Seq("el", "la", "de", "y"),
          Seq("le", "les", "et", "une"), Seq("der", "die", "und", "das")))))
        .withColumn("en_hits", col("h").getItem(0))
        .withColumn("es_hits", col("h").getItem(1))
        .withColumn("fr_hits", col("h").getItem(2))
        .withColumn("de_hits", col("h").getItem(3))
        .withColumn("pred_lang",
          when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits") &&
            col("en_hits") >= col("de_hits") && col("en_hits") > 0, "en")
            .when(col("es_hits") >= col("fr_hits") && col("es_hits") >= col("de_hits") &&
              col("es_hits") > 0, "es")
            .when(col("fr_hits") >= col("de_hits") && col("fr_hits") > 0, "fr")
            .when(col("de_hits") > 0, "de")
            .otherwise("und"))
        .select(col("doc_id"), col("pred_lang"), col("en_hits"), col("es_hits"),
          col("fr_hits"), col("de_hits"))
    }),

    // Gopher-style repetition signals: type-token ratio, top-token
    // fraction, top-bigram fraction — all from ONE map-only rep_stats
    // pass (exact string counts, so DuckDB agrees). The naive plan
    // explodes every token and bigram into two groupBy shuffles; this is
    // zero-shuffle.
    "text_repetition" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("r", VectorSql.rep_stats(col("text")))
        .select(col("doc_id"),
          col("r.n_tokens").as("n_tokens"),
          col("r.distinct_tokens").as("distinct_tokens"),
          round(col("r.distinct_tokens") / col("r.n_tokens"), 4).as("ttr"),
          round(col("r.top_tok_n") / col("r.n_tokens"), 4).as("top_tok_frac"),
          when(col("r.n_tokens") > 1,
            round(col("r.top_bigram_n") / (col("r.n_tokens") - 1), 4))
            .otherwise(lit(0.0)).as("top_bigram_frac"))
    }),

    // PII scrub: redact emails / phone numbers / IPv4 addresses with typed
    // placeholders and count each category. The corpus is synthetic word
    // soup, so the query INJECTS deterministic PII per row first (both
    // engines run the same injection) — the regex semantics are genuinely
    // cross-checked, not vacuously zero. Map-only: codegen'd regexp
    // builtins, no UDF, no shuffle.
    "text_pii_scrub" -> ((s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\d{3}-\\d{3}-\\d{4}"
      val ip = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
      Par.widen(docs(s, dir)) // three regex passes per row — the costliest map kernel here
        .withColumn("t", concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or call 555-123-4567 from 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".17")))
        .select(col("doc_id"),
          // lit() patterns, NOT expr(): SQL string literals would eat the
          // backslash escapes (\b -> backspace)
          size(regexp_extract_all(col("t"), lit(email), lit(0))).as("email_n"),
          size(regexp_extract_all(col("t"), lit(phone), lit(0))).as("phone_n"),
          size(regexp_extract_all(col("t"), lit(ip), lit(0))).as("ip_n"),
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>").as("scrubbed"))
    }),

    // HTML → visible-text extraction: the WET-extraction kernel of a
    // crawl pipeline (trafilatura/jusText ancestry reduced to its
    // deterministic regex core — the step between raw WARC and every
    // text operator above). The test corpus carries plain text, so the
    // query synthesizes deterministic markup around it (same posture as
    // text_pii_scrub's planted PII); the operator is the extraction
    // chain: (1) drop script/style subtrees, (2) strip tags, (3) decode
    // the common entities, (4) collapse whitespace. All codegen'd
    // regexp/replace builtins — map-only, zero shuffles; both engines
    // run identical RE2-compatible patterns (inline (?s) for the
    // subtree match; only the replacement-string dialects differ).
    "text_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>d</title><style>p{c:1}</style></head>" +
          "<body><script>var x=\"no\";</script><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("</p><div class=\"nav\">&lt;menu&gt; &amp; links&nbsp;here</div>" +
          "</body></html>"))
      val noBlocks = regexp_replace(html,
        "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
      val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
      val decoded = replace(replace(replace(replace(noTags,
        lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
        lit("&nbsp;"), lit(" ")), lit("&amp;"), lit("&"))
      val extracted = trim(regexp_replace(decoded, "\\s+", " "))
      docs(s, dir).select(col("doc_id"), extracted.as("extracted"),
        length(extracted).as("n_extracted"))
    }),

    // BPE-ish token accounting: a GPT-2-style pre-tokenizer regex
    // (contraction suffixes | space-prefixed letter runs | digit runs |
    // punctuation runs | whitespace runs) counted alongside the whitespace
    // token count and byte length — the three "how big is this document"
    // numbers a token-budgeted pretraining mix is planned with. Map-only:
    // codegen'd regexp builtins, no UDF, no shuffle; both engines run the
    // identical RE2-compatible pattern (leftmost-first alternation).
    "text_tokens_bpe" -> ((s, dir) => {
      val bpe = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"
      docs(s, dir).select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(bpe), lit(0))).as("n_bpe"),
        size(split(lower(trim(col("text"))), "\\s+")).as("n_ws"),
        octet_length(col("text")).as("n_bytes"))
    }),

    // CCNet-style LM perplexity filter (Wenzek et al. 2020 shape): score
    // each document by the mean negative log-probability of its tokens
    // under a unigram LM — the lower-quality tail of a crawl scores high
    // and gets cut. Trained here on the corpus itself so the whole
    // pipeline is deterministic and DuckDB-checkable; at 100 TB the model
    // is trained ONCE on a reference corpus and becomes broadcast state
    // (exactly how the vocab joins below: broadcast). Scoring is explode →
    // broadcast-join → per-doc aggregate: one shuffle to build the vocab
    // (map-side combine) and one to regroup docs — never a vocab-keyed
    // shuffle of the corpus.
    "text_lm_perplexity" -> ((s, dir) => {
      val d = docs(s, dir)
      val tk = d.select(col("doc_id"), explode(toks).as("tok"))
        .filter(col("tok") =!= "")
      // the model feeds totals + the scoring join + the size gate — one
      // eager checkpoint = one corpus scan
      val vocab = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val tot = vocab.agg(sum(col("cnt")).as("tot"))
      tk.join(sizeGatedModel(s, dir, vocab), "tok")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(round(avg(-log(col("cnt") / col("tot"))), 6).as("logppl"),
          count(lit(1)).cast("int").as("n_toks"))
    }),

    // CCNet perplexity bucketing: split each LANGUAGE's documents into
    // head/middle/tail thirds by LM perplexity — the published CCNet
    // pipeline keeps "head" (closest to the reference LM) for pretraining.
    // Buckets come from integer per-language rank tertiles (rk*3 <= n),
    // not float threshold comparisons, so the oracle agrees exactly; the
    // rank window partitions by lang — parallel across languages, no
    // global sort (same posture as curate_sample_stratified). Ordering is
    // on the ROUNDED score + doc_id tiebreak so both engines sort the
    // same ties identically.
    "text_ccnet_buckets" -> ((s, dir) => {
      val d = docs(s, dir)
      val tk = d.select(col("doc_id"), col("lang"), explode(toks).as("tok"))
        .filter(col("tok") =!= "")
      val vocab = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val tot = vocab.agg(sum(col("cnt")).as("tot"))
      val scored = tk.join(sizeGatedModel(s, dir, vocab), "tok")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(round(avg(-log(col("cnt") / col("tot"))), 6).as("logppl"))
      // per-language rank: the plain window while a language fits one
      // task; above the gate, the TWO-PHASE shuffle-index construction
      // with SCORE blocks — floor(16·logppl) ranges are contiguous in the
      // (logppl, doc_id) order and deterministic from the rounded score,
      // so rank = earlier-block count + within-block rank, bit-identical
      // to the single-window answer. (A degenerate corpus whose scores
      // collapse into one block degrades to the old shape, never below.)
      val ranked =
        if (Curation.singleWindowFits(s, dir, strata = 4,
            maxStratum = Some(Curation.maxStratumOf(docs(s, dir), "lang")))) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("lang").orderBy(col("logppl"), col("doc_id"))
          val wn = org.apache.spark.sql.expressions.Window.partitionBy("lang")
          scored
            .withColumn("rk", row_number().over(w))
            .withColumn("n", count(lit(1)).over(wn))
        } else {
          val base = scored.withColumn("sblk", floor(col("logppl") * 16).cast("long"))
          val wB = org.apache.spark.sql.expressions.Window
            .partitionBy("lang").orderBy(col("sblk"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
          val counts = base.groupBy(col("lang"), col("sblk")).agg(count(lit(1)).as("c"))
          val offs = counts
            .withColumn("boff", coalesce(sum(col("c")).over(wB), lit(0L)))
            .select(col("lang"), col("sblk"), col("boff"))
          val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("n"))
          val wIn = org.apache.spark.sql.expressions.Window
            .partitionBy("lang", "sblk").orderBy(col("logppl"), col("doc_id"))
          base
            .withColumn("r0", row_number().over(wIn))
            .join(broadcast(offs), Seq("lang", "sblk"))
            .join(broadcast(totals), Seq("lang"))
            .withColumn("rk", col("boff") + col("r0"))
        }
      ranked
        .withColumn("bucket",
          when(col("rk") * 3 <= col("n"), "head")
            .when(col("rk") * 3 <= col("n") * 2, "middle")
            .otherwise("tail"))
        .select(col("doc_id"), col("lang"), col("logppl"), col("bucket"))
    }),

    // Vocabulary-coverage / OOV gate: build the top-K corpus vocabulary
    // (one map-side-combined count + a TakeOrdered top-K heap — no global
    // sort), then score every doc's out-of-vocabulary token rate against
    // it. High-OOV docs are gibberish or mis-encoded text a tokenizer wastes
    // context on — a standard curation gate. The vocab is BROADCAST state
    // (top-K is small by construction); the scoring pass is map-only.
    "text_vocab_coverage" -> ((s, dir) => {
      val K = 256
      val d = docs(s, dir)
      val tk = d.select(col("doc_id"), explode(toks).as("tok"))
        .filter(col("tok") =!= "")
      // deterministic top-K: count desc, token asc tiebreak
      val vocab = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(K)
        .select(col("tok"))
      tk.join(broadcast(vocab).withColumn("__v", lit(1)), Seq("tok"), "left_outer")
        .groupBy("doc_id")
        .agg(round(avg(when(col("__v").isNull, 1.0).otherwise(0.0)), 4).as("oov_rate"),
          count(lit(1)).cast("int").as("n_toks"))
        .withColumn("keep", (col("oov_rate") <= 0.5).cast("int"))
    }),

    // Per-source distribution drift: KL divergence of each source domain's
    // unigram token distribution from the whole-corpus distribution —
    // the corpus-monitoring signal a pipeline watches to catch a crawl
    // source going off-distribution (spam floods, encoding breakage)
    // between ingests. KL(p_source || p_corpus) needs only tokens PRESENT
    // in the source (q > 0 always holds since every source token is a
    // corpus token), so no smoothing and no vocab outer join. Scale
    // posture: one map-side-combined (source, token) count; the corpus
    // unigram model and the 1-row total are BROADCAST; per-source totals
    // are a 20-row broadcast — the heavy frame only ever aggregates, it
    // never joins shuffled.
    "text_domain_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      val tk = d.select(col("source"), explode(toks).as("tok"))
        .filter(col("tok") =!= "")
      // every other frame is a SUM over the (source, tok) counts — the
      // old spelling aggregated the exploded token frame four separate
      // times (three full tokenize+explode corpus scans in the final
      // plan, r18 audit; only v was checkpointed). Checkpoint st — the
      // vocab-bounded dictionary frame, |sources|x|vocab| rows — and
      // derive v / srcTot / tot as exact bigint sums over it: ONE corpus
      // scan, and the three derived shuffles move dictionary rows
      // instead of corpus tokens. count-per-group == sum of sub-group
      // counts, so every downstream value is bit-identical.
      val st = tk.groupBy("source", "tok").agg(count(lit(1)).as("cs"))
        .localCheckpoint(true)
      val v = st.groupBy("tok").agg(sum(col("cs")).as("c"))
      val srcTot = st.groupBy("source").agg(sum(col("cs")).as("ts"))
      val tot = st.agg(sum(col("cs")).as("t"))
      st.join(sizeGatedModel(s, dir, v), "tok")
        .join(broadcast(srcTot), "source")
        .crossJoin(broadcast(tot))
        .groupBy("source")
        .agg(round(sum((col("cs") / col("ts")) *
            log((col("cs") / col("ts")) / (col("c") / col("t")))), 6).as("kl_div"),
          max(col("ts")).cast("int").as("n_toks"))
    }),

    // Gopher-style quality gate: the standard rule set a pretraining
    // curation pass applies (token-count window, mean-token-length window,
    // stopword floor, type-token-ratio floor, top-token concentration
    // ceiling), each exposed as its own 0/1 flag plus the conjunction.
    // Zero-shuffle: every signal comes from the one-pass text_stats /
    // rep_stats kernels, so the whole gate fuses into the scan.
    "text_gopher_filter" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("st", VectorSql.text_stats(col("text"), typedlit(stopwords)))
        .withColumn("r", VectorSql.rep_stats(col("text")))
        .withColumn("ok_len",
          (col("st.n_tokens") >= 20 && col("st.n_tokens") <= 2000).cast("int"))
        .withColumn("ok_avg_len",
          (col("st.nonws_len") / col("st.n_tokens")).between(3.0, 10.0).cast("int"))
        .withColumn("ok_stop", (col("st.stop_hits") >= 2).cast("int"))
        .withColumn("ok_ttr",
          (col("r.distinct_tokens") / col("r.n_tokens") >= 0.3).cast("int"))
        .withColumn("ok_top",
          (col("r.top_tok_n") / col("r.n_tokens") <= 0.2).cast("int"))
        .select(col("doc_id"), col("ok_len"), col("ok_avg_len"), col("ok_stop"),
          col("ok_ttr"), col("ok_top"),
          (col("ok_len") * col("ok_avg_len") * col("ok_stop") * col("ok_ttr") *
            col("ok_top")).as("keep"))
    }),

    // n-gram novelty (memorization-risk / near-duplication pressure
    // signal, the per-doc complement of corpus-level dedup): the fraction
    // of a doc's DISTINCT 5-gram shingles that appear in NO other
    // document. Low novelty = the doc is mostly made of text repeated
    // elsewhere (template/boilerplate-heavy or a near-dup survivor);
    // curation pipelines use it to cap repeated-content exposure the way
    // Lee et al. 2022 motivate dedup. Scale posture: NO shingle-keyed
    // join anywhere (see ngramNovelty) — two map-side-combined counts and
    // one doc_id-keyed join, every shuffle key skew-free.
    "text_ngram_novelty" -> ((s, dir) => ngramNovelty(docs(s, dir), 5)),

    // document fingerprinting: md5 of whitespace-normalized text
    "text_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast("binary")).as("fp"))
    }),

    // exact dedup: hash-groupBy on the fingerprint, keep lowest doc_id
    "dedup_exact" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"),
          md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast("binary")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
    }),

    // n-gram Jaccard near-dedup: shingle self-join → common counts → ratio.
    // Hot-shingle cap: shingles present in more than maxDf documents
    // (stopword runs — the unbounded skew key of the self-join at scale)
    // are EXCLUDED from candidate generation, then counted exactly for the
    // surviving candidate pairs, so reported Jaccard values stay exact.
    // The df cap derives from metaRowCount (parquet footers, driver-only)
    // — d.count() here was one extra Spark job per invocation.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val d = docs(s, dir)
      jaccardPairs(d, defaultMaxDf(s, dir), Some(shingleDfBound(s, dir)))
    }),

    // quality-aware near-dup keep policy (the RefinedWeb posture: keep
    // the best REPRESENTATIVE, not the lowest id): for every exact-
    // jaccard near-dup pair the lower-quality side loses (more chars
    // wins; the lower doc_id keeps ties), and a doc is dropped if ANY
    // pair marks it the loser. One projection over the already-capped
    // pair join + a broadcast-sized loser anti-join — cheaper than full
    // connected components when transitive closure isn't needed, and
    // quality-aware where dedup_clusters' min-id canonical is blind.
    "dedup_keep_best" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = jaccardPairs(d,
        defaultMaxDf(s, dir), Some(shingleDfBound(s, dir)))
      // n_chars lookup from the RAW table, not docs() (r19): docs()'s
      // text-IS-NOT-NULL universe filter forced BOTH lookup scans to
      // read the text column — 93% of the corpus bytes — solely to
      // evaluate the filter (plan audit: ReadSchema carried text,
      // projected away immediately). The filter is provably redundant
      // here: pair doc_ids come from shingles OF text, so every joined
      // key already has non-null text, and doc_id is unique — inner
      // joins against the unfiltered projection return identical rows
      // (OptimizationR19Spec pins it, null-text doc included). At 100 TB
      // this drops two full corpus text reads per invocation; the scans
      // now read only (doc_id, n_chars).
      val q = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val losers = pairs
        .join(q.select(col("doc_id").as("d1"), col("n_chars").as("c1")), Seq("d1"))
        .join(q.select(col("doc_id").as("d2"), col("n_chars").as("c2")), Seq("d2"))
        // d1 < d2 by construction: at equal quality the higher id loses
        .select(when(col("c1") < col("c2"), col("d1")).otherwise(col("d2"))
          .as("doc_id"))
        .distinct()
      d.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // near-dup cluster canonicalization: connected components over the
    // Jaccard pair graph by iterative min-label propagation (each round is
    // one join + agg; lineage truncated per round; converges in O(cluster
    // diameter) rounds — tiny for dup clusters). Every doc gets a cluster
    // id = the smallest doc_id reachable through near-dup edges; keeping
    // rows where doc_id == cluster is the dedup KEEP policy.
    "dedup_clusters" -> ((s, dir) => {
      val d = docs(s, dir)
      clusterLabels(d, defaultMaxDf(s, dir), Some(shingleDfBound(s, dir)))
    }),

    // end-to-end training-data curation: language gate + quality gate +
    // dedup keep-policy in ONE declarative pipeline — the corpus a 100 TB
    // pretraining run would actually ingest. Each stage is the operator
    // tested elsewhere (lang_hits / text_stats kernels, cluster labels);
    // Catalyst fuses the map-only gates into the scan.
    "pipeline_curate" -> ((s, dir) => {
      val d = docs(s, dir)
      // keep-policy via the LOSERS complement (r19): `doc_id === cluster`
      // over the labels frame inner-joined the FULL corpus against a
      // corpus-sized (doc_id, cluster) frame — a corpus⋈corpus doc_id
      // join whose only purpose was testing self-canonicality. A doc
      // fails that test iff it is an edge-connected non-minimum, so one
      // anti-join against the dup-bounded losers set is row-identical
      // (every doc has exactly one label; isolated docs are never
      // losers — the OptimizationR19Spec net pins it) and the
      // isolated-docs anti-join + union drop out of the plan with it.
      val (losers, small) = dupLosers(d, defaultMaxDf(s, dir),
        Some(shingleDfBound(s, dir)))
      // the language gate binds the lang_hits array ONCE through a
      // higher-order-function lambda: spelled as conjuncts over a
      // withColumn alias, filter pushdown inlines the alias into each
      // conjunct and the kernel re-scans the text FOUR times per row
      // (FilterExec's short-circuit codegen does no cross-conjunct CSE)
      // — measured 2x on the gate stage (r18 ProfileGate A/B, identical
      // rows). Same trick is NOT needed for projections (text_langid):
      // ProjectExec codegen CSEs repeated references.
      val isEn = exists(array(VectorSql.lang_hits(col("text"), typedlit(Seq(
          Seq("the", "a", "of", "and"), Seq("el", "la", "de", "y"),
          Seq("le", "les", "et", "une"), Seq("der", "die", "und", "das"))))),
        h => h.getItem(0) >= h.getItem(1) && h.getItem(0) >= h.getItem(2) &&
          h.getItem(0) >= h.getItem(3) && h.getItem(0) > 0)
      d.withColumn("n_tokens",
          VectorSql.text_stats(col("text"), typedlit(stopwords)).getField("n_tokens"))
        .join(if (small) broadcast(losers) else losers, Seq("doc_id"), "left_anti")
        .filter(isEn && col("n_tokens") >= 20)
        .select(col("doc_id"), col("n_tokens"))
    }),

    // incremental ingest dedup: the arriving batch checks itself against
    // the EXISTING corpus only — the shape a continuously-ingesting
    // pretraining pipeline actually runs (a full-corpus self-join per
    // batch would be O(corpus) per ingest; this is O(batch × matches)).
    // The corpus is a snapshot table: the "existing" state is snapshot v1,
    // the batch arrives as an append, and the INCREMENTAL READ
    // (start-version) plans only the files the append introduced — the
    // corpus files are never in the batch-side scan. Bipartite n-gram
    // Jaccard via one shingle-hash equi-join (no self-join); both shingle
    // frames are slim (doc_id, n, hash) checkpoints. At 100 TB the
    // corpus-side frame persists once per ingest wave and hot-shingle
    // df-capping (see jaccardPairs) bounds the join fanout.
    "dedup_incremental" -> ((s, dir) => {
      import graft.spatial.{GeoTable, Snapshots}
      val d = docs(s, dir)
      val path = scratch("incrdedup", dir)
      // existing corpus = even doc_ids (snapshot v1); batch = odd ids
      d.filter(col("doc_id") % 2 === 0).write.parquet(path)
      GeoTable.writeManifest(s, path)
      val v1 = Snapshots.mainVersion(path)
      Snapshots.append(d.filter(col("doc_id") % 2 === 1), path)
      val corpus = Snapshots.read(s, path, Some(v1))
      val batch = s.read.format("graft").option("start-version", v1).load(path)
      // NO checkpoints (r19): unlike jaccardPairs' SELF-join — where an
      // un-materialized shingle frame recomputes under the broadcast for
      // every branch — this bipartite join consumes each shingle frame
      // exactly ONCE, so a checkpoint only adds a block write + re-read
      // per side (two extra jobs per invocation; A-B-A below-noise-to-
      // positive locally, strictly fewer passes structurally). The widen
      // stays: the join probe is the work-multiplying stage and the
      // freshly written scratch files plan as one partition.
      def sh(frame: DataFrame, idAs: String, nAs: String): DataFrame =
        Par.widen(frame).withColumn("h", VectorSql.shingle_hashes(col("text")))
          .select(col("doc_id").as(idAs), size(col("h")).as(nAs),
            explode(col("h")).as("s"))
      sh(batch, "doc_id", "nb").join(sh(corpus, "dup_of", "nc"), "s")
        .groupBy(col("doc_id"), col("dup_of"), col("nb"), col("nc"))
        .agg(count(lit(1)).as("common"))
        .withColumn("jac", col("common") / (col("nb") + col("nc") - col("common")))
        .filter(col("jac") >= 0.4)
        .select(col("doc_id"), col("dup_of"), round(col("jac"), 4).as("jac"))
    }),

    // MinHash + LSH banding: 16 permutations, 4 bands × 4 rows. The
    // permutation family is ONE base xxhash64 per shingle + 16 linear
    // multiply-adds by odd constants (bijections mod 2^64) — the round-3
    // version hashed the full shingle STRING 16 times per row, and that
    // map-side cost was the whole regression margin on this query.
    "dedup_minhash" -> ((s, dir) => {
      val nHash = 16
      val sh = shingles(docs(s, dir))
      def permA(i: Int): Long = 0x9E3779B97F4A7C15L * (2L * i + 1)
      def permB(i: Int): Long = 0xC2B2AE3D27D4EB4FL * (i + 1L)
      // shingles are already 64-bit hashes — feed the permutation family
      // directly (round-3 hashed the full shingle STRING 16 times per row)
      val sig = sh
        .groupBy(col("doc_id"))
        .agg(array((0 until nHash).map(i =>
          min(VectorSql.hash_mix(col("s"), permA(i), permB(i)))): _*).as("sig"))
      // candidate pairs come from GROUPING each (band, bucket-hash), not a
      // self-join: a self-join's two sides cannot share the signature
      // pipeline (round-3's +27% was the tokenize→shingle→16-min aggregate
      // running twice, once under a broadcast exchange), while the grouped
      // shape computes signatures ONCE and shuffles them once. LSH buckets
      // are O(1)-sized by construction, so per-bucket pair expansion is
      // bounded; a doc appears once per band, so in-bucket pairs are unique
      val bands = sig.select(col("doc_id"), col("sig"),
        explode(expr("transform(sequence(0, 3), b -> struct(b AS band, xxhash64(slice(sig, b*4+1, 4)) AS bh))")).as("bb"))
        .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val buckets = bands.groupBy(col("band"), col("bh"))
        .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ds"))
        .filter(size(col("ds")) >= 2)
      val cand = buckets.select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)), y ->
            |    struct(x.doc_id AS da, y.doc_id AS db, x.sig AS sa, y.sig AS sb))))""".stripMargin))
          .as("p"))
        .select(
          least(col("p.da"), col("p.db")).as("d1"),
          greatest(col("p.da"), col("p.db")).as("d2"),
          when(col("p.da") < col("p.db"), col("p.sa")).otherwise(col("p.sb")).as("sig1"),
          when(col("p.da") < col("p.db"), col("p.sb")).otherwise(col("p.sa")).as("sig2"))
        .distinct()
      cand
        .withColumn("est_jac", round(
          aggregate(zip_with(col("sig1"), col("sig2"), (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / nHash, 4))
        .filter(col("est_jac") >= 0.5)
        .select(col("d1"), col("d2"), col("est_jac"))
    }),

    // SimHash: the one-pass codegen'd `simhash64` kernel makes signature
    // computation MAP-ONLY (the naive shape explodes the token frame and
    // shuffles every token into a 64-column vote aggregation). Candidate
    // pairs: 16-bit chunk equality (any hamming<=3 pair agrees on at least
    // one of 4 chunks) over the tiny checkpointed signature frame — one
    // signature row per doc, so the self-join re-reads blocks, not text.
    "dedup_simhash" -> ((s, dir) => {
      val sig = docs(s, dir)
        .select(col("doc_id"), VectorSql.simhash64(col("text")).as("sh"))
        .localCheckpoint(true)
      val ex = sig.select(col("doc_id"), col("sh"), explode(expr(
        "transform(sequence(0, 3), k -> struct(k AS k, shiftright(sh, k * 16) & 65535 AS cv))")).as("ch"))
        .select(col("doc_id"), col("sh"), col("ch.k").as("k"), col("ch.cv").as("cv"))
      ex.as("a").join(ex.as("b"),
          col("a.k") === col("b.k") && col("a.cv") === col("b.cv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          expr("bit_count(a.sh ^ b.sh)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
    })
  )

  /** DuckDB twins of the 64-bit hash kernels, built from the same
    * HUGEINT wraparound arithmetic as the Similarity LSH oracles: the
    * per-character FNV token fold (`list_reduce` over code points — the
    * kernels hash UTF-16 units, equal to code points for BMP text),
    * avalanche/mix steps via 32-bit-split modular multiplies, and
    * unsigned→signed conversion where Spark compares as signed Long.
    * This converts dedup_minhash and dedup_simhash from rows-only checks
    * to full rows+schema+hash oracles — verified identical result sets
    * at sf0.001 and sf0.01.
    */
  private val DuckM64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val DuckH63 = "CAST('9223372036854775808' AS HUGEINT)"

  private def duckMulmod(z: String, c: String): String =
    s"""((($z) % 4294967296) * (($c) % 4294967296)
       | + (((($z) % 4294967296) * (($c) // 4294967296)
       |     + (($z) // 4294967296) * (($c) % 4294967296)) % 4294967296) * 4294967296
       |) % $DuckM64""".stripMargin

  /** CTE prefix: `tok` (non-empty tokens, the kernel contract), `pos`
    * (token positions), `th` (per-token FNV-1a-style 64-bit hash —
    * byte-exact with the Scala kernels' fold).
    */
  private val DuckTokenHashCte: String = {
    val fnvInit = "CAST('11400714819323198485' AS HUGEINT)"
    val fnvC = "CAST(1099511628211 AS HUGEINT)"
    s"""WITH tok AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
       |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
       |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
       |  FROM tok WHERE len(t) >= 1),
       |th AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
       |    list_reduce(list_prepend($fnvInit,
       |      list_transform(string_split(t[CAST(i AS INTEGER)], ''),
       |        c -> CAST(unicode(c) AS HUGEINT))),
       |      (acc, c) -> ${duckMulmod("xor(acc, c)", fnvC)}) AS h
       |  FROM pos)""".stripMargin
  }

  private val MinhashOracle: String = {
    val M = BigInt(1) << 64
    val perms = (0 until 16).map { i =>
      val a = (BigInt("9E3779B97F4A7C15", 16) * (2 * i + 1)) mod M
      val b = (BigInt("C2B2AE3D27D4EB4F", 16) * (i + 1)) mod M
      s"($i, CAST('$a' AS HUGEINT), CAST('$b' AS HUGEINT))"
    }.mkString(",")
    val c1 = "CAST('18397679294719823053' AS HUGEINT)" // 0xFF51AFD7ED558CCD
    val c2 = "CAST('14181476777654086739' AS HUGEINT)" // 0xC4CEB9FE1A85EC53
    val c3 = "CAST('11400714819323198485' AS HUGEINT)" // 0x9E3779B97F4A7C15
    s"""$DuckTokenHashCte,
       |tri AS (SELECT a.doc_id, a.h AS t0, b.h AS t1, c.h AS t2
       |  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       |            JOIN th c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
       |s1 AS (SELECT doc_id, t1, t2, ${duckMulmod("t0", c1)} AS z FROM tri),
       |s2 AS (SELECT doc_id, t2, ${duckMulmod("xor(z, t1)", c2)} AS z FROM s1),
       |s3 AS (SELECT doc_id, ${duckMulmod("xor(z, t2)", c3)} AS z FROM s2),
       |sh AS (SELECT DISTINCT doc_id, xor(z, z // 8589934592) AS sh FROM s3),
       |perms(i, a, b) AS (VALUES $perms),
       |mh AS (SELECT doc_id, i,
       |    min(CASE WHEN zz >= $DuckH63 THEN zz - $DuckM64 ELSE zz END) AS m
       |  FROM (SELECT s.doc_id, p.i, (${duckMulmod("s.sh", "p.a")} + p.b) % $DuckM64 AS zz
       |        FROM sh s CROSS JOIN perms p) q(doc_id, i, zz)
       |  GROUP BY 1, 2),
       |sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY 1),
       |bands AS (SELECT doc_id, sig, b.b AS band,
       |    sig[CAST(b.b*4+1 AS INTEGER) : CAST(b.b*4+4 AS INTEGER)] AS sl
       |  FROM sig, unnest(generate_series(CAST(0 AS BIGINT), CAST(3 AS BIGINT))) b(b)),
       |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2, x.sig AS sig1, y.sig AS sig2
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.sl = y.sl AND x.doc_id < y.doc_id)
       |SELECT d1, d2,
       |  round(list_sum(list_transform(range(1, 17),
       |    i -> CASE WHEN sig1[i] = sig2[i] THEN 1 ELSE 0 END)) / 16.0, 4) AS est_jac
       |FROM cand
       |WHERE list_sum(list_transform(range(1, 17),
       |    i -> CASE WHEN sig1[i] = sig2[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.5""".stripMargin
  }

  private val SimhashOracle: String = {
    val p2 = (0 until 64).map(k => s"($k, CAST('${BigInt(1) << k}' AS HUGEINT))").mkString(",")
    val cAv = "CAST('13787848793156543929' AS HUGEINT)" // 0xBF58476D1CE4E5B9
    s"""$DuckTokenHashCte,
       |a1 AS (SELECT doc_id, xor(h, h // 536870912) AS z FROM th),
       |a2 AS (SELECT doc_id, ${duckMulmod("z", cAv)} AS z FROM a1),
       |av AS (SELECT doc_id, xor(z, z // 4294967296) AS z FROM a2),
       |p2(k, v) AS (VALUES $p2),
       |votes AS (SELECT av.doc_id, p2.k,
       |    sum(CASE WHEN (av.z // p2.v) % 2 = 1 THEN 1 ELSE -1 END) AS vt
       |  FROM av CROSS JOIN p2 GROUP BY 1, 2),
       |shz AS (SELECT doc_id,
       |    sum(CASE WHEN vt > 0 THEN v ELSE CAST(0 AS HUGEINT) END) AS z
       |  FROM votes JOIN p2 USING (k) GROUP BY 1),
       |sh AS (SELECT d.doc_id,
       |    CAST(CASE WHEN s.z IS NULL THEN 0
       |      WHEN s.z >= $DuckH63 THEN s.z - $DuckM64 ELSE s.z END AS BIGINT) AS sh
       |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) d LEFT JOIN shz s USING (doc_id)),
       |ch AS (SELECT doc_id, sh, k.k AS k,
       |    CAST((CASE WHEN sh < 0 THEN CAST(sh AS HUGEINT) + $DuckM64
       |        ELSE CAST(sh AS HUGEINT) END
       |      // (CASE k.k WHEN 0 THEN 1 WHEN 1 THEN 65536 WHEN 2 THEN 4294967296
       |          ELSE CAST('281474976710656' AS HUGEINT) END)) % 65536 AS BIGINT) AS cv
       |  FROM sh, unnest(generate_series(CAST(0 AS BIGINT), CAST(3 AS BIGINT))) k(k))
       |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
       |FROM ch a JOIN ch b ON a.k = b.k AND a.cv = b.cv AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "dedup_minhash" -> MinhashOracle,
    "dedup_simhash" -> SimhashOracle,
    "text_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens
        |FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents""".stripMargin,

    "text_ccnet_buckets" ->
      """WITH tk0 AS (
        |  SELECT doc_id, lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |tk AS (SELECT doc_id, lang, tok FROM tk0 WHERE tok <> ''),
        |v AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
        |tot AS (SELECT sum(cnt) AS tot FROM v),
        |s AS (
        |  SELECT doc_id, lang, round(avg(-ln(cnt * 1.0 / tot)), 6) AS logppl
        |  FROM tk JOIN v USING (tok) CROSS JOIN tot
        |  GROUP BY doc_id, lang),
        |r AS (
        |  SELECT doc_id, lang, logppl,
        |   CAST(row_number() OVER (PARTITION BY lang ORDER BY logppl, doc_id) AS INTEGER) AS rk,
        |   CAST(count(*) OVER (PARTITION BY lang) AS INTEGER) AS n
        |  FROM s)
        |SELECT doc_id, lang, logppl,
        | CASE WHEN rk * 3 <= n THEN 'head'
        |      WHEN rk * 3 <= n * 2 THEN 'middle'
        |      ELSE 'tail' END AS bucket
        |FROM r""".stripMargin,

    "text_domain_drift" ->
      """WITH tk0 AS (
        |  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |tk AS (SELECT source, tok FROM tk0 WHERE tok <> ''),
        |st AS (SELECT source, tok, count(*) AS cs FROM tk GROUP BY source, tok),
        |v AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
        |srctot AS (SELECT source, count(*) AS ts FROM tk GROUP BY source),
        |tot AS (SELECT count(*) AS t FROM tk)
        |SELECT source,
        | round(sum((cs * 1.0 / ts) * ln((cs * 1.0 / ts) / (c * 1.0 / t))), 6)
        |   AS kl_div,
        | CAST(max(ts) AS INTEGER) AS n_toks
        |FROM st JOIN v USING (tok) JOIN srctot USING (source) CROSS JOIN tot
        |GROUP BY source""".stripMargin,

    "text_vocab_coverage" ->
      """WITH tk0 AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |tk AS (SELECT doc_id, tok FROM tk0 WHERE tok <> ''),
        |v AS (SELECT tok FROM (
        |  SELECT tok, count(*) AS cnt FROM tk GROUP BY tok
        |  ORDER BY cnt DESC, tok LIMIT 256)),
        |s AS (
        |  SELECT doc_id,
        |   round(avg(CASE WHEN tok IN (SELECT tok FROM v) THEN 0.0 ELSE 1.0 END), 4)
        |     AS oov_rate,
        |   CAST(count(*) AS INTEGER) AS n_toks
        |  FROM tk GROUP BY doc_id)
        |SELECT doc_id, oov_rate, n_toks,
        | CAST(CASE WHEN oov_rate <= 0.5 THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM s""".stripMargin,

    "text_lm_perplexity" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |t2 AS (SELECT doc_id, tok FROM tk WHERE tok <> ''),
        |v AS (SELECT tok, count(*) AS cnt FROM t2 GROUP BY tok),
        |tot AS (SELECT sum(cnt) AS tot FROM v)
        |SELECT doc_id,
        | round(avg(-ln(cnt * 1.0 / tot)), 6) AS logppl,
        | CAST(count(*) AS INTEGER) AS n_toks
        |FROM t2 JOIN v USING (tok) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  string_split_regex(lower(trim(text)), '\s+') AS tk FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents)
        |SELECT doc_id,
        | CAST(len(tk) AS INTEGER) AS n_tokens,
        | CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS INTEGER) AS punct_n,
        | round(len(list_filter(tk, w -> w IN ('the','a','of','and','to','in','is'))) * 1.0 / len(tk), 4) AS stop_ratio,
        | round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(tk), 4) AS avg_tok_len
        |FROM t""".stripMargin,

    "text_bpe_pairs" ->
      """WITH tok AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |b AS (SELECT t[i] || ' ' || t[i+1] AS pair
        |      FROM (SELECT t, unnest(generate_series(1, len(t)-1)) AS i FROM tok))
        |SELECT pair, count(*) AS n FROM b GROUP BY 1
        |ORDER BY n DESC, pair LIMIT 50""".stripMargin,

    "dedup_span_exact" ->
      """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS tk
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
        |  WHERE len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) >= 8),
        |idx AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-7)) AS i FROM tok),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+7], ' ') AS s FROM idx),
        |df AS (SELECT s, count(*) AS nd FROM sh GROUP BY 1)
        |SELECT doc_id, count(*) AS n_spans,
        | CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        | round(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS dup_ratio
        |FROM sh JOIN df USING (s) GROUP BY doc_id""".stripMargin,

    "text_quality_classifier" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS t FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |s AS (SELECT doc_id,
        |  round(1.0 / (1.0 + exp(-avg(
        |    ((ascii(substr(md5(t), 1, 1)) * 256 + ascii(substr(md5(t), 2, 1)))
        |      % 200 - 100) / 100.0))), 6) AS score
        |  FROM tok GROUP BY doc_id)
        |SELECT doc_id, score, CAST(score >= 0.5 AS INTEGER) AS keep FROM s""".stripMargin,

    "text_langid" ->
      """WITH t AS (SELECT doc_id,
        |  string_split_regex(lower(trim(text)), '\s+') AS tk FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |h AS (SELECT doc_id,
        |  CAST(len(list_filter(tk, w -> w IN ('the','a','of','and'))) AS INTEGER) AS en_hits,
        |  CAST(len(list_filter(tk, w -> w IN ('el','la','de','y'))) AS INTEGER) AS es_hits,
        |  CAST(len(list_filter(tk, w -> w IN ('le','les','et','une'))) AS INTEGER) AS fr_hits,
        |  CAST(len(list_filter(tk, w -> w IN ('der','die','und','das'))) AS INTEGER) AS de_hits
        | FROM t)
        |SELECT doc_id,
        | CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
        |      WHEN es_hits >= fr_hits AND es_hits >= de_hits AND es_hits > 0 THEN 'es'
        |      WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
        |      WHEN de_hits > 0 THEN 'de'
        |      ELSE 'und' END AS pred_lang,
        | en_hits, es_hits, fr_hits, de_hits
        |FROM h""".stripMargin,

    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |tf AS (SELECT doc_id, w, count(*) AS n
        |       FROM (SELECT doc_id, unnest(tk) AS w FROM t) GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(sum(n) AS INTEGER) AS n_tokens,
        |        CAST(count(*) AS INTEGER) AS distinct_tokens,
        |        CAST(max(n) AS INTEGER) AS top_tok_n FROM tf GROUP BY 1),
        |bf AS (SELECT doc_id, b, count(*) AS n
        |       FROM (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS b
        |             FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-1)) AS i FROM t))
        |       GROUP BY 1, 2),
        |bagg AS (SELECT doc_id, CAST(max(n) AS INTEGER) AS top_bigram_n FROM bf GROUP BY 1)
        |SELECT a.doc_id, a.n_tokens, a.distinct_tokens,
        | round(a.distinct_tokens * 1.0 / a.n_tokens, 4) AS ttr,
        | round(a.top_tok_n * 1.0 / a.n_tokens, 4) AS top_tok_frac,
        | CASE WHEN a.n_tokens > 1
        |      THEN round(coalesce(b.top_bigram_n, 0) * 1.0 / (a.n_tokens - 1), 4)
        |      ELSE 0.0 END AS top_bigram_frac
        |FROM agg a LEFT JOIN bagg b ON a.doc_id = b.doc_id""".stripMargin,

    "text_pii_scrub" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@mail.example.com or call 555-123-4567 from 10.0.' || (doc_id % 256) || '.17' AS t
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS email_n,
        | CAST(len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS INTEGER) AS phone_n,
        | CAST(len(regexp_extract_all(t, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS INTEGER) AS ip_n,
        | regexp_replace(regexp_replace(regexp_replace(t,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |   '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS scrubbed
        |FROM t""".stripMargin,

    "text_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>d</title><style>p{c:1}</style></head><body><script>var x="no";</script><h1>Doc '
        |  || doc_id || '</h1><p>' || text
        |  || '</p><div class="nav">&lt;menu&gt; &amp; links&nbsp;here</div></body></html>' AS html
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |a AS (SELECT doc_id,
        |  regexp_replace(html, '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t
        |  FROM h),
        |b AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM a),
        |c AS (SELECT doc_id,
        |  replace(replace(replace(replace(t, '&lt;', '<'), '&gt;', '>'),
        |    '&nbsp;', ' '), '&amp;', '&') AS t
        |  FROM b)
        |SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS extracted,
        |  CAST(length(trim(regexp_replace(t, '\s+', ' ', 'g'))) AS INTEGER) AS n_extracted
        |FROM c""".stripMargin,

    "text_tokens_bpe" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')) AS INTEGER) AS n_bpe,
        | CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INTEGER) AS n_ws,
        | CAST(strlen(text) AS INTEGER) AS n_bytes
        |FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents""".stripMargin,

    "text_gopher_filter" ->
      """WITH t AS (SELECT doc_id, text,
        |  string_split_regex(lower(trim(text)), '\s+') AS tk FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |tf AS (SELECT doc_id, w, count(*) AS n
        |       FROM (SELECT doc_id, unnest(tk) AS w FROM t) GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(sum(n) AS INTEGER) AS n_tokens,
        |        CAST(count(*) AS INTEGER) AS distinct_tokens,
        |        CAST(max(n) AS INTEGER) AS top_tok_n FROM tf GROUP BY 1),
        |q AS (SELECT t.doc_id, agg.n_tokens, agg.distinct_tokens, agg.top_tok_n,
        |  length(regexp_replace(t.text, '\s+', '', 'g')) AS nonws_len,
        |  len(list_filter(t.tk, w -> w IN ('the','a','of','and','to','in','is'))) AS stop_hits
        | FROM t JOIN agg ON t.doc_id = agg.doc_id),
        |f AS (SELECT doc_id,
        |  CAST(n_tokens >= 20 AND n_tokens <= 2000 AS INTEGER) AS ok_len,
        |  CAST(nonws_len * 1.0 / n_tokens BETWEEN 3.0 AND 10.0 AS INTEGER) AS ok_avg_len,
        |  CAST(stop_hits >= 2 AS INTEGER) AS ok_stop,
        |  CAST(distinct_tokens * 1.0 / n_tokens >= 0.3 AS INTEGER) AS ok_ttr,
        |  CAST(top_tok_n * 1.0 / n_tokens <= 0.2 AS INTEGER) AS ok_top
        | FROM q)
        |SELECT doc_id, ok_len, ok_avg_len, ok_stop, ok_ttr, ok_top,
        | ok_len * ok_avg_len * ok_stop * ok_ttr * ok_top AS keep
        |FROM f""".stripMargin,

    "text_ngram_novelty" ->
      """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |g AS (SELECT doc_id, t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4] AS s
        |      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |            FROM tok WHERE len(t) >= 5)),
        |gd AS (SELECT DISTINCT doc_id, s FROM g),
        |dfc AS (SELECT s, count(*) AS ndocs FROM gd GROUP BY 1)
        |SELECT gd.doc_id,
        | CAST(count(*) AS INTEGER) AS n_shingles,
        | CAST(sum(CASE WHEN dfc.ndocs = 1 THEN 1 ELSE 0 END) AS INTEGER)
        |   AS unique_shingles,
        | round(avg(CASE WHEN dfc.ndocs = 1 THEN 1.0 ELSE 0.0 END), 4) AS novelty
        |FROM gd JOIN dfc USING (s) GROUP BY 1""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        | CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_dups
        |FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents GROUP BY 1""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents WHERE len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) >= 3),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM tok),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT d1, d2, round(common * 1.0 / (x.n + y.n - common), 4) AS jac
        |FROM pair JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
        |WHERE common * 1.0 / (x.n + y.n - common) >= 0.4""".stripMargin,

    "dedup_keep_best" ->
      """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents WHERE len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) >= 3),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM tok),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT d1, d2 FROM pair
        |       JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
        |       WHERE common * 1.0 / (x.n + y.n - common) >= 0.4),
        |losers AS (SELECT DISTINCT
        |    CASE WHEN c1.n_chars < c2.n_chars THEN d1 ELSE d2 END AS doc_id
        |  FROM jp JOIN documents c1 ON d1 = c1.doc_id
        |          JOIN documents c2 ON d2 = c2.doc_id)
        |SELECT doc_id, source, n_chars FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,

    "dedup_incremental" ->
      """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents WHERE len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) >= 3),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM tok),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pair AS (SELECT b.doc_id AS doc_id, c.doc_id AS dup_of, count(*) AS common
        |         FROM sh b JOIN sh c ON b.s = c.s
        |         WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0 GROUP BY 1, 2)
        |SELECT pair.doc_id, pair.dup_of, round(common * 1.0 / (x.n + y.n - common), 4) AS jac
        |FROM pair JOIN sz x ON pair.doc_id = x.doc_id JOIN sz y ON pair.dup_of = y.doc_id
        |WHERE common * 1.0 / (x.n + y.n - common) >= 0.4""".stripMargin,

    "pipeline_curate" ->
      """WITH RECURSIVE tokc AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 3),
        |idxc AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM tokc),
        |shc AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idxc),
        |szc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
        |pairc AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |          FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jpc AS (SELECT d1, d2
        |        FROM pairc JOIN szc x ON d1 = x.doc_id JOIN szc y ON d2 = y.doc_id
        |        WHERE common * 1.0 / (x.n + y.n - common) >= 0.4),
        |edgesc AS (SELECT d1 AS a, d2 AS b FROM jpc UNION ALL SELECT d2, d1 FROM jpc),
        |reachc AS (
        |  SELECT doc_id AS id, doc_id AS r FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
        |  UNION
        |  SELECT e.a AS id, r.r FROM edgesc e JOIN reachc r ON r.id = e.b
        |),
        |cl AS (SELECT id AS doc_id, min(r) AS cluster FROM reachc GROUP BY id),
        |sig AS (SELECT doc_id,
        |  string_split_regex(lower(trim(text)), '\s+') AS tk FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        |gates AS (SELECT doc_id,
        |  CAST(len(tk) AS INTEGER) AS n_tokens,
        |  len(list_filter(tk, w -> w IN ('the','a','of','and'))) AS en,
        |  len(list_filter(tk, w -> w IN ('el','la','de','y'))) AS es,
        |  len(list_filter(tk, w -> w IN ('le','les','et','une'))) AS fr,
        |  len(list_filter(tk, w -> w IN ('der','die','und','das'))) AS de
        | FROM sig)
        |SELECT g.doc_id, g.n_tokens
        |FROM gates g JOIN cl ON g.doc_id = cl.doc_id
        |WHERE g.en >= g.es AND g.en >= g.fr AND g.en >= g.de AND g.en > 0
        |  AND g.n_tokens >= 20 AND cl.cluster = g.doc_id""".stripMargin,

    // transitive closure of the near-dup graph: cluster = min reachable id
    "dedup_clusters" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents WHERE len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) >= 3),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM tok),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT d1, d2
        |       FROM pair JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
        |       WHERE common * 1.0 / (x.n + y.n - common) >= 0.4),
        |edges AS (SELECT d1 AS a, d2 AS b FROM jp UNION ALL SELECT d2, d1 FROM jp),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS r FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
        |  UNION
        |  SELECT e.a AS id, r.r FROM edges e JOIN reach r ON r.id = e.b
        |)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster
        |FROM reach GROUP BY id""".stripMargin
  )
}
