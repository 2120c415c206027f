package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batches.
  *
  * The container has no image/audio codecs, so featurization is a
  * codec-free byte-level featurizer (stride-sampled per-block moments) —
  * deterministic and oracle-checkable; everything around it — schema,
  * partition-batched processing, feature-vector shape — is the real
  * pipeline. At 100 TB the same mapPartitions shape amortizes model/codec
  * init per partition (the Scala analogue of `mapInPandas` batching) and
  * never materializes payloads on the driver.
  *
  * All query outputs are scalar columns (no raw arrays): downstream
  * comparison harnesses sort rows, and array cells aren't sortable. The
  * feature vector is carried as a fixed-format digest string; frames are
  * exploded to one row per frame.
  */
object Multimodal {

  case class MediaFeatures(doc_id: Long, n_bytes: Int, features_digest: String)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // metadata extraction over the binary payload (codegen'd, no decode)
    "mm_meta" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          (col("doc_id") % 3).cast("int").as("media_kind"))
    }),

    // frame sampling: every 64-char block of the payload becomes a "frame"
    // fingerprint row (video-style access pattern; decode is the same stub
    // boundary as mm_features — the block arithmetic is the real part).
    // One scalar row per frame so results sort/compare cleanly.
    "mm_frames" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .selectExpr("doc_id", "text",
          "explode(sequence(0, cast(floor(length(text) / 64) as int))) as frame_idx")
        .selectExpr("doc_id", "frame_idx",
          "md5(cast(substring(text, frame_idx * 64 + 1, 16) as binary)) as frame_fp")
    }),

    // per-partition batched "decode + featurize" over binary payloads: a
    // codec-free byte-level featurizer — the payload splits into 8 equal
    // blocks, each block stride-sampled (integer stride (hi-lo)/16, so up
    // to 31 probes on sub-32-byte blocks) and reduced to its
    // first two moments (sum, sum-of-squares of byte values). All-integer
    // arithmetic, so the oracle replicates it exactly (no float-format
    // drift). A real pipeline would swap the per-byte loop for a codec /
    // model call; the partition-batched shape (init once per partition,
    // payloads never on the driver) is the part that survives that swap.
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      // NULL payloads are not media: excluded on BOTH engines (the kernel
      // would NPE on a null byte array; the oracles filter identically)
      val payloads = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      payloads.mapPartitions { it =>
        // codec/model init would happen here, once per partition
        it.map { case (id, bytes) =>
          val n = bytes.length
          val digest = (0 until 8).map { i =>
            // Long arithmetic to match the oracle's BIGINT: i*n overflows
            // Int for payloads above ~306 MB
            val lo = (i.toLong * n / 8).toInt
            val hi = ((i + 1).toLong * n / 8).toInt
            val step = math.max(1, (hi - lo) / 16)
            var sum = 0L; var sumSq = 0L
            var p = lo
            while (p < hi) {
              val v = bytes(p) & 0xff
              sum += v; sumSq += v.toLong * v
              p += step
            }
            s"$sum:$sumSq"
          }.mkString(",")
          MediaFeatures(id, n, digest)
        }
      }.toDF()
    }),

    // perceptual-hash near-duplicate detection (aHash family — the
    // standard image-dedup primitive every crawl pipeline runs on media
    // before training, catching re-encodes/recompressions exact hashing
    // misses). Codec-free stand-in like the rest of the family: the
    // payload splits into 64 equal byte blocks; bit_i = 1 iff block i's
    // mean byte value exceeds the payload mean (exact integer
    // cross-multiplication, no division) → a 64-bit hash carried as two
    // non-negative 32-bit halves (BIGINT-safe in both engines).
    //
    // Dedup shape at 100 TB: exact-duplicate hashes collapse FIRST
    // (group-by, one row per DISTINCT hash), then an 8-band × 8-bit LSH
    // self-join over distinct hashes finds near pairs — by pigeonhole,
    // hamming distance ≤ 7 GUARANTEES two hashes share a band, so the
    // banded candidate set is EXACTLY the ≤7-distance pair set (the
    // oracle verifies against the all-pairs definition). Canonical id is
    // the one-hop minimum neighbor (transitive closure is dedup_clusters'
    // job); never an all-pairs join over documents.
    "mm_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull) // NULL payloads are not media
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      val hashed = payloads.mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          val sums = new Array[Long](64)
          val cnts = new Array[Long](64)
          var total = 0L
          var i = 0
          while (i < 64) {
            val lo = (i * n / 64).toInt
            val hi = ((i + 1) * n / 64).toInt
            cnts(i) = (hi - lo).toLong
            var p = lo; var s0 = 0L
            while (p < hi) { s0 += bytes(p) & 0xff; p += 1 }
            sums(i) = s0; total += s0
            i += 1
          }
          var hiBits = 0L; var loBits = 0L
          i = 0
          while (i < 64) {
            // cross-multiplication bound: sums(i)*n ≈ 4n² overflows Long
            // past n ≈ 1.5 GB (byte arrays reach 2 GB) — exact BigInt on
            // the cold giant-payload path, plain longs on the hot one
            val bit =
              if (n <= 1000000000L) { if (sums(i) * n > total * cnts(i)) 1L else 0L }
              else { if (BigInt(sums(i)) * n > BigInt(total) * cnts(i)) 1L else 0L }
            if (i < 32) hiBits = (hiBits << 1) | bit else loBits = (loBits << 1) | bit
            i += 1
          }
          (id, hiBits, loBits)
        }
      }.toDF("doc_id", "phash_hi", "phash_lo")
        // THREE plan branches consume the hashes (reps aggregate, canon
        // join, final join) — one eager localCheckpoint = one per-byte
        // hashing pass over the corpus, not three (the Curation/
        // TextPipeline shared-subtree posture)
        .localCheckpoint(true)
      val reps = hashed.groupBy("phash_hi", "phash_lo").agg(min("doc_id").as("rep_id"))
      val bands = reps.select(col("rep_id"), col("phash_hi"), col("phash_lo"),
        explode(array((0 until 8).map { b =>
          val src = if (b < 4) col("phash_hi") else col("phash_lo")
          struct(lit(b).as("b"),
            shiftright(src, 8 * (3 - b % 4)).bitwiseAND(lit(255L)).as("v"))
        }: _*)).as("band"))
        .select(col("rep_id"), col("phash_hi"), col("phash_lo"),
          col("band.b").as("b"), col("band.v").as("v"))
      // min() absorbs the duplicate candidates from multi-band collisions,
      // so no distinct() pass is needed before the aggregate
      val neighbors = bands.as("a").join(bands.as("b"),
          col("a.b") === col("b.b") && col("a.v") === col("b.v") &&
            col("a.rep_id") =!= col("b.rep_id"))
        .select(col("a.rep_id").as("rep_id"), col("b.rep_id").as("rb"),
          col("a.phash_hi").as("ha"), col("a.phash_lo").as("la"),
          col("b.phash_hi").as("hb"), col("b.phash_lo").as("lb"))
        .filter(expr("bit_count(ha ^ hb) + bit_count(la ^ lb) <= 7"))
        .groupBy("rep_id").agg(min("rb").as("min_nb"))
      val canon = reps.join(neighbors, Seq("rep_id"), "left")
        .select(col("phash_hi"), col("phash_lo"),
          when(col("min_nb").isNull || col("min_nb") > col("rep_id"), col("rep_id"))
            .otherwise(col("min_nb")).as("canonical_id"))
      hashed.join(canon, Seq("phash_hi", "phash_lo"))
        .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
          col("canonical_id"), (col("canonical_id") =!= col("doc_id")).as("is_dup"))
    }),

    // image-style RESIZE (downsample): the payload reads as a W=16-column
    // byte grid (H = n/16 full rows, ragged tail dropped) and average-
    // pools 2×2 with stride 2 — the standard pre-model downsample, in
    // pure integer arithmetic ((a+b+c+d)/4 floor) so the oracle matches
    // byte-exactly. Same partition-batched stub boundary as mm_features:
    // a real pipeline swaps the byte grid for a decoded raster, and the
    // shape — batched per-partition kernel, scalar outputs, payloads
    // never on the driver — survives the swap.
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull) // NULL payloads are not media
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      payloads.mapPartitions { it =>
        it.map { case (id, bytes) =>
          val w = 16
          val h = bytes.length / w
          val oh = h / 2
          var sum = 0L; var sumSq = 0L
          var r = 0
          while (r < oh) {
            var c = 0
            while (c < w / 2) {
              val base = (2 * r) * w + 2 * c
              val v = ((bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
                (bytes(base + w) & 0xff) + (bytes(base + w + 1) & 0xff)) / 4
              sum += v; sumSq += v.toLong * v
              c += 1
            }
            r += 1
          }
          (id, w / 2, oh, sum, sumSq)
        }
      }.toDF("doc_id", "out_w", "out_h", "pooled_sum", "pooled_sumsq")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | CAST(doc_id % 3 AS INTEGER) AS media_kind
        |FROM documents""".stripMargin,
    "mm_frames" ->
      """SELECT d.doc_id,
        | CAST(f AS INTEGER) AS frame_idx,
        | md5(substring(d.text, CAST(f AS INTEGER) * 64 + 1, 16)) AS frame_fp
        |FROM documents d,
        | unnest(generate_series(0, CAST(floor(length(d.text) / 64) AS INTEGER))) AS t(f)""".stripMargin,
    // byte-exact twin of the perceptual hash: 64 block mean-threshold bits
    // from the hex payload, packed into two 32-bit halves, then the
    // ALL-PAIRS hamming ≤ 7 neighbor definition (which the Spark side's
    // 8-band LSH equals exactly by pigeonhole) and one-hop min canonical
    "mm_phash_dedup" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL
        |), blkbounds AS (
        |  SELECT b.doc_id, b.n, b.h, i.i AS blk,
        |         i.i * b.n // 64 AS lo, (i.i + 1) * b.n // 64 AS hi
        |  FROM b, unnest(generate_series(CAST(0 AS BIGINT), CAST(63 AS BIGINT))) AS i(i)
        |), persample AS (
        |  SELECT bb.doc_id, bb.blk,
        |    (strpos('0123456789ABCDEF', substring(bb.h, CAST(p.p * 2 + 1 AS INTEGER), 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF', substring(bb.h, CAST(p.p * 2 + 2 AS INTEGER), 1)) - 1) AS v
        |  FROM blkbounds bb, unnest(generate_series(bb.lo, bb.hi - 1)) AS p(p)
        |  WHERE bb.hi > bb.lo
        |), blksum AS (
        |  SELECT doc_id, blk, sum(v) AS s FROM persample GROUP BY 1, 2
        |), blocks AS (
        |  SELECT bb.doc_id, bb.n, bb.blk, bb.hi - bb.lo AS cnt,
        |         CAST(coalesce(bs.s, 0) AS BIGINT) AS s
        |  FROM blkbounds bb LEFT JOIN blksum bs
        |    ON bs.doc_id = bb.doc_id AND bs.blk = bb.blk
        |), tot AS (
        |  SELECT doc_id, CAST(sum(s) AS BIGINT) AS total FROM blocks GROUP BY 1
        |), bits AS (
        |  SELECT bl.doc_id, bl.blk,
        |    CASE WHEN bl.s * bl.n > t.total * bl.cnt THEN 1 ELSE 0 END AS bit
        |  FROM blocks bl JOIN tot t USING (doc_id)
        |), hashes AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN blk < 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(31 - blk AS INTEGER)) ELSE 0 END) AS BIGINT) AS phash_hi,
        |    CAST(sum(CASE WHEN blk >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(63 - blk AS INTEGER)) ELSE 0 END) AS BIGINT) AS phash_lo
        |  FROM bits GROUP BY 1
        |), reps AS (
        |  SELECT phash_hi, phash_lo, min(doc_id) AS rep_id FROM hashes GROUP BY 1, 2
        |), nb AS (
        |  SELECT a.rep_id, min(b.rep_id) AS min_nb
        |  FROM reps a JOIN reps b
        |    ON a.rep_id <> b.rep_id
        |   AND bit_count(xor(a.phash_hi, b.phash_hi))
        |     + bit_count(xor(a.phash_lo, b.phash_lo)) <= 7
        |  GROUP BY 1
        |), canon AS (
        |  SELECT r.phash_hi, r.phash_lo,
        |    CASE WHEN n.min_nb IS NULL OR n.min_nb > r.rep_id
        |      THEN r.rep_id ELSE n.min_nb END AS canonical_id
        |  FROM reps r LEFT JOIN nb n ON n.rep_id = r.rep_id
        |)
        |SELECT h.doc_id, h.phash_hi, h.phash_lo, c.canonical_id,
        |  (c.canonical_id <> h.doc_id) AS is_dup
        |FROM hashes h JOIN canon c
        |  ON c.phash_hi = h.phash_hi AND c.phash_lo = h.phash_lo""".stripMargin,

    // byte-exact twin of the 2x2 average pool: every pooled cell decodes
    // its 4 bytes from the hex payload and floors the mean; docs shorter
    // than two grid rows emit zero-cell rows via the left join
    "mm_resize" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL
        |), dims AS (
        |  SELECT doc_id, h, n // 16 AS hh FROM b
        |), cells AS (
        |  SELECT d.doc_id, (2 * r.i) * 16 + 2 * c.i AS base, d.h
        |  FROM dims d,
        |       unnest(generate_series(CAST(0 AS BIGINT), d.hh // 2 - 1)) AS r(i),
        |       unnest(generate_series(CAST(0 AS BIGINT), CAST(7 AS BIGINT))) AS c(i)
        |  WHERE d.hh >= 2
        |), vals AS (
        |  SELECT doc_id,
        |    (((strpos('0123456789ABCDEF', substring(h, CAST(base * 2 + 1 AS INTEGER), 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substring(h, CAST(base * 2 + 2 AS INTEGER), 1)) - 1))
        |   + ((strpos('0123456789ABCDEF', substring(h, CAST((base + 1) * 2 + 1 AS INTEGER), 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substring(h, CAST((base + 1) * 2 + 2 AS INTEGER), 1)) - 1))
        |   + ((strpos('0123456789ABCDEF', substring(h, CAST((base + 16) * 2 + 1 AS INTEGER), 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substring(h, CAST((base + 16) * 2 + 2 AS INTEGER), 1)) - 1))
        |   + ((strpos('0123456789ABCDEF', substring(h, CAST((base + 17) * 2 + 1 AS INTEGER), 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substring(h, CAST((base + 17) * 2 + 2 AS INTEGER), 1)) - 1))) // 4 AS v
        |  FROM cells
        |), agg AS (
        |  SELECT doc_id, sum(v) AS s, sum(v * v) AS sq FROM vals GROUP BY 1
        |)
        |SELECT d.doc_id, CAST(8 AS INTEGER) AS out_w,
        |  CAST(d.hh // 2 AS INTEGER) AS out_h,
        |  CAST(coalesce(a.s, 0) AS BIGINT) AS pooled_sum,
        |  CAST(coalesce(a.sq, 0) AS BIGINT) AS pooled_sumsq
        |FROM dims d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // byte-exact twin of the Spark featurizer: UTF-8 payload → hex, byte
    // values recovered per sampled position, integer (sum, sumsq) moments
    // per block — identical stride arithmetic (integer // division)
    "mm_features" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL
        |), samples AS (
        |  SELECT b.doc_id, blk.i AS blk,
        |         CASE WHEN s.p < (blk.i + 1) * b.n // 8 THEN
        |           (strpos('0123456789ABCDEF', substring(b.h, CAST(s.p * 2 + 1 AS INTEGER), 1)) - 1) * 16
        |         + (strpos('0123456789ABCDEF', substring(b.h, CAST(s.p * 2 + 2 AS INTEGER), 1)) - 1)
        |         END AS v
        |  FROM b,
        |       unnest(generate_series(CAST(0 AS BIGINT), CAST(7 AS BIGINT))) AS blk(i),
        |       unnest(generate_series(blk.i * b.n // 8,
        |                              greatest(blk.i * b.n // 8, (blk.i + 1) * b.n // 8 - 1),
        |                              greatest(CAST(1 AS BIGINT),
        |                                       ((blk.i + 1) * b.n // 8 - blk.i * b.n // 8) // 16))) AS s(p)
        |), moments AS (
        |  SELECT doc_id, blk, coalesce(sum(v), 0) AS s, coalesce(sum(v * v), 0) AS ss
        |  FROM samples GROUP BY doc_id, blk
        |), digests AS (
        |  SELECT doc_id,
        |         string_agg(CAST(s AS VARCHAR) || ':' || CAST(ss AS VARCHAR), ',' ORDER BY blk) AS features_digest
        |  FROM moments GROUP BY doc_id
        |)
        |SELECT b.doc_id, CAST(b.n AS INTEGER) AS n_bytes, d.features_digest
        |FROM b JOIN digests d ON b.doc_id = d.doc_id""".stripMargin
  )
}
