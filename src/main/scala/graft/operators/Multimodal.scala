package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB; everything around it — schema,
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

    // per-partition batched "decode + featurize" over binary payloads
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      payloads.mapPartitions { it =>
        // STUB decoder: a real pipeline would init an image/audio codec or
        // model once per partition here. The stand-in samples bytes
        // deterministically so results are stable and testable.
        it.map { case (id, bytes) =>
          val f = Array.tabulate(8) { i =>
            if (bytes.isEmpty) 0.0
            else (bytes(((i * 7919) % bytes.length + bytes.length) % bytes.length) & 0xff) / 255.0
          }
          val digest = f.map(v => "%.4f".format(math.rint(v * 10000) / 10000)).mkString(",")
          MediaFeatures(id, bytes.length, digest)
        }
      }.toDF()
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
        | unnest(generate_series(0, CAST(floor(length(d.text) / 64) AS INTEGER))) AS t(f)""".stripMargin
  )
}
