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
  */
object Multimodal {

  case class MediaFeatures(doc_id: Long, n_bytes: Int, features: Array[Double])

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // metadata extraction over the binary payload (codegen'd, no decode)
    "mm_meta" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          (col("doc_id") % 3).cast("int").as("media_kind"))
    }),

    // frame sampling: every k-th fixed-size block of the payload becomes a
    // "frame" fingerprint (video-style access pattern; decode is the same
    // stub boundary as mm_features — the block arithmetic is the real part)
    "mm_frames" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          expr("transform(sequence(0, int(octet_length(payload) / 64)), " +
            "f -> xxhash64(substring(payload, f * 64 + 1, 16)))").as("frame_fps"))
        .withColumn("n_frames", size(col("frame_fps")))
        .select(col("doc_id"), col("n_frames"), col("frame_fps"))
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
          MediaFeatures(id, bytes.length, f.map(v => math.rint(v * 10000) / 10000))
        }
      }.toDF()
    })
  )

  val oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | CAST(doc_id % 3 AS INTEGER) AS media_kind
        |FROM documents""".stripMargin
  )
}
