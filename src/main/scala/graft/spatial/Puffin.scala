package graft.spatial

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

/** Minimal writer for the Puffin statistics-file format (the public
  * Iceberg spec; ref `core/src/main/java/org/apache/iceberg/puffin/` —
  * PuffinFormat framing, StandardBlobTypes type strings): a file is
  *
  * {{{
  *   Magic | blob payloads (concatenated) | footer
  *   footer = Magic | footer-payload (UTF-8 JSON) |
  *            payload-size (4-byte little-endian int) | flags (4 bytes) |
  *            Magic
  * }}}
  *
  * with the footer JSON listing each blob's `type`, `offset`, `length`
  * and free-form `properties`. Flags are all-zero here (bit 0 of byte 0
  * would mark an lz4-compressed footer payload; graft writes plain).
  *
  * The blobs carry Spark's `hll_sketch_agg` output — a serialized
  * `org.apache.datasketches.hll.HllSketch`, consumable by any Apache
  * DataSketches reader — declared as `apache-datasketches-hll-v1`, the
  * HLL twin of the spec's `apache-datasketches-theta-v1` NDV blob
  * (Iceberg defines no standard HLL type; external readers key off the
  * type string, the `ndv` property the spec recommends for stats blobs,
  * and the per-blob `column` property naming the sketched column).
  */
object Puffin {
  val Magic: Array[Byte] = Array('P'.toByte, 'F'.toByte, 'A'.toByte, '1'.toByte)
  val HllBlobType = "apache-datasketches-hll-v1"

  // ONE JSON-escaper seat for the spatial sidecars
  private def esc(s: String): String = GeoTable.escJson(s)

  private def propsJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")

  /** Write `file` with one blob per entry of `blobs`
    * (type, payload, blob properties), stamping `snapshotId` on each blob
    * per the spec's snapshot-id field.
    */
  def write(file: Path, blobs: Seq[(String, Array[Byte], Map[String, String])],
      snapshotId: Long, fileProps: Map[String, String] = Map.empty): Unit = {
    Files.createDirectories(file.getParent)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val entries = blobs.map { case (tpe, payload, props) =>
      val offset = out.size().toLong
      out.write(payload)
      s"""{"type":"${esc(tpe)}","fields":[],"snapshot-id":$snapshotId,""" +
        s""""sequence-number":$snapshotId,"offset":$offset,""" +
        s""""length":${payload.length},"properties":${propsJson(props)}}"""
    }
    val footerJson =
      s"""{"blobs":[${entries.mkString(",")}],"properties":${propsJson(fileProps)}}"""
    val payload = footerJson.getBytes(UTF_8)
    out.write(Magic)
    out.write(payload)
    // 4-byte little-endian payload size, then 4 flag bytes (all clear)
    val size = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(payload.length).array()
    out.write(size)
    out.write(Array[Byte](0, 0, 0, 0))
    out.write(Magic)
    Files.write(file, out.toByteArray)
    ()
  }
}
