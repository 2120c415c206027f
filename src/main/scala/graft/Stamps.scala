package graft

/** Content stamps for cache-freshness fingerprints — the ONE seat shared
  * by every derived-artifact cache (the vector index in
  * [[graft.operators.Similarity]], the grid materialization in
  * [[graft.operators.GeoQueries]]).
  *
  * Why content and not size+mtime: a corpus regenerated with identical
  * file sizes inside the mtime granularity window validated a stale
  * vector index (r11 advisor finding) — different values change the
  * parquet footer's row counts / min-max stats, and the footer lives in
  * the file tail, so a tail CRC sees any regeneration. Driver-side,
  * O(64 KB) per file, no executors.
  */
object Stamps {

  /** Per-file CONTENT stamp: size + CRC32 of the file TAIL (last 64 KB —
    * where the parquet footer with its row counts and per-column min/max
    * stats lives). Sees any regeneration that changes the footer (row
    * counts, stats, page offsets) — which real parquet regeneration does;
    * a hand-crafted mid-page byte swap that preserves the exact footer is
    * out of this check's O(64 KB) budget by design.
    *
    * Memoized per (path, size, mtime): the grid queries re-validate their
    * warehouse on EVERY invocation, and re-CRCing 64 KB x #files per join
    * would put O(GBs) of driver I/O on the timed path at 100 TB. The memo
    * key is exactly the stat pair whose cross-RUN collisions motivated
    * content stamping — within one JVM a regeneration landing on the same
    * size AND same mtime tick is the already-accepted residual risk, and
    * every new process re-reads content from scratch.
    */
  def fileStamp(f: java.nio.file.Path): String = {
    val size = java.nio.file.Files.size(f)
    val mtime = java.nio.file.Files.getLastModifiedTime(f).toMillis
    val key = (f.toAbsolutePath.toString, size, mtime)
    val hit = stampMemo.get(key)
    if (hit != null) return hit
    val tail = math.min(size, 65536L).toInt
    val ch = java.nio.channels.FileChannel.open(f)
    try {
      val buf = java.nio.ByteBuffer.allocate(tail)
      var read = 0
      while (read < tail) {
        val k = ch.read(buf, size - tail + read)
        if (k < 0) throw new java.io.EOFException(f.toString)
        read += k
      }
      val crc = new java.util.zip.CRC32()
      crc.update(buf.array(), 0, tail)
      val stamp = s"$size:${java.lang.Long.toHexString(crc.getValue)}"
      stampMemo.put(key, stamp)
      stamp
    } finally ch.close()
  }

  // count-bounded: values are tiny, 64k entries ≈ a few MB.
  // private[graft]: specs clear it to simulate the fresh process a real
  // cross-run regeneration is observed by
  private[graft] val stampMemo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long, Long), String](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long, Long), String]): Boolean =
          size() > 65536
      })

  /** A parquet table root's data files as (relative path, file) pairs,
    * name-sorted. RECURSIVE: a hive-partitioned table nests its files
    * under `k=v/` dirs — a top-level-only listing would fingerprint such
    * a table as empty and validate a stale cache forever. Any path
    * segment starting with `_`/`.` (markers, hidden) is excluded,
    * matching what `spark.read.parquet` ignores. A plain-file root lists
    * as itself.
    */
  def dataFiles(root: String): Seq[(String, java.nio.file.Path)] = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.isDirectory(p))
      graft.spatial.Snapshots.walkDir(p)(_.toSeq)
        .filter { f =>
          java.nio.file.Files.isRegularFile(f) && {
            val rel = p.relativize(f)
            (0 until rel.getNameCount).forall { i =>
              val seg = rel.getName(i).toString
              !seg.startsWith("_") && !seg.startsWith(".")
            }
          }
        }
        .map(f => p.relativize(f).toString -> f)
        .sortBy(_._1)
    else Seq(p.getFileName.toString -> p)
  }

  /** One short hex fingerprint over a set of table roots: every data
    * file's relative path + content stamp, digested in listing order.
    * Any regeneration that changes the footers — same sizes, same mtimes
    * included — changes it (see [[fileStamp]] for the exact contract).
    */
  def tableFingerprint(roots: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    roots.foreach { r =>
      dataFiles(r).foreach { case (rel, f) =>
        md.update(s"$rel:${fileStamp(f)}\n".getBytes("UTF-8"))
      }
    }
    md.digest().take(6).map("%02x".format(_)).mkString
  }
}
