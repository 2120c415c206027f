package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The shared content-stamp seat ([[Stamps]]): the freshness input of
  * every derived-artifact cache (vector index, grid materialization).
  * The class under test is the r12 staleness hole — a regenerated input
  * with IDENTICAL length and mtime must still change the fingerprint, so
  * `geo_grid_spj_join`'s warehouse key (`gridspjwh2_<fp>`) rebuilds the
  * grid instead of serving stale rows.
  */
class StampsSpec extends AnyFunSuite {

  test("same-length same-mtime regeneration changes the fingerprint") {
    val root = Files.createTempDirectory("graft_stamps").toString
    val f = Paths.get(root, "t.parquet")
    Files.write(f, Array.fill[Byte](128 * 1024)(1)) // > one 64 KB tail
    val mtime = Files.getLastModifiedTime(f)
    val fp1 = Stamps.tableFingerprint(Seq(f.toString))

    // regenerate: same length, different bytes, mtime forced back
    val bytes = Array.fill[Byte](128 * 1024)(1)
    bytes(bytes.length - 1) = 2 // a footer-tail byte — where stats live
    Files.write(f, bytes)
    Files.setLastModifiedTime(f, mtime)
    assert(Files.size(f) == 128 * 1024 &&
      Files.getLastModifiedTime(f) == mtime, "precondition: length+mtime identical")
    // a real cross-run regeneration is observed by a FRESH process whose
    // stat-keyed stamp memo is cold — simulate that; the memo itself is
    // the accepted in-process residual (the ManifestCache key precedent)
    Stamps.stampMemo.clear()
    val fp2 = Stamps.tableFingerprint(Seq(f.toString))
    assert(fp1 != fp2, "a same-length same-mtime regeneration must change the stamp")
  }

  test("listing is recursive and skips hidden/marker segments") {
    val root = Files.createTempDirectory("graft_stamps_rec")
    val nested = Files.createDirectories(root.resolve("k=1"))
    Files.write(nested.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    Files.write(root.resolve("_SUCCESS"), Array[Byte]())
    Files.write(root.resolve(".hidden"), Array[Byte](9))
    val listed = Stamps.dataFiles(root.toString).map(_._1)
    assert(listed == Seq(s"k=1${java.io.File.separator}part-0.parquet"),
      s"expected only the nested data file, got $listed")
    // a nested-file change must flow into the fingerprint: a top-level-only
    // walk would hash nothing for partitioned layouts (r16 advisor)
    val fp1 = Stamps.tableFingerprint(Seq(root.toString))
    Files.write(nested.resolve("part-0.parquet"), Array[Byte](1, 2, 4))
    // fresh-process simulation, same as the test above: the rewrite keeps
    // the length and — on coarse-mtime filesystems under concurrent-suite
    // load — can keep the mtime, in which case the stat-keyed memo
    // legitimately serves the old stamp in-process (the accepted
    // residual). The claim under test is the recursive WALK, not the
    // memo, so observe the change as a cold process would. (r19: this
    // assert flaked once in a loaded full-suite run exactly this way.)
    Stamps.stampMemo.clear()
    assert(Stamps.tableFingerprint(Seq(root.toString)) != fp1)
  }
}
