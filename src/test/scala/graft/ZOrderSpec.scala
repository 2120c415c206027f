package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderKey
import graft.spatial.Snapshots

/** Z-order rewrite: `rewrite_data_files(strategy => 'sort', sort_order =>
  * 'zorder(c1, …, cN)')` — the reference's `SparkZOrderDataRewriter` /
  * `SparkZOrderUDF` surface. The clustering payoff under test: after the
  * rewrite, per-file min/max stats prune files for single-column
  * predicates on EVERY zorder column.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ---- key construction properties ----------------------------------------

  private def key(vs: Long*): Array[Byte] =
    ZOrderKey.interleave(vs.map(_ ^ Long.MinValue).toArray)

  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  test("zorder key is monotone in one dimension when the others are fixed") {
    // x varies, y fixed: first differing interleaved bit comes from x
    for (y <- Seq(0L, 7L, 99L, -5L)) {
      val keys = Seq(-100L, -1L, 0L, 1L, 50L, 1000L).map(x => key(x, y))
      keys.sliding(2).foreach {
        case Seq(a, b) => assert(cmp(a, b) < 0, "keys must order by the varying dim")
        case _ =>
      }
    }
    // same along y
    val ks = Seq(-3L, 2L, 40L).map(y => key(5L, y))
    assert(cmp(ks(0), ks(1)) < 0 && cmp(ks(1), ks(2)) < 0)
  }

  test("zorder key interleaves: quadrant dominates either single coordinate") {
    // both-small is below both-large regardless of within-quadrant detail
    val smallSmall = key(3L, 7L)
    val largeLarge = key(1L << 40, 1L << 40)
    assert(cmp(smallSmall, largeLarge) < 0)
  }

  test("zorder_key expression evaluates over mixed types and nulls order first") {
    import org.apache.spark.sql.functions._
    graft.functions.GeoSql.install(spark)
    import spark.implicits._
    val df = Seq((Some(5.0), "bb"), (None, "aa"), (Some(-1.5), "cc"))
      .toDF("d", "s")
      .select(call_function("zorder_key", col("d"), col("s")).as("k"), col("d"))
    val rows = df.collect()
    assert(rows.forall(_.getAs[Array[Byte]]("k").length == 16))
    val nullKey = rows.find(_.isNullAt(1)).get.getAs[Array[Byte]]("k")
    // the null contributes the smallest word: its key has a zero MSB run
    assert((nullKey(0) & 0x80) == 0)
  }

  // ---- the rewrite itself --------------------------------------------------

  test("zorder rewrite: min/max on BOTH columns prune single-column predicates") {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_zow").toString
    spark.conf.set("spark.sql.catalog.zcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.zcat.warehouse", wh)
    spark.sql("CREATE TABLE zcat.db.z (id BIGINT, x DOUBLE, y DOUBLE)")
    // 4 appends, each spanning the FULL x and y ranges → every file's
    // min/max covers everything, nothing prunes before the rewrite
    (0 until 4).foreach { k =>
      spark.sql(
        s"""INSERT INTO zcat.db.z
           |SELECT id, CAST((id * 37 + $k) % 100 AS DOUBLE) x,
           |       CAST((id * 61 + $k * 7) % 100 AS DOUBLE) y
           |FROM range(2500)""".stripMargin)
    }
    val dir = s"$wh/db/z"
    val before = Snapshots.readManifest(dir)
    def mn(f: graft.spatial.FileStats, c: String) = f.mins(c).toString.toDouble
    def mx(f: graft.spatial.FileStats, c: String) = f.maxs(c).toString.toDouble
    assert(before.forall(f => mn(f, "x") <= 5 && mx(f, "x") >= 95),
      "fixture must start unprunable on x")
    assert(before.forall(f => mn(f, "y") <= 5 && mx(f, "y") >= 95),
      "fixture must start unprunable on y")
    val rowsBefore = spark.sql("SELECT id, x, y FROM zcat.db.z").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet

    val total = before.map(_.sizeBytes).sum
    val (_, rewritten) = Snapshots.rewriteDataFiles(spark, dir, strategy = "sort",
      zorderCols = Seq("x", "y"), targetFileSize = Some(total / 8))
    assert(rewritten == before.size)

    val after = Snapshots.readManifest(dir)
    assert(after.size >= 4, s"expected several output files, got ${after.size}")
    // single-column predicates must prune: x < 10 and y < 10 each touch
    // only the z-ranges whose x (resp. y) half is low
    val hitX = after.count(f => mn(f, "x") < 10)
    val hitY = after.count(f => mn(f, "y") < 10)
    assert(hitX < after.size, s"x predicate must prune: $hitX of ${after.size}")
    assert(hitY < after.size, s"y predicate must prune: $hitY of ${after.size}")
    assert(hitX <= (after.size + 1) / 2, s"x pruning too weak: $hitX of ${after.size}")
    assert(hitY <= (after.size + 1) / 2, s"y pruning too weak: $hitY of ${after.size}")
    // rows unchanged
    val rowsAfter = spark.sql("SELECT id, x, y FROM zcat.db.z").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(rowsAfter == rowsBefore)
    // and the DSv2 scan actually prunes on the stats
    val q = spark.sql("SELECT id FROM zcat.db.z WHERE x < 10")
    assert(SparkTestSession.plannedFiles(q) == hitX)
  }

  test("CALL rewrite_data_files with sort_order => 'zorder(x, y)'") {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_zow2").toString
    spark.conf.set("spark.sql.catalog.zcat2", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.zcat2.warehouse", wh)
    spark.sql("CREATE TABLE zcat2.db.z (id BIGINT, x BIGINT, y BIGINT)")
    (0 until 2).foreach { k =>
      spark.sql(s"INSERT INTO zcat2.db.z SELECT id, (id * 37 + $k) % 100, " +
        s"(id * 61 + $k) % 100 FROM range(2000)")
    }
    val dir = s"$wh/db/z"
    val total = Snapshots.readManifest(dir).map(_.sizeBytes).sum
    val out = spark.sql(s"CALL graft.system.rewrite_data_files('$dir', " +
      s"strategy => 'sort', sort_order => 'zorder(x, y)', " +
      s"target_file_size => ${math.max(1, total / 4)})").collect()
    assert(out.head.getString(1).startsWith("rewritten_files="))
    val after = Snapshots.readManifest(dir)
    assert(after.size >= 2)
    assert(after.count(_.mins("x").toString.toLong < 10) < after.size)
    assert(after.count(_.mins("y").toString.toLong < 10) < after.size)
    assert(spark.sql("SELECT count(*) FROM zcat2.db.z").head.getLong(0) == 4000)
  }
}
