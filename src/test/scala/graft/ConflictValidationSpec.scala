package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.Snapshots

/** Conflict validation on overwrite commits — the reference's
  * `validate-from-snapshot-id` / `isolation-level` write options
  * (`TestConflictValidation.java` in /root/reference): a writer declares
  * the snapshot its decision was based on, and the commit fails if a
  * concurrent commit since then could affect rows in the overwrite's
  * scope. `serializable` treats concurrent appends in scope as conflicts;
  * `snapshot` admits appends and fails only on concurrent deletes.
  */
class ConflictValidationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val warehouse: String = {
    graft.spatial.Geo.install(spark)
    val wh = Files.createTempDirectory("graft_cv_wh").toString
    spark.conf.set("spark.sql.catalog.cvcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cvcat.warehouse", wh)
    wh
  }

  private var n = 0
  private def mkTable(): (String, String) = {
    val wh = warehouse // force catalog registration before the CREATE
    assert(wh.nonEmpty)
    n += 1
    val name = s"cv$n"
    spark.sql(s"CREATE TABLE cvcat.db.$name (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO cvcat.db.$name VALUES (1, 1.0), (2, 2.0), (50, 50.0)")
    (s"cvcat.db.$name", s"$warehouse/db/$name")
  }

  import spark.implicits._

  test("filter overwrite: serializable flags a concurrent in-scope append") {
    val (tbl, path) = mkTable()
    val v1 = Snapshots.mainVersion(path)
    // concurrent append lands a row the overwrite's filter would cover
    spark.sql(s"INSERT INTO $tbl VALUES (3, 3.0)")
    val df = Seq((1L, 10.0)).toDF("id", "v")
    val e = intercept[Exception] {
      df.writeTo(tbl)
        .option("validate-from-version", v1.toString)
        .option("isolation-level", "serializable")
        .overwrite(col("id") < 10)
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("conflicting files added"), msgs(e))
    // validating from the LATEST snapshot succeeds
    val v2 = Snapshots.mainVersion(path)
    df.writeTo(tbl)
      .option("validate-from-version", v2.toString)
      .option("isolation-level", "serializable")
      .overwrite(col("id") < 10)
    assert(spark.table(tbl).filter(col("id") < 10).count() == 1)
  }

  test("filter overwrite: out-of-scope concurrent append is admissible") {
    val (tbl, path) = mkTable()
    val v1 = Snapshots.mainVersion(path)
    // the concurrent append's stats (id=500) cannot match id < 10
    spark.sql(s"INSERT INTO $tbl VALUES (500, 500.0)")
    Seq((1L, 10.0)).toDF("id", "v").writeTo(tbl)
      .option("validate-from-version", v1.toString)
      .option("isolation-level", "serializable")
      .overwrite(col("id") < 10)
    assert(spark.table(tbl).filter(col("id") === 500L).count() == 1)
  }

  test("snapshot isolation admits appends but flags concurrent deletes") {
    val (tbl, path) = mkTable()
    val v1 = Snapshots.mainVersion(path)
    spark.sql(s"INSERT INTO $tbl VALUES (3, 3.0)") // in-scope append: OK at snapshot level
    Seq((1L, 10.0)).toDF("id", "v").writeTo(tbl)
      .option("validate-from-version", v1.toString)
      .option("isolation-level", "snapshot")
      .overwrite(col("id") < 10)
    // now a concurrent CoW DELETE (removes an in-scope file) conflicts
    val v2 = Snapshots.mainVersion(path)
    spark.sql(s"DELETE FROM $tbl WHERE id = 50")
    val e = intercept[Exception] {
      Seq((2L, 20.0)).toDF("id", "v").writeTo(tbl)
        .option("validate-from-version", v2.toString)
        .option("isolation-level", "snapshot")
        .overwrite(col("id") < 100)
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("conflicting files deleted"), msgs(e))
  }

  test("dynamic overwrite: conflicts scope to the touched partitions") {
    val (tbl, path) = (s"cvcat.db.cvdyn", s"$warehouse/db/cvdyn")
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 'a'), (2, 'b')")
    val v1 = Snapshots.mainVersion(path)
    // concurrent append into partition a
    spark.sql(s"INSERT INTO $tbl VALUES (10, 'a')")
    // dynamic overwrite touching ONLY partition b: no conflict
    Seq((20L, "b")).toDF("id", "p").writeTo(tbl)
      .option("validate-from-version", v1.toString)
      .overwritePartitions()
    // touching partition a from the stale snapshot: conflict
    val e = intercept[Exception] {
      Seq((30L, "a")).toDF("id", "p").writeTo(tbl)
        .option("validate-from-version", v1.toString)
        .overwritePartitions()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("conflicting"), msgs(e))
    // without the option, last-writer-wins (no validation) still works
    Seq((30L, "a")).toDF("id", "p").writeTo(tbl).overwritePartitions()
    assert(spark.table(tbl).filter(col("p") === "a").count() == 1)
  }

  test("validate-from-version must be an ancestor; bad level rejected") {
    val (tbl, path) = mkTable()
    val e = intercept[Exception] {
      Seq((1L, 1.0)).toDF("id", "v").writeTo(tbl)
        .option("validate-from-version", "999")
        .overwrite(col("id") < 10)
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("not an ancestor"), msgs(e))
    val e2 = intercept[Exception] {
      Seq((1L, 1.0)).toDF("id", "v").writeTo(tbl)
        .option("validate-from-version", Snapshots.mainVersion(path).toString)
        .option("isolation-level", "read-committed")
        .overwrite(col("id") < 10)
    }
    assert(msgs(e2).contains("isolation-level"), msgs(e2))
  }
}
