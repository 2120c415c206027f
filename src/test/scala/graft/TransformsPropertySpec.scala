package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.Transforms

/** The correctness-critical invariant of partition projection: the value
  * `project(literal)` computes at PLANNING time must equal what
  * `writeExpr` wrote into the directory name for the same source value —
  * any divergence would prune files that contain matching rows.
  */
class TransformsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val longs = (-50 until 50).map(i => i.toLong * 7919 + i)
  private val strings = (0 until 100).map(i => s"k${i % 13}_value$i")
  private val dates = (0 until 100).map(i =>
    java.sql.Date.valueOf(java.time.LocalDate.of(1965 + i % 70, i % 12 + 1, i % 28 + 1)))

  private def evalWrite(t: Transforms.Transform, field: StructField,
      values: Seq[Any]): Seq[Any] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(values.map(Row(_)), 2), StructType(Seq(field)))
    df.select(Transforms.writeExpr(t, df).as("d")).collect().map(_.get(0)).toSeq
  }

  private def norm(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case n: Number => BigDecimal(n.toString)
    case other => other
  }

  test("truncate projection counts CODE POINTS like the write path " +
      "(supplementary characters must not desync projection from the dir value)") {
    val t = Transforms.parse("truncate(2, s)")
    // "😀ab": take(2) in UTF-16 units would yield just the emoji — the
    // write path's substring(col, 1, 2) yields emoji + 'a'
    val v = "😀ab"
    val expect = "😀a"
    assert(t.project(v) == Some(expect))
    assert(t.project(UTF8String.fromString(v)) == Some(UTF8String.fromString(expect)))
    // parity with the actual write expression
    val written = evalWrite(t, StructField("s", StringType), Seq(v))
    assert(norm(written.head) == expect)
  }

  test("V2 BOUND truncate(string) counts code points — SPJ identity with " +
      "the write derivation holds for supplementary characters") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.connector.catalog.functions.ScalarFunction
    val bound = graft.sources.GraftFunctions.load("truncate").get
      .bind(StructType(Seq(StructField("w", IntegerType), StructField("s", StringType))))
      .asInstanceOf[ScalarFunction[Any]]
    val got = bound.produceResult(new GenericInternalRow(
      Array[Any](2, UTF8String.fromString("😀ab"))))
    // UTF-16 take(2) would return just the emoji; code-point semantics
    // (the write path's substring) return emoji + 'a'
    assert(got == UTF8String.fromString("😀a"))
    val t = Transforms.parse("truncate(2, s)")
    assert(t.project("😀ab").contains("😀a"))
  }

  test("bucket projection equals the written bucket id for long keys") {
    val t = Transforms.parse("bucket(8, l)")
    val written = evalWrite(t, StructField("l", LongType), longs)
    longs.zip(written).foreach { case (v, w) =>
      assert(norm(t.project(v).get) == norm(w), s"bucket($v)")
    }
  }

  test("numeric truncate projection equals the written value") {
    val t = Transforms.parse("truncate(7, l)")
    val written = evalWrite(t, StructField("l", LongType), longs)
    longs.zip(written).foreach { case (v, w) =>
      assert(norm(t.project(v).get) == norm(w), s"truncate($v)")
    }
  }

  test("string truncate projection equals the written prefix (both literal reprs)") {
    val t = Transforms.parse("truncate(4, s)")
    val written = evalWrite(t, StructField("s", StringType), strings)
    strings.zip(written).foreach { case (v, w) =>
      assert(norm(t.project(v).get) == norm(w), s"truncate('$v')")
      // predicates carry UTF8String literals
      assert(norm(t.project(UTF8String.fromString(v)).get) == norm(w))
    }
  }

  test("year/month/day projections equal the written ordinals for date keys") {
    Seq("year(d)", "month(d)", "day(d)").foreach { spec =>
      val t = Transforms.parse(spec)
      val written = evalWrite(t, StructField("d", DateType), dates)
      dates.zip(written).foreach { case (v, w) =>
        // DateType literals arrive as epoch days
        val days = v.toLocalDate.toEpochDay.toInt
        assert(norm(t.project(days).get) == norm(w), s"$spec($v)")
      }
    }
  }

  test("hour projection equals the written epoch-hour for timestamp keys") {
    val t = Transforms.parse("hour(ts)")
    // spread across decades incl. pre-1970 (negative micros: floorDiv
    // semantics) and epsilon-under-boundary instants (a float-floor write
    // derivation would round these UP — the integer arithmetic must not)
    val micros = ((-50 until 50).map(i => i.toLong * 3600L * 1000000L * 977 + i * 1234567L) ++
      (1 until 10).map(i => i.toLong * 3600L * 1000000L - 1L)).distinct
    val ts = micros.map(us => java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS)))
    val written = evalWrite(t, StructField("ts", TimestampType), ts)
    micros.zip(written).foreach { case (us, w) =>
      // TimestampType literals arrive as epoch micros
      assert(norm(t.project(us).get) == norm(w), s"hour($us)")
      assert(norm(w) == norm(Math.floorDiv(us, 3600L * 1000000L).toInt), s"floorDiv($us)")
    }
  }

  test("bucket projection matches Spark literals of every integral width") {
    // EqualTo casts the literal to the column type before our matcher sees
    // it, but guard the hash anyway: same value, same bucket, per type
    val t = Transforms.parse("bucket(16, x)")
    val ints = (0 until 50).map(i => i * 37)
    val writtenInt = evalWrite(t, StructField("x", IntegerType), ints)
    ints.zip(writtenInt).foreach { case (v, w) =>
      assert(norm(t.project(v).get) == norm(w), s"bucket(int $v)")
    }
  }

  test("PartitionPaths.cast returns None for malformed dir values, never throws") {
    import graft.spatial.PartitionPaths
    // a corrupt or foreign directory name must degrade pruning/SPJ to
    // "unknown", not abort planning
    assert(PartitionPaths.cast("not_a_number", IntegerType).isEmpty)
    assert(PartitionPaths.cast("12.5.7", DoubleType).isEmpty)
    assert(PartitionPaths.cast("yesterday", DateType).isEmpty)
    assert(PartitionPaths.cast("", LongType).isEmpty)
    assert(PartitionPaths.cast("x", TimestampType).isEmpty) // uncastable type
    assert(PartitionPaths.cast("42", IntegerType).contains(42))
    assert(PartitionPaths.cast("2024-01-05", DateType)
      .contains(java.time.LocalDate.of(2024, 1, 5).toEpochDay.toInt))
  }
}
