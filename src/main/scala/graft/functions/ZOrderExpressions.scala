package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `zorder_key(c1, …, cN)` — the multi-column Z-order (Morton) clustering
  * key: each value normalizes to an order-preserving unsigned 64-bit word,
  * the words bit-interleave MSB-first into an `8·N`-byte key, and sorting
  * the keys (Spark compares BinaryType unsigned-lexicographically)
  * interleaves the dimensions — rows close on EVERY column land close in
  * the output order, so post-rewrite per-file min/max stats prune for
  * single-column predicates on any of the N columns.
  *
  * The reference builds the same key as a UDF over fixed-width byte
  * arrays (`spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/actions/SparkZOrderUDF.java`,
  * wired by `SparkZOrderDataRewriter.java` in /root/reference); here it is
  * a Catalyst expression evaluated only on the rewrite path (maintenance,
  * not the query hot path — CodegenFallback is deliberate, matching the
  * reference's UDF posture).
  *
  * Normalizations (order-preserving into unsigned space):
  *  - integral / date / timestamp: `v ⊕ Long.MinValue` (sign-bit flip)
  *  - float / double: IEEE bits, negatives bit-inverted, positives
  *    sign-flipped (the classic total-order trick; widened to double)
  *  - string / binary: first 8 bytes big-endian, zero-padded (the
  *    reference truncates to a fixed prefix the same way)
  *  - boolean: 0 / 1 sign-flipped; null: the smallest word (nulls first)
  */
case class ZOrderKey(children: Seq[Expression]) extends Expression with CodegenFallback {

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty)
      return TypeCheckResult.TypeCheckFailure("zorder_key needs at least one column")
    val bad = children.filterNot(c => ZOrderKey.supported(c.dataType))
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key: unsupported type(s) ${bad.map(_.dataType.simpleString).mkString(", ")}")
  }

  @transient private lazy val convs: Array[Any => Long] =
    children.map(c => ZOrderKey.converter(c.dataType)).toArray

  override def eval(input: InternalRow): Any = {
    val longs = new Array[Long](children.length)
    var i = 0
    while (i < longs.length) {
      val v = children(i).eval(input)
      // null -> the all-zero word, which COLLIDES with the minimum value
      // of sign-flipped integral columns: nulls cluster with Long.MinValue
      // rows. Clustering-quality-only — min/max file stats stay exact, so
      // pruning is unaffected; the reference takes the same posture
      // (SparkZOrderUDF's null handling).
      longs(i) = if (v == null) 0L else convs(i)(v)
      i += 1
    }
    ZOrderKey.interleave(longs)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderKey {

  private[functions] def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         BooleanType | DateType | TimestampType | TimestampNTZType |
         StringType | BinaryType => true
    case _ => false
  }

  /** Order-preserving map into unsigned-comparable 64-bit space. */
  private[functions] def converter(dt: DataType): Any => Long = dt match {
    case ByteType => v => (v.asInstanceOf[Byte].toLong) ^ Long.MinValue
    case ShortType => v => (v.asInstanceOf[Short].toLong) ^ Long.MinValue
    case IntegerType | DateType => v => (v.asInstanceOf[Int].toLong) ^ Long.MinValue
    case LongType | TimestampType | TimestampNTZType =>
      v => v.asInstanceOf[Long] ^ Long.MinValue
    case BooleanType => v => (if (v.asInstanceOf[Boolean]) 1L else 0L) ^ Long.MinValue
    case FloatType => v => fromDouble(v.asInstanceOf[Float].toDouble)
    case DoubleType => v => fromDouble(v.asInstanceOf[Double])
    case StringType => v => bytesPrefix(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => v => bytesPrefix(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(s"zorder_key over $other")
  }

  private def fromDouble(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d) // canonical NaN
    if (bits < 0) ~bits else bits ^ Long.MinValue
  }

  private def bytesPrefix(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    v
  }

  /** MSB-first round-robin bit interleave of N unsigned words into an
    * `8·N`-byte big-endian key.
    */
  def interleave(vs: Array[Long]): Array[Byte] = {
    val n = vs.length
    val out = new Array[Byte](n * 8)
    var bit = 0
    while (bit < 64) {
      var j = 0
      while (j < n) {
        if (((vs(j) >>> (63 - bit)) & 1L) != 0L) {
          val outIdx = bit * n + j
          out(outIdx >> 3) = (out(outIdx >> 3) | (1 << (7 - (outIdx & 7)))).toByte
        }
        j += 1
      }
      bit += 1
    }
    out
  }
}
