package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics. The naive formulation of the text-quality /
  * language-ID queries evaluates `split(lower(trim(text)), "\\s+")` once per
  * derived column (Project collapse inlines the alias), allocating the token
  * array 4× per row. These kernels walk the string once, allocate no token
  * array, and carry `doGenCode` so the whole stage stays in
  * WholeStageCodegen — where subexpression elimination also dedups the call
  * when several output columns read different fields of the same struct.
  *
  * Token semantics replicate `split(lower(trim(text)), "\\s+")` exactly
  * (Java regex split with limit -1 on a space-trimmed string): an empty
  * trimmed string yields one empty token, and leading/trailing non-space
  * whitespace yields empty boundary tokens — so n_tokens = (# maximal
  * whitespace runs) + 1.
  */
object TextKernels {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isPunct(c: Char): Boolean =
    c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':'

  /** struct(n_tokens, stop_hits, punct_n, nonws_len) in a single pass. */
  def tokenStats(textU: UTF8String, stops: java.util.HashSet[String]): InternalRow = {
    val s = textU.toString
    var punct = 0; var nonws = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isPunct(c)) punct += 1
      if (!isWs(c)) nonws += 1
      i += 1
    }
    // Spark's trim() strips ASCII spaces only
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    var nTokens = 1; var stopHits = 0
    var j = b
    while (j < e) {
      if (isWs(s.charAt(j))) {
        nTokens += 1
        while (j < e && isWs(s.charAt(j))) j += 1
      } else {
        val st = j
        while (j < e && !isWs(s.charAt(j))) j += 1
        if (!stops.isEmpty && stops.contains(s.substring(st, j).toLowerCase(java.util.Locale.ROOT)))
          stopHits += 1
      }
    }
    new GenericInternalRow(Array[Any](nTokens, stopHits, punct, nonws))
  }

  /** Per-profile stopword hit counts, tokenizing once. */
  def langHits(textU: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val s = textU.toString
    val hits = new Array[Int](sets.length)
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    var j = b
    while (j < e) {
      if (isWs(s.charAt(j))) {
        while (j < e && isWs(s.charAt(j))) j += 1
      } else {
        val st = j
        while (j < e && !isWs(s.charAt(j))) j += 1
        val w = s.substring(st, j).toLowerCase(java.util.Locale.ROOT)
        var k = 0
        while (k < sets.length) { if (sets(k).contains(w)) hits(k) += 1; k += 1 }
      }
    }
    new GenericArrayData(hits.map(Int.box))
  }

  private[functions] def toStringSet(arr: ArrayData): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i).toString); i += 1 }
    s
  }
}

/** text_stats(text, stopwords) → struct<n_tokens, stop_hits, punct_n, nonws_len> */
case class TextStats(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq[DataType](StringType, ArrayType(StringType))
  override def dataType: DataType = TextStats.schema
  require(right.foldable, "text_stats: the stopword set must be foldable")
  @transient private lazy val stops: java.util.HashSet[String] =
    TextKernels.toStringSet(right.eval(null).asInstanceOf[ArrayData])
  override protected def nullSafeEval(t: Any, ignored: Any): Any =
    TextKernels.tokenStats(t.asInstanceOf[UTF8String], stops)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stops", stops, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.TextKernels.tokenStats($t, $ref);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("punct_n", IntegerType, nullable = false),
    StructField("nonws_len", IntegerType, nullable = false)))
}

/** lang_hits(text, array(array<string>...)) → array<int> of per-set hits */
case class TextHits(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq[DataType](StringType, ArrayType(ArrayType(StringType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  require(right.foldable, "lang_hits: the profile sets must be foldable")
  @transient private lazy val sets: Array[java.util.HashSet[String]] = {
    val outer = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { i =>
      TextKernels.toStringSet(outer.getArray(i))
    }
  }
  override protected def nullSafeEval(t: Any, ignored: Any): Any =
    TextKernels.langHits(t.asInstanceOf[UTF8String], sets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sets", sets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.TextKernels.langHits($t, $ref);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
