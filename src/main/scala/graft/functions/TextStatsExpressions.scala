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
  * Token semantics for the COUNTING kernels ([[TextKernels.tokenStats]],
  * [[TextKernels.repStats]]) replicate `split(lower(trim(text)), "\\s+")`
  * exactly (Java regex split with limit -1 on a space-trimmed string): an
  * empty trimmed string yields one empty token, and leading/trailing
  * non-space whitespace yields empty boundary tokens — so n_tokens =
  * (# maximal whitespace runs) + 1, matching the `len(string_split_regex)`
  * oracles. The SHINGLE/SIGNATURE kernels ([[TextKernels.shingleHashes]],
  * [[TextKernels.shingleHashesN]], [[TextKernels.simHash64]],
  * [[TextKernels.langHits]]) instead define a token as a NON-EMPTY maximal
  * non-whitespace run — boundary empties are never shingle members or
  * hash votes — and their paired DuckDB oracles filter `x <> ''` to the
  * same contract (verified end-to-end against a boundary-whitespace
  * fixture, not just the generator's text shape).
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
    new GenericArrayData(hits)
  }

  private[functions] def toStringSet(arr: ArrayData): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i).toString); i += 1 }
    s
  }

  /** 64-bit SimHash of a document in one pass: per token OCCURRENCE
    * (term frequency votes, the classic Charikar weighting), each bit of
    * the token hash votes ±1; output bit j is set iff votes[j] > 0. The
    * naive formulation explodes the token frame and runs a 64-column
    * conditional-sum aggregation — a full shuffle of every token; this is
    * map-only.
    */
  def simHash64(textU: UTF8String): Long = {
    val s = textU.toString.toLowerCase(java.util.Locale.ROOT)
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val votes = new Array[Int](64)
    var j = b
    while (j < e) {
      if (isWs(s.charAt(j))) {
        while (j < e && isWs(s.charAt(j))) j += 1
      } else {
        var th = 0x9E3779B97F4A7C15L
        while (j < e && !isWs(s.charAt(j))) {
          th = (th ^ s.charAt(j)) * 0x100000001B3L
          j += 1
        }
        th ^= th >>> 29 // avalanche: FNV low bits are weakly mixed
        th *= 0xBF58476D1CE4E5B9L
        th ^= th >>> 32
        var k = 0
        while (k < 64) {
          if (((th >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
    }
    var out = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) out |= 1L << k; k += 1 }
    out
  }

  /** DISTINCT word-3-gram shingle hashes in one pass: tokenize like
    * `split(lower(trim(text)), "\\s+")`, hash each token, combine each
    * consecutive three order-sensitively, avalanche, dedup per document
    * (insertion order kept, so output is deterministic). Replaces the
    * string-shingle pipeline: no regex split, no concat allocation, and —
    * the shuffle that matters — no per-doc DISTINCT exchange downstream;
    * every later join/groupBy key is a LONG. 64-bit hash identity stands
    * in for shingle-string equality (collision odds ~n²/2⁶⁵, the contract
    * xxhash64 already carries elsewhere in this pipeline).
    */
  def shingleHashes(textU: UTF8String): ArrayData = {
    val s = textU.toString.toLowerCase(java.util.Locale.ROOT)
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    var t0 = 0L; var t1 = 0L // token hashes at window positions -2, -1
    var nTok = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[Any]()
    var j = b
    while (j < e) {
      if (isWs(s.charAt(j))) {
        while (j < e && isWs(s.charAt(j))) j += 1
      } else {
        var th = 0x9E3779B97F4A7C15L
        while (j < e && !isWs(s.charAt(j))) {
          th = (th ^ s.charAt(j)) * 0x100000001B3L
          j += 1
        }
        nTok += 1
        if (nTok >= 3) {
          var sh = t0 * 0xFF51AFD7ED558CCDL
          sh = (sh ^ t1) * 0xC4CEB9FE1A85EC53L
          sh = (sh ^ th) * 0x9E3779B97F4A7C15L
          sh ^= sh >>> 33
          if (seen.add(sh)) out.add(sh)
        }
        t0 = t1; t1 = th
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Generalized [[shingleHashes]]: DISTINCT word-n-gram hashes in one
    * pass, for decontamination-style overlap checks that want longer
    * shingles (n-gram hits against a benchmark set get rarer — and so
    * more meaningful — as n grows). Same tokenizer, same 64-bit
    * hash-identity contract; a ring buffer of the last n token hashes
    * replaces the fixed 3-token window.
    */
  def shingleHashesN(textU: UTF8String, n: Int): ArrayData = {
    val s = textU.toString.toLowerCase(java.util.Locale.ROOT)
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val ring = new Array[Long](n)
    var nTok = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[Any]()
    var j = b
    while (j < e) {
      if (isWs(s.charAt(j))) {
        while (j < e && isWs(s.charAt(j))) j += 1
      } else {
        var th = 0x9E3779B97F4A7C15L
        while (j < e && !isWs(s.charAt(j))) {
          th = (th ^ s.charAt(j)) * 0x100000001B3L
          j += 1
        }
        ring(nTok % n) = th
        nTok += 1
        if (nTok >= n) {
          // order-sensitive fold over the window, oldest token first
          var sh = 0x9E3779B97F4A7C15L
          var k = 0
          while (k < n) {
            sh = (sh ^ ring((nTok + k) % n)) * 0xC4CEB9FE1A85EC53L
            sh ^= sh >>> 29
            k += 1
          }
          sh ^= sh >>> 33
          if (seen.add(sh)) out.add(sh)
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Repetition statistics in one pass: token count, DISTINCT token count,
    * the highest single-token frequency, and the highest bigram frequency —
    * the raw ingredients of the Gopher-style repetition quality gates
    * (type-token ratio, top-token fraction, duplicate-bigram fraction).
    * Counting is EXACT over token strings (no hash-identity shortcut), so
    * the output is oracle-comparable; per-row memory is O(distinct tokens),
    * the document's own working set. Tokenizer replicates
    * `split(lower(trim(text)), "\\s+", -1)`, boundary empties included,
    * like [[tokenStats]].
    */
  def repStats(textU: UTF8String): InternalRow = {
    val s0 = textU.toString.toLowerCase(java.util.Locale.ROOT)
    var b = 0; var e = s0.length
    while (b < e && s0.charAt(b) == ' ') b += 1
    while (e > b && s0.charAt(e - 1) == ' ') e -= 1
    val s = s0.substring(b, e)
    val freq = new java.util.HashMap[String, Integer]()
    val bifreq = new java.util.HashMap[String, Integer]()
    var nTokens = 0; var topTok = 0; var topBi = 0
    var prev: String = null
    var start = 0
    var done = false
    while (!done) {
      var k = start
      while (k < s.length && !isWs(s.charAt(k))) k += 1
      val tok = s.substring(start, k)
      nTokens += 1
      val c = freq.merge(tok, 1, (a, inc) => a + inc)
      if (c > topTok) topTok = c
      if (prev != null) {
        val bc = bifreq.merge(prev + " " + tok, 1, (a, inc) => a + inc)
        if (bc > topBi) topBi = bc
      }
      prev = tok
      if (k >= s.length) done = true
      else {
        while (k < s.length && isWs(s.charAt(k))) k += 1
        start = k
      }
    }
    new GenericInternalRow(Array[Any](nTokens, freq.size, topTok, topBi))
  }
}

/** text_stats(text, stopwords) → struct<n_tokens, stop_hits, punct_n, nonws_len> */
case class TextStats(left: Expression, right: Expression)
    extends BinaryExpression with FoldableArgCheck {
  override def inputTypes = Seq[DataType](StringType, ArrayType(StringType))
  override def dataType: DataType = TextStats.schema
  override protected def foldableArgs = Seq(right -> "the stopword set")
  // a NULL literal set must fail at ANALYSIS time (the ShingleHashesN
  // posture), not as an opaque NPE when codegen forces `stops`
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else right.eval(null) match {
      case null =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "text_stats: the stopword set must not be NULL (pass an empty array)")
      case arr: org.apache.spark.sql.catalyst.util.ArrayData
          if (0 until arr.numElements()).exists(arr.isNullAt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "text_stats: the stopword set must not contain NULL elements")
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }
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

/** rep_stats(text) → struct<n_tokens, distinct_tokens, top_tok_n, top_bigram_n> */
case class RepStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq[DataType](StringType)
  override def dataType: DataType = RepStats.schema
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.repStats(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.repStats($t);")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

object RepStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("distinct_tokens", IntegerType, nullable = false),
    StructField("top_tok_n", IntegerType, nullable = false),
    StructField("top_bigram_n", IntegerType, nullable = false)))
}

/** simhash64(text) → bigint: one-pass 64-bit document SimHash. */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq[DataType](StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.simHash64(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.simHash64($t);")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** shingle_hashes(text) → array<bigint>: distinct word-3-gram hashes. */
case class ShingleHashes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq[DataType](StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.shingleHashes(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.shingleHashes($t);")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** shingle_hashes_n(text, n) → array<bigint>: distinct word-n-gram hashes. */
case class ShingleHashesN(left: Expression, right: Expression)
    extends BinaryExpression with FoldableArgCheck {
  override def inputTypes = Seq[DataType](StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def foldableArgs = Seq(right -> "the window width")
  // misuse (NULL width, n <= 0) must fail at ANALYSIS time, not as an
  // ArithmeticException inside the kernel mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes() // types + foldability (FoldableArgCheck)
    if (!base.isSuccess) base
    else right.eval(null) match {
      case i: Integer if i >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case bad =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes_n: the window width must be a positive integer literal, got $bad")
    }
  }
  @transient private lazy val n: Int = right.eval(null).asInstanceOf[Int]
  override protected def nullSafeEval(t: Any, ignored: Any): Any =
    TextKernels.shingleHashesN(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val width = ctx.addReferenceObj("n", Integer.valueOf(n), "Integer")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.TextKernels.shingleHashesN($t, $width.intValue());")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** lang_hits(text, array(array<string>...)) → array<int> of per-set hits */
case class TextHits(left: Expression, right: Expression)
    extends BinaryExpression with FoldableArgCheck {
  override def inputTypes = Seq[DataType](StringType, ArrayType(ArrayType(StringType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def foldableArgs = Seq(right -> "the profile sets")
  // NULL outer literal or a NULL inner set: analysis-time error, not NPE
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else right.eval(null) match {
      case null =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "lang_hits: the profile sets must not be NULL")
      case outer: ArrayData if (0 until outer.numElements()).exists(outer.isNullAt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "lang_hits: no profile set may be NULL (pass empty arrays)")
      case outer: ArrayData if (0 until outer.numElements()).exists(i =>
          (0 until outer.getArray(i).numElements()).exists(outer.getArray(i).isNullAt)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "lang_hits: profile sets must not contain NULL elements")
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }
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
