package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native vector/text kernels for the similarity + dedup operators.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`/`filter`) evaluate
  * their lambda per element interpreted and allocate intermediate arrays —
  * at 100 TB the dot product is the innermost loop of similarity search, so
  * it gets a tight primitive loop over `ArrayData` instead (the "custom
  * Catalyst Expression beats a UDF" rung of the extension ladder).
  *
  * All kernels implement `doGenCode`, so projections using them stay inside
  * WholeStageCodegen (a single CodegenFallback expression would knock the
  * whole stage out of codegen and disable subexpression elimination).
  */
abstract class VectorBinary extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq[DataType](ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
}

/** Σ aᵢ·bᵢ — sequential accumulation (parity with DuckDB list_dot_product). */
case class VecDot(left: Expression, right: Expression) extends VectorBinary {
  override protected def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) in one pass. */
case class VecCosine(left: Expression, right: Expression) extends VectorBinary {
  override def nullable: Boolean = true // zero-norm input → null
  override protected def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) null else dot / d
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $a.getDouble($i); final double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |final double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($d == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $d; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Count of array elements contained in a literal string set. */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression with FoldableArgCheck {
  override def inputTypes = Seq[DataType](ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override protected def foldableArgs = Seq(right -> "the set argument")
  // a NULL literal (or NULL element) must fail at ANALYSIS time — the
  // TextStats posture — not as an opaque NPE when codegen forces `set`
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else right.eval(null) match {
      case null =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "count_in_set: the set argument must not be NULL (pass an empty array)")
      case arr: ArrayData if (0 until arr.numElements()).exists(arr.isNullAt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "count_in_set: the set argument must not contain NULL elements")
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i)); i += 1 }
    s
  }
  override protected def nullSafeEval(av: Any, bv: Any): Any = {
    val arr = av.asInstanceOf[ArrayData]
    var c = 0; var i = 0
    while (i < arr.numElements()) {
      val e = arr.getUTF8String(i)
      if (e != null && set.contains(e)) c += 1
      i += 1
    }
    c
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("inSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val e = ctx.freshName("e")
      s"""
         |int $c = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final org.apache.spark.unsafe.types.UTF8String $e = $a.getUTF8String($i);
         |  if ($e != null && $setRef.contains($e)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Banded random-hyperplane signatures: one pass over the vector computes
  * `bands` signatures of `bitsPerBand` sign bits each (array<int>). The
  * LSH analogue of MinHash banding — bucket count per band is
  * 2^bitsPerBand, chosen from corpus size by the caller so collision
  * groups stay O(1) as N grows (a fixed bucket count would degenerate to
  * all-pairs at 100 TB). `vec_band_sig(v, planes, bands, bitsPerBand)`;
  * planes/bands/bits must be foldable.
  */
case class VecBandSig(vec: Expression, planesE: Expression, bandsE: Expression, bitsE: Expression)
    extends Expression with FoldableArgCheck {
  override def children: Seq[Expression] = Seq(vec, planesE, bandsE, bitsE)
  override def inputTypes = Seq[DataType](ArrayType(DoubleType),
    ArrayType(ArrayType(DoubleType)), IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override protected def foldableArgs =
    Seq(planesE -> "planes", bandsE -> "bands", bitsE -> "bits")
  // analysis-time validation (TextStats posture): NULL/shape errors must
  // not surface as per-row NPE/AIOOBE mid-job, and bits >= 32 would make
  // `1 << j` wrap — distinct sign bits silently folding onto one bit
  // collapses LSH buckets with NO error
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) return base
    (planesE.eval(null), bandsE.eval(null), bitsE.eval(null)) match {
      case (null, _, _) => TypeCheckFailure("vec_band_sig: planes must not be NULL")
      case (_, null, _) | (_, _, null) =>
        TypeCheckFailure("vec_band_sig: bands and bits must not be NULL")
      case (p: ArrayData, b: Integer, k: Integer) =>
        if (b <= 0 || k <= 0)
          TypeCheckFailure(s"vec_band_sig: bands ($b) and bits ($k) must be positive")
        else if (k >= 32)
          TypeCheckFailure(s"vec_band_sig: bits per band ($k) must be < 32 " +
            "(signatures are 32-bit ints)")
        else if (p.numElements() < b * k)
          TypeCheckFailure(s"vec_band_sig: needs bands*bits = ${b * k} planes, " +
            s"got ${p.numElements()}")
        else if ((0 until p.numElements()).exists(p.isNullAt))
          TypeCheckFailure("vec_band_sig: planes must not contain NULL rows")
        else TypeCheckSuccess
      case _ => TypeCheckSuccess
    }
  }
  @transient private lazy val planes: Array[Array[Double]] = {
    val outer = planesE.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements())(i => outer.getArray(i).toDoubleArray())
  }
  @transient private lazy val bands: Int = bandsE.eval(null).asInstanceOf[Int]
  @transient private lazy val bits: Int = bitsE.eval(null).asInstanceOf[Int]
  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null
    else VectorKernels.bandSignatures(v.asInstanceOf[ArrayData], planes, bands, bits)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val v = vec.genCode(ctx)
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    val resultCode =
      s"""
         |${ev.value} = graft.functions.VectorKernels.bandSignatures(
         |  ${v.value}, $ref, $bands, $bits);
       """.stripMargin
    if (nullable) {
      ev.copy(code = code"""
        ${v.code}
        boolean ${ev.isNull} = ${v.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) { $resultCode }""")
    } else {
      ev.copy(code = code"""
        ${v.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        $resultCode""",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3))
}

/** vec_sub_l2(v, cents, start) → array<double> of squared L2 distances
  * between the subvector v[start, start+len(cent)) and each centroid row
  * — the PQ subspace distance table (encode argmin + query LUT), as ONE
  * tight codegen'd loop instead of `transform(cents, c =>
  * aggregate(zip_with(slice(v), c, …)))`, whose lambdas evaluate
  * interpreted with per-element boxing plus an intermediate array per
  * centroid per row — the map-only PQ encode is a full-corpus pass at
  * 100 TB (r18 optimization round). Accumulation per centroid is the
  * same left-to-right fold from 0.0 as the HOF spelling, so distances
  * are bit-identical. Mirrors zip_with's length posture implicitly by
  * contract: callers pass 64-d vectors and dsub-long centroids wholly in
  * range; out-of-range positions contribute nothing (defensive clamp).
  */
case class VecSubL2(vec: Expression, centsE: Expression, startE: Expression)
    extends TernaryExpression with ExpectsInputTypes with FoldableArgCheck {
  override def first: Expression = vec
  override def second: Expression = centsE
  override def third: Expression = startE
  override def inputTypes = Seq[DataType](ArrayType(DoubleType),
    ArrayType(ArrayType(DoubleType)), IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override protected def foldableArgs =
    Seq(centsE -> "centroids", startE -> "start")
  @transient private lazy val cents: Array[Array[Double]] = {
    val outer = centsE.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements())(i => outer.getArray(i).toDoubleArray())
  }
  @transient private lazy val start: Int = startE.eval(null).asInstanceOf[Int]
  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null
    else VectorKernels.subL2Dists(v.asInstanceOf[ArrayData], cents, start)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val v = vec.genCode(ctx)
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    val resultCode =
      s"""
         |${ev.value} = graft.functions.VectorKernels.subL2Dists(
         |  ${v.value}, $ref, $start);
       """.stripMargin
    if (nullable) {
      ev.copy(code = code"""
        ${v.code}
        boolean ${ev.isNull} = ${v.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) { $resultCode }""")
    } else {
      ev.copy(code = code"""
        ${v.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        $resultCode""",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) = copy(f, s, t)
}

/** bpe_apply(cells, searches, replacements) → string: the chained
  * `replace(replace(…), sᵢ, rᵢ)` merge application of the BPE encoder as
  * ONE kernel call — byte-identical to the k nested StringReplace calls
  * (each pass is UTF8String.replace's leftmost non-overlapping byte
  * scan, passes applied in array order), but with TWO reused ping-pong
  * buffers per row instead of k fresh UTF8String allocations. Sound
  * because every BPE replacement is strictly SHORTER than its search
  * (" l\n r\n" → " lr\n"), so output never outgrows input; a longer
  * replacement is refused at analysis. The encode is a full-corpus map
  * pass at 100 TB — this is the tokenizer pipeline's hot loop (r18).
  */
case class BpeApply(cells: Expression, searchesE: Expression, replsE: Expression)
    extends TernaryExpression with ExpectsInputTypes with FoldableArgCheck {
  override def first: Expression = cells
  override def second: Expression = searchesE
  override def third: Expression = replsE
  override def inputTypes = Seq[DataType](StringType,
    ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = cells.nullable
  override protected def foldableArgs =
    Seq(searchesE -> "searches", replsE -> "replacements")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) return base
    (searchesE.eval(null), replsE.eval(null)) match {
      case (null, _) | (_, null) =>
        TypeCheckFailure("bpe_apply: searches/replacements must not be NULL")
      case (s: ArrayData, r: ArrayData) =>
        if (s.numElements() != r.numElements())
          TypeCheckFailure("bpe_apply: searches and replacements must pair up")
        else if ((0 until s.numElements()).exists(i => s.isNullAt(i) || r.isNullAt(i)))
          TypeCheckFailure("bpe_apply: NULL merge entries are not allowed")
        else if ((0 until s.numElements()).exists(i =>
          s.getUTF8String(i).numBytes == 0))
          TypeCheckFailure("bpe_apply: empty search strings are not allowed")
        else if ((0 until s.numElements()).exists(i =>
          r.getUTF8String(i).numBytes > s.getUTF8String(i).numBytes))
          TypeCheckFailure("bpe_apply: a replacement longer than its search " +
            "breaks the in-place buffer bound — this kernel is for BPE merges")
        else TypeCheckSuccess
      case _ => TypeCheckSuccess
    }
  }
  @transient private lazy val searches: Array[Array[Byte]] = {
    val a = searchesE.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getUTF8String(i).getBytes)
  }
  @transient private lazy val repls: Array[Array[Byte]] = {
    val a = replsE.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getUTF8String(i).getBytes)
  }
  override def eval(input: InternalRow): Any = {
    val c = cells.eval(input)
    if (c == null) null
    else VectorKernels.bpeApply(c.asInstanceOf[UTF8String], searches, repls)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = cells.genCode(ctx)
    val sRef = ctx.addReferenceObj("searches", searches, "byte[][]")
    val rRef = ctx.addReferenceObj("repls", repls, "byte[][]")
    val resultCode =
      s"""
         |${ev.value} = graft.functions.VectorKernels.bpeApply(
         |  ${c.value}, $sRef, $rRef);
       """.stripMargin
    if (nullable) {
      ev.copy(code = code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
        if (!${ev.isNull}) { $resultCode }""")
    } else {
      ev.copy(code = code"""
        ${c.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
        $resultCode""",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) = copy(f, s, t)
}

/** vec_nearest(v, centroids, nProbe) → array<int> of the nProbe nearest
  * centroid indices by dot product (cosine when centroids are normalized)
  * — the IVF coarse-quantizer routing step, one pass over the k×d matrix.
  */
case class VecNearest(vec: Expression, centsE: Expression, nProbeE: Expression)
    extends Expression with FoldableArgCheck {
  override def children: Seq[Expression] = Seq(vec, centsE, nProbeE)
  override def inputTypes = Seq[DataType](ArrayType(DoubleType),
    ArrayType(ArrayType(DoubleType)), IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override protected def foldableArgs =
    Seq(centsE -> "centroids", nProbeE -> "nProbe")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) return base
    (centsE.eval(null), nProbeE.eval(null)) match {
      case (null, _) => TypeCheckFailure("vec_nearest: centroids must not be NULL")
      case (_, null) => TypeCheckFailure("vec_nearest: nProbe must not be NULL")
      case (cs: ArrayData, np: Integer) =>
        if (np <= 0) TypeCheckFailure(s"vec_nearest: nProbe ($np) must be positive")
        else if (cs.numElements() == 0)
          TypeCheckFailure("vec_nearest: centroids must not be empty")
        else if ((0 until cs.numElements()).exists(cs.isNullAt))
          TypeCheckFailure("vec_nearest: centroids must not contain NULL rows")
        else TypeCheckSuccess
      case _ => TypeCheckSuccess
    }
  }
  @transient private lazy val cents: Array[Array[Double]] = {
    val outer = centsE.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements())(i => outer.getArray(i).toDoubleArray())
  }
  @transient private lazy val nProbe: Int = nProbeE.eval(null).asInstanceOf[Int]
  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null
    else VectorKernels.nearestCells(v.asInstanceOf[ArrayData], cents, nProbe)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val v = vec.genCode(ctx)
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    val resultCode =
      s"""
         |${ev.value} = graft.functions.VectorKernels.nearestCells(
         |  ${v.value}, $ref, $nProbe);
       """.stripMargin
    if (nullable) {
      ev.copy(code = code"""
        ${v.code}
        boolean ${ev.isNull} = ${v.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) { $resultCode }""")
    } else {
      ev.copy(code = code"""
        ${v.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        $resultCode""",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2))
}

object VectorKernels {
  /** All band signatures in one pass; plane p = band*bitsPerBand + bit. */
  def bandSignatures(v: ArrayData, planes: Array[Array[Double]],
      bands: Int, bitsPerBand: Int): ArrayData = {
    val out = new Array[Int](bands)
    var p = 0
    var b = 0
    while (b < bands) {
      var j = 0
      while (j < bitsPerBand) {
        val plane = planes(p)
        val n = math.min(v.numElements(), plane.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * plane(i); i += 1 }
        if (s > 0) out(b) |= (1 << j)
        p += 1
        j += 1
      }
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Indices of the `nProbe` highest-dot centroids (pass NORMALIZED
    * centroids and the ranking is cosine — |v| is constant across cells).
    */
  /** The k-merge BPE rewrite: pass i replaces every leftmost
    * non-overlapping occurrence of searches(i) with repls(i), passes in
    * order — byte-identical to k chained UTF8String.replace calls. Two
    * ping-pong buffers, both sized to the input (every replacement is
    * <= its search by the expression's analysis check, so lengths only
    * shrink). Empty searches are rejected at analysis; a pass whose
    * pattern exceeds the current length just copies through.
    */
  def bpeApply(cells: UTF8String, searches: Array[Array[Byte]],
      repls: Array[Array[Byte]]): UTF8String = {
    val n0 = cells.numBytes()
    if (n0 == 0 || searches.length == 0) return cells
    var a = cells.getBytes // materialized copy (may share; never written)
    var b = new Array[Byte](n0)
    var len = n0
    var first = true // `a` aliases the input until the first real rewrite
    var k = 0
    while (k < searches.length) {
      val s = searches(k)
      val r = repls(k)
      val sl = s.length
      val s0 = s(0)
      var i = 0
      var o = 0
      var wrote = false
      while (i < len) {
        // find the next leftmost match at or after i, then move whole
        // segments with arraycopy (the UTF8String.replace shape — a
        // byte-at-a-time copy loop measured 30% SLOWER than the chained
        // replace calls it was meant to beat)
        var m = -1
        var p = i
        val limit = len - sl
        while (m < 0 && p <= limit) {
          if (a(p) == s0) {
            var j = 1
            while (j < sl && a(p + j) == s(j)) j += 1
            if (j == sl) m = p else p += 1
          } else p += 1
        }
        if (m < 0) {
          System.arraycopy(a, i, b, o, len - i); o += len - i; i = len
        } else {
          System.arraycopy(a, i, b, o, m - i); o += m - i
          System.arraycopy(r, 0, b, o, r.length); o += r.length
          i = m + sl
          wrote = true
        }
      }
      if (wrote) {
        val t = a; a = b; b = if (first) new Array[Byte](n0) else t
        first = false
        len = o
      } // no match: keep `a` as-is, skip the swap (b holds a stale copy)
      k += 1
    }
    UTF8String.fromBytes(a, 0, len)
  }

  /** Squared L2 from v[start, start+len(cent)) to each centroid; the
    * per-centroid accumulation is the left-to-right fold from 0.0 the
    * HOF spelling used, so results are bit-identical. Positions past
    * the vector's end contribute nothing (callers pass in-range data).
    */
  def subL2Dists(v: ArrayData, cents: Array[Array[Double]], start: Int): ArrayData = {
    val out = new Array[Double](cents.length)
    val vn = v.numElements()
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(cent.length, math.max(0, vn - start))
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = v.getDouble(start + i) - cent(i)
        s += d * d
        i += 1
      }
      out(c) = s
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def nearestCells(v: ArrayData, cents: Array[Array[Double]], nProbe: Int): ArrayData = {
    val k = cents.length
    val m = math.min(nProbe, k)
    val best = new Array[Int](m)
    val bestS = Array.fill(m)(Double.NegativeInfinity)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * cent(i); i += 1 }
      var j = m - 1
      if (s > bestS(j)) {
        while (j > 0 && s > bestS(j - 1)) {
          bestS(j) = bestS(j - 1); best(j) = best(j - 1); j -= 1
        }
        bestS(j) = s; best(j) = c
      }
      c += 1
    }
    // slots never filled (every dot NaN — NaN comparisons select nothing —
    // or -Inf overflow): fall back to DISTINCT lowest cells. Leaving the
    // zero-initialized slots would return nProbe copies of cell 0 and
    // silently narrow the whole probe to one cell for corrupt vectors.
    var filled = 0
    while (filled < m && bestS(filled) != Double.NegativeInfinity) filled += 1
    if (filled < m) {
      val used = new java.util.HashSet[Integer]()
      var x = 0
      while (x < filled) { used.add(best(x)); x += 1 }
      var cand = 0
      var slot = filled
      while (slot < m) {
        while (used.contains(cand)) cand += 1
        best(slot) = cand
        used.add(cand)
        cand += 1
        slot += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(best)
  }
}

/** `h * a + b` on longs with WRAPAROUND (two's-complement) semantics —
  * the linear permutation family behind MinHash signatures. Spark's ANSI
  * mode (the 4.x default) makes built-in `*`/`+` throw on overflow, but a
  * multiply-add mod 2^64 by an odd constant is exactly the bijection the
  * permutation needs.
  */
case class HashMix(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq[DataType](LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(h: Any, a: Any, b: Any): Any =
    h.asInstanceOf[Long] * a.asInstanceOf[Long] + b.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, a, b) => s"${ev.value} = $h * $a + $b;")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(f, s, t)
}

object VectorSql {
  // see GeoSql.install: once per registry, weakly held
  private val installedRegistries =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]())

  /** Idempotent per session: registers once — re-replacing per query
    * floods the log with SimpleFunctionRegistry WARNs (synchronized I/O).
    */
  def install(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    if (!installedRegistries.contains(reg)) {
      reg.createOrReplaceTempFunction("vec_dot", e => VecDot(e(0), e(1)), "built-in")
      reg.createOrReplaceTempFunction("vec_cosine", e => VecCosine(e(0), e(1)), "built-in")
      reg.createOrReplaceTempFunction("count_in_set", e => CountInSet(e(0), e(1)), "built-in")
      reg.createOrReplaceTempFunction("text_stats", e => TextStats(e(0), e(1)), "built-in")
      reg.createOrReplaceTempFunction("lang_hits", e => TextHits(e(0), e(1)), "built-in")
      reg.createOrReplaceTempFunction("vec_band_sig",
        e => VecBandSig(e(0), e(1), e(2), e(3)), "built-in")
      reg.createOrReplaceTempFunction("hash_mix", e => HashMix(e(0), e(1), e(2)), "built-in")
      reg.createOrReplaceTempFunction("shingle_hashes", e => ShingleHashes(e(0)), "built-in")
      reg.createOrReplaceTempFunction("shingle_hashes_n",
        e => ShingleHashesN(e(0), e(1)), "built-in")
      reg.createOrReplaceTempFunction("simhash64", e => SimHash64(e(0)), "built-in")
      reg.createOrReplaceTempFunction("rep_stats", e => RepStats(e(0)), "built-in")
      reg.createOrReplaceTempFunction("vec_nearest", e => VecNearest(e(0), e(1), e(2)), "built-in")
      reg.createOrReplaceTempFunction("vec_sub_l2", e => VecSubL2(e(0), e(1), e(2)), "built-in")
      reg.createOrReplaceTempFunction("bpe_apply", e => BpeApply(e(0), e(1), e(2)), "built-in")
      installedRegistries.add(reg)
    }
  }
  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def vec_cosine(a: Column, b: Column): Column = call_function("vec_cosine", a, b)
  def count_in_set(a: Column, s: Column): Column = call_function("count_in_set", a, s)
  def text_stats(t: Column, stops: Column): Column = call_function("text_stats", t, stops)
  def lang_hits(t: Column, sets: Column): Column = call_function("lang_hits", t, sets)
  def vec_band_sig(v: Column, planes: Column, bands: Int, bits: Int): Column =
    call_function("vec_band_sig", v, planes,
      org.apache.spark.sql.functions.lit(bands), org.apache.spark.sql.functions.lit(bits))
  def shingle_hashes(t: Column): Column = call_function("shingle_hashes", t)
  def shingle_hashes_n(t: Column, n: Int): Column =
    call_function("shingle_hashes_n", t, org.apache.spark.sql.functions.lit(n))
  def simhash64(t: Column): Column = call_function("simhash64", t)
  def rep_stats(t: Column): Column = call_function("rep_stats", t)
  def vec_nearest(v: Column, cents: Column, nProbe: Int): Column =
    call_function("vec_nearest", v, cents, org.apache.spark.sql.functions.lit(nProbe))
  def vec_sub_l2(v: Column, cents: Column, start: Int): Column =
    call_function("vec_sub_l2", v, cents, org.apache.spark.sql.functions.lit(start))
  def bpe_apply(cells: Column, searches: Column, repls: Column): Column =
    call_function("bpe_apply", cells, searches, repls)
  def hash_mix(h: Column, a: Long, b: Long): Column =
    call_function("hash_mix", h,
      org.apache.spark.sql.functions.lit(a), org.apache.spark.sql.functions.lit(b))
}
