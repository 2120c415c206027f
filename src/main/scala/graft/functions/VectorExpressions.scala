package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  */
abstract class VectorBinary extends Expression with CodegenFallback with ExpectsInputTypes {
  def left: Expression
  def right: Expression
  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes = Seq[DataType](ArrayType(DoubleType), ArrayType(DoubleType))
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = DoubleType
  protected def compute(a: ArrayData, b: ArrayData): Any
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }
}

/** Σ aᵢ·bᵢ — sequential accumulation (parity with DuckDB list_dot_product). */
case class VecDot(left: Expression, right: Expression) extends VectorBinary {
  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

/** dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) in one pass. */
case class VecCosine(left: Expression, right: Expression) extends VectorBinary {
  override protected def compute(a: ArrayData, b: ArrayData): Any = {
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
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

/** Count of array elements contained in a literal string set. */
case class CountInSet(left: Expression, right: Expression)
    extends Expression with CodegenFallback with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes = Seq[DataType](ArrayType(StringType), ArrayType(StringType))
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  require(right.foldable, "count_in_set: the set argument must be foldable")
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i)); i += 1 }
    s
  }
  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      var c = 0; var i = 0
      while (i < arr.numElements()) {
        val e = arr.getUTF8String(i)
        if (e != null && set.contains(e)) c += 1
        i += 1
      }
      c
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

object VectorSql {
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", e => VecDot(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine", e => VecCosine(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction("count_in_set", e => CountInSet(e(0), e(1)), "built-in")
  }
  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def vec_cosine(a: Column, b: Column): Column = call_function("vec_cosine", a, b)
  def count_in_set(a: Column, s: Column): Column = call_function("count_in_set", a, s)
}
