package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}

/** Analysis-time foldability check for kernel arguments that must be
  * literals (broadcast sets, hyperplanes, centroid matrices, widths).
  *
  * These checks must NOT live in the case-class constructor
  * (`require(arg.foldable, ...)`): Spark's analyzer re-invokes the
  * registered function builder while generating the auto-alias for an
  * UNALIASED select-list item, and in that context the constructor-time
  * requirement trips even for perfectly legal calls —
  * `df.select(vec_nearest(col("v"), lit(...), 1))` throws while the
  * identical call under `.as("c")` works. `checkInputDataTypes()` runs
  * post-resolution, the idiomatic Catalyst seat for argument contracts,
  * and surfaces a proper AnalysisException instead of an
  * IllegalArgumentException.
  */
trait FoldableArgCheck extends Expression with ExpectsInputTypes {
  /** (argument, human name) pairs that must be foldable. */
  protected def foldableArgs: Seq[(Expression, String)]

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else foldableArgs.collectFirst {
      case (e, name) if !e.foldable =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: $name must be a foldable expression")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }
}
