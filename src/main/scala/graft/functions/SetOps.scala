package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| of two SORTED-DISTINCT long arrays as a native two-pointer
  * merge — the exact-Jaccard verify kernel of every LSH dedup pipeline
  * (one evaluation per candidate pair; billions of pairs at corpus
  * scale).
  *
  * `size(array_intersect(a, b))` builds an OpenHashSet over one side AND
  * materializes the intersection as a fresh array per pair, only for
  * `size` to read its length. [[graft.functions.HashedShingles]] already
  * emits sorted distinct hashes (set semantics), so the count is a
  * zero-allocation linear merge. Equality with the builtin on
  * sorted-distinct inputs is pinned by a seeded property sweep
  * (OperatorSpec) and by every dd_* oracle row.
  *
  * CONTRACT: both inputs must be sorted ascending with distinct
  * elements — the two-pointer merge silently undercounts otherwise.
  * Callers inside this codebase all feed HashedShingles output.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count needs two array<bigint>, got $other")
    }
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectCount.compute(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.SortedIntersectCount.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}
