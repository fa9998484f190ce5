package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point as a native codegen'd expression —
  * the write-path kernel behind locality-optimal file clustering
  * (`Layout.hilbertKey`). Same iterative xy→d transform (quadrant
  * rotation per bit level) as the composable `aggregate`-fold form it
  * replaces, but the fold ran ~21 interpreted lambda steps per row with
  * a struct allocation each step; this is one static call of straight
  * integer arithmetic inside whole-stage codegen — at 100 TB the
  * clustering key is computed once per row on the write path, so it
  * must run at scan speed (the CosineSim / TextQualityStats playbook).
  *
  * Bit-identical to the fold by construction (same per-level update
  * order); `CodegenSpec` pins a seeded sweep of both forms against each
  * other and `LayoutSpec` keeps the 8×8 Manhattan-adjacency pin.
  * Inputs are non-negative coordinates below 2^bits; callers (Z/Hilbert
  * layout over parquet key columns) guarantee the domain.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (LongType, LongType) if bits >= 1 && bits <= 31 =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"hilbert_key needs (bigint, bigint) and 1<=bits<=31, got $other bits=$bits")
    }
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_key"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    HilbertKey.compute(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.HilbertKey.compute($l, $r, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {

  /** Column-API entry point: hilbert_key($"x", $"y", 21). */
  def apply(a: Column, b: Column, bits: Int): Column =
    Bridge.column(HilbertKey(
      Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long")), bits))

  /** Static helper invoked from both interpreted eval and generated code.
    * Standard iterative xy→d: walk bit levels high→low; at each level the
    * quadrant (rx, ry) contributes s²·((3·rx)⊕ry) cells, then the
    * sub-square is rotated into canonical orientation (reflect when
    * rx=1∧ry=0, swap axes whenever ry=0). */
  def compute(a: Long, b: Long, bits: Int): Long = {
    var x = a; var y = b; var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }
}
