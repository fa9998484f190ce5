package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Each element rounded to `scale` decimals (Catalyst `round` semantics:
  * BigDecimal.valueOf HALF_UP) and returned as the UNSCALED long, i.e.
  * round(x, s)·10^s — one native pass per vector.
  *
  * This is the fixed-point form of the Lloyd update's per-dimension
  * decimal terms: Σ of these longs IS the exact Decimal(,scale) sum of
  * the rounded values (long addition is the decimal addition of
  * fixed-scale numbers), so a plain long-sum aggregate replaces a
  * Decimal(28,6)-buffered hash aggregate whose per-row BigDecimal adds
  * were ~2/3 of the whole Lloyd step at the 100× rehearsal. Overflow is
  * loud (`longValueExact`), not wrapped: one long holds |x| up to
  * ~9·10^12 at scale 6, and 2⁶³ is ~10^5 corpora of headroom on the sum
  * side for unit-normalized embeddings. */
case class RoundScaledLongs(child: Expression, scale: Int)
    extends UnaryExpression {
  require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"round_scaled_longs needs array<double>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "round_scaled_longs"

  override protected def nullSafeEval(input: Any): Any =
    RoundScaledLongs.compute(input.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RoundScaledLongs.compute($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): RoundScaledLongs =
    copy(child = newChild)
}

object RoundScaledLongs {

  def apply(c: Column, scale: Int): Column =
    Bridge.column(RoundScaledLongs(Bridge.expression(c), scale))

  def compute(arr: ArrayData, scale: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = java.math.BigDecimal.valueOf(arr.getDouble(i))
        .setScale(scale, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
