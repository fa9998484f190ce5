package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Numeric value of a slice of an md5 hex digest, in one native step —
  * bit-identical to the composable portable-hash family
  *
  *   conv(substring(md5(s), skip + 1, take), 16, 10).cast("long")
  *
  * that every oracle-portable sketch rides on (HLL buckets/ranks, CMS and
  * Bloom buckets, the portable simhash/DSIR token hashes). The composable
  * chain pays, per row: a fresh MessageDigest instance (Spark's `md5`
  * goes through commons-codec `DigestUtils.md5Hex`, which calls
  * `MessageDigest.getInstance` per invocation), a 32-char hex string
  * allocation, a substring slice, and `conv`'s string→unsigned parse →
  * decimal string render → numeric cast. Here: one THREAD-LOCAL digest
  * reused across rows, nibbles read straight out of the 16 digest bytes,
  * no intermediate strings anywhere.
  *
  * `take` is an expression so the Bloom family's data-sized hex width
  * (`bloomHexChars`, a column) works unchanged; `take ≤ 15` keeps the
  * value inside a positive long (60 bits), enforced loudly. Bit-equality
  * with the conv/substring/md5 chain is pinned in `TokenWindowSpec`. */
case class Md5PrefixLong(left: Expression, right: Expression, skip: Int)
    extends BinaryExpression {
  require(skip >= 0 && skip < 32, s"skip must be in [0, 32), got $skip")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long needs (string, int), got $other")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix_long"

  override protected def nullSafeEval(s: Any, take: Any): Any =
    Md5Prefix.value(s.asInstanceOf[UTF8String], skip, take.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, take) =>
      s"graft.functions.Md5Prefix.value($s, $skip, $take)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Md5PrefixLong =
    copy(left = newLeft, right = newRight)
}

object Md5Prefix {

  /** Column entry point: numeric value of md5-hex digits [skip, skip+take). */
  def apply(s: Column, skip: Int, take: Int): Column = {
    require(take >= 1 && take <= 15 && skip + take <= 32,
      s"need 1 <= take <= 15 and skip + take <= 32, got skip=$skip take=$take")
    Bridge.column(Md5PrefixLong(Bridge.expression(s),
      Bridge.expression(org.apache.spark.sql.functions.lit(take)), skip))
  }

  /** Column entry point with a DATA-SIZED take width (the Bloom family's
    * `bloomHexChars` column). */
  def apply(s: Column, skip: Int, take: Column): Column =
    Bridge.column(Md5PrefixLong(Bridge.expression(s),
      Bridge.expression(take), skip))

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static helper invoked from both interpreted eval and generated code. */
  def value(s: UTF8String, skip: Int, take: Int): Long = {
    if (take < 1 || take > 15 || skip + take > 32)
      throw new IllegalArgumentException(
        s"md5_prefix_long: need 1 <= take <= 15 and skip + take <= 32, " +
          s"got skip=$skip take=$take")
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var j = skip
    val end = skip + take
    while (j < end) {
      val b = d(j >> 1) & 0xff
      val nib = if ((j & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nib
      j += 1
    }
    v
  }
}
