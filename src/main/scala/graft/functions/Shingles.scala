package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of the n-token shingles of a text, in ONE native pass
  * (SURVEY §2.10: custom `Expression` over UDF).
  *
  * Replaces the composable `wsTokens` → `shinglesFromTokens` chain for the
  * near-dup pipeline: that form materializes every shingle as a
  * CONCATENATED STRING (k string allocations per document) only for each
  * one to be hashed downstream anyway. Here the text bytes are scanned
  * once: each whitespace-delimited token is FNV-1a+fmix64 hashed as it is
  * read, a ring buffer holds the last n token hashes, and each complete
  * window emits one fmix-chained shingle hash. Downstream, grouping,
  * banding ([[MinHashBands]] long input) and the exact-Jaccard verify all
  * operate on the long array — no string ever leaves the expression.
  * 64-bit shingle hashes make the verify's Jaccard exact up to hash
  * collisions (~n²·2⁻⁶⁴ per pair — negligible at any corpus size).
  *
  * Output length = max(0, tokens − n + 1); callers filter `size > 0` to
  * drop too-short documents (same contract as the string form).
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle width must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_shingles"

  override protected def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {

  /** Column-API entry point: hashed_shingles($"text", n). */
  def apply(c: Column, n: Int): Column =
    Bridge.column(HashedShingles(Bridge.expression(c), n))

  private final val FNV_OFFSET = 0xcbf29ce484222325L
  private final val FNV_PRIME = 0x100000001b3L

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r'

  /** Static helper invoked from both interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val ring = new Array[Long](n)
    var tokens = 0
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        var h = FNV_OFFSET
        while (i < len && !isWs(bytes(i))) {
          h ^= (bytes(i) & 0xffL); h *= FNV_PRIME; i += 1
        }
        ring(tokens % n) = fmix64(h)
        tokens += 1
        if (tokens >= n) {
          // combine the window OLDEST-FIRST so the shingle hash is
          // position-defined, like concatenating the token strings
          var acc = FNV_OFFSET
          var j = tokens - n
          while (j < tokens) { acc = fmix64(acc ^ ring(j % n)); j += 1 }
          out += acc
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}
