package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk fingerprints as ONE native pass per document —
  * the kernel of [[graft.text.TextFunctions.cdcChunkFingerprints]] (see
  * that scaladoc for the algorithm and why CDC re-synchronizes where
  * fixed chunking cannot).
  *
  * Rule, byte-identical to the SQL oracle: scanning token positions
  * i = 1..n, position i is a CUT when i ≥ window and the first byte of
  * md5(tokens[i-window+1..i] joined on U+001F) taken as an unsigned int
  * (≡ `conv(substring(md5, 1, 2), 16, 10)`) is ≡ 0 (mod modulus); each
  * cut emits md5 of the open chunk INCLUDING the cut position, and a
  * trailing open chunk emits at end-of-document. Mean chunk ≈ modulus
  * tokens.
  *
  * The HOF-fold form of this computation evaluates an interpreted
  * expression tree (slice → array_join → md5 → conv → struct rebuild)
  * PER TOKEN POSITION — at the 100× rehearsal that single fold was the
  * whole `tx_cdc_chunks` row (~82 s) and both chunking passes of
  * `dd_cdc_incremental` (~130 s). Here each position streams its
  * 3-token window into one reused MessageDigest and chunks hash
  * directly from the token array: no per-position allocation beyond the
  * digest, no string rebuilding. The HOF form stays in TextFunctions as
  * the cross-check reference (`cdcChunkFingerprintsHof`), equality
  * pinned by a property sweep in CurationSpec plus the family's hash
  * oracles. */
case class CdcChunkFp(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {
  require(window > 0, s"window must be positive, got $window")
  require(modulus > 0 && modulus <= 256,
    s"modulus must be in [1, 256] (the cut value is one md5 byte), got $modulus")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_fp needs array<string> tokens, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunk_fp"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunkFp.compute(input.asInstanceOf[ArrayData], window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunkFp.compute($c, $window, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkFp =
    copy(child = newChild)
}

object CdcChunkFp {

  /** Column-API entry point. */
  def apply(toks: Column, window: Int, modulus: Int): Column =
    Bridge.column(CdcChunkFp(Bridge.expression(toks), window, modulus))

  private final val SEP: Byte = 0x1F
  private final val HEX = "0123456789abcdef".getBytes("US-ASCII")

  private def hexOf(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var k = 0
    while (k < 16) {
      out(2 * k) = HEX((d(k) >> 4) & 0xF)
      out(2 * k + 1) = HEX(d(k) & 0xF)
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  /** md5-hex of tokens[a..b] joined on U+001F, streamed through `md`. */
  private def chunkHex(toks: ArrayData, a: Int, b: Int,
                       md: MessageDigest): UTF8String = {
    var j = a
    while (j <= b) {
      md.update(toks.getUTF8String(j).getBytes)
      if (j < b) md.update(SEP)
      j += 1
    }
    hexOf(md.digest()) // digest() resets md
  }

  def compute(toks: ArrayData, window: Int, modulus: Int): ArrayData = {
    val n = toks.numElements()
    val md = MessageDigest.getInstance("MD5")
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](
      math.max(1, n / math.max(1, modulus)))
    var start = -1 // 0-based first token of the open chunk; -1 = closed
    var i = 0
    while (i < n) {
      if (start < 0) start = i
      var cut = false
      if (i + 1 >= window) {
        var j = i - window + 1
        while (j <= i) {
          md.update(toks.getUTF8String(j).getBytes)
          if (j < i) md.update(SEP)
          j += 1
        }
        cut = (md.digest()(0) & 0xFF) % modulus == 0
      }
      if (cut) {
        out += chunkHex(toks, start, i, md)
        start = -1
      }
      i += 1
    }
    if (start >= 0) out += chunkHex(toks, start, n - 1, md)
    ArrayData.toArrayData(out.toArray)
  }
}
