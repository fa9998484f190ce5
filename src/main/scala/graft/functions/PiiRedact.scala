package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Email + long-digit-run PII redaction in native byte scans — the
  * count/redact/verify triple of tx_pii_redact as ONE expression
  * (SURVEY §2.10: custom `Expression` over UDF).
  *
  * The composable form pays four java.util.regex passes per document
  * (count emails, replace emails, replace digit runs, re-count on the
  * redacted text) with the backtracking email pattern
  * `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` — the slowest
  * remaining non-index row at sf10. That pattern's match spans are
  * reproducible WITHOUT a regex engine: every match contains exactly
  * one `@` (no class admits it), so
  *  - the local part is the maximal L-run immediately before the `@`
  *    (clamped to the scan position — java.util.regex resumes AT the
  *    previous match end), non-empty;
  *  - greedy `M+` then backtracking `\.` placement selects the
  *    RIGHTMOST dot in the maximal M-run after the `@` that has at
  *    least one M char before it and ≥2 letters immediately after;
  *  - greedy `T{2,}` extends the match over the maximal letter run
  *    after that dot (letters ⊂ M, so the run lies inside the M-run).
  * Matches are non-overlapping left-to-right, exactly replaceAll's
  * semantics. Digit-run redaction (`\d{7,}` → `<NUM>`) is a trivial
  * greedy scan. The residual count runs on the fully-redacted text,
  * same matcher. Every class test is ASCII, so UTF-8 continuation
  * bytes pass through untouched. Equivalence with the regexp_* form is
  * pinned in CurationSpec (edge cases + seeded fuzz).
  */
case class PiiRedact(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pii_redact needs a string column, got $other")
  }

  override def dataType: DataType = PiiRedact.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pii_redact"

  override protected def nullSafeEval(input: Any): Any =
    PiiRedact.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiRedact.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiRedact =
    copy(child = newChild)
}

object PiiRedact {

  val schema: StructType = StructType(Seq(
    StructField("emails_found", LongType, nullable = false),
    StructField("residual", LongType, nullable = false),
    StructField("clean", StringType, nullable = false)))

  /** Column-API entry point: pii_redact($"text"). */
  def apply(c: Column): Column =
    Bridge.column(PiiRedact(Bridge.expression(c)))

  private final val EmailTag = "<EMAIL>".getBytes
  private final val NumTag = "<NUM>".getBytes

  // character classes of the email pattern (all ASCII; signed-byte
  // comparisons are safe — multi-byte UTF-8 units are negative)
  private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isLocal(b: Byte): Boolean = // [A-Za-z0-9._%+-]
    isLetter(b) || isDigit(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  private def isDomain(b: Byte): Boolean = // [A-Za-z0-9.-]
    isLetter(b) || isDigit(b) || b == '.' || b == '-'

  /** Next email match at-or-after `pos`: packed (start << 32) | end, or
    * -1. Scans `@` anchors left to right. */
  private def nextEmail(t: Array[Byte], pos: Int): Long = {
    val len = t.length
    var at = pos
    while (at < len) {
      while (at < len && t(at) != '@') at += 1
      if (at < len) {
        // maximal local run ending at `at`, clamped to scan position
        var s = at
        while (s > pos && isLocal(t(s - 1))) s -= 1
        if (s < at) {
          // maximal domain run after `at`
          var e = at + 1
          while (e < len && isDomain(t(e))) e += 1
          // rightmost dot with >=1 domain char before and >=2 letters after
          var p = e - 1
          var found = -1
          while (found < 0 && p >= at + 2) {
            if (t(p) == '.' && p + 2 < len
                && isLetter(t(p + 1)) && isLetter(t(p + 2))) found = p
            else p -= 1
          }
          if (found >= 0) {
            var me = found + 3
            while (me < len && isLetter(t(me))) me += 1
            return (s.toLong << 32) | me.toLong
          }
        }
        at += 1
      }
    }
    -1L
  }

  private def countEmails(t: Array[Byte]): Long = {
    var n = 0L
    var pos = 0
    var m = nextEmail(t, pos)
    while (m >= 0) {
      n += 1
      pos = (m & 0xffffffffL).toInt
      m = nextEmail(t, pos)
    }
    n
  }

  private def redactEmails(t: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(t.length + 16)
    var pos = 0
    var m = nextEmail(t, pos)
    while (m >= 0) {
      val s = (m >>> 32).toInt
      val e = (m & 0xffffffffL).toInt
      out.write(t, pos, s - pos)
      out.write(EmailTag, 0, EmailTag.length)
      pos = e
      m = nextEmail(t, pos)
    }
    out.write(t, pos, t.length - pos)
    out.toByteArray
  }

  /** Greedy `\d{7,}` → `<NUM>`. */
  private def redactLongNumbers(t: Array[Byte], minDigits: Int): Array[Byte] = {
    val len = t.length
    val out = new java.io.ByteArrayOutputStream(len + 16)
    var i = 0
    var flushed = 0
    while (i < len) {
      if (isDigit(t(i))) {
        val d0 = i
        while (i < len && isDigit(t(i))) i += 1
        if (i - d0 >= minDigits) {
          out.write(t, flushed, d0 - flushed)
          out.write(NumTag, 0, NumTag.length)
          flushed = i
        }
      } else i += 1
    }
    out.write(t, flushed, len - flushed)
    out.toByteArray
  }

  /** Public deliberately: generated Java calls this static forwarder
    * (see the [[HashedShingles.countTokens]] note on Janino). */
  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val found = countEmails(bytes)
    val clean = redactLongNumbers(redactEmails(bytes), 7)
    new GenericInternalRow(Array[Any](
      found, countEmails(clean), UTF8String.fromBytes(clean)))
  }
}
