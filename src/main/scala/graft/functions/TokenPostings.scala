package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document positional postings in ONE native pass — bit-identical
  * to the composable ingest chain it replaces in
  * [[graft.text.PostingsIndex.addBatch]]:
  *
  *   toks = split(trim(text), "\\s+")            // wsTokens, limit −1
  *   posexplode(toks) → groupBy(doc_id, term)
  *     .agg(count(*) AS tf, sort_array(collect_list(pos)) AS positions)
  *
  * i.e. for each DISTINCT token of the document: the term string, its
  * occurrence count, and its 0-based positions in ascending order —
  * emitted as array<struct<term, tf, positions>> so the ingest is
  * `explode` + a partitioned write, with NO per-batch shuffle: the old
  * chain exploded every token occurrence into a corpus-scale
  * (doc, term) hash aggregate (an exchange per ingest batch) plus a
  * collect_list + sort per posting, all to regroup rows that were
  * already adjacent in the source document. Split parity (space-only
  * trim, Java limit −1 empty-token edges) is the shared
  * [[TokenWindows]] splitFields; positions arrive ascending by
  * construction, so no sort is ever needed.
  *
  * Output ORDER is first-appearance of each term — irrelevant to every
  * reader (the index is grouped by (tb, term) scans and aggregates),
  * but deterministic. Equality with the explode/groupBy chain is pinned
  * in TokenWindowSpec; the three bm25 index rows keep the scan oracle.
  */
case class TokenPostings(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_postings needs a string column, got $other")
  }

  override def dataType: DataType = TokenPostings.OutType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_postings"

  override protected def nullSafeEval(input: Any): Any =
    TokenPostings.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenPostings.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenPostings =
    copy(child = newChild)
}

object TokenPostings {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  def apply(c: Column): Column =
    Bridge.column(TokenPostings(Bridge.expression(c)))

  /** Static helper invoked from both interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val starts = new Array[Int](len / 2 + 2)
    val ends = new Array[Int](len / 2 + 2)
    val t = TokenWindows.splitFieldBounds(bytes, 0, len, starts, ends)
    // distinct terms in first-appearance order, each with its growing
    // position list — per-doc vocabularies are small, and UTF8String
    // hashes/compares raw bytes, so the map never materializes strings
    // beyond the per-term key (which IS the output term)
    val posOf = new java.util.LinkedHashMap[UTF8String, java.util.ArrayList[Integer]]()
    var k = 0
    while (k < t) {
      val term = UTF8String.fromBytes(bytes, starts(k), ends(k) - starts(k))
      var ps = posOf.get(term)
      if (ps == null) { ps = new java.util.ArrayList[Integer](4); posOf.put(term, ps) }
      ps.add(Integer.valueOf(k))
      k += 1
    }
    val out = new Array[Any](posOf.size)
    var i = 0
    val it = posOf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val ps = e.getValue
      val positions = new Array[Int](ps.size)
      var j = 0
      while (j < positions.length) { positions(j) = ps.get(j).intValue(); j += 1 }
      out(i) = new GenericInternalRow(Array[Any](
        e.getKey, ps.size.toLong, new GenericArrayData(positions)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
