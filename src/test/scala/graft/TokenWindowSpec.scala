package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TokenWindows
import graft.text.TextFunctions

/** Bit-equality pins for the native [[graft.functions.TokenWindowHashes]]
  * kernel against the composable HOF form it replaces — every gram
  * pipeline's oracle rides on the two producing IDENTICAL hash arrays,
  * including the wsTokens edge cases (space-only trim, limit −1 split). */
class TokenWindowSpec extends SparkSuite {

  import spark.implicits._

  /** The HOF reference form the call sites used before the native swap.
    * Guarded on token count: with fewer than n tokens the raw form's
    * sequence(1, ≤0) DESCENDS through 0 and slice(t, 0, n) throws —
    * which is why every call site filtered `size(t) >= n` first. The
    * native form returns an empty array there instead. */
  private def hofWindows(text: Column, n: Int, sep: String): Column = {
    val t = TextFunctions.wsTokens(text)
    when(size(t) < n, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
        i => xxhash64(array_join(slice(t, i, lit(n)), sep))))
  }

  private val edgeCases = Seq(
    "plain space separated tokens here",
    "multi   space    runs",
    "\tleading tab yields empty first token",
    "trailing tab yields empty last token\t",
    "newline\nand\ttabmixed\fseparators\rhere",
    "   leading and trailing spaces   ",
    "single",
    "two tokens",
    "", // empty: split yields [""], size 1
    "     ", // all spaces: trim → "", split yields [""]
    "\t\t", // all tabs: survive trim, split yields ["", ""]
    "unicode tökens ünd ßtrings müssen auch stimmen",
    "a b a b a b a b", // max field density
    "x\u001Fy contains the separator byte inside a token")

  test("native window hashes ≡ HOF form on edge cases (n = 1, 2, 3, 8)") {
    val df = edgeCases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(1, 2, 3, 8); sep <- Seq("\u001F", " ")) {
      val got = df.select(col("id"),
          TokenWindows(col("text"), n, sep.head.toByte).as("native"),
          hofWindows(col("text"), n, sep).as("hof"))
        .collect()
      got.foreach { r =>
        val nat = r.getSeq[Long](1)
        val hof = r.getSeq[Long](2)
        assert(nat == hof, s"id=${r.getLong(0)} n=$n sep=${sep.head.toInt}")
      }
    }
  }

  test("native window hashes ≡ HOF form on the sf0.001 documents corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    for (n <- Seq(3, 8)) {
      val mismatches = docs
        .filter(size(TextFunctions.wsTokens(col("text"))) >= n)
        .select(col("doc_id"),
          TokenWindows(col("text"), n).as("native"),
          hofWindows(col("text"), n, "\u001F").as("hof"))
        .filter(not(col("native") <=> col("hof")))
        .count()
      assert(mismatches === 0L, s"n=$n")
    }
  }

  test("ws_field_count ≡ size(wsTokens) including empty-token edge cases") {
    val df = edgeCases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val bad = df.select(
        TokenWindows.fieldCountCol(col("text")).as("native"),
        size(TextFunctions.wsTokens(col("text"))).as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(bad === 0L)
  }

  test("windows shorter than n hash nothing; explode drops the doc") {
    val df = Seq((1L, "only two"), (2L, "one two three four")).toDF("id", "text")
      .select(col("id"), explode(TokenWindows(col("text"), 3)).as("h"))
    assert(df.select("id").distinct().collect().map(_.getLong(0)).toSet === Set(2L))
  }
}
