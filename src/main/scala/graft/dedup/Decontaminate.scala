package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Benchmark decontamination — the cross-corpus membership test every
  * training-data pipeline runs before a model ships: flag training
  * documents that share any length-`n` token n-gram with an evaluation
  * benchmark, so test-set passages can be scrubbed from the training
  * corpus.
  *
  * Scale shape: the benchmark side is the SMALL side (eval suites are
  * thousands of documents; the corpus is the 100 TB side), so its distinct
  * gram set is aggregated first and the corpus probes it with a broadcast
  * hash join — corpus grams are never shuffled. Grams travel as 64-bit
  * xxhash64 values, not strings: the join key is 8 bytes regardless of
  * n-gram width, and the per-doc hit count dedups gram VALUES (a doc
  * repeating a contaminated gram counts it once). At 2⁻⁶⁴ collision odds a
  * false hit needs ~billions of distinct grams; decontamination is a
  * flagging pass reviewed downstream, so that trade is standard.
  *
  * If the benchmark outgrows broadcast size the same plan degrades to a
  * shuffled semi-join on the gram hash — the code path is identical, AQE
  * picks the strategy from the aggregated benchmark's actual size.
  */
object Decontaminate {

  /** Distinct 64-bit gram hashes per doc: tokenize, slide an `n`-token
    * window, hash each gram's tokens joined with a 0x1F separator (US —
    * cannot appear inside whitespace-split tokens, so token boundaries
    * stay unambiguous: ["ab","c"] never collides with ["a","bc"]). */
  private def gramHashes(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame = {
    val toks = TextFunctions.wsTokens(col(textCol))
    docs
      .select(col(idCol).as("id"), toks.as("t"))
      .filter(size(col("t")) >= n)
      .select(col("id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("t")) - (n - 1)),
          i => xxhash64(array_join(slice(col("t"), i, lit(n)), "\u001F"))))).as("g"))
  }

  /** Corpus docs sharing at least one `n`-gram with `benchmark`.
    * Returns (id, n_hits) — the number of DISTINCT contaminated grams per
    * flagged doc, the usual triage signal (1 shared gram = boilerplate;
    * hundreds = an embedded test passage). */
  def flagContaminated(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = gramHashes(benchmark, idCol, textCol, n)
      .select(col("g")).distinct()
    gramHashes(corpus, idCol, textCol, n)
      // no explicit broadcast hint: a hint would force the broadcast even
      // when the benchmark gram set outgrows broadcast size (driver OOM);
      // AQE sees the aggregated side's actual size and auto-broadcasts
      // the small case, degrading to a shuffled join otherwise — which is
      // exactly the documented contract above
      .join(benchGrams, "g")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits")) // grams are pre-distinct per doc
      .select(col("id").as(idCol), col("n_hits"))
  }
}
