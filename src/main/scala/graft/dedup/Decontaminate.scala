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
  * Join-strategy choice: the broadcast is gated on the benchmark's
  * MEASURED distinct-gram count, not on a planner hint or estimate. A
  * blanket `broadcast()` hint risks driver OOM when the benchmark
  * outgrows broadcast size; but leaving the choice to AQE alone is
  * wrong in the other direction — the static planner sees only input
  * size estimates (the benchmark's pre-aggregation size), plans a
  * sort-merge join, and AQE can only convert to broadcast AFTER both
  * child shuffle stages materialize, by which point the corpus gram
  * stream has already paid its full shuffle WRITE (~tokens × 16 B at
  * 100 TB — the exact cost this operator exists to avoid). Counting the
  * aggregated benchmark first costs one action on the SMALL side and
  * makes the common case (eval suites: thousands of docs, millions of
  * grams) an explicit broadcast with the corpus never shuffled; past
  * the gate the plan degrades to the shuffled join that an
  * over-threshold broadcast would have OOM'd on.
  */
object Decontaminate {

  /** Grams above which the benchmark side stops broadcasting: 8M grams
    * ≈ 64 MB of hashes before overhead — comfortably inside a default
    * driver/executor budget, far past any real eval suite. */
  private[dedup] val MaxBroadcastGrams = 8L * 1000 * 1000

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
      // both the count gate and the join read this: one benchmark pass
      .localCheckpoint(eager = true)
    // measured-size gate (see scaladoc): explicit broadcast keeps the
    // corpus stream shuffle-free in the common case; the oversized case
    // takes the shuffled join a forced broadcast would have OOM'd on
    val joined =
      if (benchGrams.count() <= MaxBroadcastGrams)
        gramHashes(corpus, idCol, textCol, n).join(broadcast(benchGrams), "g")
      else
        gramHashes(corpus, idCol, textCol, n).join(benchGrams, "g")
    joined
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits")) // grams are pre-distinct per doc
      .select(col("id").as(idCol), col("n_hits"))
  }
}
