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
  * grams) an explicit broadcast with the corpus never shuffled.
  *
  * Past the gate the corpus STILL never shuffles in full: the oversized
  * regime builds a Bloom filter over the benchmark grams (~7.3 bits/gram
  * at 3% fpp — ~9× denser than the 8-byte hashes a broadcast ships, so
  * a gram set well past broadcast size still fits every executor) and
  * pre-filters corpus grams with Spark's native
  * `BloomFilterMightContain` predicate BEFORE the exact join. Only true
  * hits plus the fpp sliver of false positives enter the shuffle, and
  * the exact join then removes the false positives — output is
  * byte-identical to the broadcast path. This is the same
  * sketch-then-verify shape Spark's own runtime row-level filtering
  * injects for large joins, applied here with a measured item count:
  * the filter is sized from the exact distinct-gram count via a direct
  * `treeAggregate` over the public sketch API, because BOTH SQL routes
  * to a Bloom build (`bloom_filter_agg`, and `stat.bloomFilter` which
  * delegates to it on Spark 4) silently clamp the filter to
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
  * (defaults 4M items / 64M bits) — a clamp that would quietly push
  * fpp toward 1 in exactly the >8M-gram regime this path exists for.
  */
object Decontaminate {

  /** Grams above which the benchmark side stops broadcasting: 8M grams
    * ≈ 64 MB of hashes before overhead — comfortably inside a default
    * driver/executor budget, far past any real eval suite. */
  private[dedup] val MaxBroadcastGrams = 8L * 1000 * 1000

  /** False-positive rate for the oversized-benchmark Bloom pre-filter —
    * Spark's own runtime-filter default. At 3% the filter costs ~7.3
    * bits per gram and the exact verify join sees 3% of non-matching
    * corpus grams instead of 100%. */
  private[dedup] val BloomFpp = 0.03

  /** Distinct 64-bit gram hashes per doc: tokenize, slide an `n`-token
    * window, hash each gram's tokens joined with a 0x1F separator (US —
    * cannot appear inside whitespace-split tokens, so token boundaries
    * stay unambiguous: ["ab","c"] never collides with ["a","bc"]). */
  private def gramHashes(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame =
    // fused native window hashes (graft.functions.TokenWindowHashes) —
    // bit-identical to the wsTokens → transform/xxhash64(array_join)
    // chain it replaced; a doc under n tokens hashes to an empty array
    // and the explode drops it, so no token-count pre-filter pass
    docs.select(col(idCol).as("id"), explode(array_distinct(
      graft.functions.TokenWindows(col(textCol), n))).as("g"))

  /** Corpus docs sharing at least one `n`-gram with `benchmark`.
    * Returns (id, n_hits) — the number of DISTINCT contaminated grams per
    * flagged doc, the usual triage signal (1 shared gram = boilerplate;
    * hundreds = an embedded test passage). */
  /** Benchmark gram set, checkpointed (one benchmark pass feeds the
    * count gate, the Bloom build, and the verify join), plus its exact
    * distinct count. Shared by both public entry points so the two
    * paths can never drift in gram canonicalization. */
  private def benchGramsWithCount(benchmark: DataFrame, idCol: String,
                                  textCol: String, n: Int): (DataFrame, Long) = {
    val g = gramHashes(benchmark, idCol, textCol, n)
      .select(col("g")).distinct()
      .localCheckpoint(eager = true)
    (g, g.count())
  }

  def flagContaminated(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, n: Int): DataFrame = {
    val (benchGrams, nGrams) = benchGramsWithCount(benchmark, idCol, textCol, n)
    // measured-size gate (see scaladoc): explicit broadcast keeps the
    // corpus stream shuffle-free in the common case; the oversized case
    // Bloom-prefilters the corpus grams so only candidate hits shuffle
    val joined =
      if (nGrams <= MaxBroadcastGrams)
        gramHashes(corpus, idCol, textCol, n).join(broadcast(benchGrams), "g")
      else
        bloomPrefiltered(corpus, benchGrams, nGrams, idCol, textCol, n, BloomFpp)
    hitCounts(joined, idCol)
  }

  /** The oversized-benchmark path, callable directly (and testable at
    * small scale): Bloom-prefilter corpus grams against the benchmark
    * gram set, then exact-verify the survivors. Output is identical to
    * [[flagContaminated]] — the verify join removes the Bloom's false
    * positives — only the plan differs. */
  def flagContaminatedBloom(corpus: DataFrame, benchmark: DataFrame,
                            idCol: String, textCol: String, n: Int,
                            fpp: Double = BloomFpp): DataFrame = {
    val (benchGrams, nGrams) = benchGramsWithCount(benchmark, idCol, textCol, n)
    if (nGrams == 0L) // degenerate: nothing to build a filter from
      hitCounts(gramHashes(corpus, idCol, textCol, n).limit(0), idCol)
    else
      hitCounts(
        bloomPrefiltered(corpus, benchGrams, nGrams, idCol, textCol, n, fpp),
        idCol)
  }

  /** Build the Bloom filter over `benchGrams` (distributed
    * `treeAggregate` over the public sketch API — sized from the
    * measured count, NOT clamped by the runtime-filter confs the SQL
    * builds apply; see object scaladoc), probe it with the native
    * codegen'd `might_contain` predicate on the corpus gram stream,
    * then exact-join the survivors. The filter bytes ride the task
    * binary — broadcast once per stage, never per task. */
  private def bloomPrefiltered(corpus: DataFrame, benchGrams: DataFrame,
                               nGrams: Long, idCol: String, textCol: String,
                               n: Int, fpp: Double): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftshim.Bridge
    import org.apache.spark.util.sketch.BloomFilter
    val bloom = benchGrams.select(col("g"))
      .as(org.apache.spark.sql.Encoders.scalaLong).rdd
      .treeAggregate(BloomFilter.create(nGrams, fpp))(
        (bf, g) => { bf.putLong(g); bf },
        (a, b) => a.mergeInPlace(b))
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val mightContain = Bridge.column(new BloomFilterMightContain(
      Literal(out.toByteArray, org.apache.spark.sql.types.BinaryType),
      Bridge.expression(col("g"))))
    gramHashes(corpus, idCol, textCol, n)
      .filter(mightContain)
      .join(benchGrams, "g") // exact verify: false positives drop here
  }

  private def hitCounts(joined: DataFrame, idCol: String): DataFrame =
    joined
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits")) // grams are pre-distinct per doc
      .select(col("id").as(idCol), col("n_hits"))
}
