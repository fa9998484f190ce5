package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and domain-mixing operators for corpus
  * curation. Training-data pipelines need REPRODUCIBLE subsets — a
  * `rand()`-based sample changes under retry/re-partitioning and cannot
  * be audited, so every operator here keys its decision on row CONTENT:
  * the same corpus always yields byte-identical output, on any cluster
  * layout, and an independent engine (the DuckDB oracle) reproduces it
  * exactly.
  */
object Sampling {

  /** Content-hash Bernoulli sample: keep rows whose md5(content) hex
    * digest sorts below `thresholdHex` (compared over the threshold's
    * length — e.g. "28" keeps ≈ 0x28/0x100 ≈ 15.6%). A narrow per-row
    * filter — no shuffle, fully pushdown-friendly, and stable under
    * corpus re-sharding. md5 (not xxhash64) and LEXICOGRAPHIC hex
    * comparison so any external engine (the DuckDB oracle, a Python
    * audit script) reproduces the exact subset byte-for-byte. */
  def hashSample(contentCol: Column, thresholdHex: String): Column = {
    require(thresholdHex.nonEmpty && thresholdHex.matches("[0-9a-f]+"),
      s"thresholdHex must be lowercase hex, got '$thresholdHex'")
    substring(md5(contentCol), 1, thresholdHex.length) < lit(thresholdHex)
  }

  /** Per-domain quota mixing: cap each domain at `quota(domain)` rows,
    * keeping the first rows by `orderCol` (deterministic, auditable —
    * "first N by id" is the reproducible stand-in for "N uniformly
    * sampled" once ids are assignment-order). Domains absent from the
    * quota map fall back to `defaultQuota`.
    *
    * Scale shape: ranking is a window per domain — domains are the
    * partition key, so the sort shards across the cluster and each
    * domain sorts independently; the quota map is a literal CASE
    * expression (no join, no broadcast table). A skewed mega-domain
    * sorts n·log n rows within its partitions; for quota ≪ domain size
    * swap the window for the bounded per-partition top-k heap
    * (TopKByScore) — same contract, map-side truncation. */
  def quotaMix(df: DataFrame, domainCol: Column, orderCol: Column,
               quota: Map[String, Int], defaultQuota: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quotaCol = quota.foldLeft(lit(defaultQuota)) { case (acc, (dom, q)) =>
      when(domainCol === lit(dom), lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(domainCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quotaCol)
      .drop("__rn")
  }

  /** Power-of-two-free LINEAR histogram of a count column: integer
    * bucket = value div `width` — exact integer arithmetic on both
    * engine and oracle, no float log edge cases. The standard corpus
    * length profile (how many docs of 0-15 tokens, 16-31, ...). */
  def linearHistogram(df: DataFrame, valueCol: Column, width: Int): DataFrame =
    df.groupBy(floor(valueCol.cast("long") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(valueCol).cast("long").as("lo"),
        max(valueCol).cast("long").as("hi"))
}
