package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * arXiv 2302.03169): score every raw document by how target-like its
  * hashed n-gram profile is. Two bag-of-hashed-bigrams unigram LMs are
  * fit — one over the target slice, one over the whole raw corpus — and
  * each document's importance weight is its summed per-gram
  * log-likelihood ratio log p_target(g) − log p_raw(g). High-weight
  * documents are the ones importance resampling keeps when curating a
  * target-shaped training set from a web-scale crawl.
  *
  * Scale shape: one explode + bucket hash-agg builds BOTH LMs in a single
  * pass (the target count rides the same shuffle as the raw count as a
  * conditional sum); the bucket weight table is `buckets` rows (fixed,
  * thousands at most) and broadcasts to the per-doc scoring join; the
  * per-doc aggregation shuffles (doc, weight) scalars. Nothing grows with
  * the corpus except the two linear passes. Hashing is md5-derived
  * (engine-portable, the dd_minhash_md5 trick), log-ratios are rounded
  * then decimal-summed, so any engine reproduces every weight exactly.
  */
object Dsir {

  /** Per-document DSIR importance weights. `targetPred` marks the target
    * slice (e.g. lang = 'en'). Returns (doc_id, n_grams, dsir_weight),
    * one row per doc with ≥ 1 bigram; weights use add-1 smoothing over
    * `buckets` hashed-bigram buckets. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, buckets: Int = 512): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"), targetPred.as("is_t"),
        TextFunctions.wsTokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      // U+001F separator: boundary-unambiguous, = the oracle's chr(31)
      .select(col("doc_id"), col("is_t"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => concat_ws("\u001F", element_at(col("t"), i),
          element_at(col("t"), i + lit(1))))).as("g"))
      .select(col("doc_id"), col("is_t"),
        (conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
          % buckets).as("bkt"))
    // both LMs from ONE (bucket)-grouped pass: raw count + conditional
    // target count ride the same shuffle
    val cnts = grams.groupBy(col("bkt")).agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    val tot = cnts.agg(sum(col("c_r")).as("t_r"), sum(col("c_t")).as("t_t"))
    val wtab = cnts.crossJoin(broadcast(tot))
      .select(col("bkt"), round(
        log((col("c_t") + lit(1.0)) / (col("t_t") + lit(buckets.toDouble))) -
          log((col("c_r") + lit(1.0)) / (col("t_r") + lit(buckets.toDouble))),
        6).as("w"))
    grams.join(broadcast(wtab), "bkt")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        round(sum(col("w").cast(DecimalType(18, 6))).cast("double"), 6)
          .as("dsir_weight"))
  }
}
