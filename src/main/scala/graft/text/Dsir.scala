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

  /** (doc_id, is_t, bkt) — one row per bigram occurrence, bucket-hashed.
    * U+001F separator: boundary-unambiguous, = the oracle's chr(31).
    * NATIVE one-pass kernel ([[graft.functions.TokenWindowMd5Buckets]]):
    * bit-identical to the wsTokens → transform(concat_ws) → Md5Prefix %
    * chain it replaced (the md5 digests the same window bytes straight
    * out of the tokenizer's normalized buffer), which paid a token-array
    * materialization, an interpreted transform lambda and a gram-string
    * allocation per bigram; docs under two tokens emit an empty array,
    * folding in the size(t) >= 2 filter. Parity pinned in
    * TokenWindowSpec. */
  private def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
                          targetPred: Column, buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), targetPred.as("is_t"),
      explode(graft.functions.TokenWindows.md5BucketsCol(
        col(textCol), 2, 0, 15, buckets)).as("bkt"))

  /** The (bkt, w) weight frame: both LMs from ONE bucket-grouped pass —
    * raw count + conditional target count ride the same shuffle; add-1
    * smoothing, log-ratio rounded to 6. Only buckets with ≥ 1 raw gram
    * appear (the fit corpus defines the rest via the unseen weight). */
  private def weightFrame(grams: DataFrame, buckets: Int): DataFrame = {
    val cnts = grams.groupBy(col("bkt")).agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    val tot = cnts.agg(sum(col("c_r")).as("t_r"), sum(col("c_t")).as("t_t"))
    cnts.crossJoin(broadcast(tot))
      .select(col("bkt"), round(
        log((col("c_t") + lit(1.0)) / (col("t_t") + lit(buckets.toDouble))) -
          log((col("c_r") + lit(1.0)) / (col("t_r") + lit(buckets.toDouble))),
        6).as("w"))
  }

  /** Per-document DSIR importance weights. `targetPred` marks the target
    * slice (e.g. lang = 'en'). Returns (doc_id, n_grams, dsir_weight),
    * one row per doc with ≥ 1 bigram; weights use add-1 smoothing over
    * `buckets` hashed-bigram buckets. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, buckets: Int = 512): DataFrame = {
    val grams = gramBuckets(docs, idCol, textCol, targetPred, buckets)
    grams.join(broadcast(weightFrame(grams, buckets)), "bkt")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        round(sum(col("w").cast(DecimalType(18, 6))).cast("double"), 6)
          .as("dsir_weight"))
  }

  /** The LM artifact alone, collected: (bkt → w, unseenW) — `buckets`
    * entries at most (index-artifact size, built once per corpus
    * snapshot, the PQ codebook billing). `unseenW` is the weight of a
    * bucket with zero fit-corpus grams (c_t = c_r = 0 under the same
    * smoothing — what a NEW streamed document's out-of-fit gram scores).
    * Feed to [[scoreWithLiteralWeights]] for streaming/serving reads. */
  def weightTable(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, buckets: Int = 512): (Map[Long, Double], Double) = {
    val grams = gramBuckets(docs, idCol, textCol, targetPred, buckets)
    val cnts = grams.groupBy(col("bkt")).agg(
        count(lit(1)).as("c_r"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tR = cnts.map(_._2).sum.toDouble
    val tT = cnts.map(_._3).sum.toDouble
    // identical op sequence to weightFrame's Spark expression (divide,
    // java.lang.Math.log, HALF_UP round to 6) so the collected artifact
    // equals the plan-side table bit-for-bit
    def w(cT: Double, cR: Double): Double =
      BigDecimal(math.log((cT + 1.0) / (tT + buckets)) -
          math.log((cR + 1.0) / (tR + buckets)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (cnts.map { case (b, cR, cT) => b -> w(cT.toDouble, cR.toDouble) }.toMap,
      w(0.0, 0.0))
  }

  /** STATELESS per-doc scoring against a pre-built weight map: the map
    * is a plan LITERAL (buckets entries — index-artifact size, the PQ
    * codebook precedent), gram hashing and the decimal-exact weight sum
    * run as a pure projection over the doc scan. No join, no shuffle,
    * no aggregation state — which is exactly what makes it legal on an
    * UNBOUNDED STREAM in append mode: scoring each arriving document
    * touches nothing but that document. Arithmetic is identical to
    * [[importanceWeights]] (same rounded-6 weights, decimal-summed), so
    * streamed scores equal the batch scorer bit-for-bit. Buckets absent
    * from the map (zero raw count in the fit corpus) score with the
    * unseen-bucket weight — ln((0+1)/(t_t+B)) − ln((0+1)/(t_r+B)) —
    * passed in by the caller as `unseenW`. */
  def scoreWithLiteralWeights(docs: DataFrame, idCol: String, textCol: String,
                              weights: Map[Long, Double], unseenW: Double,
                              buckets: Int = 512): DataFrame = {
    val wlit = typedLit(weights)
    // native one-pass bucket kernel (see gramBuckets): same buckets, no
    // token array / gram strings; the size(__g) >= 1 filter replaces the
    // size(tokens) >= 2 filter row-identically (>= 1 bigram <=> >= 2
    // tokens). The decimal-exact weight fold is unchanged.
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.TokenWindows.md5BucketsCol(
          col(textCol), 2, 0, 15, buckets).as("__g"))
      .filter(size(col("__g")) >= 1)
      .select(col("doc_id"),
        size(col("__g")).cast("long").as("n_grams"),
        round(aggregate(col("__g"),
          lit(0).cast(DecimalType(38, 6)),
          (acc, g) => acc + coalesce(element_at(wlit, g), lit(unseenW))
            .cast(DecimalType(18, 6))).cast("double"), 6).as("dsir_weight"))
  }
}
