package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension) 8-bit quantization — the SIMPLEST ANN memory
  * compression, and the one every vector store ships first: each
  * dimension is affinely mapped to 0..255 by the corpus-wide per-dim
  * (min, max) range, shrinking a 64-dim double vector to 64 bytes (8×)
  * with no codebook training at all. Next to PQ (sub-space codebooks)
  * this is the low-distortion/high-memory point on the quantization
  * curve; like the PQ family it scores candidates WITHOUT touching raw
  * vectors (reconstruct-from-code arithmetic over the codes column)
  * and re-ranks only the bounded shortlist exactly.
  *
  * The range is a pure selection (per-dim MIN/MAX — no arithmetic), so
  * unlike a trained codebook it is engine-reproducible for free, and
  * the whole pipeline — ranges, codes, reconstruction, approximate
  * distances, ranks — is oracle-exact: every float step is a fixed
  * parenthesization of single-rounded IEEE ops both engines replay.
  *
  * Scale shape: `fitRange` is an index-build artifact (dim×2 doubles,
  * collected once like the PQ codebook); ENCODE IS A PURE MAP (the
  * ranges inline as plan literals — no shuffle, no join); scoring is a
  * broadcast of the ≤|Q| queries against the codes relation; only the
  * bounded per-query shortlist heap shuffles.
  */
object Sq {

  /** Per-dimension (min, max) over the corpus — the index-build
    * artifact. Driver-side head() is the BUILD, not a query path. */
  def fitRange(corpus: DataFrame): (Seq[Double], Seq[Double]) = {
    val dim = corpus.select(size(col("c_vec"))).head().getInt(0)
    val aggs = (1 to dim).flatMap(d => Seq(
      min(element_at(col("c_vec"), d)), max(element_at(col("c_vec"), d))))
    val row = corpus.agg(aggs.head, aggs.tail: _*).head()
    ((0 until dim).map(d => row.getDouble(2 * d)),
     (0 until dim).map(d => row.getDouble(2 * d + 1)))
  }

  /** code[d] = min(255, floor(((v[d] − lo[d]) · 255) / (hi[d] − lo[d])))
    * — fixed parenthesization, constant dims pinned to 0. Pure map. */
  def encode(corpus: DataFrame, lo: Seq[Double], hi: Seq[Double]): DataFrame = {
    val loL = typedLit(lo); val hiL = typedLit(hi)
    corpus.select(col("vec_id"),
      transform(sequence(lit(1), lit(lo.length)), d => {
        val v = element_at(col("c_vec"), d)
        val l = element_at(loL, d); val h = element_at(hiL, d)
        least(
          when(h === l, lit(0.0))
            .otherwise(floor(((v - l) * lit(255.0)) / (h - l))),
          lit(255.0)).cast("int")
      }).as("codes"))
  }

  /** Reconstructed vector from codes: r[d] = lo[d] + ((code[d] + 0.5) ·
    * (hi[d] − lo[d])) / 255 — the cell midpoint, same parenthesization
    * engine and oracle. */
  private def reconstruct(codes: Column, lo: Seq[Double], hi: Seq[Double]): Column = {
    val loL = typedLit(lo); val hiL = typedLit(hi)
    transform(sequence(lit(1), lit(lo.length)), d => {
      val l = element_at(loL, d); val h = element_at(hiL, d)
      l + ((element_at(codes, d).cast("double") + lit(0.5)) * (h - l)) / lit(255.0)
    })
  }

  /** SQ8 top-k: approximate L2 against RECONSTRUCTED vectors (codes
    * only — raw corpus vectors untouched) → bounded per-query shortlist
    * heap → exact-cosine re-rank. Output contract matches
    * [[Vectors.bruteForceKnnHeap]]: (q_id, rank, vec_id, score). */
  def sqKnn(queries: DataFrame, corpus: DataFrame,
            lo: Seq[Double], hi: Seq[Double], k: Int,
            shortlist: Int = 128, roundScale: Int = 6): DataFrame = {
    val codes = encode(corpus, lo, hi)
    val cand = codes
      .crossJoin(broadcast(queries.select(col("q_id"), col("q_vec"))))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sq_d2",
        round(aggregate(
          zip_with(col("q_vec"), reconstruct(col("codes"), lo, hi),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x), 9))
    val spark = cand.sparkSession
    import spark.implicits._
    val short = cand.select(col("q_id"), negate(col("sq_d2")).as("score"), col("vec_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKByScore(shortlist).toColumn.name("top"))
      .toDF("q_id", "top")
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t._2").as("vec_id"))
    val rescored = corpus.join(broadcast(short), "vec_id")
      .join(broadcast(queries.select(col("q_id"), col("q_vec"))), "q_id")
      .withColumn("score",
        round(Vectors.cosine(col("q_vec"), col("c_vec")), roundScale))
      .select(col("q_id"), col("score"), col("vec_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
  }
}
