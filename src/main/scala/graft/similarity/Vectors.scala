package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the (small)
  * query set against the corpus — one scan, no shuffle of the corpus,
  * per-partition top-k heaps via window-rank prune. The scale path is
  * SRP-LSH (random-hyperplane signatures): corpus is bucketed by signature
  * once (one cheap narrow transform), queries probe only their own bucket,
  * turning O(|Q|·|C|) into O(|Q|·|C|/2^bits) with recall controlled by
  * `bits` and multi-probe.
  */
object Vectors {

  /** Elementwise double cast (embeddings arrive as float[]). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic summation order, so
    * results are reproducible and engine-comparable. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k neighbors for each query vector.
    * `queries` must be broadcast-sized; corpus is streamed. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    roundScale: Int = 6): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("c_vec")), roundScale))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("score"))
  }

  /** Signed-random-projection signature: `bits` hyperplanes with ±1
    * components derived from a deterministic seed — no data-dependent
    * training, so corpus and queries bucket identically. */
  def srpSignature(v: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val planes: Seq[Seq[Double]] = (0 until bits).map { b =>
      (0 until dim).map { j =>
        // splitmix-style bit mix of (seed, b, j) → ±1
        var z = seed + b * 0x9e3779b97f4a7c15L + j * 0xbf58476d1ce4e5b9L
        z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
        z ^= z >>> 27; z *= 0x94d049bb133111ebL
        z ^= z >>> 31
        if ((z & 1L) == 1L) 1.0 else -1.0
      }
    }
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** LSH-bucketed ANN: probe only the query's SRP bucket. Recall < 1;
    * raise `bits` for smaller buckets, lower for higher recall. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, dim: Int, bits: Int,
             k: Int, roundScale: Int = 6): DataFrame = {
    val cb = corpus.withColumn("bucket", srpSignature(col("c_vec"), dim, bits))
    val qb = queries.withColumn("bucket", srpSignature(col("q_vec"), dim, bits))
    val joined = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("c_vec")), roundScale))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("score"))
  }
}
