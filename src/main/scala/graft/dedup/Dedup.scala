package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Hashing
import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: exact dedup is one hash-shuffle on a 64/128-bit content
  * key (never shuffle the documents themselves — hash first, group on the
  * hash). MinHash+LSH makes near-dup detection linear-ish: candidate pairs
  * only form inside LSH band buckets, so the quadratic all-pairs join never
  * materializes; the exact-Jaccard verification then runs per candidate
  * pair on pre-aggregated shingle sets (array ops, no explode).
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per content hash.
    * Returns (survivors, dropped-duplicate count column name is "dups"). */
  def exactDedup(df: DataFrame, idCol: String, contentCols: Seq[Column]): DataFrame = {
    val hashed = df.withColumn("content_hash", Hashing.md5Hash(contentCols: _*))
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: k minimums of per-seed 64-bit hashes over the
    * shingle set. Pure Catalyst array exprs — codegen'd, no UDF. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shingleCol, s => xxhash64(lit(i), s)))): _*)

  /** LSH band hashes: split the k-length signature into `bands` bands and
    * hash each; docs sharing any band hash become candidate pairs. */
  def lshBandHashes(sigCol: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    array((0 until bands).map(b =>
      xxhash64(lit(b), slice(sigCol, b * r + 1, r))): _*)
  }

  /** Full MinHash+LSH near-dup pipeline over (id, text):
    * shingle → sign → band → bucket-join → exact-Jaccard verify.
    * Returns candidate pairs (id_a, id_b, jaccard) with jaccard >= minJaccard.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                   minJaccard: Double = 0.2): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
        TextFunctions.shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minhashSignature(col("sh"), k))
      .withColumn("band", explode(lshBandHashes(col("sig"), k, bands)))
    val a = sig.select(col("id").as("id_a"), col("sh").as("sh_a"), col("band"))
    val b = sig.select(col("id").as("id_b"), col("sh").as("sh_b"), col("band"))
    val cand = a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
    cand
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact token-set Jaccard over all pairs (bounded input!) — the
    * oracle-checkable baseline that MinHash approximates. Explode tokens,
    * self-join per token to count intersections, then compute
    * |A∩B| / (|A| + |B| - |A∩B|). Quadratic: only for bounded subsets or
    * verification; use minhashPairs at scale. */
  def tokenJaccardPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        array_distinct(TextFunctions.wsTokens(col(textCol))).as("toks"))
    val sizes = toks.select(col("id"), size(col("toks")).as("n"))
    val exploded = toks.select(col("id"), explode(col("toks")).as("tok"))
    val inter = exploded.as("x").join(exploded.as("y"),
        col("x.tok") === col("y.tok") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
