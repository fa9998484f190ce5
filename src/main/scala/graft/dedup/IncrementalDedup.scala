package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashedShingles, MinHashBands, TokenCount}

/** Incremental near-dup dedup against a persistent survivor index — the
  * daily-ingest shape of a training-data pipeline: yesterday's corpus is
  * already deduplicated and indexed; today's batch must only be compared
  * against the index plus itself, never re-pairing the historical corpus.
  *
  * The index is a parquet table of surviving documents' shingle-hash sets
  * and LSH band hashes (id, sh array<long>, bands array<long>) — ~tens of
  * bytes per doc, NOT the documents. Per batch:
  *
  *  1. batch docs → hashed shingles + bands (one native pass each);
  *  2. batch×index candidates by band join (ids only), verified by exact
  *     set-Jaccard on the stored shingle hashes — batch docs matching an
  *     indexed survivor are dropped (FIRST-WINS, like the reference's
  *     insert dedup J9: what's already in wins);
  *  3. remaining batch docs near-dup-dedup against each other through the
  *     same [[Dedup.minhashPairs]]/[[Dedup.survivors]] path as the batch
  *     form (min-id per component);
  *  4. the batch's survivors append their signatures to the index.
  *
  * Equivalence contract (unit-proven): feeding a corpus in id-ascending
  * batches yields the same final survivor set as one global batch pass,
  * because first-wins over earlier batches coincides with min-id when
  * earlier batches hold smaller ids. Like every greedy incremental dedup,
  * cross-batch TRANSITIVE closure is not re-evaluated: a doc that only
  * links to an already-dropped doc (not to its surviving representative)
  * survives — at near-dup thresholds ≥0.8 components are dense and this
  * is the standard accepted trade.
  *
  * Streaming: drive `addBatch` from `foreachBatch` — the index read/write
  * is the per-batch state commit. Docs shorter than `shingleN` tokens
  * have no shingles, can match nothing, and pass through unindexed.
  */
object IncrementalDedup {

  private def emptyIndex(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("sh", ArrayType(LongType, containsNull = false), nullable = false),
        StructField("bands", ArrayType(LongType, containsNull = false), nullable = false))))
  }

  private def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.parquet(indexDir) else emptyIndex(spark)
  }

  /** Process one arriving batch of (id, text) docs against the survivor
    * index at `indexDir` (created on first call). Returns the batch's
    * surviving docs (all original columns). */
  def addBatch(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
               shingleN: Int = 3, k: Int = 16, bands: Int = 4,
               minJaccard: Double = 0.8, bucketCap: Int = 1024): DataFrame = {
    val spark = docs.sparkSession

    // signatures for the pairable part of the batch (one native pass);
    // short docs survive unconditionally and are never indexed
    val sigs = docs
      .filter(TokenCount(col(textCol)) >= shingleN)
      .select(col(idCol).as("id"),
        HashedShingles(col(textCol), shingleN).as("sh"))
      .withColumn("bands", MinHashBands(col("sh"), k, bands))
      .localCheckpoint(eager = true) // consumed by index-join, pairing, and the index append

    val index = readIndex(spark, indexDir)

    // batch×index candidates: band join on ids only, then ONE verify pass
    // over the stored shingle sets — never the documents
    val batchBands = sigs.select(col("id"), explode(col("bands")).as("band"))
    val indexBands = index.select(col("id").as("idx_id"), explode(col("bands")).as("band"))
    val cand = batchBands.join(indexBands, "band")
      .select(col("id"), col("idx_id")).distinct()
    val dropped = cand
      .join(sigs.select(col("id"), col("sh")), "id")
      .join(index.select(col("id").as("idx_id"), col("sh").as("idx_sh")), "idx_id")
      .withColumn("n_inter", size(array_intersect(col("sh"), col("idx_sh"))))
      .withColumn("j", col("n_inter").cast("double") /
        (size(col("sh")) + size(col("idx_sh")) - col("n_inter")))
      .filter(col("j") >= minJaccard)
      .select(col("id")).distinct()

    // remaining batch docs dedup against each other through the SAME
    // batch machinery (minhash pairs → components → min-id survivors)
    val remaining = docs.join(dropped.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
    val pairs = Dedup.minhashPairs(remaining, idCol, textCol,
      shingleN, k, bands, minJaccard, bucketCap)
    val surv = Dedup.survivors(remaining, idCol, pairs)
      .localCheckpoint(eager = true) // must be computed BEFORE the index append below

    // append the new survivors' signatures to the index
    sigs.join(surv.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .write.mode("append").parquet(indexDir)

    surv
  }
}
