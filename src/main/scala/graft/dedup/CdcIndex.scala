package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Incremental CHUNK-level dedup against a persistent content-defined
  * chunk-fingerprint index — the passage-granularity sibling of
  * [[IncrementalDedup]] (whole-document near-dup): a new ingest batch
  * is scored by how many of its CDC chunks the corpus has already seen,
  * which catches copied PASSAGES inside otherwise-novel documents and
  * survives insertions/offsets (the CDC re-synchronization property —
  * see [[TextFunctions.cdcChunkFingerprints]]) where fixed-offset
  * chunking would miss every shifted copy.
  *
  * The index stores DISTINCT chunk fingerprints (md5 strings, ~32 bytes
  * per unique passage — not the text), one `batch=<id>` partition per
  * ingest batch: the same idempotent commit contract as the other
  * persistent indexes (a retry overwrites its own partition; the index
  * read excludes the current batch, so scoring never sees a partial
  * earlier attempt of itself). Scoring is one hashed left-anti join of
  * the batch's chunk relation against the index — fingerprints shuffle,
  * text never does.
  */
object CdcIndex {

  private def chunks(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"), TextFunctions.wsTokens(col(textCol)).as("__t"))
      .select(col("__id"),
        explode(TextFunctions.cdcChunkFingerprints(col("__t"))).as("fp"))

  /** All fingerprints committed by OTHER batches (empty on first use). */
  private def knownFps(spark: SparkSession, indexPath: String,
                       excludeBatch: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) spark.emptyDataFrame.select(lit("").as("fp")).limit(0)
    else spark.read.option("basePath", indexPath).parquet(s"$indexPath/batch=*")
      .filter(col("batch") =!= excludeBatch)
      .select(col("fp"))
  }

  /** Score one ingest batch against the accumulated index and commit its
    * distinct fingerprints. Returns per-doc (idCol, n_chunks, n_novel):
    * `n_novel` counts chunks the index had NOT seen before this batch —
    * a full-copy document scores 0 novel even when its ids/offsets
    * differ from the indexed original. */
  def addBatch(docs: DataFrame, idCol: String, textCol: String,
               indexPath: String, batchId: Long): DataFrame = {
    val spark = docs.sparkSession
    val ch = chunks(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val known = knownFps(spark, indexPath, batchId)
      val novel = ch.join(known.distinct(), Seq("fp"), "left_anti")
        .groupBy(col("__id")).agg(count(lit(1)).as("n_novel"))
      val all = ch.groupBy(col("__id")).agg(count(lit(1)).as("n_chunks"))
      // commit AFTER scoring reads: the batch's own fps must not count
      // against itself; overwrite makes a retry idempotent
      ch.select(col("fp")).distinct()
        .write.mode("overwrite").parquet(s"$indexPath/batch=$batchId")
      all.join(novel, Seq("__id"), "left")
        .select(col("__id").as(idCol), col("n_chunks"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"))
        .localCheckpoint(eager = true)
    } finally ch.unpersist(blocking = true)
  }
}
