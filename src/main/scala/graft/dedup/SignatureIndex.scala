package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared machinery of the batch-partitioned signature indexes
  * ([[IncrementalDedup]] text shingles, [[graft.similarity.IncrementalVectors]]
  * embeddings): the parameter sidecar, the retry-safe read, and the
  * hot-band stop-list live HERE so a fix to any of them cannot silently
  * miss one front. */
private[graft] object SignatureIndex {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Validate or record the index's signature parameters in a
    * `_graft_params` sidecar: signatures from different parameters
    * silently match nothing, so a mismatched batch fails loudly. */
  def checkParams(spark: SparkSession, indexDir: String, want: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir, "_graft_params")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hfs.exists(p)) {
      val in = hfs.open(p)
      val got = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      require(got == want,
        s"index at $indexDir was built with [$got]; this batch uses [$want]")
    } else {
      hfs.mkdirs(new org.apache.hadoop.fs.Path(indexDir))
      val out = hfs.create(p, true)
      try out.write(want.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Read every `batch=<id>` partition EXCEPT `excludeBatch` (idempotent
    * retry: a rerun must not see its own previous append). The explicit
    * schema (which must include the `batch` partition column) means an
    * empty or partially-written index reads as empty instead of failing
    * parquet schema inference. */
  def read(spark: SparkSession, indexDir: String, schema: StructType,
           excludeBatch: Long): DataFrame =
    spark.read.schema(schema).parquet(indexDir)
      .filter(col("batch") =!= excludeBatch)
      .drop("batch")

  /** Non-informative hot buckets from the INCREMENTAL stats subtree:
    * buckets whose summed index frequency exceeds `cap` are returned
    * (materialized) for anti-join exclusion, and their count is logged —
    * a bucket shared by ~everything would explode the batch×index join
    * quadratically; docs still probe via their remaining bands.
    *
    * Scale shape: per-batch bucket counts are tiny pre-aggregates written
    * by [[writeStats]] at commit time, so computing the stop-list reads
    * ONLY the stats — never a full scan of the index's signature column
    * per batch. `statsSchema` must be keyCols + (n long) + (batch long). */
  def stopList(spark: SparkSession, indexDir: String,
               statsSchema: StructType, keyCols: Seq[String],
               excludeBatch: Long, cap: Int, label: String): DataFrame = {
    // first batch: the stats subtree may not exist yet — an empty dir
    // with the explicit schema reads as empty
    val sp = new org.apache.hadoop.fs.Path(statsDir(indexDir))
    sp.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(sp)
    val stats = spark.read.schema(statsSchema).parquet(statsDir(indexDir))
      .filter(col("batch") =!= excludeBatch)
    val hot = stats.groupBy(keyCols.map(col): _*).agg(sum(col("n")).as("n"))
      .filter(col("n") > cap)
      .select(keyCols.map(col): _*)
      .localCheckpoint(eager = true)
    val nHot = hot.count()
    if (nHot > 0)
      log.warn(s"$label: stop-listing $nHot bucket(s) with index frequency > $cap")
    hot
  }

  /** Commit a batch's per-bucket counts alongside its signatures. The
    * stats live in an underscore-prefixed subtree of the index directory,
    * which parquet readers of the index itself IGNORE (Spark's file index
    * hides `_`-prefixed paths) — one directory to manage, two logical
    * tables. Overwrite per batch partition = idempotent like the
    * signature write. */
  def writeStats(banded: DataFrame, indexDir: String, keyCols: Seq[String],
                 batchId: Long): Unit =
    banded.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"${statsDir(indexDir)}/batch=$batchId")

  private def statsDir(indexDir: String): String = s"$indexDir/_stats"
}
