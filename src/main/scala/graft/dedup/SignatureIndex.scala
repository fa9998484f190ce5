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

  /** Does the index hold any batch partition OTHER than `excludeBatch`?
    * One driver-side directory listing — the gate for the fresh-index
    * fast path (the BucketedIncrementalDedup/CdcIndex r17 precedent): a
    * first batch probes a provably-empty index, so its candidate join,
    * stop-list and verify machinery are pure scheduler overhead. A RETRY
    * of batch 1 sees only its own partition and still counts as fresh —
    * reads exclude it anyway. */
  def hasOtherBatches(spark: SparkSession, indexDir: String,
                      excludeBatch: Long): Boolean = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.exists(root) && hfs.listStatus(root).exists { s =>
      s.isDirectory && {
        val n = s.getPath.getName
        n.startsWith("batch=") &&
          n.stripPrefix("batch=").toLongOption.exists(_ != excludeBatch)
      }
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
    // LAZY checkpoint: the count below materializes the blocks and
    // returns the size in one job instead of a checkpoint job + a count
    // job (the stop-list is consumed by two anti-joins downstream, so
    // the materialization itself is still required)
    val hot = stats.groupBy(keyCols.map(col): _*).agg(sum(col("n")).as("n"))
      .filter(col("n") > cap)
      .select(keyCols.map(col): _*)
      .localCheckpoint(eager = false)
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

  /** Compact the index's batch partitions: every batch strictly below
    * the LATEST non-negative batch id (which stays untouched — it is the
    * only id a foreachBatch retry can legally reuse, and a retry
    * overwrites its own partition) folds into one consolidated partition
    * `batch=-(maxCompacted)`, and the originals are deleted. Negative
    * ids are prior consolidations and fold in too. Fixes the
    * daily-ingest small-files problem: after N batches the index is one
    * consolidated partition + the live batch, not N directories.
    *
    * Retry safety: consolidated ids are negative, foreachBatch ids are
    * non-negative — `read`'s excludeBatch can never exclude (and an
    * overwrite can never destroy) consolidated data.
    *
    * Crash safety: consolidated data is WRITTEN (signatures, then stats,
    * then an own `_graft_commit` marker inside `batch=gen`) before any
    * original is deleted, and deletes remove signature dirs before stats
    * dirs — so a rerun can always classify where the crash landed from
    * the filesystem alone. The marker is compact's OWN commit record:
    * `_SUCCESS` would vanish under
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` (common on
    * object stores) and a mid-delete crash would then be misclassified
    * as mid-write, regenerating `batch=gen` from only the SURVIVING
    * originals — silent data loss. The regenerate path clears any stale
    * marker first (the signature overwrite deletes the directory that
    * holds it).
    *
    *  - `batch=gen` absent or missing `_graft_commit` → the crash hit
    *    mid-write, every original is intact → regenerate both
    *    consolidated partitions with `mode(overwrite)` from the
    *    originals (the rerun behaves exactly like a first run; the
    *    partial `batch=gen` is never READ, only clobbered);
    *  - `batch=gen` carries `_graft_commit` → both writes completed and
    *    the crash hit mid-delete; `batch=gen` already holds every fold
    *    source's data (surviving originals are a duplicated subset) →
    *    skip the writes and finish the deletes.
    *
    * Either way the rerun converges to the same healthy state — compact
    * is idempotent under crash-rerun, never wedged. Stats partitions
    * whose signature sibling is gone (possible only mid-delete, since
    * writes create signatures first) are swept as residue up front.
    *
    * Returns the number of batch partitions folded (0 = nothing to do).
    *
    * `partitionCols`: sub-partition columns WITHIN each batch (e.g. the
    * postings index's term bucket `tb`) — the consolidated write
    * re-partitions by them so directory-level pruning survives
    * compaction; the fold read recovers them from the source dirs. */
  def compact(spark: SparkSession, indexDir: String, schema: StructType,
              statsSchema: StructType, keyCols: Seq[String],
              partitionCols: Seq[String] = Nil): Int = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(root)) return 0
    def batchDirs(p: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
      if (!hfs.exists(p)) Seq.empty
      else hfs.listStatus(p).toIndexedSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .flatMap(s => s.getPath.getName.stripPrefix("batch=").toLongOption
          .map(_ -> s.getPath))
    val statsRoot = new org.apache.hadoop.fs.Path(statsDir(indexDir))
    val sig = batchDirs(root)
    // sweep stats residue: a stats dir with no signature sibling can only
    // be the tail of an interrupted delete phase (writes create the
    // signature partition first; deletes remove it first), so its rows
    // are already folded into a consolidated partition
    val sigIds = sig.map(_._1).toSet
    batchDirs(statsRoot).filterNot(s => sigIds.contains(s._1))
      .foreach(s => hfs.delete(s._2, true))
    val nonneg = sig.map(_._1).filter(_ >= 0)
    if (nonneg.isEmpty) return 0
    val live = nonneg.max
    val fold = sig.filter(_._1 != live)
    if (live == 0 || fold.size < 2) return 0 // nothing worth folding
    // the consolidated id derives from LIVE, which is never in the fold
    // set — so the write target is never a directory being read. A
    // pre-existing `batch=gen` is a crashed prior run's leftover: it is
    // excluded from the READ set unconditionally and healed per the
    // contract above (a prior consolidation's id always derives from an
    // older, smaller live id and folds in as a normal source).
    val gen = -live
    val genSig = new org.apache.hadoop.fs.Path(root, s"batch=$gen")
    val genStats = new org.apache.hadoop.fs.Path(statsRoot, s"batch=$gen")
    val commitMarker = new org.apache.hadoop.fs.Path(genSig, "_graft_commit")
    val foldRead = fold.filterNot(_._1 == gen)
    val foldIds = foldRead.map(_._1).toSet
    val foldStats = batchDirs(statsRoot).filter(s => foldIds.contains(s._1))
    val priorComplete = hfs.exists(commitMarker)
    if (!priorComplete) {
      val noBatch = StructType(schema.filterNot(_.name == "batch"))
      // the overwrite deletes genSig first — including any stale marker
      // from a partially-written prior attempt. Sub-partitioned sources
      // are read one root at a time and unioned: a multi-path read over
      // nested partition dirs trips partition-inference's common-base
      // check, and a basePath of the index root would re-introduce the
      // excluded `batch` column.
      val folded =
        if (partitionCols.isEmpty)
          spark.read.schema(noBatch).parquet(foldRead.map(_._2.toString): _*)
        else foldRead.map(p => spark.read.schema(noBatch).parquet(p._2.toString))
          .reduce(_ unionByName _)
      val writer = if (partitionCols.isEmpty) folded.write
        else folded.write.partitionBy(partitionCols: _*)
      writer.mode("overwrite").parquet(genSig.toString)
      // stats: re-aggregate the folded partitions into one
      if (foldStats.nonEmpty) {
        val noBatchStats = StructType(statsSchema.filterNot(_.name == "batch"))
        spark.read.schema(noBatchStats).parquet(foldStats.map(_._2.toString): _*)
          .groupBy(keyCols.map(col): _*).agg(sum(col("n")).as("n"))
          .write.mode("overwrite").parquet(genStats.toString)
      }
      // both writes durable → commit; only now may deletes begin
      hfs.create(commitMarker, true).close()
    } else {
      log.info(s"compact of $indexDir resuming after an interrupted delete " +
        s"phase: batch=$gen is complete, finishing the deletes only")
    }
    // deletes come LAST (see crash-safety contract above): signature
    // partitions first, then stats — the order the healing rules assume
    (foldRead.map(_._2) ++ foldStats.map(_._2)).foreach(p => hfs.delete(p, true))
    log.info(s"compacted ${foldRead.size} batch partition(s) of $indexDir into batch=$gen")
    foldRead.size
  }

  private def statsDir(indexDir: String): String = s"$indexDir/_stats"
}
