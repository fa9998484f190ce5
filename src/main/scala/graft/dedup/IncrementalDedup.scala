package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{HashedShingles, MinHashBands, TokenCount}

/** Incremental near-dup dedup against a persistent survivor index — the
  * daily-ingest shape of a training-data pipeline: yesterday's corpus is
  * already deduplicated and indexed; today's batch must only be compared
  * against the index plus itself, never re-pairing the historical corpus.
  *
  * The index is a parquet table of surviving documents' shingle-hash sets
  * and LSH band hashes (id, sh array<long>, bands array<long>) — ~tens of
  * bytes per doc, NOT the documents — laid out one partition directory
  * per batch (`batch=<id>`). Per batch:
  *
  *  1. batch docs → hashed shingles + bands (ONE native pass, reused by
  *     the index join, the within-batch pairing, and the index append);
  *  2. batch×index candidates by band join (ids only; batch-side exact
  *     duplicates collapse to one representative first), verified by
  *     exact set-Jaccard on the stored shingle hashes — batch docs
  *     matching an indexed survivor are dropped (FIRST-WINS, like the
  *     reference's insert dedup J9: what's already in wins);
  *  3. remaining batch docs near-dup-dedup against each other through the
  *     same pairing/clustering path as the batch form
  *     ([[Dedup.minhashPairsFromShingles]] + [[Dedup.survivors]],
  *     min-id per component);
  *  4. the batch's survivors overwrite their own `batch=<id>` partition
  *     of the index — so a Structured-Streaming retry of the same
  *     batchId is idempotent: the index read excludes the current
  *     batchId's partition, and the write replaces it.
  *
  * Hot-band guard: bands whose INDEX frequency exceeds `bandCap` are
  * stop-listed out of candidate generation (logged) — a band shared by
  * ~everything is non-informative and would otherwise explode the
  * batch×index join quadratically; the doc's other bands still probe
  * (multi-band redundancy), which is the standard recall trade.
  *
  * Equivalence contract (unit-proven): feeding a corpus in id-ascending
  * batches yields the same final survivor set as one global batch pass
  * when near-dup components are DENSE (every member links to the
  * surviving representative — true at thresholds ≥0.8 for
  * boilerplate-style duplication). Like every greedy incremental dedup,
  * cross-batch TRANSITIVE closure is not re-evaluated: a doc linking
  * only to an already-dropped doc (not to its surviving representative)
  * survives.
  *
  * Streaming: drive `addBatch` from `foreachBatch(batchDf, batchId)` —
  * the partition overwrite is the per-batch state commit. Docs shorter
  * than `shingleN` tokens have no shingles, can match nothing, and pass
  * through unindexed. The index records its (shingleN, k, bands)
  * parameters in a `_graft_params` sidecar and refuses a mismatched
  * batch — signatures from different parameters silently match nothing.
  */
object IncrementalDedup {


  private val indexSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sh", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("bands", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("batch", LongType, nullable = false)))

  /** Fold all settled batch partitions (everything below the live batch)
    * into one consolidated partition — run periodically so N daily
    * batches cost one directory, not N (the small-files problem).
    * Retry- and crash-safety contract in [[SignatureIndex.compact]].
    * Returns the number of partitions folded. */
  def compactIndex(spark: SparkSession, indexDir: String): Int = {
    val statsSchema = StructType(Seq(
      StructField("band", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("batch", LongType, nullable = false)))
    SignatureIndex.compact(spark, indexDir, indexSchema, statsSchema, Seq("band"))
  }

  /** Process one arriving batch of (id, text) docs against the survivor
    * index at `indexDir` (created on first call). Returns the batch's
    * surviving docs (all original columns). `batchId` must be unique per
    * logical batch and stable across retries (foreachBatch's batchId). */
  def addBatch(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
               batchId: Long,
               shingleN: Int = 3, k: Int = 16, bands: Int = 4,
               minJaccard: Double = 0.8, bucketCap: Int = 1024,
               bandCap: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    SignatureIndex.checkParams(spark, indexDir,
      s"shingleN=$shingleN,k=$k,bands=$bands")

    // ONE native signature pass per batch; short docs survive
    // unconditionally and are never indexed. chash is the canonical
    // 128-bit content key (sh is sorted-distinct, so same set ⇒ same key).
    val sigs = docs
      .filter(TokenCount(col(textCol)) >= shingleN)
      .select(col(idCol).as("id"),
        HashedShingles(col(textCol), shingleN).as("sh"))
      .withColumn("bands", MinHashBands(col("sh"), k, bands))
      .withColumn("chash", struct(xxhash64(col("sh")), xxhash64(lit(1L), col("sh"))))
      .localCheckpoint(eager = true)

    // fresh-index fast path (the BucketedIncrementalDedup r17
    // precedent): a first batch probes a provably-empty index — every
    // read excludes this batch's own partition and nothing else exists —
    // so skip the stop-list checkpoint+count, the reps persist and the
    // candidate/verify joins entirely (~a third of the batch's scheduler
    // round-trips). A batch-1 RETRY sees only its own partition, which
    // the reads exclude, so the skip stays correct under retries.
    // empty frame derived FROM sigs (not a hardcoded LongType struct) so
    // the anti-joins below cannot silently type-mismatch if the id
    // contract ever widens (r18 ADVICE); limit(0) is plan-only, no job
    val dropped = if (!SignatureIndex.hasOtherBatches(spark, indexDir, batchId))
      sigs.select(col("id")).limit(0)
    else probeIndex(spark, sigs, indexDir, batchId, bandCap, minJaccard)

    // remaining batch docs dedup against each other, REUSING the
    // checkpointed signatures (no second hashing pass over the text) AND
    // the precomputed bands (pure function of sh — the pair pipeline
    // skips its per-distinct-content banding pass)
    val remaining = docs.join(dropped.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
    val remainingSh = sigs.join(dropped, Seq("id"), "left_anti")
      .select(col("id"), col("sh"), col("bands"))
    val pairs = Dedup.minhashPairsFromShingles(remainingSh,
      k, bands, minJaccard, bucketCap)
    val surv = Dedup.survivors(remaining, idCol, pairs)
      .localCheckpoint(eager = true) // computed BEFORE the index write below

    // idempotent commit: this batch's survivors replace their own
    // partition, and their per-band counts land in the stats subtree so
    // future stop-lists never rescan the index. `committed` is a cheap
    // semi-join of two CACHED frames — each write recomputes it rather
    // than paying an extra materialization round-trip.
    val committed = sigs
      .join(surv.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .select(col("id"), col("sh"), col("bands"))
    committed.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    SignatureIndex.writeStats(
      committed.select(explode(col("bands")).as("band")),
      indexDir, Seq("band"), batchId)

    surv
  }

  /** The index probe of one batch: which batch ids near-match an indexed
    * survivor (eagerly checkpointed bare-id frame — two downstream
    * consumers read it). Structure unchanged from the inline form it was
    * extracted from; see the comments inside. */
  private def probeIndex(spark: SparkSession, sigs: DataFrame,
                         indexDir: String, batchId: Long, bandCap: Int,
                         minJaccard: Double): DataFrame = {
    val index = SignatureIndex.read(spark, indexDir, indexSchema,
      excludeBatch = batchId)

    // stop-list non-informative hot bands from the incremental stats
    // subtree (never a full per-batch scan of the index signatures);
    // MinHashBands salts each band hash with its position, so the raw
    // value IS position-qualified here
    val statsSchema = StructType(Seq(
      StructField("band", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("batch", LongType, nullable = false)))
    val hotBands = SignatureIndex.stopList(spark, indexDir, statsSchema,
      Seq("band"), excludeBatch = batchId, bandCap, "incremental dedup")

    // batch×index candidates: ONE representative per distinct batch
    // content (exact dups share the verdict), ids only through the join.
    // Persisted: the `dropped` plan references this aggregate three ways
    // (banding, verify, verdict expansion) and exchange reuse does not
    // cover all of them. Unpersisted right after `dropped` materializes:
    // the session CacheManager holds a STRONG reference to a persisted
    // plan (the ContextCleaner never reclaims it on its own), so skipping
    // the unpersist leaks one cache entry per foreachBatch call on a
    // long-running stream. Blocking unpersist AFTER the eager checkpoint
    // returns cannot race anything — every consumer of `reps` sits under
    // that one completed action.
    val reps = sigs.groupBy(col("chash"))
      .agg(min(col("id")).as("rep"), first(col("sh")).as("sh"),
        first(col("bands")).as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val repBands = reps.select(col("rep"), explode(col("bands")).as("band"))
      .join(hotBands.select(col("band")), Seq("band"), "left_anti")
    val indexBands = index.select(col("id").as("idx_id"), explode(col("bands")).as("band"))
      .join(hotBands.select(col("band")), Seq("band"), "left_anti")
    val cand = repBands.join(indexBands, "band")
      .select(col("rep"), col("idx_id")).distinct()
    val droppedReps = cand
      .join(reps.select(col("rep"), col("sh")), "rep")
      .join(index.select(col("id").as("idx_id"), col("sh").as("idx_sh")), "idx_id")
      .withColumn("n_inter", graft.functions.SortedIntersectCount(col("sh"), col("idx_sh")))
      .withColumn("j", col("n_inter").cast("double") /
        (size(col("sh")) + size(col("idx_sh")) - col("n_inter")))
      .filter(col("j") >= minJaccard)
      .select(col("rep")).distinct()
    // expand the rep verdict to every exact copy in the batch. Eagerly
    // checkpointed: `dropped` has two consumers (the doc anti-join and the
    // signature anti-join in addBatch), and its subtree is the whole
    // batch×index band join + Jaccard verify — without materialization
    // that subtree evaluates twice per batch (the multi-consumer lesson
    // this codebase keeps re-learning). The rows are bare ids: checkpoint
    // cost ~nil. finally: a failed checkpoint (transient task loss on a
    // stream) must still release the cache entry, or every foreachBatch
    // retry attempt leaks one — the crash-loop variant of the leak fixed
    // here
    try sigs
      .join(reps.join(droppedReps, "rep").select(col("chash")), Seq("chash"), "left_semi")
      .select(col("id"))
      .localCheckpoint(eager = true)
    finally reps.unpersist(blocking = true)
  }
}
