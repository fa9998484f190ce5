package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.similarity.{Kmeans, Vectors}

/** Incremental SemDeDup — the streaming-ingest sibling of
  * [[graft.dedup.SemDedup]] (Abbas et al. 2303.09540): arriving batches
  * of embeddings are assigned against FROZEN trained centroids (a pure
  * map, no fit per batch — production trains the quantizer once on a
  * sample, exactly like the IVF families), then pruned within-cell
  * against a persistent per-cell vector index plus themselves.
  *
  * Semantics match the global pass exactly: a vector is dominated iff
  * ANY lower-id same-cell vector (survivor or not — the global rule's
  * domination set) has rounded cosine ≥ τ. The index therefore stores
  * EVERY ingested vector with its cell, not just survivors — a dominated
  * vector still dominates later arrivals. Under id-ascending batches the
  * union of per-batch survivor outputs is BY CONSTRUCTION the global
  * [[SemDedup.survivors]] result (pinned in SelectionSpec), so the
  * dd_semdedup oracle checks this path too.
  *
  * Scale shape: the batch×index compare joins ON CELL ONLY — both sides
  * hash-partition on `cell`, work is |batch|·cellSize, never
  * index-quadratic; the index side grows without bound but is read
  * cell-co-partitioned per batch. Commits land in `batch=<id>`
  * partitions with overwrite and the read excludes the current batch,
  * so foreachBatch retries are idempotent ([[SignatureIndex]] contract);
  * `_graft_params` pins (τ, k, centroid digest) and rejects a batch
  * assigned against different centroids — a silent centroid swap would
  * corrupt every cell.
  */
object SemDedupIncremental {

  private val indexSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cell", IntegerType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("batch", LongType, nullable = false)))

  /** Stable digest of the centroid table for the params sidecar: md5 of
    * the 6-decimal rendering (the fit's own precision), so a re-derived
    * bit-identical fit pins equal and anything else rejects. */
  private def centroidDigest(centroids: Seq[Seq[Double]]): String = {
    val s = centroids.map(_.map(x =>
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(x)))
      .mkString(",")).mkString(";")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Fold settled batch partitions into one consolidated partition —
    * the [[SignatureIndex.compact]] crash/retry contract (no stats
    * table in this index; an empty stats root is a no-op there). */
  def compactIndex(spark: SparkSession, indexDir: String): Int = {
    val statsSchema = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("batch", LongType, nullable = false)))
    SignatureIndex.compact(spark, indexDir, indexSchema, statsSchema,
      Seq("cell"))
  }

  /** Process one arriving batch of (idCol, vecCol array<double>) rows.
    * Returns the batch's survivors as (idCol, cell), the
    * [[SemDedup.survivors]] output shape. */
  def addBatch(vecs: DataFrame, centroids: Seq[Seq[Double]], tau: Double,
               indexDir: String, batchId: Long,
               idCol: String = "vec_id", vecCol: String = "c_vec"): DataFrame = {
    val spark = vecs.sparkSession
    SignatureIndex.checkParams(spark, indexDir,
      s"tau=$tau,k=${centroids.length},cent=${centroidDigest(centroids)}")

    // pure-map assignment against the frozen literal centroids; eagerly
    // checkpointed — three consumers (two domination joins + the commit)
    val batch = Kmeans.assign(
        vecs.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec")),
        centroids)
      .select(col("vec_id").as("id"), col("cell"), col("c_vec").as("v"))
      .localCheckpoint(eager = true)

    val index = SignatureIndex.read(spark, indexDir, indexSchema,
      excludeBatch = batchId)

    // domination by the indexed past: cell-co-partitioned join, rounded
    // cosine at the engine-parity scale — idx_id < id guards replays of
    // out-of-order ids (under ascending batches it is always true)
    val domIndex = batch.join(
        index.select(col("cell"), col("id").as("idx_id"), col("v").as("idx_v")),
        Seq("cell"))
      .filter(col("idx_id") < col("id"))
      .filter(round(Vectors.cosine(col("v"), col("idx_v")), 6) >= tau)
      .select(col("id"))
    // domination within the batch: the global pass's within-cell rule
    val domWithin = batch.select(col("cell"), col("id").as("__id_a"), col("v").as("__va"))
      .join(batch.select(col("cell"), col("id").as("__id_b"), col("v").as("__vb")),
        Seq("cell"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(round(Vectors.cosine(col("__va"), col("__vb")), 6) >= tau)
      .select(col("__id_b").as("id"))
    val dominated = domIndex.unionByName(domWithin).distinct()
      .localCheckpoint(eager = true)

    val surv = batch.join(dominated, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cell"))
      .localCheckpoint(eager = true) // computed BEFORE the index write

    // EVERY batch row commits — dominated vectors still dominate later
    // arrivals under the global rule; overwrite keeps retries idempotent
    batch.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    surv
  }
}
