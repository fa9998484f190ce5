package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup
import graft.functions.SrpBands

/** Incremental embedding near-dup dedup against a persistent vector
  * index — the embedding-space sibling of
  * [[graft.dedup.IncrementalDedup]]: an arriving batch of vectors is
  * compared against the indexed survivors by SRP band collision + exact
  * cosine verify (first-wins), the remainder dedups against itself
  * through [[Vectors.cosinePairsLsh]], and the batch's survivors append
  * their vectors + band signatures to the index.
  *
  * The index stores (id, v array<double>, bands array<long>) — the
  * vectors themselves are needed for the exact-cosine verify, the same
  * storage contract as any production vector index. Index writes land in
  * a `batch=<id>` partition with overwrite and the read excludes the
  * current batchId, so foreachBatch retries are idempotent. Bands whose
  * index frequency exceeds `bandCap` are stop-listed (logged) to bound
  * the batch×index join. A `_graft_params` sidecar pins (bits, bands)
  * and rejects mismatched batches.
  */
object IncrementalVectors {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val indexSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("bands", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("batch", LongType, nullable = false)))

  private def checkParams(spark: SparkSession, indexDir: String,
                          bits: Int, bands: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir, "_graft_params")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = s"bits=$bits,bands=$bands"
    if (hfs.exists(p)) {
      val in = hfs.open(p)
      val got = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      require(got == want,
        s"vector index at $indexDir was built with [$got]; this batch uses [$want]")
    } else {
      hfs.mkdirs(new org.apache.hadoop.fs.Path(indexDir))
      val out = hfs.create(p, true)
      try out.write(want.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Process one arriving batch of (id, vector) rows against the index.
    * Returns the batch's surviving rows (all original columns). */
  def addBatch(vecs: DataFrame, idCol: String, vecCol: String, indexDir: String,
               batchId: Long, bits: Int, minCosine: Double,
               bands: Int = 4, bucketCap: Int = 1024,
               bandCap: Int = 4096): DataFrame = {
    val spark = vecs.sparkSession
    checkParams(spark, indexDir, bits, bands)

    // one codegen'd SrpBands pass; vectors ride as double[] (exact float
    // widening) so the stored form verifies identically
    val sigs = vecs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bands", SrpBands(col("v"), bits, bands, seed = 42L))
      .localCheckpoint(eager = true)

    val index = spark.read.schema(indexSchema).parquet(indexDir)
      .filter(col("batch") =!= batchId)
      .select(col("id"), col("v"), col("bands"))

    val bandFreq = index.select(explode(col("bands")).as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n"))
    val hotBands = bandFreq.filter(col("n") > bandCap).localCheckpoint(eager = true)
    val nHot = hotBands.count()
    if (nHot > 0)
      log.warn(s"incremental vector dedup: stop-listing $nHot band value(s) with " +
        s"index frequency > $bandCap")

    val batchBands = sigs.select(col("id"), explode(col("bands")).as("band"))
      .join(hotBands.select(col("band")), Seq("band"), "left_anti")
    val indexBands = index.select(col("id").as("idx_id"), explode(col("bands")).as("band"))
      .join(hotBands.select(col("band")), Seq("band"), "left_anti")
    val dropped = batchBands.join(indexBands, "band")
      .select(col("id"), col("idx_id")).distinct()
      .join(sigs.select(col("id"), col("v")), "id")
      .join(index.select(col("id").as("idx_id"), col("v").as("idx_v")), "idx_id")
      .filter(Vectors.cosine(col("v"), col("idx_v")) >= minCosine)
      .select(col("id")).distinct()

    val remaining = vecs.join(dropped.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
    // REUSE the checkpointed signatures for within-batch pairing
    val remainingSigs = sigs.join(dropped, Seq("id"), "left_anti")
    val pairs = Vectors.cosinePairsFromBands(remainingSigs, minCosine, bucketCap)
      .select(col("id_a"), col("id_b"))
    val surv = Dedup.survivors(remaining, idCol, pairs)
      .localCheckpoint(eager = true) // computed BEFORE the index write below

    sigs.join(surv.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .select(col("id"), col("v"), col("bands"))
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")

    surv
  }
}
