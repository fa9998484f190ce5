package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.IncrementalDedup
import graft.similarity.IncrementalVectors

/** Compaction of the batch-partitioned signature indexes: results must
  * be invariant under compaction, directory count must actually drop,
  * and the latest batch must stay retryable afterwards. */
class IndexCompactionSpec extends SparkSuite {
  import spark.implicits._

  /** Same 40 texts under shifted ids — later batches fully duplicate the
    * first, so every cross-batch index hit is a planted expectation. */
  private def docsBatch(idOffset: Long): DataFrame =
    (0 until 40).map(i =>
      (idOffset + i, s"alpha document number $i with shared boilerplate text"))
      .toDF("doc_id", "text")

  private def addDoc(indexDir: String, batchId: Long, idOffset: Long): Set[Long] =
    IncrementalDedup.addBatch(docsBatch(idOffset), "doc_id", "text", indexDir,
        batchId, shingleN = 2, k = 16, bands = 8, minJaccard = 0.9)
      .select("doc_id").as[Long].collect().toSet

  private def batchDirs(dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(p)) Set.empty
    else hfs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSet
  }

  test("text index: compaction folds settled partitions, results invariant") {
    val plain = Files.createTempDirectory("idxplain").toString + "/index"
    val compacted = Files.createTempDirectory("idxcomp").toString + "/index"
    // identical three-batch history on both indexes
    val a = Seq(1L, 2L, 3L).map(b => addDoc(plain, b, (b - 1) * 100))
    val b0 = Seq(1L, 2L, 3L).map(b => addDoc(compacted, b, (b - 1) * 100))
    assert(a === b0)
    assert(a(0).size === 40 && a(1).isEmpty && a(2).isEmpty,
      "batches 2-3 fully duplicate batch 1 and must drop against the index")

    // fold batches 1-2 (settled) into batch=-3; live batch 3 untouched
    assert(IncrementalDedup.compactIndex(spark, compacted) === 2)
    assert(batchDirs(compacted) === Set("batch=-3", "batch=3"))
    assert(batchDirs(compacted + "/_stats") === Set("batch=-3", "batch=3"))
    assert(IncrementalDedup.compactIndex(spark, compacted) === 0, "no-op when compact")

    // batch 4 sees identical state through both layouts
    val s4p = addDoc(plain, 4L, 300)
    val s4c = addDoc(compacted, 4L, 300)
    assert(s4p === s4c)
    assert(s4c.isEmpty, "batch 4 duplicates batch 1 — all dropped")

    // compaction after batch 4 folds {-3, 3} into batch=-4, and the live
    // batch stays retryable: re-running batchId 4 is idempotent
    assert(IncrementalDedup.compactIndex(spark, compacted) === 2)
    assert(batchDirs(compacted) === Set("batch=-4", "batch=4"))
    val retry = addDoc(compacted, 4L, 300)
    assert(retry === s4c)
    assert(batchDirs(compacted) === Set("batch=-4", "batch=4"))
  }

  test("foreachBatch stream with mid-stream compaction converges to the batch answer") {
    import org.apache.spark.sql.streaming.Trigger
    // three files arriving as three micro-batches; the index is compacted
    // INSIDE foreachBatch after every commit — the operational cadence a
    // daily pipeline would run — and the final survivor set must still
    // equal the one-shot batch pass
    val tmp = Files.createTempDirectory("stream-compact").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val family = (0 until 15).map(i => (i.toLong, s"$base uniq${i % 5}"))
    val all = family ++ family.map { case (id, t) => (id + 500L, t) } ++
      family.map { case (id, t) => (id + 900L, t) }
    val docs = all.toDF("doc_id", "text")
    Seq(0L -> 500L, 500L -> 900L, 900L -> 2000L).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .coalesce(1).write.parquet(s"$tmp/in/b$i")
        new java.io.File(s"$tmp/in/b$i").listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val survived = scala.collection.mutable.Set.empty[Long]
    val q = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val s = IncrementalDedup.addBatch(batch, "doc_id", "text",
          s"$tmp/index", batchId, shingleN = 2, k = 16, bands = 8, minJaccard = 0.8)
        survived.synchronized { survived ++= s.collect().map(_.getLong(0)) }
        IncrementalDedup.compactIndex(spark, s"$tmp/index")
        ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000L)
    q.stop()
    val batchSurv = graft.dedup.Dedup.survivors(docs, "doc_id",
        graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text",
          shingleN = 2, k = 16, bands = 8, minJaccard = 0.8))
      .collect().map(_.getLong(0)).toSet
    assert(survived.toSet === batchSurv,
      s"streaming-compacted ${survived.toSet} != batch $batchSurv")
  }

  test("compact rerun heals a crash at either phase (idempotent, never wedged)") {
    val hconf = spark.sparkContext.hadoopConfiguration
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    val hfs = path("/").getFileSystem(hconf)

    // replay compact's WRITE phase without its delete phase — the exact
    // on-disk state a crash between the two leaves behind. Classification
    // rides on compact's OWN _graft_commit marker (deliberately not
    // _SUCCESS, which marksuccessfuljobs=false deployments don't write):
    // committed = crash was mid-delete; uncommitted = crash was mid-write.
    def simulateCrashedWrite(index: String, committed: Boolean): Unit = {
      val fold = Seq(s"$index/batch=1", s"$index/batch=2")
      spark.read.parquet(fold: _*)
        .write.mode("overwrite").parquet(s"$index/batch=-3")
      spark.read.parquet(fold.map(_.replace("/batch=", "/_stats/batch=")): _*)
        .groupBy(col("band")).agg(sum(col("n")).as("n"))
        .write.mode("overwrite").parquet(s"$index/_stats/batch=-3")
      if (committed) hfs.create(path(s"$index/batch=-3/_graft_commit"), true).close()
    }

    for (committed <- Seq(true, false)) {
      val index = Files.createTempDirectory("idxcrash").toString + "/index"
      Seq(1L, 2L, 3L).foreach(b => addDoc(index, b, (b - 1) * 100))
      simulateCrashedWrite(index, committed)
      // the rerun must converge instead of throwing (the old contract
      // wedged here: batch=-3 landed in its own fold set)
      assert(IncrementalDedup.compactIndex(spark, index) === 2)
      assert(batchDirs(index) === Set("batch=-3", "batch=3"))
      assert(batchDirs(index + "/_stats") === Set("batch=-3", "batch=3"))
      // and the healed index still answers like the uncompacted one
      assert(addDoc(index, 4L, 300).isEmpty,
        "batch 4 duplicates batch 1 — all dropped through the healed index")
    }

    // crash INSIDE the delete phase: signature partitions gone, stats
    // residue left behind — the rerun sweeps it and no-ops
    val index = Files.createTempDirectory("idxcrash2").toString + "/index"
    Seq(1L, 2L, 3L).foreach(b => addDoc(index, b, (b - 1) * 100))
    simulateCrashedWrite(index, committed = true)
    Seq(1, 2).foreach(b => hfs.delete(path(s"$index/batch=$b"), true))
    assert(IncrementalDedup.compactIndex(spark, index) === 0)
    assert(batchDirs(index) === Set("batch=-3", "batch=3"))
    assert(batchDirs(index + "/_stats") === Set("batch=-3", "batch=3"),
      "orphaned stats partitions swept")
    assert(addDoc(index, 4L, 300).isEmpty)
  }

  test("vector index: compaction folds partitions, later batches still match") {
    val dir = Files.createTempDirectory("idxvec").toString + "/index"
    def vecs(ids: Range): DataFrame =
      ids.map(i => (i.toLong, Seq.tabulate(8)(d => math.sin(i % 7 + d).toFloat)))
        .toDF("vec_id", "v")
    def add(batchId: Long, ids: Range): Set[Long] =
      IncrementalVectors.addBatch(vecs(ids), "vec_id", "v", dir, batchId,
          bits = 8, minCosine = 0.999)
        .select("vec_id").as[Long].collect().toSet
    val s1 = add(1L, 0 until 30)
    val s2 = add(2L, 100 until 130)
    val s3 = add(3L, 200 until 230)
    assert(s1.size === 7, "one survivor per distinct vector family (id mod 7)")
    assert(s2.isEmpty && s3.isEmpty, "later batches fully duplicate the families")

    assert(IncrementalVectors.compactIndex(spark, dir) === 2)
    assert(batchDirs(dir) === Set("batch=-3", "batch=3"))
    // the consolidated index must serve batch 4 exactly like the original
    assert(add(4L, 300 until 330).isEmpty)
  }
}
