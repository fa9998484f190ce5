package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.Hashing


/** Deduplication queries over `documents`. The doubled batch (each doc
  * unioned with a shifted-id copy) plants exact duplicates so every dedup
  * path has guaranteed positives to find.
  *
  * `dd_exact` and `dd_ngram_jaccard` are oracle-checked; `dd_minhash` and
  * `dd_simhash` use engine-specific 64-bit hashes (xxhash64 / FNV simhash)
  * that no SQL oracle reproduces → rows-only checks, with the exact-Jaccard
  * query as their semantic cross-check. */
object DedupQueries extends QuerySet {

  private val COPY_OFFSET = 1000000L

  private def doubled(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.union(d.withColumn("doc_id", col("doc_id") + COPY_OFFSET))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: first-id-wins per content hash over the doubled batch.
    "dd_exact" -> ((s, dir) => {
      Dedup.exactDedup(doubled(s, dir), "doc_id", Seq(col("text")))
        .select(col("doc_id"), col("content_hash"))
        .orderBy(col("doc_id"))
    }),

    // Exact token-set Jaccard, top-100 most-similar pairs (bounded subset).
    "dd_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
      Dedup.tokenJaccardPairs(docs, "doc_id", "text")
        .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
        .limit(100)
    }),

    // MinHash+LSH near-dup candidates with exact-Jaccard verification.
    // No SQL oracle (xxhash64-based) — planted duplicates guarantee that
    // every doc pairs with its copy at jaccard=1.0.
    "dd_minhash" -> ((s, dir) => {
      Dedup.minhashPairs(doubled(s, dir), "doc_id", "text",
          shingleN = 2, k = 16, bands = 8, minJaccard = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Near-dup clusters + survivors: pairs → connected components → one
    // representative per cluster. Planted copies mean every original doc
    // survives and every +1000000 copy is dropped, plus any natural
    // near-dup merges. Rows-only (inherits minhash's engine hashes).
    "dd_survivors" -> ((s, dir) => {
      val docs = doubled(s, dir)
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleN = 2, k = 16, bands = 8, minJaccard = 0.9)
      Dedup.survivors(docs, "doc_id", pairs)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // Incremental (daily-ingest) near-dup dedup: originals arrive as batch
    // one, their exact copies as batch two; every copy matches the
    // survivor index at jaccard 1.0 (or its family's indexed rep, since
    // planted families are dense), so the final survivor set coincides
    // with dd_survivors' global batch pass here — the general contract is
    // first-wins with no cross-batch transitive closure (see
    // IncrementalDedup scaladoc; unit-proven in ScaleGuardSpec).
    // Rows-only (engine hashes); the index holds signatures, never
    // documents.
    "dd_incremental" -> ((s, dir) => {
      import graft.dedup.IncrementalDedup
      // deterministic per-sf path, cleaned before each run (no /tmp leak)
      val idx = "/tmp/graft_export/incdedup_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "/index"
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = doubled(s, dir)
      val s1 = IncrementalDedup.addBatch(docs.filter(col("doc_id") < COPY_OFFSET),
        "doc_id", "text", idx, batchId = 1L,
        shingleN = 2, k = 16, bands = 8, minJaccard = 0.9)
      val s2 = IncrementalDedup.addBatch(docs.filter(col("doc_id") >= COPY_OFFSET),
        "doc_id", "text", idx, batchId = 2L,
        shingleN = 2, k = 16, bands = 8, minJaccard = 0.9)
      s1.select(col("doc_id")).unionByName(s2.select(col("doc_id")))
        .orderBy(col("doc_id"))
    }),

    // Connected-components + survivors anchored to a SQL oracle: exact-dup
    // pairs (same md5) are oracle-expressible, so feeding them through the
    // SAME min-label-propagation components() and survivors() code path
    // the minhash pipeline uses gives the clustering machinery a
    // hash-checked row — the rows-only dd_survivors then only adds the
    // engine-specific candidate generation on top.
    "dd_survivors_exact" -> ((s, dir) => {
      val docs = doubled(s, dir)
      val hashed = docs.withColumn("content_hash", Hashing.md5Hash(col("text")))
      val grouped = hashed.groupBy(col("content_hash"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      val pairs = grouped.filter(size(col("ids")) > 1)
        .select(explode(col("ids")).as("id_a"), col("ids"))
        .select(col("id_a"), explode(col("ids")).as("id_b"))
        .filter(col("id_a") < col("id_b"))
      Dedup.survivors(docs, "doc_id", pairs)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // SimHash near-dup: native simhash64 expression, 16-bit banding with
    // exact-dup collapse + bucket-collect (see Dedup.simhashPairs).
    // No SQL oracle (FNV/simhash is engine-specific).
    "dd_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(doubled(s, dir), "doc_id", "text",
          bands = 4, maxHamming = 4L)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "dd_exact" ->
      """WITH batch AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents)
        |SELECT doc_id, md5(text) AS content_hash
        |FROM batch
        |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin,

    "dd_survivors_exact" ->
      """WITH batch AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents)
        |SELECT doc_id
        |FROM batch
        |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin,

    "dd_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks
        |  FROM documents WHERE doc_id < 300),
        |ex AS (SELECT id, unnest(toks) AS tok FROM toks),
        |sizes AS (SELECT id, len(toks) AS n FROM toks),
        |inter AS (
        |  SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_inter
        |  FROM ex x JOIN ex y ON x.tok = y.tok AND x.id < y.id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.id = id_a
        |JOIN sizes sb ON sb.id = id_b
        |ORDER BY jaccard DESC, id_a, id_b
        |LIMIT 100""".stripMargin
  )
}
