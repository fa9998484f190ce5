package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payload metadata (oracle-checked) and
  * the stubbed decode/feature-extract pipeline (rows-only — the decode stub
  * is engine-specific by design). */
object MultimodalQueries extends QuerySet {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Columnar metadata over opaque binary payloads.
    "mm_binary_meta" -> ((s, dir) => {
      Multimodal.binaryMetadata(
          Multimodal.withBinaryPayload(t(s, dir, "documents"), "doc_id", "text"))
        .orderBy(col("doc_id"))
    }),

    // Frame sampling: fixed-size byte frames, every 2nd kept. The slicing
    // is columnar, so sampling prunes frames BEFORE any decode stage.
    "mm_frame_sample" -> ((s, dir) => {
      val bin = Multimodal.withBinaryPayload(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
      Multimodal.sampleFrames(bin, frameBytes = 256, every = 2)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame_bytes")).cast("long").as("frame_len"),
          lower(hex(substring(col("frame_bytes"), 1, 8))).as("frame_magic"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Stubbed decode → fixed-width feature vector via partition-batched
    // typed transform (the production plumbing shape, fake features).
    "mm_decode_stub" -> ((s, dir) => {
      val bin = Multimodal.withBinaryPayload(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
      Multimodal.decodeStub(s, bin).toDF()
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          element_at(col("features"), 1).as("f0"),
          element_at(col("features"), 2).as("f1"),
          element_at(col("features"), 3).as("f2"),
          element_at(col("features"), 4).as("f3"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // DuckDB cannot slice BLOBs, but the builder's documents are ASCII
    // (octet_length == length for every row), so char slicing on the text
    // then encode() reproduces the byte slicing exactly.
    "mm_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, text, length(text) AS n
        |  FROM documents WHERE doc_id < 100),
        |idx AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS frame_idx
        |  FROM b)
        |SELECT doc_id, frame_idx,
        |  CAST(octet_length(encode(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256))) AS BIGINT) AS frame_len,
        |  lower(hex(encode(substring(text, CAST(frame_idx * 256 + 1 AS INT), 8)))) AS frame_magic
        |FROM idx
        |WHERE frame_idx % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lower(hex(encode(substring(text, 1, 8)))) AS magic_hex
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // The stub's "features" are 8 interleaved byte-block sums — pure
    // arithmetic over the payload, so (ASCII corpus: ord == byte) the
    // oracle reproduces them exactly and the partition-batched typed
    // transform gets a hash-checked row, not just a rows-only count.
    "mm_decode_stub" ->
      """WITH b AS (
        |  SELECT doc_id, text, strlen(text) AS n
        |  FROM documents WHERE doc_id < 100),
        |pos AS (
        |  SELECT doc_id, (i - 1) % 8 AS j,
        |    ord(substr(text, CAST(i AS INT), 1)) AS bv
        |  FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS i FROM b)),
        |f AS (
        |  SELECT b.doc_id, b.n,
        |    CAST(COALESCE(SUM(CASE WHEN j = 0 THEN bv END), 0) AS DOUBLE) AS f0,
        |    CAST(COALESCE(SUM(CASE WHEN j = 1 THEN bv END), 0) AS DOUBLE) AS f1,
        |    CAST(COALESCE(SUM(CASE WHEN j = 2 THEN bv END), 0) AS DOUBLE) AS f2,
        |    CAST(COALESCE(SUM(CASE WHEN j = 3 THEN bv END), 0) AS DOUBLE) AS f3
        |  FROM b LEFT JOIN pos ON pos.doc_id = b.doc_id
        |  GROUP BY b.doc_id, b.n)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, f0, f1, f2, f3
        |FROM f
        |ORDER BY doc_id""".stripMargin
  )
}
