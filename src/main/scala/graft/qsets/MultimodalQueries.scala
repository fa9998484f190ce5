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
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lower(hex(encode(substring(text, 1, 8)))) AS magic_hex
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
