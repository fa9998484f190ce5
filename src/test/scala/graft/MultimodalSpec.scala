package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Batch-shape tests for the multimodal plumbing: fixed output widths,
  * pass-through for small payloads, frame-count arithmetic. */
class MultimodalSpec extends SparkSuite {

  import spark.implicits._

  test("thumbnail stub: fixed byte budget, small payloads pass through") {
    val docs = Seq((1L, "x" * 1000), (2L, "short")).toDF("doc_id", "text")
    val bin = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val out = Multimodal.thumbnailStub(spark, bin, outBytes = 64).collect()
      .map(d => d.doc_id -> d.content.length).toMap
    assert(out(1L) === 64)
    assert(out(2L) === 5)
  }

  test("json source FAILFAST rejects corrupt rows instead of nulling them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_").toFile
    dir.deleteOnExit()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"id": 1, "v": "ok"}""" + "\n" + """{"id": 2, "v": BROKEN""" + "\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    val ex = intercept[org.apache.spark.SparkException] {
      graft.sources.JsonTables.readJson(spark, dir.toString, schema).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed")
      || Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("frame sampling: ceil(n/frame) frames, every 2nd kept, sizes right") {
    val docs = Seq((1L, "a" * 700)).toDF("doc_id", "text") // 3 frames of 256
    val bin = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(bin, frameBytes = 256, every = 2)
      .select(col("frame_idx"), length(col("frame_bytes")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(frames.keySet === Set(0L, 2L)) // frame 1 sampled out
    assert(frames(0L) === 256)
    assert(frames(2L) === 700 - 512)      // short tail frame
  }
}
