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
