package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sketch.Sketches

/** st9: the streaming register aggregation must converge to the BATCH
  * sketch exactly — MAX registers are order- and batching-independent,
  * which is the property that lets an approximate streaming query carry
  * a full hash oracle. */
class StreamingHllSpec extends SparkSuite {

  test("streaming HLL registers ≡ batch registers, and state is sketch-bounded") {
    val streamed = EventStreams.streamingHllRegisters(spark, sfDir,
      s"hlltest_${System.nanoTime()}", col("event_id"))
    val batch = Sketches.hllRegisters(
      graft.Tables.load(spark, sfDir, "events"), Seq("event_type"), col("event_id"))

    val s = streamed.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val b = batch.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(s == b, "converged streaming registers must equal the batch sketch")

    // sketch-bounded state: at most 256 registers per event type
    val perType = streamed.groupBy("event_type").count().collect()
    perType.foreach(r => assert(r.getLong(1) <= Sketches.HllM))
  }

  test("streaming CMS counters ≡ batch counters, and state is sketch-bounded") {
    val streamed = EventStreams.streamingCmsCounters(spark, sfDir,
      s"cmstest_${System.nanoTime()}", col("user_id"))
    val batch = Sketches.cmsCounters(
      graft.Tables.load(spark, sfDir, "events").select(col("user_id")),
      col("user_id"))

    val s = streamed.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val b = batch.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(s == b, "converged streaming counters must equal the batch sketch")
    assert(streamed.count() <= Sketches.CmsD.toLong * Sketches.CmsM)
  }

  test("streaming quantile sample ≡ batch bottom-k sample, state sketch-bounded") {
    val streamed = EventStreams.streamingQuantileSample(spark, sfDir,
      s"sqtest_${System.nanoTime()}", "event_type",
      md5(col("event_id").cast("string")), col("value"))
    val batch = Sketches.bottomKSample(
      graft.Tables.load(spark, sfDir, "events"), Seq("event_type"),
      md5(col("event_id").cast("string")), col("value"))
    val s = streamed.select("event_type", "vs")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val b = batch.select("event_type", "vs")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(s == b, "converged streaming sample must equal the batch sketch")
    streamed.select("sample_k").collect()
      .foreach(r => assert(r.getLong(0) <= Sketches.QuantK))
  }
}
