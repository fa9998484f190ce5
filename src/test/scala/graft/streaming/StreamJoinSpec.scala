package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.{SparkSuite, Tables}

/** Stream-stream interval join: the watermarked streaming join must
  * converge to exactly the batch interval join — same pairs, no
  * duplicates, no drops — under AvailableNow. */
class StreamJoinSpec extends SparkSuite {
  import spark.implicits._

  test("stream-stream interval join ≡ batch interval join, exactly") {
    val out = java.nio.file.Files.createTempDirectory("stj").toString
    val streamed = EventStreams.runToDir(
        EventStreams.streamStreamMatches(spark, sfDir, "click", "purchase", 3600L),
        out, OutputMode.Append)
      .select("user_id", "a_id", "b_id").as[(Long, Long, Long)]
      .collect().sorted.toSeq

    val ev = Tables.load(spark, sfDir, "events")
    val a = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("a_ts"), col("event_id").as("a_id"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("b_id"))
    val batch = a.join(b,
        col("user_id") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 3600 SECONDS"))
      .select("user_id", "a_id", "b_id").as[(Long, Long, Long)]
      .collect().sorted.toSeq

    assert(batch.nonEmpty, "fixture should produce at least one attribution pair")
    assert(streamed == batch)
  }

  test("runToDir rejects a streamed schema that shadows the batch partition column") {
    val out = java.nio.file.Files.createTempDirectory("stj-guard").toString
    val in = java.nio.file.Files.createTempDirectory("stj-guard-in").toString
    spark.range(4).withColumn("__graft_batch", col("id"))
      .write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema("id LONG, __graft_batch LONG").parquet(in)
    val e = intercept[IllegalArgumentException] {
      EventStreams.runToDir(stream, out, OutputMode.Append)
    }
    assert(e.getMessage.contains("__graft_batch"))
  }

  test("runToDirPerBatch: per-batch stream-static join + agg ≡ batch result") {
    // documents stream through a per-batch transform that joins a static
    // gram set and aggregates per doc — the st15 shape. Row-local per
    // document, so stream must equal batch exactly.
    val docs = Tables.load(spark, sfDir, "documents")
    val bench = docs.filter(col("doc_id") % 7 === 0)
    def flag(corpus: org.apache.spark.sql.DataFrame) =
      graft.dedup.Decontaminate.flagContaminated(
        corpus.filter(col("doc_id") % 7 =!= 0), bench, "doc_id", "text", n = 3)
    val out = java.nio.file.Files.createTempDirectory("pbj").toString
    val streamed = EventStreams.runToDirPerBatch(
        EventStreams.readTableStream(spark, sfDir, "documents"),
        out, OutputMode.Append)(flag)
      .as[(Long, Long)].collect().sorted.toSeq
    val batch = flag(docs).as[(Long, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty, "fixture should flag at least one doc")
    assert(streamed == batch)
  }

  test("runToDirPerBatch guards the partition column on the TRANSFORMED schema") {
    val in = java.nio.file.Files.createTempDirectory("pbj-guard-in").toString
    spark.range(4).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema("id LONG").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("pbj-guard").toString
    val e = intercept[IllegalArgumentException] {
      EventStreams.runToDirPerBatch(stream, out, OutputMode.Append)(
        _.withColumn("__graft_batch", col("id")))
    }
    assert(e.getMessage.contains("__graft_batch"))
  }
}
