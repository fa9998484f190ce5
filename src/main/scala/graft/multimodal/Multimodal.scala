package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode/feature-extract as
  * partition-batched transforms.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `decodeStub` produces deterministic fake features from the bytes. The
  * Spark-side plumbing — binary schema, metadata extraction, partition
  * batching, feature schema — is real and is what matters at scale: the
  * decode runs once per row inside a `mapPartitions` batch, the binary
  * column is projected only where needed (lazy column, SURVEY S6), and the
  * output is a fixed-width feature vector ready for the similarity ops.
  */
object Multimodal {

  /** Typed record for the decode pipeline. */
  case class BinaryDoc(doc_id: Long, content: Array[Byte])
  case class DecodedFeatures(doc_id: Long, n_bytes: Int, features: Array[Double])

  /** Attach an opaque binary payload column (here synthesized from text —
    * in production this is the raw image/audio bytes column). */
  def withBinaryPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), encode(col(textCol), "UTF-8").as("content"))

  /** Columnar metadata over the binary payload — stays in codegen, never
    * deserializes the blob into the JVM heap twice. */
  def binaryMetadata(bin: DataFrame): DataFrame =
    bin.select(
      col("doc_id"),
      length(col("content")).cast("long").as("n_bytes"),
      lower(hex(substring(col("content"), 1, 8))).as("magic_hex"))

  /** Frame sampling (video-style): split the payload into fixed-size
    * frames and keep every `every`-th one. The slicing itself is pure
    * Catalyst (explode over a frame-index sequence + byte substring) —
    * only the per-frame DECODE needs a codec, so at scale the sampler
    * prunes frames before any expensive decode runs, and the decode stage
    * receives (doc_id, frame_idx, frame_bytes) rows it can batch freely. */
  def sampleFrames(bin: DataFrame, frameBytes: Int, every: Int): DataFrame =
    bin.withColumn("__nf",
        ceil(length(col("content")).cast("double") / frameBytes).cast("long"))
      .filter(col("__nf") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0L), col("__nf") - 1)))
      .filter(col("frame_idx") % every === 0)
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(content, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)")
          .as("frame_bytes"))

  /** STUB thumbnail/resize: deterministic byte-level downsample to a fixed
    * `outBytes` budget (every k-th byte). A real implementation decodes
    * and resamples pixels here; the shape — map, fixed-width output,
    * binary in/binary out — is the production shape. */
  def thumbnailStub(spark: SparkSession, bin: DataFrame, outBytes: Int): Dataset[BinaryDoc] = {
    import spark.implicits._
    bin.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        val n = d.content.length
        val out =
          if (n <= outBytes) d.content
          else Array.tabulate(outBytes)(i => d.content(i * n / outBytes))
        BinaryDoc(d.doc_id, out)
      }
    }
  }

  /** STUB decode: deterministic fake "feature extraction" — 8 block sums
    * over the payload bytes. Real implementation would decode the image /
    * resample the audio here; the batching shape (one iterator pass per
    * partition, fixed-width output) is the production shape. */
  def decodeStub(spark: SparkSession, bin: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    bin.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        val feats = new Array[Double](8)
        var i = 0
        while (i < d.content.length) {
          feats(i % 8) += (d.content(i) & 0xff).toDouble
          i += 1
        }
        DecodedFeatures(d.doc_id, d.content.length, feats)
      }
    }
  }
}
