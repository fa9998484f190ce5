package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read parquet directly so
  * Catalyst sees a plain `FileScan parquet` it can push filters/projections
  * into. At cluster scale these would be partitioned/bucketed tables; the
  * reader API is the same.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `events.ts` is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // raw long (spark.sql.legacy.parquet.nanosAsLong=true — set by
    // configure()). Values are µs-grain, so ns→µs truncation is lossless —
    // but it must be INTEGRAL division: `col / 1000` is double division,
    // and an epoch-nanos value (~1.7e18) exceeds a double's 53-bit
    // mantissa, silently perturbing timestamps by up to ±1 µs.
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }

  /** Session configs every graft session needs (nanos parquet, UTC). */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.sql.adaptive.enabled", "true")

  /** Register every table as a temp view (for spark.sql / tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
