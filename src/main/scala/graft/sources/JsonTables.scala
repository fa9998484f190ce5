package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S3 — JSON source/sink (`qcportal/qcportal/serialization.py:48-70`,
  * `qcfractal/flask_app/decorators.py:272-330`): the reference's wire
  * format is JSON documents; here that is JSON-lines ingest with an
  * explicit schema (never inferred — schema inference is a full extra
  * pass over the data at 100 TB, and silently widens types). */
object JsonTables {

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSON lines with the declared schema (SURVEY §1.2 mapping).
    * Corrupt rows fail loudly (FAILFAST) rather than turning into nulls —
    * the reference rejects malformed bodies at the route layer too. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}
