package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 — dataset export sink (`qcfractal/qcfractal/components/
  * dataset_processing/views.py:25-183`): the reference dumps a whole
  * dataset (records + entries + specs) into a view file for offline
  * analytics. Our export format is parquet partitioned by `record_type`
  * (SURVEY S4): readers filtering one type prune whole partitions at
  * file-listing time, which replaces the reference's per-type chunked
  * cursor loops. */
object DatasetExport {

  def exportRecords(records: DataFrame, path: String): Unit =
    records
      // cluster rows inside each partition file so parquet row-group
      // min/max stats skip data on the hot (status, record_id) predicates
      .sortWithinPartitions("status", "record_id")
      .write.mode("overwrite").partitionBy("record_type").parquet(path)

  def readRecords(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
