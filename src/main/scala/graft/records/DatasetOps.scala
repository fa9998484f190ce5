package graft.records

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{AggOps, JoinOps, PivotOps}

/** Dataset-level operations: the entry × specification matrix
  * (SURVEY §1.1-3, §2 J7/A2/A11/X1-X2). */
object DatasetOps {

  /** `submit`: records still to create = entries × specs minus existing
    * items (`base_dataset_socket.py:1333-1435`). */
  def submitMissing(entries: DataFrame, specs: DataFrame,
                    items: DataFrame): DataFrame =
    JoinOps.submitMissing(
      entries.select(col("name").as("entry_name")),
      specs.select(col("name").as("specification_name")),
      items.select(col("entry_name"), col("specification_name")),
      Seq("entry_name", "specification_name"))

  /** Dataset status matrix: per (specification, status) record counts
    * (`base_dataset_socket.py:207-219`). */
  def statusMatrix(items: DataFrame, records: DataFrame): DataFrame =
    items.join(records, Seq("record_id"))
      .groupBy(col("specification_name"), col("status"))
      .agg(count(lit(1)).as("n"))

  /** Overall rollup across specifications (`dataset_socket.py:157-186`). */
  def statusRollup(items: DataFrame, records: DataFrame): DataFrame =
    statusMatrix(items, records).groupBy(col("status")).agg(sum(col("n")).as("n"))

  /** `compile_values`: wide entry × specification value frame
    * (`qcportal/dataset_models.py:2168-2265`). `value` is any Column over
    * the joined (item ⋈ record) row — the declarative analogue of the
    * reference's per-record callable. */
  def compileValues(items: DataFrame, records: DataFrame, value: Column,
                    specNames: Seq[String],
                    statusFilter: Option[String] = Some(RecordStatus.Complete)): DataFrame = {
    val joined = items.join(records, Seq("record_id"))
    val filtered = statusFilter.fold(joined)(st => joined.filter(col("status") === st))
    PivotOps.compileValues(filtered.withColumn("__v", value),
      "entry_name", "specification_name", first(col("__v"), ignoreNulls = true), specNames)
  }
}
