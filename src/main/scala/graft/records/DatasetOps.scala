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

  /** `copy_specifications` (`base_dataset_socket.py:1686-1752`): the
    * source dataset's spec rows re-keyed to the destination, SKIPPING
    * rows whose (name, specification_id) pair the destination already
    * has — same name bound to the SAME spec is a benign re-copy. A name
    * present with a DIFFERENT id is the reference's IntegrityError;
    * surfaced here as a loud failure before anything is produced.
    * Returns the full post-copy specs table. The destination's key set
    * is dataset metadata (thousands of rows, never corpus-scale), so
    * both the skip and the conflict check are broadcast joins against
    * the streamed source — no shuffle of the big table. */
  def copySpecifications(specs: DataFrame, srcId: Long, dstId: Long,
                         names: Option[Seq[String]] = None): DataFrame = {
    val dst = specs.filter(col("dataset_id") === dstId)
    val srcAll = specs.filter(col("dataset_id") === srcId)
    val src = names.fold(srcAll)(ns => srcAll.filter(col("name").isin(ns: _*)))
    val fresh = src.join(
      broadcast(dst.select(col("name"), col("specification_id"))),
      Seq("name", "specification_id"), "left_anti")
    val nConflict = fresh
      .join(broadcast(dst.select(col("name"))), Seq("name"), "left_semi").count()
    require(nConflict == 0,
      s"copy_specifications: $nConflict source spec name(s) already exist in " +
        s"dataset $dstId under a different specification_id")
    specs.unionByName(fresh.withColumn("dataset_id", lit(dstId))
      .select(specs.columns.map(col): _*))
  }

  /** `copy_entries` (`base_dataset_socket.py:1652-1684`): source entries
    * re-keyed to the destination. Any source entry NAME the destination
    * already has is the reference's IntegrityError ("destination already
    * has entries with the same name") — checked loudly up front.
    * Returns the full post-copy entries table. */
  def copyEntries(entries: DataFrame, srcId: Long, dstId: Long,
                  names: Option[Seq[String]] = None): DataFrame = {
    val dst = entries.filter(col("dataset_id") === dstId)
    val srcAll = entries.filter(col("dataset_id") === srcId)
    val src = names.fold(srcAll)(ns => srcAll.filter(col("name").isin(ns: _*)))
    val nConflict = src
      .join(broadcast(dst.select(col("name"))), Seq("name"), "left_semi").count()
    require(nConflict == 0,
      s"copy_entries: $nConflict source entry name(s) already exist in dataset $dstId")
    entries.unionByName(src.withColumn("dataset_id", lit(dstId))
      .select(entries.columns.map(col): _*))
  }

  /** `copy_record_items` (`base_dataset_socket.py:1754-1800`): the
    * source dataset's (entry, specification) → record links rewritten to
    * the destination — records themselves are NEVER duplicated, both
    * datasets keep pointing at the same record ids (the reference's
    * documented contract). Plain insert-select, no conflict filter,
    * exactly like the reference. Returns the post-copy items table. */
  def copyRecordItems(items: DataFrame, srcId: Long, dstId: Long,
                      entryNames: Option[Seq[String]] = None,
                      specNames: Option[Seq[String]] = None): DataFrame = {
    val srcAll = items.filter(col("dataset_id") === srcId)
    val src1 = entryNames.fold(srcAll)(ns => srcAll.filter(col("entry_name").isin(ns: _*)))
    val src = specNames.fold(src1)(ns => src1.filter(col("specification_name").isin(ns: _*)))
    items.unionByName(src.withColumn("dataset_id", lit(dstId))
      .select(items.columns.map(col): _*))
  }

  /** `copy_from` (`base_dataset_socket.py:1802-1872`): specs, entries
    * and record links in the reference's order; `copyRecords` implies
    * the other two. Returns the three post-copy tables. `clone` is this
    * with a fresh destination id and no name subsets
    * (`base_dataset_socket.py:1874+`). */
  def copyFrom(entries: DataFrame, specs: DataFrame, items: DataFrame,
               srcId: Long, dstId: Long,
               entryNames: Option[Seq[String]] = None,
               specNames: Option[Seq[String]] = None,
               copyEntriesFlag: Boolean = false,
               copySpecificationsFlag: Boolean = false,
               copyRecords: Boolean = false): (DataFrame, DataFrame, DataFrame) = {
    val outSpecs =
      if (copySpecificationsFlag || copyRecords)
        copySpecifications(specs, srcId, dstId, specNames) else specs
    val outEntries =
      if (copyEntriesFlag || copyRecords)
        copyEntries(entries, srcId, dstId, entryNames) else entries
    val outItems =
      if (copyRecords)
        copyRecordItems(items, srcId, dstId, entryNames, specNames) else items
    (outEntries, outSpecs, outItems)
  }

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
