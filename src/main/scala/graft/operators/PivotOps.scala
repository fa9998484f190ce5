package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot analytics — SURVEY §2.10 X1-X3.
  *
  * The reference's `compile_values` runs a callable per record and pivots
  * rows=entry, cols=specification (`qcportal/qcportal/dataset_models.py:
  * 2168-2265`); `get_properties_df` does the same over JSON properties.
  * On Spark this is `groupBy(entry).pivot(spec, values).agg(...)`.
  *
  * ALWAYS pass explicit pivot values at scale: without them Spark runs an
  * extra distinct() job over the full table just to discover columns.
  */
object PivotOps {

  /** X1 — pivot a value per (entry, spec) into a wide entry × spec frame. */
  def compileValues(df: DataFrame, entryCol: String, specCol: String,
                    value: Column, specValues: Seq[String]): DataFrame =
    df.groupBy(col(entryCol)).pivot(specCol, specValues).agg(value)

  /** X2 — extract N properties from a JSON string column then pivot.
    * Property extraction is columnar (`get_json_object`), no UDF. The input
    * must be unique per (entry, spec) — callers pick one record per cell
    * first (A10 DISTINCT ON semantics), as the reference does with its
    * complete-record pick, so `first` is deterministic. Pivoted columns are
    * named `{specValue}_{prop}`. */
  def propertiesDf(df: DataFrame, entryCol: String, specCol: String,
                   jsonCol: String, props: Seq[String],
                   specValues: Seq[String]): DataFrame = {
    val extracted = df.select(
      col(entryCol) +: col(specCol) +:
        props.map(p => get_json_object(col(jsonCol), s"$$.$p").cast("double").as(p)): _*)
    extracted.groupBy(col(entryCol))
      .pivot(specCol, specValues)
      .agg(first(col(props.head), ignoreNulls = true).as(props.head),
           props.tail.map(p => first(col(p), ignoreNulls = true).as(p)): _*)
  }

  /** X2's trailing `dropna(axis=1, how="all")`: drop the listed columns
    * that are entirely null. One count-aggregate action decides the final
    * schema — a driver-side schema decision, same as the reference
    * (`qcportal/qcportal/dataset_models.py:2304-2312`). */
  def dropAllNullCols(df: DataFrame, candidates: Seq[String]): DataFrame = {
    val counts = df.agg(
      count(col(candidates.head)).as(candidates.head),
      candidates.tail.map(c => count(col(c)).as(c)): _*).collect()(0)
    val dead = candidates.filter(c => counts.getAs[Long](c) == 0L)
    if (dead.isEmpty) df else df.drop(dead: _*)
  }

  /** X3 — unpack a struct-valued column into top-level columns (the
    * reference's value_call sequence→columns fan-out,
    * `qcportal/qcportal/dataset_models.py:2246-2256`). */
  def unpack(df: DataFrame, structCol: String, keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+ col(s"$structCol.*"): _*)
}
