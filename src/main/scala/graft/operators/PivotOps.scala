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
    * Property extraction is columnar (`get_json_object`), no UDF. */
  def propertiesDf(df: DataFrame, entryCol: String, specCol: String,
                   jsonCol: String, props: Seq[String],
                   specValues: Seq[String]): DataFrame = {
    val extracted = df.select(
      col(entryCol) +: col(specCol) +:
        props.map(p => get_json_object(col(jsonCol), s"$$.$p").cast("double").as(p)): _*)
    extracted.groupBy(col(entryCol))
      .pivot(specCol, specValues)
      .agg(props.head match { case h => first(col(h), ignoreNulls = true).as(h) },
           props.tail.map(p => first(col(p), ignoreNulls = true).as(p)): _*)
  }
}
