package graft.records

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{FilterOps, Pagination}

/** The reference's record query surface (§3.1 lifecycle): a validated
  * filter object compiled to a single declarative plan.
  *
  * Mirrors `RecordSocket.query_base` (`qcfractal/components/
  * record_socket.py:238-335`): every filter is optional; joins to
  * side tables (children edges, dataset membership) are constructed only
  * when the corresponding filter is present — Catalyst cannot drop a
  * semantics-changing join, so the compiler does (SURVEY §4). The
  * result is keyset-paginated ids-first, then hydrated by a second
  * projection join, exactly like the reference's ids → bulkGet split.
  */
case class RecordQueryFilters(
    recordId: Seq[Long] = Nil,
    recordType: Seq[String] = Nil,
    status: Seq[String] = Nil,
    managerName: Seq[String] = Nil,
    creatorUser: Seq[String] = Nil,
    createdAfter: Option[String] = None,
    createdBefore: Option[String] = None,
    modifiedAfter: Option[String] = None,
    modifiedBefore: Option[String] = None,
    parentId: Seq[Long] = Nil,
    childId: Seq[Long] = Nil,
    datasetId: Seq[Long] = Nil,
    cursor: Option[Long] = None,
    limit: Option[Int] = None)

object RecordQueries {

  val MaxLimit = 1000 // ≙ api_limits.get_records (config.py:207)

  /** Compile filters over the records table (+ optional side tables) into
    * one DataFrame plan: filter → conditional semi-joins → cursor page. */
  def query(records: DataFrame,
            filters: RecordQueryFilters,
            edges: Option[DataFrame] = None,
            datasetItems: Option[DataFrame] = None): DataFrame = {

    def inOpt[T](c: Column, vs: Seq[T]): Option[Column] =
      if (vs.isEmpty) None else Some(c.isin(vs: _*))

    val preds: Seq[Column] = Seq(
      inOpt(col("record_id"), filters.recordId),
      inOpt(col("record_type"), filters.recordType),
      inOpt(col("status"), filters.status),
      inOpt(col("manager_name"), filters.managerName),
      inOpt(col("creator_user"), filters.creatorUser),
      filters.createdAfter.map(v => col("created_on") >= lit(v).cast("timestamp")),
      filters.createdBefore.map(v => col("created_on") <= lit(v).cast("timestamp")),
      filters.modifiedAfter.map(v => col("modified_on") >= lit(v).cast("timestamp")),
      filters.modifiedBefore.map(v => col("modified_on") <= lit(v).cast("timestamp"))
    ).flatten

    var df = preds.foldLeft(records)((d, p) => d.filter(p))

    // children-of-parent: semi-join against the edge view (J5)
    if (filters.parentId.nonEmpty) {
      val e = edges.getOrElse(sys.error("parentId filter requires edges"))
        .filter(col("parent_id").isin(filters.parentId: _*))
        .select(col("child_id").as("record_id"))
      df = df.join(e, Seq("record_id"), "left_semi")
    }
    // parents-of-child
    if (filters.childId.nonEmpty) {
      val e = edges.getOrElse(sys.error("childId filter requires edges"))
        .filter(col("child_id").isin(filters.childId: _*))
        .select(col("parent_id").as("record_id"))
      df = df.join(e, Seq("record_id"), "left_semi")
    }
    // dataset membership (J6)
    if (filters.datasetId.nonEmpty) {
      val m = datasetItems.getOrElse(sys.error("datasetId filter requires datasetItems"))
        .filter(col("dataset_id").isin(filters.datasetId: _*))
        .select(col("record_id"))
      df = df.join(m, Seq("record_id"), "left_semi")
    }

    Pagination.keysetPage(df, "record_id", filters.cursor,
      Pagination.clampLimit(MaxLimit, filters.limit))
  }

  /** P1 — include/exclude projection resolution with wildcards
    * (`db_socket/helpers.py:135-231`, wildcard semantics 543-551):
    * no include → the default column set; `*` → defaults plus any named
    * extras; `**` → every column including lazy/blob ones; exclude is
    * applied last and can remove anything except the pk, which is always
    * kept (the reference always loads the id). */
  def resolveProjection(allCols: Seq[String], defaultCols: Seq[String],
                        pk: String, include: Seq[String],
                        exclude: Seq[String]): Seq[String] = {
    val named = include.filterNot(Set("*", "**"))
    val base =
      if (include.contains("**")) allCols
      else if (include.contains("*")) (defaultCols ++ named).distinct
      else if (include.isEmpty) defaultCols
      else (pk +: named).distinct
    val kept = base.filterNot(c => c != pk && exclude.contains(c))
    if (kept.contains(pk)) kept else pk +: kept
  }

  /** Hydration: fetch selected columns for an id page in request order
    * (S1 + P1 include/exclude projection). `defaultCols` models the
    * non-deferred column set (all columns if unspecified). */
  def hydrate(records: DataFrame, ids: Seq[Long],
              include: Seq[String] = Nil, exclude: Seq[String] = Nil,
              defaultCols: Seq[String] = Nil): DataFrame = {
    val all = records.columns.toSeq
    val defaults = if (defaultCols.isEmpty) all else defaultCols
    val cols = resolveProjection(all, defaults, "record_id", include, exclude)
    Pagination.fetchInOrder(records.select(cols.map(col): _*), "record_id", ids)
  }
}
