package graft.records

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Project-scoped query surface (SURVEY §2 J20/A14): records and datasets
  * filtered through project membership with name resolution, plus the
  * per-project status rollup.
  *
  * Mirrors `qcfractal/qcfractal/components/project_socket.py`:
  *  - `queryProjectRecords` (:245-278) — which projects do these records
  *    belong to, with the project name and the record's in-project name;
  *  - `queryProjectDatasets` (:280-315) — same for datasets;
  *  - `status` (:317-347) — the project's directly-linked record statuses
  *    plus the summed `overall_status` of every member dataset
  *    (`dataset_socket.py:157-186`: per-(spec,status) counts summed across
  *    specs and datasets, i.e. item-link counts, NOT distinct records).
  *
  * Scale shape: the projects dimension is metadata (thousands of rows at
  * most) → broadcast-joined; membership tables are orders-of-magnitude
  * smaller than the record corpus → the corpus side is only touched through
  * semi-joins on its partition key, never widened. The IN-lists arrive as
  * literal filters so parquet row-group pruning sees them.
  */
object ProjectOps {

  /** `query_project_records`: membership rows for the requested record ids,
    * resolved against the project dimension. Column contract matches the
    * reference's result dicts (record_id, project_id, project_name,
    * record_name). */
  def queryProjectRecords(recordMembers: DataFrame, projects: DataFrame,
                          recordIds: Seq[Long]): DataFrame =
    recordMembers.filter(col("record_id").isin(recordIds: _*))
      .join(broadcast(projects.select(col("project_id"), col("project_name"))),
        Seq("project_id"))
      .select(col("record_id"), col("project_id"),
        col("project_name"), col("record_name"))

  /** `query_project_datasets`: same shape over the dataset membership. */
  def queryProjectDatasets(datasetMembers: DataFrame, projects: DataFrame,
                           datasetIds: Seq[Long]): DataFrame =
    datasetMembers.filter(col("dataset_id").isin(datasetIds: _*))
      .join(broadcast(projects.select(col("project_id"), col("project_name"))),
        Seq("project_id"))
      .select(col("dataset_id"), col("project_id"),
        col("project_name"), col("dataset_name"))

  /** `status`: two-section rollup for one project.
    *
    * `records` section — status counts of the project's directly-linked
    * records (one count per membership link, like the reference's
    * `count(BaseRecordORM.id)` over the join).
    *
    * `datasets` section — the reference loops member datasets calling
    * `overall_status` and sums; declaratively that is ONE semi-join of the
    * item table against the (tiny, broadcast) member-dataset id set,
    * joined to records and grouped by status — the per-dataset loop
    * collapses into a single aggregate with no driver iteration. */
  def status(projectId: Long, recordMembers: DataFrame,
             datasetMembers: DataFrame, datasetItems: DataFrame,
             records: DataFrame): DataFrame = {
    // Inner join (not semi): one count per membership LINK, matching the
    // reference. No broadcast hint — a single project's membership is
    // usually small (AQE broadcasts it) but is not bounded the way the
    // dataset-id set below is.
    val recSide = records
      .join(recordMembers.filter(col("project_id") === projectId)
        .select(col("record_id")), Seq("record_id"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .select(lit("records").as("section"), col("status"), col("n"))
    val memberDs = datasetMembers.filter(col("project_id") === projectId)
      .select(col("dataset_id"))
    val dsSide = datasetItems
      .join(broadcast(memberDs), Seq("dataset_id"), "left_semi")
      .join(records, Seq("record_id"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .select(lit("datasets").as("section"), col("status"), col("n"))
    recSide.unionByName(dsSide)
  }
}
