package graft.records

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ST1's write path and the undo stack, event-sourced.
  *
  *  - `applyFinished` ≙ `update_finished`/`update_completed_schema_v1`
  *    (`qcfractal/qcfractal/components/record_socket.py:684-738`): a batch
  *    of manager results transitions record statuses and appends history
  *    rows. The reference UPDATEs in place; here the records table is a
  *    derived view — new statuses merge in via one left join, history is
  *    append-only (SURVEY §7 hard-part 4: event-sourced log + latest-state
  *    view instead of in-place UPDATE).
  *  - `revertToPrevious` ≙ the revert/uninvalidate path backed by
  *    `RecordInfoBackupORM` (`record_socket.py:975-1188`,
  *    `record_db_models.py:65-84`): the "backup stack pop" is the
  *    second-latest history entry per record — a rank-2 pick over the
  *    history log, so no separate backup table is needed.
  */
object RecordOps {

  /** Apply finished results (record_id, new_status) to the records view;
    * untouched records pass through. Returns the updated records view. */
  def applyFinished(records: DataFrame, results: DataFrame): DataFrame =
    records
      .join(results.select(col("record_id"), col("new_status")), Seq("record_id"), "left")
      .withColumn("status", coalesce(col("new_status"), col("status")))
      .drop("new_status")

  /** Previous status per record from an append-only history log
    * (record_id, seq, status): the rank-2 entry by seq descending.
    * Records with fewer than two entries have nothing to revert to and
    * are omitted, like the reference's empty-backup guard. */
  def revertToPrevious(history: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("record_id")).orderBy(col("seq").desc)
    history.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 2)
      .select(col("record_id"), col("status").as("reverted_status"))
  }
}
