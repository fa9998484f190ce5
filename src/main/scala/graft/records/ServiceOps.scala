package graft.records

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST2 — service iteration (`qcfractal/qcfractal/components/services/
  * socket.py:136-285`): a periodic pass aggregates each service's
  * dependency-record statuses and decides the next action — wait while
  * any dependency is unfinished, error out if any finished dependency
  * errored, otherwise enqueue the next iteration.
  *
  * The reference tests the aggregated status array with `contained_by(
  * ['complete','error'])` / `contains(['error'])` (A9); here those subset
  * tests are counter aggregates (`sum(when(...))`) — one hash-agg shuffle,
  * no array materialization (SURVEY A9 "counters preferred"). The sorted
  * distinct status CSV is surfaced for the A9 array_agg shape itself.
  */
object ServiceOps {

  /** Per-service decision over (service_id, status) dependency rows. */
  def iterationDecisions(deps: DataFrame): DataFrame =
    deps.groupBy(col("service_id")).agg(
        count(lit(1)).as("n_deps"),
        sum(when(col("status").isin(RecordStatus.Complete, RecordStatus.Error), 1L)
          .otherwise(0L)).as("n_done"),
        sum(when(col("status") === RecordStatus.Error, 1L).otherwise(0L)).as("n_error"),
        concat_ws(",", sort_array(collect_set(col("status")))).as("statuses"))
      .withColumn("decision",
        when(col("n_done") < col("n_deps"), "wait")
          .when(col("n_error") > 0, "error")
          .otherwise("iterate"))
}
