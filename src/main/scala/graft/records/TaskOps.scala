package graft.records

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Task-queue semantics (SURVEY W1/W2, ST1, X4).
  *
  * The reference's `FOR UPDATE SKIP LOCKED` claim loop is redesigned for
  * batch execution (SURVEY §7 hard-part 2): the *observable* contract —
  * highest priority, oldest sort_date, lowest id, matching tag and
  * program requirements — is a filtered global top-k; concurrency is
  * deterministic assignment instead of row locks.
  */
object TaskOps {

  /** Claim: available tasks whose required programs the manager has and
    * whose tag the manager serves ('*' serves all), ordered
    * (priority desc, sort_date asc, id asc), top `limit`. */
  def claim(tasks: DataFrame, managerPrograms: Seq[String],
            managerTags: Seq[String], limit: Int): DataFrame = {
    val eligible = tasks
      .filter(col("available") === true)
      // task requires nothing the manager lacks (P6 `?&`)
      .filter(size(array_except(col("required_programs"),
        array(managerPrograms.map(lit): _*))) === 0)
      .filter(
        if (managerTags.contains("*")) lit(true)
        else col("compute_tag").isin(managerTags: _*))
    TopK.orderedClaim(eligible, col("compute_priority"), col("sort_date"),
      col("task_id"), limit)
  }

  /** W1 per-tag claim loop, flattened: the reference claims tag by tag in
    * the manager's declared tag ORDER until the limit fills
    * (`qcfractal/qcfractal/components/tasks/socket.py:303-365` loops tags,
    * each inner query ordered by priority/sort_date/id). The observable
    * contract — earlier tags win, then priority desc, sort_date asc, id
    * asc — is a single global top-k over (tag_rank, ...), so the loop
    * becomes one TakeOrderedAndProject. '*' serves all tags with equal
    * rank, like the reference's wildcard manager. */
  def claimTagOrdered(tasks: DataFrame, managerPrograms: Seq[String],
                      managerTags: Seq[String], limit: Int): DataFrame = {
    val eligible = tasks
      .filter(col("available") === true)
      .filter(size(array_except(col("required_programs"),
        array(managerPrograms.map(lit): _*))) === 0)
    val ranked =
      if (managerTags.contains("*")) eligible.withColumn("tag_rank", lit(1L))
      else eligible
        .withColumn("tag_rank",
          array_position(array(managerTags.map(lit): _*), col("compute_tag")))
        .filter(col("tag_rank") > 0)
    ranked.orderBy(col("tag_rank").asc, col("compute_priority").desc,
        col("sort_date").asc, col("task_id").asc)
      .limit(limit)
  }

  /** Status transition legality guard (P10): which of `ids` may be
    * cancelled/reverted given current status. */
  def cancellable(records: DataFrame): DataFrame =
    records.filter(col("status").isin(RecordStatus.cancellable.toSeq: _*))

  /** X4 — waiting-reason diagnostics: for each waiting task, can any
    * active manager run it? (program subset + tag membership per manager,
    * no UDF — array predicates over a broadcast managers frame). */
  def waitingReasons(tasks: DataFrame, managers: DataFrame): DataFrame = {
    val active = managers.filter(col("status") === "active")
      .select(col("name").as("manager"), col("compute_tags"), col("programs"))
    tasks.filter(col("available") === true)
      .crossJoin(broadcast(active))
      .withColumn("programs_ok",
        size(array_except(col("required_programs"), col("programs"))) === 0)
      .withColumn("tag_ok",
        array_contains(col("compute_tags"), "*") ||
          array_contains(col("compute_tags"), col("compute_tag")))
      .groupBy(col("task_id"))
      .agg(max(col("programs_ok") && col("tag_ok")).as("claimable"),
           sum(when(col("programs_ok"), 1).otherwise(0)).as("n_program_matches"),
           sum(when(col("tag_ok"), 1).otherwise(0)).as("n_tag_matches"))
  }
}
