package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered top-k — SURVEY §2.5 W1/W2.
  *
  * The reference's task claim is `ORDER BY compute_priority DESC,
  * sort_date ASC, id ASC LIMIT n FOR UPDATE SKIP LOCKED`
  * (`qcfractal/components/tasks/socket.py:303-365`). Spark has no row
  * locks; the *observable* contract — the n highest-priority, oldest,
  * lowest-id available tasks — is a global top-k, which Catalyst executes
  * as `TakeOrderedAndProject`: per-partition size-n heaps merged at the
  * driver. No global sort, no shuffle of the full table.
  *
  * Concurrency (SKIP LOCKED) is redesigned for batch: `assignRoundRobin`
  * deterministically partitions the claimed set across m claimers.
  */
object TopK {

  /** W1/W2 — ordered claim: top-k by (priority desc, date asc, id asc). */
  def orderedClaim(df: DataFrame, priority: Column, date: Column, id: Column,
                   k: Int): DataFrame =
    df.orderBy(priority.desc, date.asc, id.asc).limit(k)

  /** Deterministic claim assignment replacing SKIP LOCKED: hash/round-robin
    * the top-k over `m` claimers by rank. */
  def assignRoundRobin(topk: DataFrame, id: Column, m: Int): DataFrame =
    topk.withColumn("__claimer", pmod(id, lit(m)))
}
