package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AggOps, JoinOps}

/** Skew-handling operators, oracle-checked for result equivalence: the
  * salted forms must produce byte-identical answers to their plain
  * counterparts (the oracle computes the plain form), so the skew
  * machinery can never silently change semantics. */
object SkewSafe extends QuerySet {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Salted equi join: lineitem (big, skewed side) ⋈ supplier (small,
    // replicated ×8), aggregated after the join — same answer as the
    // plain join, but a hot l_suppkey spreads over 8 reducers.
    "skew_salted_join" -> ((s, dir) => {
      val small = t(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      JoinOps.saltedEquiJoin(t(s, dir, "lineitem"), small,
          keys = Seq("l_suppkey"), spreadCol = "l_orderkey", salts = 8)
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(col("s_name"))
    }),

    // Salted distinct-set aggregation: per-supplier sorted distinct
    // return flags via the two-phase (key, salt-of-value) form.
    "skew_salted_collect" -> ((s, dir) => {
      AggOps.sortedDistinctCsvSalted(t(s, dir, "lineitem"),
          keyCols = Seq("l_suppkey"), valueCol = "l_returnflag", salts = 4)
        .orderBy(col("l_suppkey"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "skew_salted_join" ->
      """SELECT s_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,

    "skew_salted_collect" ->
      """SELECT l_suppkey,
        |  array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS vals
        |FROM lineitem
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin
  )
}
