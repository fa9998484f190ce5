package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 decoupled the public `Column` API from Catalyst `Expression`s;
  * the classic converters live behind `private[sql]`. Extensions that add
  * native expressions (e.g. graft's SimHash64) need exactly these two
  * hops, so we expose them from inside the sql package namespace — the
  * same technique Spark connector libraries use. No Spark internals are
  * modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native function into an EXISTING session's registry —
    * the runtime-path twin of `SparkSessionExtensions.injectFunction`
    * (which only applies to sessions built after the extension loads).
    * `sessionState` is `private[sql]`, hence this hop lives here. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
