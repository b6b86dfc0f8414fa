package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made `Column` a thin wrapper over `ColumnNode` and scoped the
  * converter (`ExpressionUtils`) `private[sql]`, so extension libraries
  * shipping native `Expression`s need one file in the `org.apache.spark.sql`
  * package tree — this is that file, and the ONLY place graft reaches into
  * Spark-private scope. Everything else uses public APIs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
