package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. Spark 4 moved the catalyst-
  * backed Column constructor behind `private[sql]` ExpressionUtils; this
  * one-file subpackage re-exports the two conversions the engine needs
  * to expose native expressions as Columns (same approach as any
  * third-party Spark extension library).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
