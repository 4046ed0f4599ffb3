package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters (Spark 4
  * moved the old public `new Column(expr)` constructor behind
  * `classic.ExpressionUtils`). Lives in the sql package namespace only
  * to satisfy the access modifier; contains no Spark-internal logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
