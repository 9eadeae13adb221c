package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's package-private Column↔Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils, private[sql]) so the graft
  * engine's custom Catalyst expressions can expose a `Column` API.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Unwrap a `lit(...)` Column back to its Scala value (Spark 4 Columns
    * wrap private[sql] ColumnNodes). */
  def literalValue(c: Column): Option[Any] = c.node match {
    case l: internal.Literal => Some(l.value)
    case _ => None
  }
}
