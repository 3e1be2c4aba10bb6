package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's private[sql] Column↔Expression conversion (Spark 4
  * hides Column.expr behind the connect-compatible ColumnNode API). Lives in
  * the org.apache.spark.sql package solely to satisfy the access modifier —
  * same technique used by every third-party Catalyst extension library.
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
