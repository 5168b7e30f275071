package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 routes Column through ColumnNode; the classic converters are
  * package-private). Lives in an `org.apache.spark.sql` subpackage solely
  * to satisfy that visibility — the one non-`graft` package in this
  * library, kept to two forwarders.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
