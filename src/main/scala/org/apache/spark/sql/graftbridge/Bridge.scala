package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for Spark's `private[sql]` Column↔Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala) — the supported way since Spark 4 split
  * `Column` from catalyst is gated to the sql package, so third-party
  * native expressions need this one-file bridge.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
