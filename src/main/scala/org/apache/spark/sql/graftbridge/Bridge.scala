package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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

  /** Register a native expression into an EXISTING session's function
    * registry (the `spark.sql.extensions` config path only applies at
    * session build time; a library handed a live session needs this).
    * Idempotent: re-registration overwrites the same entry.
    */
  def registerFunction(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(new FunctionIdentifier(name), info, builder)
}
