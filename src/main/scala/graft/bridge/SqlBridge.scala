package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 scopes these conversions
  * private[sql]; a subpackage object is the standard extension-library way
  * (Delta, Sedona, ...) to build `Column`s from custom Catalyst expressions
  * without string-rendering them through the parser. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
