package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 marks ExpressionUtils
  * private[sql]; extension libraries conventionally expose the two
  * conversions from inside the package (same pattern as frameless /
  * spark-daria / sedona bridges). Nothing else from the private API is
  * touched. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
