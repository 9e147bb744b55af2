package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 made these conversions `private[sql]`; libraries that ship
  * native Catalyst expressions (frameless, spark-daria, most connectors)
  * expose them through a shim in the `org.apache.spark.sql` namespace.
  * This is the only file outside the `graft` namespace and contains no
  * logic — two delegating one-liners.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
