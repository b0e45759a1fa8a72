package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils). Since the Spark 4
  * Column-node refactor there is no public API for wrapping a custom
  * Catalyst Expression into a Column; this one-liner shim (in an
  * `org.apache.spark.sql` subpackage to satisfy `private[sql]`) is the
  * minimal, standard way third-party expression libraries do it.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
