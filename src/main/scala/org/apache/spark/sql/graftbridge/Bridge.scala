package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column <-> Expression
  * converters — the conventional shim a Spark-extension library uses
  * to lift custom Catalyst expressions into public `Column`s (the
  * Spark 4 classic/connect split removed the public constructors).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
