package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> catalyst Expression bridge for graft's broadcast-backed
  * expressions ([[graft.functions.NearestCentroidsBroadcast]]), which
  * carry a runtime object (a Broadcast handle) and therefore cannot be
  * built through the SQL function registry the way the literal-only
  * graft functions are. `classic.ExpressionUtils` is `private[sql]`, so
  * this one-file accessor lives in the sql package — the standard shim
  * pattern for Spark library extensions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
