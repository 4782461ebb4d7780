package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 moved `Column.expr` behind `org.apache.spark.sql.classic`).
  * Lives in the `org.apache.spark.sql` package solely to satisfy the
  * `private[sql]` qualifier; uses only stable classic-converter entry points.
  */
object GraftBridge {
  /** Eager ColumnNode→Expression conversion (ExpressionUtils.expression only
    * wraps lazily in a ColumnNodeExpression, which catalyst transforms can't
    * see through).
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unset the checkpoint dir (`private[spark]` var; no public unset API) —
    * lets a shared test session restore the localCheckpoint fallback after
    * exercising the reliable-checkpoint path.
    */
  def clearCheckpointDir(sc: org.apache.spark.SparkContext): Unit =
    sc.checkpointDir = None
}
