package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the public `Column` carry an
  * abstract ColumnNode; the converter (`classic.ExpressionUtils`) is
  * `private[sql]`, so this one-file adapter lives under the
  * `org.apache.spark.sql` package to expose it to graft's custom
  * Catalyst expressions. No Spark internals are modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unset a previously-set reliable checkpoint dir (SparkContext offers
    * no public clear; the field is `private[spark]`). Used by tests that
    * exercise the storage-backed CC barrier and then restore the default. */
  def clearCheckpointDir(sc: org.apache.spark.SparkContext): Unit =
    sc.checkpointDir = None
}
