package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal classic-mode bridge: `Column ↔ Expression` conversion lives
  * behind `private[sql]` in Spark 4, so third-party native expressions need
  * an adapter inside the `org.apache.spark.sql` package tree — the same
  * pattern every Spark extension library uses (Sedona, spark-nlp, Delta). */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
