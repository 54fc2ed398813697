/*
 * Bridge into Spark's private[sql] Column <-> Expression converters —
 * the standard pattern third-party Catalyst extensions use (a single
 * file compiled under the org.apache.spark.sql namespace). Only
 * forwarding, no behavior.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
