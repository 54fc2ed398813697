/*
 * Bridge into Spark's private[sql] Column <-> Expression converters —
 * the standard pattern third-party Catalyst extensions use (a single
 * file compiled under the org.apache.spark.sql namespace). Only
 * forwarding, no behavior.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A clone of `s` (same SparkContext, copied conf/state) with the given
    * conf overrides — the thread-safe way to give ONE read a legacy flag
    * without mutating the caller's session (set/unset around a read races
    * when two queries build plans concurrently). */
  def sessionWithConf(s: SparkSession, kv: (String, String)*): SparkSession = {
    val c = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    kv.foreach { case (k, v) => c.conf.set(k, v) }
    c
  }

  /** Free the BlockManager blocks behind a `localCheckpoint()`ed frame
    * (they are NOT CacheManager-registered, so `df.unpersist()` can't
    * reach them). Safe only once the frame's data is no longer needed —
    * a truncated-lineage RDD cannot be recomputed. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
}
