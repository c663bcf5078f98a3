package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column <-> Expression
 * converters (Spark 4 removed the public `new Column(expr)` constructor in
 * the classic/connect unification). This is the only file that lives in the
 * Spark namespace; everything else is plain `graft.*`.
 */
object GraftInternal {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the executor blocks behind a `localCheckpoint(eager = true)`
    * frame (Dataset.unpersist only reaches CacheManager entries, not the
    * checkpointed RDD). Used by iterative operators to free superseded
    * rounds deterministically instead of waiting for driver GC. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Drain the shared listener bus so asynchronously-delivered events
    * (QueryExecutionListener callbacks ride it) have all been handled.
    * Test-only helper — `listenerBus` is `private[spark]`, which this
    * bridge's package placement can reach. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
