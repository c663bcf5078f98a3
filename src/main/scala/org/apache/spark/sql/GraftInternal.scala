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

  /** Corpus-sized checkpoint frames created INSIDE operators (DupSpans'
    * gram streams, Selection's narrow base) cannot be unpersisted at their
    * creation site — the returned DataFrame's consumers run later — and
    * relying on driver GC + ContextCleaner lets a long session looping
    * many dirs (the amplified-sweep pattern) accumulate executor block
    * storage. Operators register those frames here; the engine's
    * per-dir cache eviction ([[graft.SparkEntry.evictDirCaches]], called
    * between sweep iterations when nothing is in flight) releases every
    * tracked block for the session. WEAK references: a frame the driver
    * already dropped stays eligible for the normal ContextCleaner path
    * and its entry is pruned on the next release sweep. */
  private val trackedCheckpoints =
    new java.util.concurrent.ConcurrentLinkedQueue[
      (String, java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]])]()

  /** Register `df`'s checkpointed RDD blocks for scoped release; returns
    * `df` so call sites can wrap `.localCheckpoint(true)` inline. Each
    * registration also sweeps entries whose referent was already
    * GC-collected, so a library user that never calls the release keeps
    * the queue bounded by its LIVE checkpoints, not by calls ever made. */
  def trackLocalCheckpoint(df: DataFrame): DataFrame = {
    val it = trackedCheckpoints.iterator()
    while (it.hasNext) if (it.next()._2.get() == null) it.remove()
    val app = df.sparkSession.sparkContext.applicationId
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        trackedCheckpoints.add(
          (app, new java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]](lr.rdd)))
      case _ => ()
    }
    df
  }

  /** Unpersist every tracked checkpoint registered under this session's
    * application. Callers guarantee no tracked frame is still awaiting
    * consumption (checkpoint lineage is truncated — blocks cannot be
    * recomputed once dropped). */
  def releaseTrackedCheckpoints(spark: SparkSession): Unit = {
    val app = spark.sparkContext.applicationId
    val it = trackedCheckpoints.iterator()
    while (it.hasNext) {
      val (a, ref) = it.next()
      val rdd = ref.get()
      if (rdd == null) it.remove()
      else if (a == app) { rdd.unpersist(blocking = false); it.remove() }
    }
  }

  /** Drain the shared listener bus so asynchronously-delivered events
    * (QueryExecutionListener callbacks ride it) have all been handled.
    * Test-only helper — `listenerBus` is `private[spark]`, which this
    * bridge's package placement can reach. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
