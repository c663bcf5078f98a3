package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustered writes: multi-dimensional data-skipping
 * layout for the 100 TB scan path.
 *
 * Parquet readers prune at TWO granularities from footer min/max stats —
 * whole files and row groups — but only when values are clustered so each
 * file covers a narrow range. Range-partitioning by a single column gives
 * perfect pruning on that column and none on any other; interleaving the
 * bits of several columns' normalized ranks onto one space-filling curve
 * makes every file a small hyper-rectangle, so predicates on ANY subset of
 * the clustered columns skip most files. The standard layout trick for
 * multi-tenant fact tables (filter by user AND time), documented in the
 * Morton-order / UB-tree literature and every modern lakehouse engine.
 *
 * Scale shape: one min/max aggregate over the clustered columns (a scalar
 * to the driver), one map-side z-value projection (pure bit arithmetic,
 * codegen'd builtins — no UDF), one range repartition on the z-value
 * (Spark samples boundaries), sortWithinPartitions, write. The data
 * shuffles ONCE, same cost class as any repartition-before-write.
 *
 * Normalization is linear min→max (each column scaled into 2^bits
 * buckets). Heavily skewed columns concentrate rank buckets — pruning
 * degrades toward single-column range partitioning but never below it;
 * pre-transform (e.g. log) skewed columns, the same advice every z-order
 * implementation gives.
 */
object ZOrder {

  /** Morton z-value of the given numeric columns as a non-negative long:
    * each column is linearly bucketed into [0, 2^bits) using the provided
    * (min, max) and the buckets' bits are interleaved column-round-robin
    * (bit b of column i lands at position b·n + i). bits·n must fit a
    * long; NULL — and NaN, which would otherwise silently bucket to the
    * top because Spark's greatest/least order NaN above every double — in
    * any column yields NULL (sorts first — callers wanting NULL-last
    * should coalesce upstream). Pure builtin bit arithmetic —
    * whole-stage-codegen'd, no UDF. */
  def zValue(cols: Seq[Column], ranges: Seq[(Double, Double)], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zValue needs at least one column")
    require(bits >= 1 && bits * n <= 62,
      s"bits*cols must fit a positive long, got $bits*$n")
    val top = (1L << bits) - 1
    val bucketed = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val w = if (hi > lo) hi - lo else 1.0
      // floor to [0, top]; constant range (hi == lo) puts everything at 0.
      // greatest/least SKIP nulls (they'd mask a null input as bucket 0),
      // so null propagation is explicit.
      when(c.isNull || isnan(c.cast("double")), lit(null).cast("long")).otherwise(
        least(lit(top), greatest(lit(0L),
          floor((c.cast("double") - lit(lo)) / lit(w) * lit(top.toDouble)).cast("long"))))
    }
    (for (b <- 0 until bits; i <- 0 until n) yield {
      shiftleft(bucketed(i).bitwiseAND(lit(1L << b)).cast("long"), b * (n - 1) + i)
    }).reduce(_ bitwiseOR _)
  }

  /**
   * Rewrite `df` into `numFiles` z-clustered files at `outDir`: computes
   * each column's min/max, projects the z-value, range-repartitions on it
   * (so files tile the curve), sorts within partitions (so ROW GROUPS
   * within a file tile it too), and writes parquet without the helper
   * column. Read back with plain `spark.read.parquet` — pruning is free,
   * no index structure to maintain.
   */
  def writeClustered(df: DataFrame, cols: Seq[String], outDir: String,
      numFiles: Int, bits: Int = 12): Unit = {
    require(cols.nonEmpty, "writeClustered needs at least one cluster column")
    // NaN → NULL before the range agg: Spark's max treats NaN as the
    // greatest double, so one NaN row would poison the whole range;
    // NaN rows z-cluster as NULL (same contract as zValue).
    val aggs = cols.flatMap { c =>
      val cd = when(!isnan(col(c).cast("double")), col(c).cast("double"))
      Seq(min(cd).as(s"__min_$c"), max(cd).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input / all-null column -> null aggregates; any constant range
    // degrades that column to bucket 0 (still a valid layout)
    val ranges = cols.indices.map { i =>
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) (0.0, 0.0)
      else (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
    df.withColumn("__z", zValue(cols.map(col), ranges, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
