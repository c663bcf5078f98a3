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
    writeStatsManifest(df.sparkSession, outDir, cols)
  }

  /** Sidecar data-skipping manifest name. The leading underscore keeps
    * Spark's parquet reader from treating it as data (same convention as
    * `_SUCCESS`). */
  private val ManifestName = "_graft_zstats.tsv"

  /** Per-FILE min/max stats of the clustered columns, collected with one
    * scan of the freshly-written (clustered, hence cheap) files and
    * written as a tiny TSV sidecar — the lakehouse data-skipping pattern
    * (Delta/Iceberg keep these in their transaction log; plain parquet
    * keeps row-group stats in footers but Spark tasks every file before
    * footers are read, so FILE-level pruning needs a manifest). Bounded:
    * one row per (file, column), driver-collected. NaN is excluded from
    * stats the same way as the range agg above (a NaN row would poison
    * max and disable skipping for its file). */
  private def writeStatsManifest(
      spark: org.apache.spark.sql.SparkSession, outDir: String,
      cols: Seq[String]): Unit = {
    val written = spark.read.parquet(outDir)
    val aggs = cols.flatMap { c =>
      val cd = when(!isnan(col(c).cast("double")), col(c).cast("double"))
      Seq(min(cd).as(s"__min_$c"), max(cd).as(s"__max_$c"))
    }
    val rows = written.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val sb = new StringBuilder
    rows.foreach { r =>
      val base = r.getString(0).split('/').last
      cols.indices.foreach { i =>
        if (!r.isNullAt(1 + 2 * i) && !r.isNullAt(2 + 2 * i))
          sb.append(base).append('\t').append(cols(i)).append('\t')
            .append(r.getDouble(1 + 2 * i)).append('\t')
            .append(r.getDouble(2 + 2 * i)).append('\n')
      }
    }
    val path = new org.apache.hadoop.fs.Path(outDir, ManifestName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** True when `dir` holds a clustered write with a skipping manifest. */
  def hasManifest(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir, ManifestName)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Read back a [[writeClustered]] directory pruning whole FILES whose
    * manifest [min, max] is disjoint from every requested `(col, lo, hi)`
    * closed range. Returns (candidate rows, filesTotal, filesRead).
    *
    * The result is a SUPERSET of the matching rows (file granularity, and
    * all-null-column files are kept conservatively — their stats line is
    * absent): the caller MUST re-apply its predicate on top; the pruning
    * only shrinks the scan. Correct for range predicates because a row
    * with NULL in a range-filtered column cannot match the predicate, so
    * skipping a file whose non-null values are disjoint never drops a
    * matching row.
    *
    * The manifest keeps stats in the DOUBLE domain (each value cast, then
    * min/max — both monotone), but integral columns past 2^53 lose
    * precision in that cast: at 2^62 the double ULP is 512, so a stored
    * bound can sit up to half an ULP away from the true long value. A
    * caller whose re-applied predicate lives in the LONG domain can then
    * hand us `lo`/`hi` doubles rounded the other way, and an exact `<`
    * test against the rounded bound would prune a file holding a matching
    * boundary row — silently, because the caller only re-filters the KEPT
    * files. The disjointness test therefore widens each stored bound by
    * one ULP (`nextDown(min)`, `nextUp(max)`) before comparing: pruning
    * stays a strict superset at any magnitude, at worst keeping one extra
    * boundary file per range. */
  def readPruned(spark: org.apache.spark.sql.SparkSession, dir: String,
      ranges: Seq[(String, Double, Double)]): (DataFrame, Int, Int) = {
    val path = new org.apache.hadoop.fs.Path(dir, ManifestName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // file -> col -> (min, max)
    val stats = text.linesIterator.filter(_.nonEmpty).toSeq
      .map { l => val f = l.split('\t'); (f(0), f(1), f(2).toDouble, f(3).toDouble) }
      .groupBy(_._1)
      .map { case (f, ls) => f -> ls.map(t => t._2 -> (t._3, t._4)).toMap }
    // Enumerate the actual data files: a file whose rows are all-NULL in
    // every clustered column has NO manifest line at all, and the
    // conservative-keep contract still applies to it. total therefore
    // counts files on disk, not manifest entries.
    val partFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith(".") && n.endsWith(".parquet"))
      .toSeq.sorted
    val total = partFiles.size
    val kept = partFiles.filter { f =>
      stats.get(f).forall { byCol =>
        ranges.forall { case (c, lo, hi) =>
          byCol.get(c).forall { case (mn, mx) =>
            !(Math.nextUp(mx) < lo || Math.nextDown(mn) > hi) }
        }
      }
    }
    val df =
      if (kept.isEmpty) spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(kept.map(f => s"$dir/$f"): _*)
    (df, total, kept.size)
  }
}
