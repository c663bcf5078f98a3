package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join without a broadcast-nested-loop plan.
 *
 * Spark turns a bare `p BETWEEN lo AND hi` join condition into
 * BroadcastNestedLoopJoin (or a cartesian product) — both dead at scale.
 * This operator rewrites the range predicate as an equi-join on fixed-width
 * bins: each interval is exploded to every bin it covers, each point maps
 * to exactly ONE bin, the sides hash-join on (equiKeys..., bin), and the
 * exact containment predicate filters the bin-collisions. A point falls in
 * one bin and an interval lists each covered bin once, so no pair is
 * produced twice — no dedup pass needed.
 *
 * Scale shape: one hash exchange per side keyed by (equiKeys, bin). The
 * only amplification is the interval fan-out `len/binWidth + 1`, so pick
 * `binWidth` near the typical interval length (fan-out ~2 rows per
 * interval). Degenerate giant intervals (covering the whole axis) belong
 * on a broadcast side instead — cap and split upstream.
 */
object RangeJoin {

  /**
   * Inverted intervals (lo > hi) contain no point by definition and are
   * dropped before the bin fan-out (they would otherwise explode a
   * *descending* bin sequence — wasted rows that the containment filter
   * then discards). An interval spanning more than `maxFanOut` bins fails
   * the job with an error naming the offending interval instead of
   * silently amplifying (or tripping Spark's sequence length limit deep in
   * an executor): such intervals belong on a broadcast side or split
   * upstream, and a loud failure at the source beats an OOM three stages
   * later.
   *
   * @param points    side with a point column
   * @param pointCol  numeric point (e.g. epoch seconds)
   * @param intervals side with [loCol, hiCol] inclusive bounds (same units)
   * @param binWidth  bin width in point units
   * @param equiKeys  additional equi-key columns present on both sides
   * @param maxFanOut hard cap on bins covered by one interval
   * @return one row per (point row × containing interval), with all
   *         columns of both sides (equiKeys appear once)
   */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      equiKeys: Seq[String] = Nil,
      maxFanOut: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxFanOut > 0, "maxFanOut must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(pointCol)))
    // The guard lives inside the sequence's start bound so column pruning
    // can never optimize it away; when/otherwise coerces raise_error's
    // NULL type to long. try_subtract keeps the guard sound for extreme
    // bounds: a plain subtraction can overflow long and go NEGATIVE,
    // silently bypassing the check (Spark's internal sequence-length limit
    // would still fail the job, but deep in an executor with a far less
    // actionable message). NULL bounds never reach here (the lo <= hi
    // filter below rejects them), so a NULL diff means overflow → raise.
    val fanOut = try_subtract(bin(col(hiCol)), bin(col(loCol)))
    val guardedLo = when(
      fanOut.isNull || fanOut >= maxFanOut,
      raise_error(concat(
        lit(s"range join fan-out exceeds $maxFanOut bins (binWidth=$binWidth) for interval ["),
        col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"),
        lit("]: raise binWidth, or split/broadcast degenerate intervals upstream"))))
      .otherwise(bin(col(loCol)))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(guardedLo, bin(col(hiCol)))))
    p.join(iv, equiKeys :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
