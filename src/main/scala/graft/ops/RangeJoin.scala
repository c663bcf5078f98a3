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
   * @param points    side with a point column
   * @param pointCol  numeric point (e.g. epoch seconds)
   * @param intervals side with [loCol, hiCol] inclusive bounds (same units)
   * @param binWidth  bin width in point units
   * @param equiKeys  additional equi-key columns present on both sides
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
      equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(pointCol)))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p.join(iv, equiKeys :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
