package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.search.{Ann, Ivf}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated regions on the unit circle (near (1,0) and (0,1)),
  // each containing a near-dup pair, plus one CROSS-region pair that is
  // cosine-close enough to pass the threshold if it were ever scored.
  private def vec(x: Double, y: Double): Array[Float] = {
    val n = math.sqrt(x * x + y * y)
    Array((x / n).toFloat, (y / n).toFloat)
  }
  private val fixture = Seq(
    (1L, vec(1.0, 0.0)),
    (2L, vec(1.0, 0.05)),   // near-dup of 1 (same region)
    (3L, vec(0.0, 1.0)),
    (4L, vec(0.05, 1.0)),   // near-dup of 3 (same region)
    (5L, vec(0.8, 0.6))     // between regions: cos(5,1)=0.8, cos(5,3)=0.6
  ).toDF("id", "vec")
  private val centroids = Array(vec(1.0, 0.0), vec(0.0, 1.0))

  test("pairs are mined within cells only; cross-cell pairs never scored") {
    val got = SemDedup.cellNearDupPairs(fixture, "id", "vec", centroids,
        threshold = 0.7, roundScoreTo = Some(6))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // doc 5 routes to cell 0 (cos 0.8 > 0.6) where it pairs with 1 and 2
    // (cos(5,1)=0.8, cos(5,2)≈0.82 — both ≥ 0.7); the exact all-pairs
    // operator would also emit nothing else above 0.7 across regions
    // except those. Crucially (1,3)-type cross-cell pairs are absent even
    // though the all-pairs operator at threshold 0.0 would score them.
    assert(got == Set((0, 1L, 2L), (0, 1L, 5L), (0, 2L, 5L), (1, 3L, 4L)))
    // adversarial variant: at threshold 0.55 the cross-region pair (3,5)
    // has cosine 0.6 ≥ threshold but lives in different cells — still absent
    val loose = SemDedup.cellNearDupPairs(fixture, "id", "vec", centroids,
        threshold = 0.55, roundScoreTo = Some(6))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(!loose.contains((3L, 5L)) && !loose.contains((1L, 3L)))
    val exact = Ann.nearDupPairs(fixture, "id", "vec",
        threshold = 0.55, roundScoreTo = Some(6))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((3L, 5L))) // the all-pairs operator DOES score it
  }

  test("one cell ≡ exact all-pairs (the cell bound is the only approximation)") {
    val one = SemDedup.cellNearDupPairs(fixture, "id", "vec",
        Array(vec(1.0, 1.0)), threshold = 0.5, roundScoreTo = Some(6))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = Ann.nearDupPairs(fixture, "id", "vec",
        threshold = 0.5, roundScoreTo = Some(6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one == exact && one.nonEmpty)
  }

  test("oversized cells are dropped by the skew guard") {
    val capped = SemDedup.cellNearDupPairs(fixture, "id", "vec", centroids,
      threshold = 0.7, maxCellSize = 2) // cell 0 holds {1,2,5} -> dropped
    assert(capped.collect().map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((3L, 4L)))
  }

  test("dropSemanticDuplicates keeps one representative per semantic cluster") {
    val kept = SemDedup.dropSemanticDuplicates(fixture, "id", "vec", centroids,
        threshold = 0.7)
      .select("id").as[Long].collect().sorted.toSeq
    // cluster {1,2,5} in cell 0 -> keep 1; cluster {3,4} in cell 1 -> keep 3
    assert(kept == Seq(1L, 3L))
  }

  test("plan: cell-keyed equi-join, never a nested-loop or cartesian") {
    val assigned = Ivf.assign(fixture, "vec", centroids, "cell")
      .select(col("cell"), col("id"), col("vec"))
    val p = SemDedup.pairsPlan(assigned, "id", "vec",
        threshold = 0.7, maxCellSize = 100000, roundScoreTo = None)
      .queryExecution.executedPlan.toString
    // the id_a < id_b predicate must ride the cell equi-join as a post
    // condition, not force a nested-loop plan; the skew sizing pass must
    // broadcast its (tiny) oversized-cell list
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNL in:\n$p")
    assert(p.contains("BroadcastExchange"), s"oversized-cell list must broadcast:\n$p")
  }

  test("works with trained KMeans centroids (the production path)") {
    val trained = Ivf.trainCentroids(fixture, "id", "vec", nList = 2, seed = 7L)
    val pairs = SemDedup.cellNearDupPairs(fixture, "id", "vec", trained,
        threshold = 0.7, roundScoreTo = Some(6))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // the two in-region near-dup pairs must land in shared cells; the
    // cross-region docs 1/3 must not pair
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)))
    assert(!pairs.contains((1L, 3L)))
  }
}
