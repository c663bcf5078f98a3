package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.top_k_rows

/**
 * Hybrid retrieval by reciprocal-rank fusion (Cormack et al., SIGIR 2009):
 * fused(q, d) = Σ over ranked lists of 1/(k + rank of d in that list),
 * documents absent from a list contributing nothing. RRF is the standard
 * score-scale-free way to combine lexical ([[Bm25]]) and vector
 * ([[Knn]]) retrieval — ranks, not scores, cross the fusion boundary, so
 * BM25 magnitudes and cosine magnitudes never need calibration.
 *
 * Scale shape: inputs are already top-k'd (≤ |Q|·k rows each), so the
 * union + fusion aggregate is query-output-sized, never corpus-sized; the
 * final per-query cut reuses the bounded-heap aggregate. Fusion terms are
 * floor-quantized to the 1e-12 grid and DECIMAL-summed (the repo's
 * cross-engine discipline), so the DuckDB twin reproduces fused scores
 * cell-exactly.
 */
object Hybrid {

  /**
   * Fuse ranked lists, each with columns (query_id, result_id, rank).
   * Output: query_id, result_id, `score` (fused, rounded), `rank`.
   */
  def rrf(lists: Seq[DataFrame], k: Int = 60, topK: Int = 10,
      roundScoreTo: Int = 6): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val contrib = lists.map(_.select(col("query_id"), col("result_id"),
        (floor(lit(1.0) / (lit(k) + col("rank")) * lit(1e12) + lit(0.5)) / lit(1e12))
          .cast("decimal(28,12)").as("__r")))
      .reduce(_ union _)
    val m = math.pow(10.0, roundScoreTo)
    val fusedScores = contrib.groupBy(col("query_id"), col("result_id"))
      .agg((floor(sum(col("__r")).cast("double") * lit(m) + lit(0.5)) / lit(m))
        .as("score"))
    topKPerQuery(fusedScores, topK)
  }

  /**
   * Hybrid retrieval by weighted score fusion: each list's scores are
   * min-max normalized PER QUERY to [0, 1] (scale calibration — BM25
   * magnitudes are unbounded, cosine lives in [-1, 1]), then combined as
   * the convex sum `alpha·dense + (1 − alpha)·lexical`; a document absent
   * from a list contributes nothing from it. The other standard hybrid
   * mode next to [[rrf]]: rank-only fusion discards score MAGNITUDES
   * (a near-tie and a blowout at ranks 1-2 fuse identically), while
   * weighted fusion keeps them and gives users the alpha dial.
   * Degenerate all-tied lists (max = min) normalize to 1.0 — every doc is
   * equally "best", so each keeps the list's full weight.
   *
   * Scale shape: inputs are already top-k'd (≤ |Q|·k rows each), so the
   * min-max windows, union, and fusion aggregate are query-output-sized,
   * never corpus-sized. Same cross-engine float discipline as [[rrf]]:
   * normalized scores are exact-double functions of 6-dp-quantized inputs,
   * each weighted contribution is floor-quantized to the 1e-12 grid and
   * DECIMAL-summed, so the DuckDB twin reproduces fused scores
   * cell-exactly.
   *
   * Inputs carry (query_id, result_id, score).
   * Output: query_id, result_id, `score` (fused, rounded), `rank`.
   */
  def weighted(dense: DataFrame, lexical: DataFrame, alpha: Double = 0.5,
      topK: Int = 10, roundScoreTo: Int = 6): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    def contribution(list: DataFrame, weight: Double): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      val mn = min(col("score")).over(w)
      val mx = max(col("score")).over(w)
      list.select(col("query_id"), col("result_id"),
          when(mx === mn, lit(1.0))
            .otherwise((col("score") - mn) / (mx - mn)).as("__n"))
        .select(col("query_id"), col("result_id"),
          (floor(lit(weight) * col("__n") * lit(1e12) + lit(0.5)) / lit(1e12))
            .cast("decimal(28,12)").as("__c"))
    }
    val contrib = contribution(dense, alpha)
      .union(contribution(lexical, 1.0 - alpha))
    val m = math.pow(10.0, roundScoreTo)
    val fusedScores = contrib.groupBy(col("query_id"), col("result_id"))
      .agg((floor(sum(col("__c")).cast("double") * lit(m) + lit(0.5)) / lit(m))
        .as("score"))
    topKPerQuery(fusedScores, topK)
  }

  /** Per-query top-k cut over (query_id, result_id, score): bounded heap
    * for integral AND string (uuid) result ids (shared routing rule:
    * [[Knn.tieKeyFor]] — string ids compare as UTF8String bytes inside the
    * heap, identical to the window's string sort); rank-window fallback
    * only for fractional id types, whose truncating long cast could
    * collide two ids. */
  private[search] def topKPerQuery(scores: DataFrame, topK: Int): DataFrame = {
    val tieKey = Knn.tieKeyFor(scores.schema("result_id").dataType, "result_id")
    if (tieKey.isDefined) {
      scores
        .groupBy(col("query_id"))
        .agg(top_k_rows(struct(col("result_id"), col("score")),
          col("score"), tieKey.get, topK).as("__tk"))
        .select(col("query_id"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
        .select(col("query_id"), col("__e.result_id").as("result_id"),
          col("__e.score").as("score"), (col("__pos") + 1).cast("int").as("rank"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("result_id").asc)
      scores
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
        .select(col("query_id"), col("result_id"), col("score"),
          col("rank").cast("int").as("rank"))
    }
  }
}
