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

  /** Per-query top-k cut over (query_id, result_id, score): bounded heap
    * for integral result ids, rank-window fallback for any other orderable
    * id type (same guard as Knn.knnJoin — a uuid-string id would null-cast
    * out of the heap's long tie-break). */
  private[search] def topKPerQuery(scores: DataFrame, topK: Int): DataFrame = {
    val idIsIntegral = scores.schema("result_id").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (idIsIntegral) {
      scores
        .groupBy(col("query_id"))
        .agg(top_k_rows(struct(col("result_id"), col("score")),
          col("score"), col("result_id").cast("long"), topK).as("__tk"))
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
