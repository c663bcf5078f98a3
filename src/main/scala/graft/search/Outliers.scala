package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, top_k_rows}

/**
 * Embedding-space outlier scoring: each corpus vector's mean cosine
 * similarity to its `k` nearest neighbors WITHIN A FIXED REFERENCE SAMPLE
 * — low mean-kNN similarity marks documents far from every dense region
 * (mojibake, wrong-language shards, adversarial junk), the embedding-level
 * complement of the Gopher-style text filters in a training-data pipeline
 * (cf. kNN-distance outlier scoring, Ramaswamy et al., SIGMOD 2000).
 *
 * The reference set is a [[graft.bench.Sampling.seeded]] deterministic
 * sample, NOT the full corpus: exact self-kNN is |C|² and dies at scale,
 * while sim-to-sample concentrates identically for density purposes. The
 * plan broadcasts the sample (sample-sized, corpus-independent) and
 * streams the corpus through one scoring pass; the bounded heap keeps ≤ k
 * sims per document before the per-document mean, so the post-scan state
 * is |C|·k tiny rows. One corpus pass, no corpus shuffle of vectors.
 *
 * Determinism discipline: sims rounded to 6 dp, mean = exact DECIMAL sum /
 * count then floor-quantized to 6 dp — the structural "mean of 6-dp
 * values" half-boundary case Spark's round() and an oracle engine disagree
 * on (same rule as [[graft.search.Bm25]]).
 */
object Outliers {
  private def r6(c: Column): Column =
    graft.functions.round6(c) // the one wire-rounding definition

  /**
   * Mean-kNN-similarity per corpus row against `reference`. Output:
   * `idCol`, `mean_knn_sim` (6-dp double). Integral AND string (uuid)
   * reference ids ride the bounded heap (the shared [[Knn.tieKeyFor]]
   * routing rule — string ties compare UTF8String bytes, DuckDB's binary
   * VARCHAR collation); fractional ids refuse LOUDLY at plan time rather
   * than truncation-colliding on a long cast (before r20 a uuid corpus
   * instead THREW at runtime under ANSI mode — the last heap site not on
   * the shared rule).
   */
  def meanKnnSim(
      corpus: DataFrame, idCol: String, vecCol: String,
      reference: DataFrame, refId: String, refVec: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tieKey = Knn.tieKeyForced(reference.schema(refId).dataType, "__rid")
    val ref = broadcast(
      reference.select(col(refId).as("__rid"), col(refVec).as("__rvec")))
    val sims = corpus.select(col(idCol), col(vecCol))
      .crossJoin(ref)
      .filter(col(idCol) =!= col("__rid"))
      .withColumn("__sim", round(cosine_similarity(col(vecCol), col("__rvec")), 6))
    // Every sim for one document is produced inside a single task (the
    // reference side is broadcast), so the heap's partial aggregation
    // collapses to ≤ k entries per document before any exchange.
    sims
      .groupBy(col(idCol))
      .agg(top_k_rows(struct(col("__sim")), col("__sim"), tieKey, k).as("__tk"))
      .select(col(idCol), explode(col("__tk")).as("__e"))
      .groupBy(col(idCol))
      .agg(r6(sum(col("__e.__sim").cast("decimal(28,6)")).cast("double") /
        count(lit(1))).as("mean_knn_sim"))
  }

  /** The `n` strongest outliers: lowest mean-kNN similarity first,
    * deterministic id tie-break, with `outlier_rank` attached. Planned as
    * TakeOrderedAndProject over the score frame — no full sort. */
  def topOutliers(
      corpus: DataFrame, idCol: String, vecCol: String,
      reference: DataFrame, refId: String, refVec: String,
      k: Int, n: Int): DataFrame = {
    val scored = meanKnnSim(corpus, idCol, vecCol, reference, refId, refVec, k)
      .orderBy(col("mean_knn_sim").asc, col(idCol).asc)
      .limit(n)
    scored.select(
      col(idCol), col("mean_knn_sim"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("mean_knn_sim").asc, col(idCol).asc)).as("outlier_rank"))
  }
}
