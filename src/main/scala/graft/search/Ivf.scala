package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{nearest_centroids, top_k_rows}

/**
 * IVF (inverted-file) approximate nearest-neighbor search — the
 * partition-pruning scale path next to [[Ann]]'s LSH.
 *
 * Train: deterministic lattice KMeans ([[LatticeKmeans]]) over a bounded
 * seeded corpus sample → nList centroids. Index: each corpus row assigned
 * to its nearest centroid — pure map work
 * ([[graft.expr.NearestCentroids]], centroids ride the plan as a
 * constant). Query: probe the nProbe nearest cells only; ~nProbe/nList of
 * the corpus is scored instead of all of it.
 *
 * Scale shape: cell assignment never shuffles the corpus; the probe join
 * broadcasts (query_id, cell) pairs (≤ |Q|·nProbe rows) onto the assigned
 * corpus, and the per-query top-k is the bounded-heap aggregate (|Q|·k
 * shuffle). Persisting the assigned corpus partitioned BY CELL turns the
 * probe into static partition pruning — the 100 TB plan reads only
 * nProbe/nList of the data.
 */
object Ivf {

  /** Seeded centroids over a bounded sample of the corpus vectors —
    * [[LatticeKmeans]], the deterministic engine-replayable trainer (the
    * earlier MLlib KMeans delegate was retired: k-means‖ init and
    * partition-order float means can't be replayed by an oracle). Needs
    * `idCol` because deterministic sampling orders on a salted md5 of the
    * row id. IVF cells only need a reasonable space partition, not
    * converged clusters — a capped iteration count trains in a fraction
    * of the converged time with equivalent probe recall. */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nList: Int, seed: Long = 42L, sampleN: Int = 2048,
      maxIter: Int = 8): Array[Array[Float]] =
    LatticeKmeans.train(corpus, idCol, vecCol, nList, iters = maxIter,
      sampleN = sampleN, salt = s"graftivf$seed:")

  /** Corpus with its IVF cell id appended (map-side only). Always computes
    * from THESE centroids — a pre-existing `cellCol` (possibly from other
    * centroids) is discarded, never trusted; cell reuse is an explicit
    * caller decision via [[knnJoinIvf]]'s `reuseCellCol`. */
  def assign(corpus: DataFrame, vecCol: String,
      centroids: Array[Array[Float]], cellCol: String = "ivf_cell"): DataFrame =
    corpus.drop(cellCol).withColumn(cellCol,
      element_at(nearest_centroids(col(vecCol), centroids, 1), 1))

  /**
   * Approximate top-k similarity join probing `nProbe` cells per query.
   * Same contract as [[Knn.knnJoin]] minus missed-recall results.
   * Output: query_id, corpus columns (minus vector), score, rank.
   *
   * Probe ROUTING always runs on `queryVec` (float, against the float
   * centroids); SCORING runs `metric` over (`queryScoreCol` or
   * `queryVec`) vs `corpusVec` — the split lets an int8-compressed layout
   * route full-float and score code-vs-code ([[graft.index.IvfCollection]]
   * with `int8 = true`).
   */
  def knnJoinIvf(
      queries: DataFrame, queryId: String, queryVec: String,
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int,
      centroids: Array[Array[Float]],
      nProbe: Int = 4,
      excludeSelf: Boolean = true,
      roundScoreTo: Option[Int] = None,
      reuseCellCol: Boolean = false,
      metric: String = "cosine",
      queryScoreCol: Option[String] = None,
      scorer: Option[(Column, Column) => Column] = None): DataFrame = {
    // reuseCellCol: the caller vouches that corpus.ivf_cell was assigned
    // from EXACTLY these centroids (e.g. IvfCollection persists both
    // together) — skipping the per-row recompute. Never inferred from
    // column presence: a stale/foreign ivf_cell would silently mis-route
    // probes.
    val assigned =
      if (reuseCellCol && corpus.columns.contains("ivf_cell")) corpus
      else assign(corpus, corpusVec, centroids)
    val probes = queries.select(
        col(queryId).as("query_id"),
        col(queryScoreCol.getOrElse(queryVec)).as("__qv"),
        explode(nearest_centroids(col(queryVec), centroids, nProbe)).as("ivf_cell"))
    val scored0 = assigned
      .join(broadcast(probes), Seq("ivf_cell"))
      .withColumn("score", {
        // scorer overrides the named metric — for kernels carrying plan
        // constants (PQ codebooks) that a metric string can't express
        val raw = scorer.fold(Knn.score(metric)(col("__qv"), col(corpusVec))) {
          f => f(col("__qv"), col(corpusVec))
        }
        roundScoreTo.fold(raw)(n => round(raw, n))
      })
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col(corpusId))
      else scored0
    // Vector and cell id excluded from the aggregate payload — scoring /
    // routing inputs, not payload (same pruning rationale as Knn.knnJoin).
    val corpusCols = corpus.columns.toSeq
      .filterNot(c => c == corpusVec || c == "ivf_cell")
    val entry = struct((corpusCols :+ "score").map(col): _*)
    scored
      .groupBy(col("query_id"))
      .agg(top_k_rows(entry, col("score"),
        Knn.tieKeyForced(scored.schema(corpusId).dataType, corpusId), k).as("__tk"))
      .select(Seq(col("query_id"), posexplode(col("__tk")).as(Seq("__pos", "__entry"))): _*)
      .select(col("query_id") +:
        corpusCols.map(n => col(s"__entry.$n")) :+
        col("__entry.score").as("score") :+
        ((col("__pos") + 1).cast("int").as("rank")): _*)
  }
}
