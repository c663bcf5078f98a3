package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Universal multi-stage query: prefetch a candidate pool with a CHEAP
 * scoring representation, then rescore only those candidates at full
 * precision — the vector-backend "query with prefetch" surface (a query
 * request nests prefetch sub-requests; the outer stage re-ranks the
 * union of their candidate pools).
 *
 * The canonical instance is matryoshka / refine-style retrieval: stage 1
 * ranks on a head slice (or any derived column — a quantized code, a
 * projection), stage 2 re-ranks the |Q|·prefetchK survivors on the full
 * vector. The expensive representation is touched for CANDIDATES only.
 *
 * Scale shape: stage 1 is [[Knn.knnJoin]]'s broadcast + bounded-heap plan
 * over the cheap column (one corpus pass, shuffle ≤ |Q|·prefetchK rows);
 * stage 2 broadcasts the candidate ids into an equi-join against the
 * full-precision frame (the big scan is probed, not shuffled — the same
 * plan as IVF's codec rescore, `IvfCollection.rescoreExact`) and re-ranks
 * through the bounded heap again. Corpus vectors cross the wire never;
 * candidate rows cross once.
 */
object Query {

  /**
   * Exact re-rank of a prepared candidate set. `candidates` carries
   * (`query_id`, corpus id) pairs from any retriever — a cheap-vector
   * top-k, an IVF probe, a BM25 list, or a union of several such pools
   * (`unionByName` + `dropDuplicates` fuses multi-prefetch branches).
   * Corpus payload is re-attached from `full`, so candidate frames need
   * nothing but the two id columns.
   *
   * Output: `query_id`, all non-vector `full` columns, `score`, `rank`.
   */
  def rescoreExact(
      candidates: DataFrame,
      queries: DataFrame, queryId: String, queryVec: String,
      full: DataFrame, corpusId: String, corpusVec: String,
      k: Int,
      metric: String = "cosine",
      roundScoreTo: Option[Int] = None): DataFrame = {
    val cand = candidates.select(col("query_id"), col(corpusId)).dropDuplicates()
    val qv = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
    val payloadCols = full.columns.toSeq.filterNot(_ == corpusVec)
    val scored = full
      .join(broadcast(cand), Seq(corpusId))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("score", {
        val raw = Knn.score(metric)(col("__qv"), col(corpusVec))
        roundScoreTo.fold(raw)(n => round(raw, n))
      })
    val entry = struct((payloadCols :+ "score").map(col): _*)
    val heapScore = if (Knn.ascending(metric)) -col("score") else col("score")
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.top_k_rows(entry, heapScore,
        Knn.tieKeyForced(scored.schema(corpusId).dataType, corpusId), k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__pos", "__entry")))
      .select(col("query_id") +:
        payloadCols.map(n => col(s"__entry.$n")) :+
        col("__entry.score").as("score") :+
        (col("__pos") + 1).cast("int").as("rank"): _*)
  }

  /**
   * Formula rescoring (the backend's score-boosting query: the rescore
   * stage ranks by an arbitrary FORMULA over the similarity and payload
   * fields — recency decay, category boosts, popularity blending). The
   * similarity is computed exactly as [[rescoreExact]] would (same
   * candidate-broadcast plan, `roundSimTo`-rounded so the formula's
   * input is engine-stable), exposed to `formula` as column `sim`
   * alongside every non-vector `full` column; the formula's value is the
   * final score, ranked DESCENDING (bigger-is-better is the formula
   * contract — fold a distance into the formula with a negation).
   *
   * Scale shape: identical to [[rescoreExact]] — the formula is one more
   * codegen'd projection over the |Q|·|candidates| rescore rows; the
   * corpus is probed by broadcast id join, never shuffled.
   *
   * Output: `query_id`, all non-vector `full` columns, `sim`, `score`
   * (= rounded formula), `rank`.
   */
  def rescoreFormula(
      candidates: DataFrame,
      queries: DataFrame, queryId: String, queryVec: String,
      full: DataFrame, corpusId: String, corpusVec: String,
      k: Int,
      formula: Column,
      metric: String = "cosine",
      roundSimTo: Option[Int] = None,
      roundScoreTo: Option[Int] = None): DataFrame = {
    val cand = candidates.select(col("query_id"), col(corpusId)).dropDuplicates()
    val qv = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
    val payloadCols = full.columns.toSeq.filterNot(_ == corpusVec)
    val scored = full
      .join(broadcast(cand), Seq(corpusId))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("sim", {
        val raw = Knn.score(metric)(col("__qv"), col(corpusVec))
        roundSimTo.fold(raw)(n => round(raw, n))
      })
      .withColumn("score", roundScoreTo.fold(formula)(n => round(formula, n)))
    val entry = struct((payloadCols :+ "sim" :+ "score").map(col): _*)
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.top_k_rows(entry, col("score"),
        Knn.tieKeyForced(scored.schema(corpusId).dataType, corpusId), k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__pos", "__entry")))
      .select(col("query_id") +:
        payloadCols.map(n => col(s"__entry.$n")) :+
        col("__entry.sim").as("sim") :+
        col("__entry.score").as("score") :+
        (col("__pos") + 1).cast("int").as("rank"): _*)
  }

  /**
   * Single-prefetch convenience: rank on `cheapVec(vector)` (applied to
   * BOTH sides) for the top `prefetchK`, rescore those candidates on the
   * full vector for the final `k`.
   *
   * Both stages round to `roundScoreTo` — stage 1's ranking must be
   * reproducible too, because it decides WHICH candidates reach stage 2.
   */
  def prefetchRescore(
      queries: DataFrame, queryId: String, queryVec: String,
      corpus: DataFrame, corpusId: String, corpusVec: String,
      cheapVec: Column => Column,
      prefetchK: Int, k: Int,
      excludeSelf: Boolean = true,
      prefetchMetric: String = "cosine",
      metric: String = "cosine",
      roundScoreTo: Option[Int] = None): DataFrame = {
    // prefetchK < k is allowed (mirrors the backend API: the pool bounds
    // the output — each query surfaces at most prefetchK rows).
    require(prefetchK >= 1, s"need prefetchK >= 1, got $prefetchK")
    val cheapQ = queries.select(col(queryId), cheapVec(col(queryVec)).as(queryVec))
    val cheapC = corpus.select(col(corpusId), cheapVec(col(corpusVec)).as(corpusVec))
    val candidates = Knn.knnJoin(
        cheapQ, queryId, queryVec, cheapC, corpusId, corpusVec,
        k = prefetchK, excludeSelf = excludeSelf, metric = prefetchMetric,
        roundScoreTo = roundScoreTo)
      .select(col("query_id"), col(corpusId))
    rescoreExact(candidates, queries, queryId, queryVec,
      corpus, corpusId, corpusVec, k, metric, roundScoreTo)
  }
}
