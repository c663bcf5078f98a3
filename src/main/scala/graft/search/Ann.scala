package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, hyperplane_sig}

/**
 * Approximate nearest-neighbor search over embedding columns — the scale
 * path next to [[Knn]]'s exact broadcast scan.
 *
 * Scheme: sign-random-projection LSH ([[graft.expr.HyperplaneSig]]) with
 * multiple independent tables. A corpus row is a candidate for a query iff
 * their signatures MATCH EXACTLY in at least one table. With b bits per
 * table the collision probability for angle θ is (1-θ/π)^b per table —
 * tune (bits, tables) to the recall/candidate-count target.
 *
 * Physical shape: signatures are computed map-side (8 bytes × tables per
 * row); the candidate join shuffles on (table, signature) — never all
 * pairs; cosine is verified only on candidates; per-query top-k is a rank
 * window on the (small) verified candidate set. At 100 TB the corpus-side
 * signature computation is embarrassingly parallel and the join fan-in per
 * bucket is controlled by the bit width.
 */
object Ann {

  /** (table, signature) bucket rows for a frame — the LSH index. */
  private def bucketed(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int, seed: Long): DataFrame = {
    val bands = array((0 until tables).map { t =>
      struct(lit(t).as("t"),
        hyperplane_sig(col(vecCol), bits, seed + t * 1000003L).as("sig"))
    }: _*)
    df.select(col(idCol), col(vecCol), explode(bands).as("bucket"))
  }

  /**
   * Approximate top-k cosine join: same contract as [[Knn.knnJoin]] but
   * candidates come from LSH buckets instead of the full corpus. Results
   * may miss true neighbors (recall < 1); ranks are over found candidates.
   */
  def knnJoinLsh(
      queries: DataFrame, queryId: String, queryVec: String,
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int,
      bits: Int = 12, tables: Int = 8, seed: Long = 42L,
      excludeSelf: Boolean = true,
      roundScoreTo: Option[Int] = None): DataFrame = {
    val q = bucketed(queries, queryId, queryVec, bits, tables, seed)
      .select(col(queryId).as("query_id"), col(queryVec).as("__qv"), col("bucket"))
    val c = bucketed(corpus, corpusId, corpusVec, bits, tables, seed)
    val cand = q.join(c, Seq("bucket"))
      .select(col("query_id"), col("__qv"), col(corpusId), col(corpusVec))
      .distinct() // collapse multi-table collisions
    val scored0 = cand.withColumn("score", {
      val raw = cosine_similarity(col("__qv"), col(corpusVec))
      roundScoreTo.fold(raw)(n => round(raw, n))
    })
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col(corpusId))
      else scored0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(corpusId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__qv", corpusVec)
  }

  /**
   * Embedding-cosine near-duplicate pairs, exact (all pairs, id_a < id_b,
   * cosine ≥ threshold). O(n²) — oracle/small-set path; [[nearDupPairsLsh]]
   * is the scale path.
   */
  def nearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, roundScoreTo: Option[Int] = None): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    val raw = cosine_similarity(col("__va"), col("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", roundScoreTo.fold(raw)(n => round(raw, n)))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** LSH-bucketed near-dup pairs: candidates from bucket agreement in any
    * table, verified by exact cosine. Same output contract as
    * [[nearDupPairs]] minus missed-recall pairs. */
  def nearDupPairsLsh(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double,
      bits: Int = 12, tables: Int = 8, seed: Long = 42L,
      roundScoreTo: Option[Int] = None): DataFrame = {
    val bk = bucketed(df, idCol, vecCol, bits, tables, seed)
    val cand = bk.as("l").join(bk.as("r"),
        col("l.bucket") === col("r.bucket") && col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        col(s"l.$vecCol").as("__va"), col(s"r.$vecCol").as("__vb"))
      .distinct()
    val raw = cosine_similarity(col("__va"), col("__vb"))
    cand.withColumn("cosine", roundScoreTo.fold(raw)(n => round(raw, n)))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
