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
 * row); the candidate join and the multi-table dedup shuffle carry ONLY
 * (id, bucket) / (id, id) rows — embedding vectors never ride a shuffle.
 * Vectors are joined back onto the deduplicated candidate set: in
 * [[knnJoinLsh]] AQE sizes the candidate join at runtime (broadcast when
 * the set is small — the common case — shuffle join when buckets
 * degenerate, instead of an OOM); in [[nearDupPairsLsh]] the rejoin
 * shuffles vectors once per side, keyed by id — bounded by corpus size,
 * not by candidate multiplicity.
 */
object Ann {

  /** (id, bucket) rows per table — the LSH index. Ids only: vectors are
    * deliberately NOT carried here (they would multiply by `tables` and
    * ride every downstream shuffle). */
  private def bucketedIds(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int, seed: Long): DataFrame = {
    val bands = array((0 until tables).map { t =>
      struct(lit(t).as("t"),
        hyperplane_sig(col(vecCol), bits, seed + t * 1000003L).as("sig"))
    }: _*)
    df.select(col(idCol), explode(bands).as("bucket"))
  }

  /**
   * Approximate top-k cosine join: same contract as [[Knn.knnJoin]] but
   * candidates come from LSH buckets instead of the full corpus. Results
   * may miss true neighbors (recall < 1); ranks are over found candidates.
   *
   * Output: `query_id`, all corpus columns except the vector, `score`,
   * `rank`.
   */
  def knnJoinLsh(
      queries: DataFrame, queryId: String, queryVec: String,
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int,
      bits: Int = 12, tables: Int = 8, seed: Long = 42L,
      excludeSelf: Boolean = true,
      roundScoreTo: Option[Int] = None,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val qb = bucketedIds(queries, queryId, queryVec, bits, tables, seed)
      .select(col(queryId).as("query_id"), col("bucket"))
    val cb0 = bucketedIds(corpus, corpusId, corpusVec, bits, tables, seed)
      .select(col(corpusId).as("__cand_id"), col("bucket"))
    // Optional skew guard (same shape as Dedup.minHashNearDups): a
    // degenerate bucket — many identical or all-zero vectors sharing a
    // signature — multiplies candidates quadratically. Corpus rows in
    // buckets above maxBucketSize lose candidacy via those buckets only
    // (they can still collide with a query in their other tables). OPT-IN
    // (default no cap) because a region denser than the cap in EVERY table
    // would return zero neighbors for its queries — for pair MINING that
    // is a documented recall trade, for top-k SEARCH it is silent result
    // loss; callers choose. The sizing pass shuffles (bucket, count) only.
    val cb =
      if (maxBucketSize == Int.MaxValue) cb0
      else {
        val oversized = cb0.groupBy(col("bucket")).count()
          .filter(col("count") > maxBucketSize).select(col("bucket"))
        cb0.join(broadcast(oversized), Seq("bucket"), "left_anti")
      }
    // Ids-only candidate generation: the (bucket) join and the distinct
    // (multi-table collision collapse) move 16-byte rows.
    val cand = qb.join(cb, Seq("bucket"))
      .select(col("query_id"), col("__cand_id"))
      .distinct()
    val qv = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
    // Candidates are |Q|·avgCollisions — small in the common case, so AQE
    // picks a broadcast join from the RUNTIME size; deliberately NOT a
    // broadcast() hint, so a degenerate candidate set (dense buckets, low
    // bits) degrades to a shuffle join instead of OOMing the driver. The
    // query-vector side is |Q|-bounded by contract and keeps the hint.
    val scored0 = corpus
      .join(cand, col(corpusId) === col("__cand_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("score", {
        val raw = cosine_similarity(col("__qv"), col(corpusVec))
        roundScoreTo.fold(raw)(n => round(raw, n))
      })
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col(corpusId))
      else scored0
    // Per-query cut through the bounded heap (r17): the candidate set is
    // |Q|·avgCollisions — usually small, but dense buckets can blow it up
    // to corpus-scale, and a rank window would shuffle ALL of it; the
    // heap keeps ≤ k rows per query map-side (same routing rule as
    // Knn.knnJoin — integral/string ids; fractional ids keep the window).
    Knn.tieKeyFor(corpus.schema(corpusId).dataType, corpusId) match {
      case Some(tie) =>
        val corpusCols = corpus.columns.toSeq.filterNot(_ == corpusVec)
        val entry = struct((corpusCols :+ "score").map(col): _*)
        scored
          .groupBy(col("query_id"))
          .agg(graft.functions.top_k_rows(entry, col("score"), tie, k).as("__tk"))
          .select(col("query_id"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
          .select(col("query_id") +:
            corpusCols.map(n => col(s"__e.$n")) :+
            col("__e.score").as("score") :+
            (col("__pos") + 1).cast("int").as("rank"): _*)
      case None =>
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col(corpusId).asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .drop("__qv", "__cand_id", corpusVec)
    }
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
    val bk = bucketedIds(df, idCol, vecCol, bits, tables, seed)
    // Ids-only candidate pairs, deduplicated across tables BEFORE any
    // vector is touched.
    val cand = bk.as("l").join(bk.as("r"),
        col("l.bucket") === col("r.bucket") && col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
    // Vectors join back once per side, keyed by id — the shuffle carries
    // each corpus vector at most once, not once per colliding pair.
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    val raw = cosine_similarity(col("__va"), col("__vb"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cosine", roundScoreTo.fold(raw)(n => round(raw, n)))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
