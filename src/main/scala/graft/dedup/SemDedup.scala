package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.cosine_similarity
import graft.search.Ivf

/**
 * SemDeDup-style cell-bounded semantic deduplication (Abbas et al. 2023,
 * "SemDeDup: Data-efficient learning at web-scale through semantic
 * deduplication"): embeddings are first routed to a cluster cell, then
 * cosine near-dup pairs are mined ONLY inside each cell — never across
 * the corpus. The quadratic pair cost is bounded by the largest cell
 * instead of the corpus: with C balanced cells the work drops from n² to
 * n²/C, and each cell's pair mining is an independent partition-local
 * task — exactly the shape that survives 100 TB, where all-pairs cosine
 * ([[graft.search.Ann.nearDupPairs]]) is dead on arrival and even
 * LSH-global mining ([[graft.search.Ann.nearDupPairsLsh]]) shuffles every
 * bucket collision.
 *
 * Centroids come from the caller: [[Ivf.trainCentroids]] (deterministic lattice KMeans)
 * is the production path; any deterministic seed set (e.g. the embeddings
 * of K fixed documents) works and keeps the operator oracle-checkable
 * cross-engine. Routing reuses [[Ivf.assign]] — one map-side pass, the
 * centroid table rides the plan as a constant.
 *
 * Physical shape: the corpus shuffles ONCE, keyed by cell (each vector
 * rides the exchange once per join side); within a cell the self-join is
 * partition-local. Cells larger than `maxCellSize` are dropped by a
 * sizing pass that shuffles only (cell, count) rows — the same documented
 * recall-for-boundedness trade as every other skew guard in this package
 * (a boilerplate-dominated cell would otherwise explode quadratically).
 * Missed-recall caveat inherent to cell bounding: a pair straddling a
 * cell boundary is never scored; SemDeDup accepts this by design (near
 * duplicates land in the same cell with high probability).
 */
object SemDedup {

  /**
   * Within-cell cosine near-duplicate pairs.
   *
   * @return (cell, id_a, id_b, cosine) with id_a < id_b, cosine ≥
   *         threshold, both ids assigned to `cell`
   */
  def cellNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]],
      threshold: Double,
      maxCellSize: Int = 100000,
      roundScoreTo: Option[Int] = None): DataFrame = {
    val assigned = Ivf.assign(df, vecCol, centroids, "cell")
      .select(col("cell"), col(idCol), col(vecCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Same eager-pair discipline as every miner in this package:
      // DISK_ONLY off the storage floor, and the durable parquet path
      // when spark.graft.checkpointDir is set (preemptible clusters).
      Dedup.eagerPairs(
        pairsPlan(assigned, idCol, vecCol, threshold, maxCellSize, roundScoreTo))
    } finally assigned.unpersist(false)
  }

  /** The lazy mining plan over an already-cell-assigned frame — split out
    * so plan-shape tests can assert the physical join (a cell-keyed
    * equi-join, never a nested-loop/cartesian) before the eager
    * checkpoint hides it behind a LogicalRDD. */
  private[graft] def pairsPlan(
      assigned: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxCellSize: Int,
      roundScoreTo: Option[Int]): DataFrame = {
    val oversized = assigned.groupBy(col("cell")).count()
      .filter(col("count") > maxCellSize).select(col("cell"))
    val capped = assigned.join(broadcast(oversized), Seq("cell"), "left_anti")
    val a = capped.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = capped.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    val raw = cosine_similarity(col("__va"), col("__vb"))
    a.join(b, a("cell") === b("cell") && col("id_a") < col("id_b"))
      .select(a("cell"), col("id_a"), col("id_b"),
        roundScoreTo.fold(raw)(n => round(raw, n)).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** One-call semantic dedup: [[cellNearDupPairs]] →
    * [[Dedup.connectedComponents]] → drop every clustered non-representative
    * (the min-id per component survives). Same anti-join shape as
    * [[Dedup.dropNearDuplicates]]: the duplicate set is the small side, the
    * corpus never shuffles. */
  def dropSemanticDuplicates(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]],
      threshold: Double,
      maxCellSize: Int = 100000): DataFrame = {
    val pairs = cellNearDupPairs(df, idCol, vecCol, centroids, threshold, maxCellSize)
    val comps = Dedup.connectedComponents(df.select(col(idCol)), idCol,
      pairs, "id_a", "id_b")
    val dupes = comps.filter(col("id") =!= col("component")).select(col("id"))
    df.join(dupes, df(idCol) === dupes("id"), "left_anti")
  }
}
