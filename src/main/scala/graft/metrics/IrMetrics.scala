package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's retrieval-evaluation suite, re-expressed as window + hash
 * aggregations (single distributed pass; the reference accumulates these in
 * Python loops per query, `/root/reference/bcb_utils.py:124-279`,
 * `poj_utils.py:130-290`).
 *
 * Inputs are "detailed results": one row per (query, retrieved result) with
 * a rank (1-based, dense per query), a similarity score, and a boolean
 * relevance tag (BCB: retrieved func_id ∈ query's clone set,
 * bcb_utils.py:183; POJ: same class label, poj_utils.py:188).
 *
 * Metric semantics preserved exactly:
 *  - success@k  = fraction of queries with ≥1 relevant result (bcb_utils.py:224-226,255)
 *  - P@k        = hits / k averaged over queries — divided by k even when
 *                 self-exclusion leaves k-1 results (bcb_utils.py:228-230)
 *  - MRR        = mean of 1/rank of first relevant, 0 when none (bcb_utils.py:232-238)
 *  - AP@k       = Σ_relevant (running-precision at its rank) / denominator;
 *                 denominator = min(|ground truth|, k) for BCB
 *                 (bcb_utils.py:250) but plain k for POJ (poj_utils.py:259)
 *                 — both variants kept.
 *  - score-separation stats: per-query avg relevant vs non-relevant score,
 *                 0 (not null) when a side is empty (bcb_utils.py:202-205).
 */
object IrMetrics {

  /** Per-query accumulators. Output: query_id, hits, first_rel_rank,
    * ap_numerator, avg_relevant_score, avg_irrelevant_score,
    * num_relevant_found, num_irrelevant_found. */
  def perQuery(
      detailed: DataFrame,
      queryIdCol: String = "query_id",
      rankCol: String = "rank",
      relCol: String = "is_relevant",
      scoreCol: String = "score"): DataFrame = {
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col(rankCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rel1 = when(col(relCol), 1).otherwise(0)
    detailed
      .withColumn("__cum_rel", sum(rel1).over(w))
      .groupBy(col(queryIdCol))
      .agg(
        sum(rel1).as("hits"),
        min(when(col(relCol), col(rankCol))).as("first_rel_rank"),
        sum(when(col(relCol), col("__cum_rel").cast("double") / col(rankCol))
          .otherwise(lit(0.0))).as("ap_numerator"),
        // Score means run through an exact DECIMAL sum so they are
        // order-independent and bit-identical across engines (callers
        // pre-round scores to ≤6 dp; a plain double avg would depend on
        // partial-aggregation order). Semantics unchanged: mean, 0 when the
        // side is empty (bcb_utils.py:202-205).
        coalesce(sum(when(col(relCol), col(scoreCol)).cast("decimal(28,6)")).cast("double") /
          count(when(col(relCol), col(scoreCol))), lit(0.0)).as("avg_relevant_score"),
        coalesce(sum(when(!col(relCol), col(scoreCol)).cast("decimal(28,6)")).cast("double") /
          count(when(!col(relCol), col(scoreCol))), lit(0.0)).as("avg_irrelevant_score"),
        sum(rel1).as("num_relevant_found"),
        sum(when(!col(relCol), 1).otherwise(0)).as("num_irrelevant_found"))
  }

  /**
   * Global metric row from a perQuery frame. `apDenominator` is the AP@k
   * denominator as a Column over the perQuery frame: `lit(k)` (POJ variant)
   * or `least(col("num_relevant_truth"), lit(k))` (BCB variant, requires
   * that column to be joined on beforehand).
   */
  def global(perQueryDf: DataFrame, k: Int, apDenominator: Column): DataFrame =
    perQueryDf.agg(
      avg(when(col("hits") > 0, 1.0).otherwise(0.0)).as("success_rate"),
      avg(col("hits").cast("double") / k).as("mean_precision_at_k"),
      avg(coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0))).as("mrr"),
      avg(when(apDenominator > 0, col("ap_numerator") / apDenominator)
        .otherwise(lit(0.0))).as("map_at_k"),
      avg(col("avg_relevant_score")).as("avg_relevant_score"),
      avg(col("avg_irrelevant_score")).as("avg_irrelevant_score"))
}
