package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Token-budget corpus selection: keep the best documents (by a quality
 * key, descending) whose running token total stays within a fixed budget —
 * the "data selection under a token budget" step of a training-data
 * pipeline (pick the top-quality slice that fits the planned token count).
 *
 * The naive formulation is a running sum over a GLOBAL order
 * (`sum(tokens) over (order by quality desc, id)`), which Spark executes
 * as a single-partition window — the exact anti-pattern this engine's
 * plan guards exist to catch. This implementation computes the SAME
 * inclusive-prefix-sum cutoff exactly, in two bounded phases:
 *
 *  1. *Bucket pass*: quantize the quality key to its 6-dp fixed-point
 *     integer (the repo's wire rounding, so bucket boundaries coincide
 *     with the oracle's rounded values) and hash-aggregate per-bucket
 *     token sums — one shuffle whose output is at most 10⁶+1 rows
 *     REGARDLESS of corpus size (quality ∈ [0,1] at 6 dp), so the
 *     cumulative sweep over the sorted bucket table is a bounded
 *     single-partition window over ≤10⁶ rows, not over the corpus.
 *  2. *Selection pass*: ONE more corpus scan broadcast-joins each row to
 *     its bucket's decision (`__before` = tokens consumed by strictly
 *     better buckets), prunes rows whose bucket cannot contribute
 *     (neither fully inside the budget nor straddling it), and applies
 *     the in-bucket running sum over a window PARTITIONED by the bucket
 *     key (ordered by id). The window's input is only the candidate rows
 *     — roughly budget-sized, never the corpus — and the global
 *     prefix-sum rule decomposes exactly as `__before + run ≤ budget`
 *     for EVERY row (for a fully-fitting bucket, run ≤ bucket-sum, so
 *     the inequality holds automatically; for the one straddling bucket
 *     it is the fine cutoff).
 *
 * A document is selected iff its inclusive running total over the order
 * (quality desc, id asc) is ≤ `budget` — bit-identical to the naive
 * global-window definition (ties inside a bucket are broken by id; buckets
 * never split ties because equal rounded quality means equal bucket).
 * Total cost: two corpus scans (bucket stats + selection), one bounded
 * broadcast, one candidate-sized shuffle — no corpus-sized global window
 * at any scale.
 */
object Selection {

  private val Fp = 1000000L // 6-dp fixed point — matches the oracle wire rounding

  /**
   * @param docs     one row per document
   * @param quality  sort key in [0, 1] (higher = better), e.g.
   *                 [[TextAnalysis.qualityScore]]; quantized to 6 dp
   * @param tokens   per-document token count column (non-negative)
   * @param budget   inclusive token budget
   * @return (id, quality, n_tokens) of the selected documents — quality is
   *         the 6-dp rounded value the ordering used
   */
  def tokenBudgetSelect(
      docs: DataFrame, idCol: String,
      quality: Column, tokens: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      col(idCol).as("id"),
      floor(quality * lit(Fp) + lit(0.5)).cast("long").as("__qb"),
      tokens.cast("long").as("n_tokens"))

    // Phase 1: per-bucket sums, then the bounded cumulative sweep. The
    // single-partition window is over the BUCKET table (≤ Fp+1 rows by
    // construction), which is also why the decision frame below may ride
    // a broadcast join.
    val buckets = base.groupBy(col("__qb")).agg(sum(col("n_tokens")).as("__bt"))
    val sweep = Window.orderBy(col("__qb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val decided = buckets
      .withColumn("__cum", sum(col("__bt")).over(sweep))
      .select(col("__qb"), (col("__cum") - col("__bt")).as("__before"),
        col("__cum"))

    // Phase 2: one selection scan. Candidate buckets either fit entirely
    // (__cum ≤ budget) or straddle the cutoff (__before < budget < __cum);
    // everything else is pruned before the window, so the fine prefix sum
    // runs over ~budget-sized input partitioned by the bucket key.
    val fine = Window.partitionBy(col("__qb")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(decided), Seq("__qb"))
      .filter(col("__cum") <= budget || col("__before") < budget)
      .withColumn("__run", sum(col("n_tokens")).over(fine))
      .filter(col("__before") + col("__run") <= budget)
      .select(col("id"),
        (col("__qb").cast("double") / lit(Fp.toDouble)).as("quality"),
        col("n_tokens"))
  }
}
