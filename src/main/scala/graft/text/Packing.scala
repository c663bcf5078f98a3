package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for training-data pipelines: assign documents to
 * fixed-token-budget batches so downstream training reads contiguous,
 * budget-sized groups (the "pack short sequences together" step that runs
 * before example serialization).
 *
 * Assignment rule (deterministic, engine-agnostic): within each group,
 * documents are laid out in `orderCol` order and a document starts a new
 * batch whenever the tokens accumulated BEFORE it fill a whole budget —
 * i.e. `batch_id = floor(exclusive_prefix_sum(tokens) / budget)`. A
 * document longer than the budget occupies (at least) its own batch; the
 * exclusive prefix sum keeps the rule a single running-sum window. The
 * division runs in double precision on both engines (bit-identical
 * cross-engine; exact while a group's cumulative token count stays below
 * 2⁵³ — nine petatokens per group, far past any real shard).
 *
 * Scale design: ONE window partitioned by the group columns = one shuffle
 * keyed on the group — each group packs independently in parallel. Packing
 * quality/parallelism trade: more groups (e.g. lang × source × shard) =
 * more parallelism and more padding at group tails; the caller picks the
 * granularity. A global (ungrouped) pack would funnel the corpus through
 * one reducer and is deliberately not offered.
 */
object Packing {

  /** Per-document batch assignment: input columns + `n_tokens` + `batch_id`. */
  def assign(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokenCount: Column, budget: Long): DataFrame = {
    require(groupCols.nonEmpty,
      "packing requires ≥1 group column (a global pack would not scale)")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("batch_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens"))
          .cast("double") / budget).cast("long"))
  }

  /** Packed-batch manifest: one row per (group, batch) with its document
    * count, token total, and id span — the shape a training-shard writer
    * consumes. */
  def batches(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokenCount: Column, budget: Long): DataFrame =
    assign(df, groupCols, orderCol, tokenCount, budget)
      .groupBy((groupCols :+ "batch_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("batch_tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))
}
