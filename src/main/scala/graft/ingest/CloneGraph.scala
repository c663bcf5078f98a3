package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Clone ground-truth graph build (SURVEY A1): from a table of undirected
 * clone pairs, the symmetrized adjacency — each id with the distinct sorted
 * set of its clone partners.
 *
 * Reference: `create_clone_mappings` builds a `dict[int,set[int]]` by
 * inserting both directions of every pair (`/root/reference/bcb_utils.py:24-33`).
 *
 * Spark shape: UNION ALL of both directions, then one hash aggregation
 * (partial map-side combine is free). Scale: the only shuffle is the groupBy
 * on id; the output per key is bounded by the max clone-family size, not by
 * |pairs|, so no skew blowup unless one id participates in a huge family —
 * at which point AQE skew handling or a two-level (salted) collect applies.
 * The array is sorted for deterministic, engine-comparable output.
 */
object CloneGraph {

  /** (a, b) pairs → (id, clones: sorted distinct array). */
  def adjacency(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val fwd = pairs.select(col(aCol).as("id"), col(bCol).as("other"))
    val bwd = pairs.select(col(bCol).as("id"), col(aCol).as("other"))
    fwd.unionAll(bwd)
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("other"))).as("clones"))
  }

  /** Adjacency plus the family size — the BCB MAP@k denominator input
    * (`min(|clones|, k)`, bcb_utils.py:250). */
  def adjacencyWithCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    adjacency(pairs, aCol, bCol)
      .withColumn("num_clones", size(col("clones")))

  /**
   * Skew-resistant adjacency: two-level collect for corpora where one id
   * participates in a huge clone family (a hub key would otherwise funnel
   * its whole neighbor set through one reducer). Level 1 collects per
   * (id, salt) — spreading a hub's neighbors over `saltBuckets` reducers —
   * level 2 merges the (far fewer, pre-deduped) partial sets. Same output
   * contract as [[adjacency]].
   */
  def adjacencySalted(pairs: DataFrame, aCol: String, bCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val fwd = pairs.select(col(aCol).as("id"), col(bCol).as("other"))
    val bwd = pairs.select(col(bCol).as("id"), col(aCol).as("other"))
    fwd.unionAll(bwd)
      .withColumn("__salt", pmod(hash(col("other")), lit(saltBuckets)))
      .groupBy(col("id"), col("__salt"))
      .agg(collect_set(col("other")).as("__partial"))
      .groupBy(col("id"))
      .agg(sort_array(array_distinct(flatten(collect_list(col("__partial")))))
        .as("clones"))
  }
}
