package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sparse-vector top-k retrieval: documents and queries carry
 * `(indices: array<int>, values: array<float>)` pairs and score by sparse
 * dot product `Σ_{i ∈ both} q[i]·d[i]` — the vector-backend surface for
 * learned-sparse embeddings (SPLADE-style term weights), complementing
 * [[Bm25]] (statistical lexical ranking) and dense [[Knn]]. BM25 covers
 * ranked keyword retrieval; this covers models that EMIT sparse weight
 * vectors as data.
 *
 * Scale shape (the BM25 contribution-join applied to generic components):
 *  - the query side is small by contract → its exploded (query, index,
 *    value) triples BROADCAST; the corpus explodes streaming and is never
 *    shuffled by the join.
 *  - only components whose index appears in some query survive the join —
 *    corpus components outside the query support cost one broadcast-hash
 *    probe each, no materialization.
 *  - per-(query, doc) summation and the top-k cut run through the same
 *    bounded-heap aggregate as the dense path: shuffle ≤ |Q|·k rows.
 *  - documents sharing NO index with a query score 0 and are absent from
 *    the output (they could never enter a meaningful top-k).
 *
 * Cross-engine float discipline: each component product is computed in
 * double (float inputs upcast exactly), floor-quantized to the 1e-12 grid,
 * and DECIMAL(28,12)-summed so partial-aggregation order cannot perturb
 * the result; the final score uses the same floor-based rounding as
 * [[Bm25]] (a DECIMAL sum can sit exactly on a 0.5e-6 boundary where
 * HALF_UP engines diverge).
 */
object Sparse {

  /**
   * For each query, the top-`k` documents by sparse dot product.
   * Output: `query_id`, `outIdCol`, `score`, `rank`.
   */
  def knn(
      docs: DataFrame, idCol: String, idxCol: String, valCol: String,
      queries: DataFrame, queryIdCol: String, queryIdxCol: String,
      queryValCol: String,
      k: Int,
      excludeSelf: Boolean = true,
      roundScoreTo: Option[Int] = None,
      outIdCol: String = "result_id"): DataFrame = {
    val q = exploded(queries, queryIdCol, queryIdxCol, queryValCol, "query_id", "__qv")
    val d = exploded(docs, idCol, idxCol, valCol, "__doc", "__dv")
    val contrib = d.join(broadcast(q), Seq("__i"))
      .withColumn("__c",
        (floor(col("__qv").cast("double") * col("__dv").cast("double") *
          lit(1e12) + lit(0.5)) / lit(1e12)).cast("decimal(28,12)"))
    val scored0 = contrib
      .groupBy(col("query_id"), col("__doc"))
      .agg(sum(col("__c")).cast("double").as("__s"))
    val scored = (if (excludeSelf) scored0.filter(col("query_id") =!= col("__doc"))
      else scored0)
      .withColumn("score", roundScoreTo.fold(col("__s")) { p =>
        val m = math.pow(10.0, p)
        floor(col("__s") * lit(m) + lit(0.5)) / lit(m)
      })
      .select(col("query_id"), col("__doc").as("result_id"), col("score"))
    Hybrid.topKPerQuery(scored, k)
      .select(col("query_id"), col("result_id").as(outIdCol),
        col("score"), col("rank"))
  }

  /** `(id, index, value)` triples from parallel (indices, values) arrays.
    * Defensive zip: mismatched array lengths would silently mis-pair
    * components, so they fail loudly instead. */
  private def exploded(df: DataFrame, idCol: String, idxCol: String,
      valCol: String, outId: String, outVal: String): DataFrame =
    df
      // assert_true rides INSIDE the projected id so column pruning can
      // never optimize the check away (arrays_zip would silently null-pad
      // a length mismatch otherwise)
      .select(
        when(assert_true(size(col(idxCol)) === size(col(valCol)),
          lit(s"sparse vector arity mismatch: $idxCol and $valCol lengths differ")).isNull,
          col(idCol)).as(outId),
        explode(arrays_zip(col(idxCol).as("__i"), col(valCol).as("__v"))).as("__e"))
      .select(col(outId), col("__e.__i").as("__i"), col("__e.__v").as(outVal))

  /** Sparsify a dense `array<float>` column into 1-based `(indices,
    * values)` arrays keeping components with `|v| >= threshold` — the
    * bridge from dense embeddings to the sparse search surface (and the
    * construction the `sparse_knn` oracle mirrors in SQL). */
  def sparsify(vec: Column, threshold: Double): (Column, Column) = {
    val idxs = filter(sequence(lit(1), size(vec)),
      i => abs(element_at(vec, i)) >= lit(threshold))
    (idxs, transform(idxs, i => element_at(vec, i)))
  }
}
