package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.top_k_rows
import graft.text.TextAnalysis

/**
 * BM25 full-text retrieval (Robertson/Sparck-Jones probabilistic ranking,
 * the Okapi BM25 formulation) — the lexical complement to the vector
 * search stack, and one half of hybrid retrieval ([[Hybrid]]).
 *
 * score(q,d) = Σ_{t ∈ distinct(q)} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
 * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
 *
 * Scale shape:
 *  - per-(doc, term) TF comes from one explode + hash aggregate with
 *    map-side combine; `dl` rides the grouping as a per-doc-constant key,
 *    so no separate doc-length join ever happens.
 *  - corpus statistics are two scalars (N, avgdl) from one agg; the
 *    per-term DF table is vocab-sized but is immediately semi-joined to
 *    the QUERY term set (|Q|·terms-per-query rows) and the result
 *    broadcasts — the TF stream is never shuffled again.
 *  - per-(query, doc) summation and the final top-k run through the same
 *    bounded-heap aggregate as the vector kNN: shuffle ≤ |Q|·k rows.
 *
 * Cross-engine float discipline (same contract as the cosine oracles):
 * the IDF — the only transcendental — is deterministic by construction:
 * its argument is the integer ratio (2N+2)/(2df+1), so ln goes through
 * [[graft.expr.DetMath.log2q20]] (engine-stable q20 fixed-point log2)
 * scaled by the ln-2 double literal — every step is a correctly-rounded
 * IEEE op, bit-identical in any engine — then 6-dp floor-quantized.
 * Downstream term products are exact-rational functions of that 6-dp
 * value; per-pair sums run over DECIMAL(28,12) so partial-aggregation
 * order cannot perturb the result. The DuckDB twin (`bm25_topk`)
 * reproduces the scores cell-exactly.
 */
object Bm25 {

  /**
   * Top-`k` BM25 matches per query. `queries` carries raw text — each
   * query's DISTINCT tokens are matched against the corpus.
   * Output: query_id, doc id column, `score`, `rank`.
   *
   * Self-contained: re-runs the corpus tokenize+TF kernel (and scopes it in
   * a MEMORY_AND_DISK persist) on EVERY call. Right for one-shot retrieval
   * at moderate scale; a retrieval service — and anything at 100 TB — should
   * build a [[graft.index.Bm25Index]] once and query the artifact instead.
   */
  def search(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = true,
      roundScoreTo: Option[Int] = None): DataFrame = {
    val tf = tfFrame(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (n, totalTokens) = corpusStats(docs, textCol)
      val avgdl = totalTokens.toDouble / n
      // DF only for terms some query mentions: the semi-join shrinks the
      // vocab-sized aggregate to |query terms| before it broadcasts.
      val queryTerms = queries.select(
        explode(array_distinct(TextAnalysis.tokens(col(queryTextCol)))).as("__t"))
      val dfTable = tf.join(queryTerms.distinct(), Seq("__t"), "left_semi")
        .groupBy(col("__t")).agg(count(lit(1)).as("__df"))
      // eager: the result must materialize while tf is still persisted
      // (scoped-persist pattern; the index path stays lazy — its inputs
      // are durable parquet, nothing to scope). Plain localCheckpoint,
      // deliberately NOT the durable mode: the frame is |Q|·k
      // OUTPUT-sized — never corpus-scale — and the exposure window ends
      // when the caller consumes it; a preemption re-runs one query, not
      // a multi-hour job.
      scoreTf(tf, dfTable, n, avgdl, queries, queryIdCol, queryTextCol,
        k, k1, b, excludeSelf, roundScoreTo, idCol)
        .localCheckpoint(true)
    } finally tf.unpersist(false)
  }

  /** The per-(doc, term) TF frame `(__d, __dl, __t, __tf)`: dl is constant
    * per doc, so it rides the TF aggregate as a grouping key — no separate
    * doc-length join ever exists. */
  private[graft] def tfFrame(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("__d"),
        TextAnalysis.tokenCount(col(textCol)).as("__dl"),
        explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .groupBy(col("__d"), col("__dl"), col("__t"))
      .agg(count(lit(1)).as("__tf"))

  /** (N, total tokens) — two scalars from one agg; metadata-sized collect. */
  private[graft] def corpusStats(docs: DataFrame, textCol: String): (Long, Long) = {
    val statsRow = docs
      .agg(count(lit(1)),
        coalesce(sum(TextAnalysis.tokenCount(col(textCol))), lit(0L)))
      .head()
    (statsRow.getLong(0), statsRow.getLong(1))
  }

  /** BM25 scoring over a prepared TF frame — THE shared kernel between the
    * self-contained [[search]] and the persisted
    * [[graft.index.Bm25Index]], so both paths are output-identical (and
    * share one oracle). `dfTable` is `(__t, __df)` covering at least every
    * query term. */
  private[graft] def scoreTf(
      tf: DataFrame, dfTable: DataFrame, n: Long, avgdl: Double,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double, b: Double,
      excludeSelf: Boolean, roundScoreTo: Option[Int],
      outIdCol: String): DataFrame = {
    val r6: Column => Column = graft.functions.round6 // the one wire rounding
    val queryTerms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col(queryTextCol)))).as("__t"))
    // idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) = ln((2N+2)/(2df+1)):
    // an integer ratio, so the log runs through the engine-stable q20
    // kernel; the ÷2²⁰ is an exact power-of-two step and the ×ln2 literal
    // is one correctly-rounded multiply — identical bits in any engine.
    val qidf = queryTerms.join(dfTable, Seq("__t"))
      .withColumn("__idf",
        r6((graft.expr.DetMath.log2q20(
            lit(2L * n + 2L), col("__df") * lit(2L) + lit(1L)).cast("double") /
          lit(1048576.0d)) * lit(0.6931471805599453d)))
      .select(col("query_id"), col("__t"), col("__idf"))
    // Each term contribution is floor-quantized to the 1e-12 grid BEFORE
    // the DECIMAL cast: the pre-cast double then sits within an ulp of a
    // grid point, where Spark's shortest-string HALF_UP and DuckDB's
    // exact-binary double→decimal conversions provably agree (a raw
    // full-mantissa double can straddle a 0.5e-12 midpoint, where they
    // don't). The DECIMAL sum then makes partial-agg order irrelevant.
    val raw = col("__idf") * col("__tf") * lit(k1 + 1.0) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / lit(avgdl)))
    val contrib = tf.join(broadcast(qidf), Seq("__t"))
      .withColumn("__c",
        (floor(raw * lit(1e12) + lit(0.5)) / lit(1e12)).cast("decimal(28,12)"))
    val scored0 = contrib
      .groupBy(col("query_id"), col("__d"))
      .agg(sum(col("__c")).cast("double").as("__s"))
    // floor-based rounding, NOT round(): the DECIMAL-summed score is an
    // exact 12-dp decimal that CAN sit exactly on a 0.5e-6 boundary,
    // where Spark's HALF_UP and DuckDB's exact-binary round() diverge —
    // the structural case r6 exists for.
    val scored = (if (excludeSelf) scored0.filter(col("query_id") =!= col("__d"))
      else scored0)
      .withColumn("score", roundScoreTo.fold(col("__s")) { p =>
        val m = math.pow(10.0, p)
        floor(col("__s") * lit(m) + lit(0.5)) / lit(m)
      })
    // Heap tie-break by id type (shared rule: Knn.tieKeyFor) — integral
    // ids cast to long, string (uuid) ids compare as UTF8String bytes
    // inside the heap; only fractional ids, whose truncating cast could
    // collide two docs, fall back to a rank window ordered by
    // (score desc, id asc), correct for any orderable id type.
    val tieKey = Knn.tieKeyFor(scored.schema("__d").dataType, "__d")
    if (tieKey.isDefined) {
      scored
        .groupBy(col("query_id"))
        .agg(top_k_rows(struct(col("__d"), col("score")),
          col("score"), tieKey.get, k).as("__tk"))
        .select(col("query_id"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
        .select(col("query_id"), col("__e.__d").as(outIdCol),
          col("__e.score").as("score"),
          (col("__pos") + 1).cast("int").as("rank"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("__d").asc)
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("__d").as(outIdCol),
          col("score"), col("rank").cast("int").as("rank"))
    }
  }
}
