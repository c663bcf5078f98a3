package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Maximal Marginal Relevance diversified retrieval (Carbonell & Goldstein,
 * SIGIR 1998): re-rank a relevance-ordered candidate list so each selected
 * result balances query relevance against redundancy with the results
 * already selected —
 *
 *   MMR(d) = λ·sim(q, d) − (1−λ)·max_{s ∈ S} sim(d, s)
 *
 * selected greedily k times. λ=1 degenerates to plain top-k; λ<1 pushes
 * near-duplicate hits below novel ones — the "don't return five copies of
 * the same boilerplate" mode of a retrieval stack (for a clone-detection
 * corpus the top-k is OFTEN all clones of one file; MMR surfaces distinct
 * clone families instead).
 *
 * Scale shape: stage 1 is [[Knn.knnJoin]]'s broadcast + bounded-heap plan
 * (shuffle ≤ |Q|·fetchK rows); candidate vectors are re-attached by a
 * candidate-sized join (never a second corpus pass — the heap output is the
 * join's probe side); the greedy selection is per-query over ≤ fetchK rows
 * inside `flatMapGroups`, so its state and compute are O(fetchK²) per query
 * regardless of corpus size. The corpus is touched exactly once.
 *
 * Determinism discipline (oracle-comparable): relevance scores are rounded
 * to 6 dp by stage 1; pairwise candidate similarities are floor-quantized
 * to the 1e-6 grid (`floor(x·1e6 + 0.5)/1e6` — pure double arithmetic, so
 * any engine computing on the same doubles agrees exactly); the greedy
 * argmax breaks ties on ascending candidate id. The emitted `mmr_score` is
 * floor-quantized the same way.
 */
object Mmr {
  private[search] case class Cand(qid: Long, id: Long, rel: Double, vec: Array[Float])
  private[search] case class Picked(
      query_id: Long, result_id: Long, mmr_rank: Int, mmr_score: Double, score: Double)

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Double-accumulated cosine over float vectors — the same arithmetic as
    * [[graft.expr.VectorOps.cosine]] (sequential double sums), kept here in
    * plain-array form for the per-group driver-free greedy loop. */
  private[graft] def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    var j = n
    while (j < a.length) { val x = a(j).toDouble; na += x * x; j += 1 }
    j = n
    while (j < b.length) { val y = b(j).toDouble; nb += y * y; j += 1 }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Greedy MMR over one query's candidate list (relevance-ordered input
    * not required; selection scans all remaining candidates each step). */
  private[search] def select(
      cands: Seq[Cand], k: Int, lambda: Double): Seq[Picked] = {
    val remaining = scala.collection.mutable.ArrayBuffer(cands.sortBy(c => (-c.rel, c.id)): _*)
    val picked = scala.collection.mutable.ArrayBuffer.empty[Picked]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    while (picked.size < k && remaining.nonEmpty) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var bestId = Long.MaxValue
      var i = 0
      while (i < remaining.length) {
        val c = remaining(i)
        // True max over the selected set (can be negative for anti-aligned
        // vectors — clamping at 0 would diverge from a SQL MAX twin); the
        // empty set contributes no penalty at all.
        var div = Double.NegativeInfinity
        var s = 0
        while (s < pickedVecs.length) {
          val sim = r6(cosine(c.vec, pickedVecs(s)))
          if (sim > div) div = sim
          s += 1
        }
        val m =
          if (pickedVecs.isEmpty) lambda * c.rel
          else lambda * c.rel - (1.0 - lambda) * div
        if (m > bestScore || (m == bestScore && c.id < bestId)) {
          bestScore = m; bestIdx = i; bestId = c.id
        }
        i += 1
      }
      val c = remaining.remove(bestIdx)
      picked += Picked(c.qid, c.id, picked.size + 1, r6(bestScore), c.rel)
      pickedVecs += c.vec
    }
    picked.toSeq
  }

  /**
   * Diversified top-k: fetch `fetchK` candidates per query by cosine
   * relevance, then greedily pick `k` by MMR with trade-off `lambda`.
   *
   * Output: `query_id`, `result_id`, `mmr_rank` (1-based selection order),
   * `mmr_score` (6-dp), `score` (the stage-1 relevance, 6-dp). Requires
   * integral ids (the shared bounded-heap contract).
   */
  def diversifiedTopK(
      queries: DataFrame, queryId: String, queryVec: String,
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int, lambda: Double, fetchK: Int = 50): DataFrame = {
    require(k >= 1 && fetchK >= k, s"need fetchK >= k >= 1, got k=$k fetchK=$fetchK")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    // The greedy selector's typed grouping keys are Long: a non-integral
    // id would NULL-cast below — collapsing every query into one group
    // and silently returning garbage. Refuse loudly instead (string-id
    // MMR would need a string-keyed Cand; not a reference surface).
    Seq(queryId -> queries.schema(queryId).dataType,
        corpusId -> corpus.schema(corpusId).dataType).foreach { case (c, dt) =>
      require(dt match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
        case _ => false
      }, s"diversifiedTopK requires integral ids; '$c' is ${dt.catalogString}")
    }
    val spark = queries.sparkSession
    import spark.implicits._
    val cands = Knn.knnJoin(
        queries.select(col(queryId), col(queryVec)), queryId, queryVec,
        corpus.select(col(corpusId), col(corpusVec)), corpusId, corpusVec,
        k = fetchK, roundScoreTo = Some(6))
      .select(col("query_id"), col(corpusId).as("result_id"), col("score"))
    // Candidate vectors ride back in via a candidate-sized equi-join (the
    // |Q|·fetchK side probes the corpus; at scale this is an id-lookup
    // join, not a second scoring pass).
    val withVec = cands.join(
        corpus.select(col(corpusId).as("result_id"), col(corpusVec).as("__cvec")),
        Seq("result_id"))
      .select(col("query_id").cast("long").as("qid"),
        col("result_id").cast("long").as("id"),
        col("score").as("rel"), col("__cvec").as("vec"))
      .as[Cand]
    withVec.groupByKey(_.qid)
      .flatMapGroups((_: Long, it: Iterator[Cand]) => select(it.toSeq, k, lambda))
      .toDF()
  }
}
