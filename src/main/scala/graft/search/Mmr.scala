package graft.search

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
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
 *
 * Id types (r18): integral ids select on the Long key; string ids (the
 * reference's uuid point-id space) on UTF-8 byte order — the same total
 * order as the bounded heap's UTF8String tie-break and DuckDB's binary
 * VARCHAR collation, so a string-keyed run is oracle-replayable with plain
 * `ORDER BY ... id ASC`. Fractional ids refuse loudly (truncation would
 * collide distinct ids), matching [[Knn.tieKeyForced]].
 */
object Mmr {
  private[search] case class Cand[K](qid: K, id: K, rel: Double, vec: Array[Float])
  private[search] case class Picked[K](
      query_id: K, result_id: K, mmr_rank: Int, mmr_score: Double, score: Double)

  /** UTF-8 byte order — identical to UTF8String.compareTo (the heap
    * tie-break) and to DuckDB's binary VARCHAR collation. Scala's default
    * Ordering[String] is UTF-16 unit order, which DIVERGES on
    * supplementary-vs-[U+E000,U+FFFF] code points, so it must not leak in. */
  private[search] val utf8ByteOrder: Ordering[String] = (x: String, y: String) =>
    org.apache.spark.unsafe.types.UTF8String.fromString(x)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))

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
  private[search] def select[K](
      cands: Seq[Cand[K]], k: Int, lambda: Double, ord: Ordering[K]): Seq[Picked[K]] = {
    val sorted = cands.sortWith((a, b) =>
      a.rel > b.rel || (a.rel == b.rel && ord.lt(a.id, b.id)))
    val remaining = scala.collection.mutable.ArrayBuffer(sorted: _*)
    val picked = scala.collection.mutable.ArrayBuffer.empty[Picked[K]]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    while (picked.size < k && remaining.nonEmpty) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
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
        if (m > bestScore ||
            (m == bestScore && bestIdx >= 0 && ord.lt(c.id, remaining(bestIdx).id))) {
          bestScore = m; bestIdx = i
        }
        i += 1
      }
      val c = remaining.remove(bestIdx)
      picked += Picked(c.qid, c.id, picked.size + 1, r6(bestScore), c.rel)
      pickedVecs += c.vec
    }
    picked.toSeq
  }

  /** Keyed selection pass shared by both id types: stage-1 candidates with
    * vectors re-attached, grouped per query, greedily selected. */
  private def selectGrouped[K](withVec: DataFrame, k: Int, lambda: Double,
      ord: Ordering[K])(implicit ce: Encoder[Cand[K]], ke: Encoder[K],
      pe: Encoder[Picked[K]]): DataFrame =
    withVec.as[Cand[K]]
      .groupByKey(_.qid)
      .flatMapGroups((_: K, it: Iterator[Cand[K]]) => select(it.toSeq, k, lambda, ord))
      .toDF()

  /**
   * Diversified top-k: fetch `fetchK` candidates per query by cosine
   * relevance, then greedily pick `k` by MMR with trade-off `lambda`.
   *
   * Output: `query_id`, `result_id`, `mmr_rank` (1-based selection order),
   * `mmr_score` (6-dp), `score` (the stage-1 relevance, 6-dp); id columns
   * keep the input id type (long for integral ids, string for string ids).
   */
  def diversifiedTopK(
      queries: DataFrame, queryId: String, queryVec: String,
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int, lambda: Double, fetchK: Int = 50): DataFrame = {
    require(k >= 1 && fetchK >= k, s"need fetchK >= k >= 1, got k=$k fetchK=$fetchK")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    def kindOf(dt: org.apache.spark.sql.types.DataType): Option[String] = dt match {
      case ByteType | ShortType | IntegerType | LongType => Some("long")
      case StringType => Some("string")
      case _ => None
    }
    // The greedy selector's typed grouping key must match the id family: a
    // fractional id would truncation-collide under a long cast (and before
    // r17 a string id NULL-cast — collapsing every query into one group).
    // Refuse anything but integral/string loudly, and refuse MIXED id
    // families (query long vs corpus string): Cand keys query and result
    // ids in one type, and a silent cross-cast would corrupt either space.
    val kinds = Seq(queryId -> queries.schema(queryId).dataType,
      corpusId -> corpus.schema(corpusId).dataType).map { case (c, dt) =>
      kindOf(dt).getOrElse(throw new IllegalArgumentException(
        s"diversifiedTopK requires integral or string ids; '$c' is ${dt.catalogString}"))
    }
    require(kinds.distinct.size == 1,
      s"diversifiedTopK requires query and corpus ids of one family, got ${kinds.mkString("/")}")
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
    val withVec0 = cands.join(
        corpus.select(col(corpusId).as("result_id"), col(corpusVec).as("__cvec")),
        Seq("result_id"))
    if (kinds.head == "long")
      selectGrouped[Long](withVec0.select(
          col("query_id").cast("long").as("qid"),
          col("result_id").cast("long").as("id"),
          col("score").as("rel"), col("__cvec").as("vec")),
        k, lambda, Ordering.Long)
    else
      selectGrouped[String](withVec0.select(
          col("query_id").as("qid"), col("result_id").as("id"),
          col("score").as("rel"), col("__cvec").as("vec")),
        k, lambda, utf8ByteOrder)
  }
}
