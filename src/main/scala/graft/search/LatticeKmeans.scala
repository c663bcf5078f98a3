package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.bench.Sampling

/**
 * Deterministic, engine-replayable KMeans on the 2⁻²⁰ integer lattice —
 * the IVF centroid trainer that graduates the recall family from
 * rows-only driver checks to full DuckDB oracles (the BPE playbook:
 * bounded seeded driver-side training whose every step is exact integer
 * arithmetic, replayed in SQL as materialized per-round CTEs).
 *
 * Why not MLlib KMeans: k-means‖ initialization draws weighted random
 * samples whose order depends on the physical partitioning, and its
 * distributed float mean accumulates in partition order — neither is
 * expressible as deterministic SQL. This trainer instead:
 *
 *  1. samples `sampleN` vectors in salted-md5 order ([[Sampling.seeded]],
 *     the engine-portable convention every oracle already replays) —
 *     BOUNDED at any corpus size, so the driver collect is O(sampleN·dim)
 *     regardless of scale (same shape as BPE's 200-doc training sample);
 *  2. quantizes each component to the 2⁻²⁰ lattice:
 *     `q = floor(v·2²⁰ + 0.5)` over the exact float→double value —
 *     replayed as `CAST(FLOOR(x*1048576 + 0.5) AS BIGINT)`;
 *  3. initializes with the first k DISTINCT lattice vectors in sample
 *     order (Forgy on the deterministic order);
 *  4. runs `iters` Lloyd rounds entirely in Long arithmetic: assignment
 *     is argmin of the exact integer squared L2 (ties → lowest cell id),
 *     the new centroid is the round-half-up mean computed with a
 *     POSITIVE-OFFSET truncating division — `(2s + n + 2n·2²²)/(2n) − 2²²`
 *     — because DuckDB's `//` truncates toward zero while Java's
 *     `Math.floorDiv` floors; shifting the numerator positive makes
 *     truncation = floor in both engines. Empty cells keep their previous
 *     centroid (no re-seeding — re-seeding needs an RNG, RNGs don't
 *     replay);
 *  5. returns centroids as floats: lattice/2²⁰ is a dyadic rational with
 *     ≤24 significant bits, EXACTLY representable in float32, so the
 *     cosine probe routing ([[graft.expr.NearestCentroids]]) computes the
 *     same doubles as `list_inner_product` over `cell_lattice/1048576.0`
 *     in SQL.
 *
 * Cell quality: Forgy init + 8 Lloyd rounds on a 2048-vector sample is
 * not a converged clustering — IVF cells only need a reasonable space
 * partition (the same argument `Ivf.trainCentroids` made for capping
 * MLlib at 8 iterations), and the recall floors assert the quality gate
 * at execution time. Lattice quantization error (2⁻²¹ per component) is
 * orders below the cell-boundary scale.
 *
 * Scale shape: one narrow TakeOrderedAndProject scan (per-partition
 * top-n, no full sort) + an O(sampleN·k·dim·iters) driver loop (~17M
 * long ops at the defaults — microseconds). The corpus itself is never
 * collected.
 */
object LatticeKmeans {
  /** Lattice denominator 2²⁰ — fine enough that quantization error is
    * negligible vs cell geometry, coarse enough that |q| < 2²⁴ keeps
    * lattice/2²⁰ exact in float32 and dist² sums far from Long overflow. */
  val Scale = 1048576L

  private val Off = 1L << 22 // positive-offset for the truncating-div mean

  val defaultSalt = "graftivf42:"

  /** `floor(v·2²⁰ + 0.5)` per component, over the exact double value of
    * the float — the SQL twin is `CAST(FLOOR(x*1048576 + 0.5) AS BIGINT)`
    * on `CAST(embedding AS DOUBLE[])`. */
  def quantize(v: Array[Float]): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) {
      out(i) = math.floor(v(i).toDouble * Scale + 0.5).toLong
      i += 1
    }
    out
  }

  /** Round-half-up mean of a Long sum, identical under Scala `/` and
    * DuckDB `//` (both truncate; the offset keeps the numerator
    * positive, where truncation IS floor). */
  @inline private def roundedMean(s: Long, n: Long): Long =
    (2 * s + n + 2 * n * Off) / (2 * n) - Off

  /** Train k centroids; returns exact-in-float32 dyadic centroids for
    * [[Ivf.knnJoinIvf]] / [[graft.index.IvfCollection]]. Fewer than k
    * centroids come back when the sample has fewer distinct lattice
    * points. */
  def train(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 8, sampleN: Int = 2048,
      salt: String = defaultSalt): Array[Array[Float]] =
    trainLattice(corpus, idCol, vecCol, k, iters, sampleN, salt)
      .map(_.map(c => (c.toDouble / Scale).toFloat))

  /** The raw lattice centroids (exposed for specs and the SQL-twin
    * cross-check). */
  private[graft] def trainLattice(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, sampleN: Int, salt: String): Array[Array[Long]] = {
    require(k > 0 && iters >= 0 && sampleN >= k,
      s"need sampleN >= k > 0, iters >= 0; got k=$k iters=$iters sampleN=$sampleN")
    lloyd(sampleLattice(corpus, idCol, vecCol, sampleN, salt), k, iters)
  }

  /** The bounded seeded sample as quantized lattice vectors, in salted-md5
    * order (one narrow TakeOrderedAndProject scan; collect preserves the
    * sort). Shared by [[train]] and [[Pq.trainCodebooks]] — PQ slices the
    * same lattice sample into subspaces (quantization is per-component,
    * so slicing commutes with it). */
  private[graft] def sampleLattice(
      corpus: DataFrame, idCol: String, vecCol: String,
      sampleN: Int, salt: String): Array[Array[Long]] = {
    val rows = Sampling.seeded(
        corpus.select(col(idCol), col(vecCol).as("__v")), idCol, sampleN, salt)
      .select(col("__v")).collect()
    val qs = rows.map { r =>
      require(!r.isNullAt(0),
        s"$vecCol: NULL vector in the training sample — the deterministic " +
          "sample is id-ordered, so a null cannot be silently skipped " +
          "without diverging from the SQL replay; filter nulls upstream")
      val q = quantize(r.getSeq[Float](0).toArray)
      // Loud-failure input-domain bound (same style as the NULL/ragged
      // checks): roundedMean's truncation-equals-floor trick needs its
      // numerator 2s + n + 2n·2²² positive, i.e. every mean lattice value
      // > −2²² (components > −4.0), and the Long-overflow / float32-
      // exactness margins assume |q| < 2²⁴. Components outside [−4, 4)
      // would not crash — they would SILENTLY break the cross-engine
      // replay contract (Scala `/` and DuckDB `//` diverge on negative
      // numerators), which is strictly worse. Embeddings are unit-norm or
      // near it in every supported pipeline, so the bound is free. The
      // domain is the open interval (-4, 4): ±4.0 exactly quantizes to
      // ±2²², the first point the margins no longer cover.
      var ci = 0
      while (ci < q.length) {
        require(math.abs(q(ci)) < (1L << 22),
          s"$vecCol: component ${q(ci).toDouble / Scale} is outside the " +
            "lattice trainer's replayable domain (-4, 4) — the exact-" +
            "integer mean offset trick breaks silently beyond it; " +
            "normalize or rescale the embeddings upstream")
        ci += 1
      }
      q
    }
    qs.headOption.foreach { h =>
      require(qs.forall(_.length == h.length),
        s"$vecCol: ragged vector dims in the training sample " +
          s"(expected ${h.length}) — mixed-dim corpora cannot share one " +
          "centroid table")
    }
    qs
  }

  /** Forgy init + `iters` exact-integer Lloyd rounds over in-memory
    * lattice points (the driver-side training core; bounded by
    * construction — points come from [[sampleLattice]]). */
  private[graft] def lloyd(
      qs: Array[Array[Long]], k: Int, iters: Int): Array[Array[Long]] = {
    if (qs.isEmpty) return Array.empty
    val dim = qs(0).length

    // Forgy init on the deterministic order: first k distinct lattice points
    val init = Array.newBuilder[Array[Long]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Long]]
    var i = 0
    while (i < qs.length && seen.size < k) {
      if (seen.add(qs(i).toSeq)) init += qs(i)
      i += 1
    }
    var cents = init.result()

    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Long](dim))
      val counts = new Array[Long](cents.length)
      var v = 0
      while (v < qs.length) {
        val q = qs(v)
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < cents.length) {
          val cent = cents(c)
          var d = 0L
          var j = 0
          while (j < dim) { val t = q(j) - cent(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c } // strict < : ties keep lowest c
          c += 1
        }
        val s = sums(best)
        var j = 0
        while (j < dim) { s(j) += q(j); j += 1 }
        counts(best) += 1
        v += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c) // empty cell: keep previous centroid
        else {
          val out = new Array[Long](dim)
          var j = 0
          while (j < dim) { out(j) = roundedMean(sums(c)(j), counts(c)); j += 1 }
          out
        }
      }.toArray
      it += 1
    }
    cents
  }
}
