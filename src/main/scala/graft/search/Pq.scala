package graft.search

import org.apache.spark.sql.DataFrame

/**
 * Product-quantization codebook training (Jégou et al., TPAMI 2011):
 * the vector space is split into `m` contiguous subspaces and a separate
 * deterministic lattice KMeans ([[LatticeKmeans]]) learns `codebookSize`
 * centroids per subspace over ONE bounded seeded corpus sample (salted
 * md5 order — quantization is per-component, so the full-vector lattice
 * sample slices into exact sub-lattice samples). Codebooks are tiny plan
 * constants (m × k × d/m floats — 64 KB at 64-dim/m8/k256); encoding and
 * asymmetric scoring are pure map work ([[graft.expr.PqEncode]] /
 * [[graft.expr.PqCosine]]).
 *
 * The earlier per-subspace MLlib KMeans was retired for the same reason
 * as [[Ivf.trainCentroids]]'s: k-means‖ init and partition-order float
 * means can't be replayed by a DuckDB oracle, while lattice Lloyd rounds
 * replay exactly (SparkEntry.ivfPqRecallSql runs all m × iters rounds as
 * materialized CTEs). Centroids are dyadic rationals — exact in float32
 * and in SQL as `lattice/1048576.0`.
 *
 * Like IVF cell training, PQ codebooks need a reasonable space partition,
 * not converged clusters — a capped iteration count trains in a fraction
 * of the converged time with equivalent recall. Lattice Forgy init may
 * find fewer than `codebookSize` distinct sub-lattice points on
 * small/duplicate-heavy corpora; the codebook simply shrinks (codes stay
 * one byte).
 */
object Pq {

  def trainCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, codebookSize: Int = 256, seed: Long = 42L,
      sampleN: Int = 2048,
      maxIter: Int = 8): Array[Array[Array[Float]]] = {
    require(m > 0, s"m must be positive, got $m")
    require(codebookSize > 0 && codebookSize <= 256,
      s"codebookSize must be in 1..256 (codes are one byte), got $codebookSize")
    // one sample pass feeds all m sub-trainings
    val lat = LatticeKmeans.sampleLattice(corpus, idCol, vecCol, sampleN,
      s"graftpq$seed:")
    require(lat.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val dim = lat(0).length
    require(dim % m == 0,
      s"vector dim $dim is not divisible into $m subspaces")
    val dsub = dim / m
    (0 until m).map { j =>
      val pts = lat.map(q => java.util.Arrays.copyOfRange(q, j * dsub, (j + 1) * dsub))
      LatticeKmeans.lloyd(pts, codebookSize, maxIter)
        .map(_.map(c => (c.toDouble / LatticeKmeans.Scale).toFloat))
    }.toArray
  }
}
