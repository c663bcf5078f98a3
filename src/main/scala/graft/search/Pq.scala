package graft.search

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Product-quantization codebook training (Jégou et al., TPAMI 2011):
 * the vector space is split into `m` contiguous subspaces and a separate
 * seeded KMeans learns `codebookSize` centroids per subspace over (a
 * sample of) the corpus. Codebooks are tiny plan constants (m × k × d/m
 * floats — 64 KB at 64-dim/m8/k256); encoding and asymmetric scoring are
 * pure map work ([[graft.expr.PqEncode]] / [[graft.expr.PqCosine]]).
 *
 * Like IVF cell training, PQ codebooks need a reasonable space partition,
 * not converged clusters — a capped iteration count trains in a fraction
 * of the default time with equivalent recall. KMeans may return fewer
 * than `codebookSize` distinct centers on small/duplicate-heavy corpora;
 * the codebook simply shrinks (codes stay one byte).
 */
object Pq {

  def trainCodebooks(
      corpus: DataFrame, vecCol: String,
      m: Int, codebookSize: Int = 256, seed: Long = 42L,
      sampleFraction: Double = 1.0,
      maxIter: Int = 8): Array[Array[Array[Float]]] = {
    require(m > 0, s"m must be positive, got $m")
    require(codebookSize > 0 && codebookSize <= 256,
      s"codebookSize must be in 1..256 (codes are one byte), got $codebookSize")
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0,
      s"vector dim $dim is not divisible into $m subspaces")
    val dsub = dim / m
    val sampled =
      if (sampleFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, sampleFraction, seed)
    // One persisted pass feeds all m sub-trainings (KMeans iterates over
    // its input; without the persist each subspace would re-scan the
    // corpus maxIter times).
    val vecs = sampled.select(col(vecCol).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (0 until m).map { j =>
        val sub = vecs.select(
          array_to_vector(slice(col("__v"), j * dsub + 1, dsub)).as("features"))
        // per-subspace seed offset: identical subspace data must not be
        // forced into identical codebooks
        new KMeans().setK(codebookSize).setSeed(seed + j).setMaxIter(maxIter)
          .setFeaturesCol("features")
          .fit(sub)
          .clusterCenters.map(_.toArray.map(_.toFloat))
      }.toArray
    } finally { vecs.unpersist(false); () }
  }
}
