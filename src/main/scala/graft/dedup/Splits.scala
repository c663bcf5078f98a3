package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Leakage-free train/val/test splitting: assign every document to a split
 * by hashing its near-duplicate CLUSTER, not the document itself, so no
 * near-dup pair can ever straddle a split boundary. Splitting documents
 * independently leaks: a near-duplicate of a training document landing in
 * the held-out set inflates eval scores (the standard motivation for
 * cluster-aware splits in corpus-curation pipelines — the same concern the
 * reference's BCB/POJ ground-truth protocol guards with explicit clone
 * groups, reference `bcb_utils.py` relevance sets).
 *
 * Mechanics: `component` labels come from [[Dedup.connectedComponents]]
 * over the mined near-dup pair set (min-id labeling, so singleton docs are
 * their own component). The split is decided by the salted-md5 uniform of
 * the COMPONENT id — the identical `first-8-hex / 2^32` convention as
 * [[graft.bench.Sampling.weighted]], bit-reproducible in any engine with
 * md5 and independent of physical layout. Every member of a cluster hashes
 * the same component, hence lands in the same split, by construction.
 *
 * Scale: the only non-map-side cost is connectedComponents itself (already
 * the pointer-jumping / guarded driver union-find of the dedup family);
 * the assignment is one join of docs to their label (shuffle keyed by id,
 * or free if the caller already holds labels) plus a map-side hash — no
 * new shuffle family at 100 TB.
 */
object Splits {

  /** Salted-md5 uniform in [0, 1) of `key` — the shared engine-portable
    * convention (first 8 hex digits of md5(seed‖key) scaled by 2⁻³²). */
  private def uniformOf(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed), key.cast("string"))), 1, 8),
      16, 10).cast("double") / 4294967296.0

  /**
   * Assign each document a split label such that all documents of one
   * near-dup component share a label.
   *
   * @param docs     one row per document (must cover every id in `pairs`)
   * @param pairs    near-dup pairs (e.g. [[Dedup.minHashNearDups]] output)
   * @param trainLt  uniforms below this go to "train"
   * @param valLt    uniforms in [trainLt, valLt) go to "val"; rest "test"
   * @return (id, component, split) — one row per document
   */
  def leakFreeSplits(
      docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      trainLt: Double = 0.8, valLt: Double = 0.9,
      seed: String = graft.bench.Sampling.defaultSeed): DataFrame = {
    require(trainLt >= 0 && trainLt <= valLt && valLt <= 1.0,
      s"split bounds must satisfy 0 <= trainLt <= valLt <= 1 (got $trainLt, $valLt)")
    val labeled = Dedup.connectedComponents(
      docs.select(col(idCol)), idCol, pairs, aCol, bCol)
    val u = uniformOf(col("component"), seed)
    labeled.select(
      col("id"),
      col("component"),
      when(u < lit(trainLt), lit("train"))
        .when(u < lit(valLt), lit("val"))
        .otherwise(lit("test")).as("split"))
  }
}
