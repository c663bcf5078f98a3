package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic query sampling (SURVEY T2): the reference samples
 * benchmark queries unseeded (`bcb_utils.py:150`); this engine pins
 * reproducibility by ordering on a salted md5 of the id and keeping the
 * first n — reproducible in any engine with md5 (the DuckDB oracles use
 * the identical expression), constant |Q| at any corpus size, and planned
 * as TakeOrderedAndProject (per-partition top-n, no full sort shuffle).
 *
 * THE single definition: SparkEntry, the CLI pipelines, and every
 * embedded-sample query route through here so the scheme can never
 * diverge from the oracle SQL in one place only.
 */
object Sampling {
  val defaultSeed = "graft42:"

  def seeded(df: DataFrame, idCol: String, n: Int,
      seed: String = defaultSeed): DataFrame =
    df.orderBy(md5(concat(lit(seed), col(idCol).cast("string"))), col(idCol))
      .limit(n)

  /** Stratified deterministic sample: the first `nPerStratum` rows of each
    * stratum under the SAME salted-md5 order as [[seeded]] — a constant
    * per-class quota for balanced eval/training subsets (class-skewed
    * corpora would otherwise drown rare strata). One rank window
    * partitioned by the stratum: a single shuffle keyed on the stratum
    * column; rows past the quota are discarded right after ranking. Strata
    * with fewer than `nPerStratum` rows keep everything.
    *
    * Scale note: the window funnels each stratum through one reducer
    * (sort-based, spilling). Right for many-strata layouts (language ×
    * source at corpus scale); for a FEW huge strata a bounded per-stratum
    * heap (TopKRows over a numeric rank key) would cap the shuffle at
    * |strata|·n rows — not implemented because its 60-bit md5-prefix rank
    * key would order ties differently than the full-digest oracle sort. */
  def stratified(df: DataFrame, idCol: String, strataCol: String, nPerStratum: Int,
      seed: String = defaultSeed): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
      .orderBy(md5(concat(lit(seed), col(idCol).cast("string"))), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nPerStratum)
      .drop("__rn")
  }
}
