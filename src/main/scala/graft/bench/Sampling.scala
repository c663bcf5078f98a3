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
}
