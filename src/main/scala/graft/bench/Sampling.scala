package graft.bench

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic weighted (Bernoulli) sample: keep a row iff its salted
    * md5 uniform falls below `prob` (a per-row probability column in
    * [0,1]). The uniform is the first 8 hex digits of md5(seed‖id) scaled
    * by 2⁻³² — identical in any engine with md5 (the DuckDB twin uses the
    * same expression), so the kept set is bit-reproducible, unlike
    * `df.sample()` whose kept set depends on Spark's partition-seeded RNG
    * and therefore on the physical split layout.
    *
    * Pure map-side filter: no shuffle, no state — at 100 TB this is a scan
    * with a pushable-ish predicate (the md5 itself isn't pushable, but no
    * exchange is ever introduced). Standard use: quality-proportional
    * downsampling, e.g. `prob = quality_score` keeps good documents with
    * high probability while never fully zeroing a stratum. */
  def weighted(df: DataFrame, idCol: String, prob: Column,
      seed: String = defaultSeed): DataFrame = {
    val uniform = conv(substring(md5(concat(lit(seed),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") / 4294967296.0
    df.filter(uniform < prob)
  }

  /** Stratified deterministic sample: the first `nPerStratum` rows of each
    * stratum under the SAME salted-md5 order as [[seeded]] — a constant
    * per-class quota for balanced eval/training subsets (class-skewed
    * corpora would otherwise drown rare strata). Strata with fewer than
    * `nPerStratum` rows keep everything.
    *
    * Scale shape (r17): a bounded per-stratum heap
    * ([[graft.plans.TopKRows]], keyed on the FULL md5 digest — the
    * string tie-key the heap gained this round orders hex digests
    * byte-wise, exactly the rank window's and the oracle's sort), so
    * each map partition keeps ≤ n rows per stratum and the shuffle
    * carries ≤ |strata|·n rows — a rank window would instead funnel
    * every stratum's FULL row set through one sort reducer (the classic
    * skewed-stratum spill at corpus scale). A null id has a null digest;
    * it maps to "" so null-id rows sort first, as the window's
    * nulls-first asc order did. Only a crafted md5 collision between
    * distinct ids could reorder ties vs the (digest, id) window sort —
    * not a property of these inputs. */
  def stratified(df: DataFrame, idCol: String, strataCol: String, nPerStratum: Int,
      seed: String = defaultSeed): DataFrame = {
    val cols = df.columns.toSeq
    val key = coalesce(md5(concat(lit(seed), col(idCol).cast("string"))), lit(""))
    df.groupBy(col(strataCol).as("__stratum"))
      .agg(graft.functions.top_k_rows(
        struct(cols.map(col): _*), lit(0.0), key, nPerStratum).as("__tk"))
      .select(explode(col("__tk")).as("__e"))
      .select(cols.map(n => col(s"__e.$n")): _*)
  }
}
