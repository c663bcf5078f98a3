package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/**
 * Key-membership joins for a SMALL frame probed against an arbitrarily
 * large key table — the admission-sink and artifact-upsert shape: a
 * micro-batch (hundreds of rows) checked against a corpus-sized id set
 * (millions to billions of rows) on every call.
 *
 * A plain `small.join(bigKeys, key, "left_anti"/"left_semi")` can only
 * BROADCAST its right side — the build side of a broadcast hash join is
 * the non-preserved side — so once the key table outgrows the broadcast
 * threshold (~10 MB; a few hundred thousand ids), Spark falls back to
 * shuffling BOTH sides into a sort-merge join. On a per-micro-batch path
 * that shuffles and sorts the corpus-sized side once per batch, forever.
 *
 * Reversing the probe keeps the big side streaming: first semi-join the
 * big keys down to the ones the small side actually carries (the small
 * side's key set broadcasts — it is batch-sized by contract), then join
 * that batch-sized hit set back onto the small frame (broadcast again).
 * One codegen'd scan of the big side per call, zero shuffles of it, at
 * any corpus size. Null keys behave identically to the plain join: a
 * null never equi-matches, so it survives the anti and drops in the semi
 * either way.
 */
object Joins {

  /** `small` rows whose `key` does NOT appear in `bigKeys(key)` —
    * `small.join(bigKeys, Seq(key), "left_anti")` without ever shuffling
    * `bigKeys`. Output columns are exactly `small`'s. */
  def antiSmallLeft(small: DataFrame, bigKeys: DataFrame, key: String): DataFrame =
    small.join(broadcast(hits(small, bigKeys, key)), Seq(key), "left_anti")

  /** `small` rows whose `key` DOES appear in `bigKeys(key)` — the
    * left-semi twin of [[antiSmallLeft]], same single-pass shape. */
  def semiSmallLeft(small: DataFrame, bigKeys: DataFrame, key: String): DataFrame =
    small.join(broadcast(hits(small, bigKeys, key)), Seq(key), "left_semi")

  /** The big-side keys that occur in `small` — at most |small| distinct
    * values, so always broadcastable. The semi's build side is the small
    * frame's key set: only its KEYS execute twice across the two joins
    * (content comes solely from the outer join's execution, so a
    * nondeterministic-row upstream — e.g. `dropDuplicates` — stays
    * consistent: its key set is stable even when its row choice isn't). */
  private def hits(small: DataFrame, bigKeys: DataFrame, key: String): DataFrame =
    bigKeys.select(col(key))
      .join(broadcast(small.select(col(key)).distinct()), Seq(key), "left_semi")
      .distinct() // bigKeys may repeat a key (e.g. a postings table's doc
                  // column) — the hit set is batch-sized either way, but
                  // the broadcast build should carry each key once
}
