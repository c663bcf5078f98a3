package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Character-bigram language-model quality scoring (the CCNet/KenLM-style
 * perplexity filter of a training-data pipeline, reduced to a model that
 * is exactly reproducible cross-engine): train bigram transition counts
 * on the corpus itself, then score each document by its average negative
 * log2 transition probability — bits per character transition. Junk
 * (mojibake, random identifiers, binary-ish text) makes improbable
 * transitions and floats to the top; fluent prose scores low. Rank
 * thresholds, not absolute values, are the filter contract (the model is
 * corpus-trained, so scores are relative to the corpus itself).
 *
 * Model, pinned for the oracle twin:
 *   P(b|a) = (c(ab) + 1) / (c(a*) + V)
 * over lowercased text; `c(ab)` = corpus count of bigram ab, `c(a*)` =
 * count of bigrams starting with a, `V` = distinct observed second
 * characters (add-one smoothing's vocabulary). Documents shorter than 2
 * characters have no transitions and are dropped.
 *
 * Scale shape: bigram expansion is builtin codegen (`sequence` +
 * `transform` + `explode` — no UDF); the model is two aggregations over
 * the bigram stream (alphabet²-bounded output: a few thousand rows for
 * real text) and joins back to per-doc TF as a BROADCAST — per-doc
 * scoring never shuffles the corpus, only its TF rows (bounded by
 * doc length, combined map-side). One corpus pass for counts, one for
 * TF; both are the same exploded stream, so Catalyst reuses the scan.
 *
 * Determinism discipline: each bigram's log2 probability is computed by
 * [[graft.expr.DetMath.log2q20]] — a q20 fixed-point BIGINT built from
 * only correctly-rounded IEEE operations, bit-identical in any engine BY
 * CONSTRUCTION (libm `log2` differs between engines in the last ulp,
 * which flips quantization cells no matter how coarse the grid); per-doc
 * totals are exact integer sums of (tf × qlog); the final
 * bits-per-transition is one double division (correctly rounded,
 * identical everywhere), floor-quantized to 6 dp for the wire format.
 */
object Perplexity {

  private def r6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.round6(c) // the one wire-rounding definition

  /** Per-document bits-per-transition under the corpus-trained bigram LM.
    * Output: `doc_id`-named id column, `n_bigrams`, `q20_bits` (the EXACT
    * integer −Σ tf·qlog — the score in q20 fixed point, the column to
    * hash-compare cross-engine), and `bits_per_char` (the human-readable
    * double, q20_bits / n_bigrams / 2²⁰, floor-quantized to 6 dp; derived,
    * not part of the exact wire contract). */
  def bitsPerChar(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val big = docs
      .select(col(idCol), graft.functions.simple_lower(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= 2)
      // fused bigram kernel (r21): the original per-position substring
      // paid an O(i) code-point seek each call — O(len²) per document —
      // inside an interpreted higher-order transform
      .select(col(idCol), explode(graft.functions.char_bigrams(col("__t"))).as("bg"))
    val tf = big.groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("tf"))
    // Corpus model from the SAME exploded stream: bigram counts, context
    // (first-char) totals, and the distinct-second-char vocabulary.
    val cbg = big.groupBy(col("bg")).agg(count(lit(1)).as("c"))
    val ctx = cbg.groupBy(substring(col("bg"), 1, 1).as("a")).agg(sum(col("c")).as("ca"))
    val vocab = cbg.agg(countDistinct(substring(col("bg"), 2, 1)).as("v"))
    val model = cbg
      .join(broadcast(ctx), substring(col("bg"), 1, 1) === col("a"))
      .crossJoin(broadcast(vocab))
      .select(col("bg"),
        graft.expr.DetMath.log2q20(col("c") + lit(1), col("ca") + col("v")).as("qlog"))
    // qlog < 0 (probabilities < 1), so the integer sum is negative and the
    // negated division yields positive bits. Both factors stay exact in
    // double (|sum| ≤ n·64·2²⁰ ≪ 2⁵³), so the single division is correctly
    // rounded — identical in every engine.
    tf.join(broadcast(model), Seq("bg"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("qlog")).as("__sq"))
      .select(col(idCol), col("n_bigrams"),
        (-col("__sq")).cast("long").as("q20_bits"),
        r6((-col("__sq")).cast("double") /
          col("n_bigrams").cast("double") / lit(graft.expr.DetMath.Q.toDouble))
          .as("bits_per_char"))
  }
}
