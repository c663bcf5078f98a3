package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.BpeEncode

/**
 * Byte-pair encoding: a REAL learned subword tokenizer for the
 * training-data pipeline — token budgets, packing, and cost estimates
 * computed with the merges an actual model vocabulary would use, not a
 * whitespace proxy (the whitespace and regex counters in
 * [[TextAnalysis]] remain the cheap paths).
 *
 * Algorithm (Sennrich et al. 2016, the standard formulation): training
 * counts adjacent symbol pairs over word frequencies and greedily merges
 * the most frequent pair `numMerges` times; encoding replays the merge
 * list by rank per word until no merge applies.
 *
 * Scale shape — the production split:
 *  - TRAIN on a bounded seeded SAMPLE, driver-side. Merge selection is
 *    inherently sequential (each round's counts depend on the previous
 *    merge), so a distributed trainer is numMerges full-corpus jobs;
 *    every production tokenizer trains on a sample instead. The sample
 *    is capped (`sampleSize` docs via the deterministic salted-md5
 *    order of [[graft.bench.Sampling]]) so driver memory is bounded and
 *    the result reproducible in any engine.
 *  - ENCODE the full corpus map-side: ONE codegen'd expression pass
 *    ([[graft.expr.BpeEncode]]) with the merge list riding the plan as
 *    a constant. No shuffle anywhere; cost is O(tokens · merges applied)
 *    with a per-word merge loop identical to the reference algorithm.
 */
object Bpe {

  /** Learned merge list, best-first. `left + right` is the merged symbol;
    * rank order IS the encode priority. */
  final case class Merges(pairs: Seq[(String, String)])

  /** Lowercase whitespace words — the same token definition as
    * [[TextAnalysis.tokenCount]], so BPE counts nest under word counts. */
  private[graft] def words(text: String): Seq[String] =
    if (text == null) Seq.empty
    // The engine's canonical fold (Unicode SIMPLE lowercase): context-
    // and locale-free, so merges and subword counts are machine- and
    // engine-independent; matches TextAnalysis.tokens' fold exactly.
    else graft.expr.SimpleCaseFold.lower(text).split("\\s+").filter(_.nonEmpty).toSeq

  /** Initial symbol sequence of a word: one symbol per Unicode CODE POINT
    * (not UTF-16 code unit — astral characters must stay whole symbols;
    * lone surrogates would collide as replacement bytes in UTF8String and
    * break the cross-engine replay, which iterates code points). */
  private[graft] def splitSymbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Train `numMerges` merges on a seeded sample of `df`. Deterministic:
    * sample selection is the salted-md5 order, pair counting is exact,
    * and ties break lexicographically on (left, right). */
  def train(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int, sampleSize: Int = 500): Merges = {
    require(numMerges >= 0 && numMerges <= 65536,
      s"numMerges out of range: $numMerges")
    val sample = graft.bench.Sampling.seeded(
        df.select(col(idCol), col(textCol)), idCol, sampleSize)
      .select(col(textCol)).collect().map(r => Option(r.getString(0)).getOrElse(""))
    // word -> frequency over the sample; each word as its symbol sequence
    val wordFreq = new java.util.HashMap[String, Long]()
    sample.foreach(t => words(t).foreach(w =>
      wordFreq.merge(w, 1L, (a, b) => a + b)))
    var symbols: Map[String, (Array[String], Long)] =
      wordFreq.entrySet().toArray(Array.empty[java.util.Map.Entry[String, Long]])
        .map(e => e.getKey -> (splitSymbols(e.getKey), e.getValue))
        .toMap
    val out = Seq.newBuilder[(String, String)]
    var m = 0
    while (m < numMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      symbols.valuesIterator.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, (a, b) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) m = numMerges
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 || (c == best._2 &&
              (p._1 < best._1._1 || (p._1 == best._1._1 && p._2 < best._1._2))))
            best = (p, c)
        }
        val (a, b) = best._1
        out += ((a, b))
        val merged = a + b
        symbols = symbols.map { case (w, (syms, f)) =>
          w -> (mergePass(syms, a, b, merged), f)
        }
        m += 1
      }
    }
    Merges(out.result())
  }

  private def mergePass(syms: Array[String], a: String, b: String,
      merged: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += merged; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Subword sequence of a text column under the learned merges
    * (array<string>; empty for null/whitespace-only text). Map-side
    * codegen'd expression; merges ride the plan as a constant. */
  def encode(text: Column, merges: Merges): Column =
    org.apache.spark.sql.GraftInternal.column(BpeEncode(
      org.apache.spark.sql.GraftInternal.expression(text), merges.pairs.toArray))

  /** Learned-subword token count (int) — the budget the packing and
    * sampling operators should consume for model-real costs. */
  def tokenCount(text: Column, merges: Merges): Column =
    size(encode(text, merges))

  /** Persist the merge list (rank, left, right) as a tiny parquet
    * artifact — train once, encode from any later job/session; the same
    * build-once/use-many contract as the index family. Works on any
    * Hadoop filesystem the session resolves. */
  def save(spark: org.apache.spark.sql.SparkSession, merges: Merges,
      path: String): Unit = {
    import spark.implicits._
    merges.pairs.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Merges =
    Merges(spark.read.parquet(path).orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq)
}
