package graft

/**
 * Driver-contract guards: a dangling oracleSql key (typo, renamed query)
 * would surface as a silent "no spark output" FAIL in the round's
 * correctness report — catch it at test time instead.
 */
class SparkEntrySpec extends SparkSpec {

  test("every oracleSql key has a queries twin") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: $dangling")
  }

  test("rows-only queries are the documented hash-dependent set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // winnow_pairs and simhash_pairs graduated to full oracles in round
    // 11 (wraparound-64-bit integer kernels, SQL-replayable over
    // HUGEINT); round 12 added ann_recall (splitmix64 SRP plane replay),
    // corpus_uuid (recursive-SQL SHA-1), and embed_corpus/embed_knn (the
    // engine-stable FNV+q20 TF-IDF embedder). What remains is genuinely
    // non-replayable: seeded-KMeans recall scalars (floor-asserted at
    // execution time instead), an approx quantile sketch, and BPE
    // subword counts (iterative merge training — each round's argmax
    // depends on the previous merge — cannot replay in SQL; BpeSpec
    // pins the classic hand-computed reference instead).
    val expected = Set(
      "ivf_recall", "ivf_partitioned_recall", "ivf_int8_recall",
      "ivf_pq_recall", "ivf_binary_recall",
      "quant_recall",
      "doc_len_quantiles_approx",
      "bpe_tokens")
    assert(rowsOnly == expected,
      s"rows-only set changed: extra=${rowsOnly -- expected} missing=${expected -- rowsOnly}")
  }

  test("flagship entry returns rows on the smoke fixture (driver contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 (smoke breadth: no fixture-size assumptions)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sf0001).count()
      assert(n >= 0, s"$name failed at sf0.001")
    }
  }
}
