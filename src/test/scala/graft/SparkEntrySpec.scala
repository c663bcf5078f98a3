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
    // engine-stable FNV+q20 TF-IDF embedder); round 13 graduated BPE
    // (training replayed as 64 materialized DuckDB CTE rounds, encode as
    // a recursive lowest-ranked-merge CTE — SparkEntry.bpeReplaySql);
    // round 14 graduated ivf_recall + ivf_partitioned_recall (MLlib
    // KMeans replaced by the deterministic integer-lattice trainer
    // LatticeKmeans, replayed as per-round CTEs — SparkEntry
    // .ivfRecallSql; both recall floors retained), then the whole codec
    // ladder: quant_recall / ivf_int8_recall (exact int8 code replay),
    // ivf_binary_recall (sign-sketch candidates + rescore replay),
    // ivf_pq_recall (per-subspace PQ codebook training replayed as
    // m x iters Lloyd-round CTEs + ADC reconstruction scoring), and
    // finally doc_len_quantiles_approx (below its accuracy the GK
    // summary never compresses — exact rank-ceil(p*n) replay, convention
    // pinned in TextAnalysisSpec). EVERY query now carries a full DuckDB
    // oracle.
    val expected = Set.empty[String]
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

  test("EVERY lowercasing twin folds through sqlFold (no raw lower( in final SQL)") {
    // Round 15 retired the İ/Σ fixture guard by making the CANONICAL FOLD
    // the Unicode simple mapping on both sides: the engine folds with
    // simple_lower, the twins with sqlFold (DuckDB lower() + the three
    // stale-table pre-replaces). The invariant that keeps this sound is
    // that no twin lowercases OUTSIDE the fold: oracleSql's post-pass
    // rewrites the literal lower(text)/lower(qtext) spellings, and this
    // pin fails on any OTHER lower( so a future twin cannot reintroduce
    // an unfolded (full-vs-simple divergent) lowercase path.
    val foldPrefix = "lower(replace(replace(replace("
    var folded = 0
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      var i = sql.indexOf("lower(")
      while (i >= 0) {
        assert(sql.regionMatches(i, foldPrefix, 0, foldPrefix.length),
          s"$name: raw lower( at offset $i — text must fold through sqlFold " +
            "(engine fold is SIMPLE lowercase; a bare lower() twin diverges on İ/Σ)")
        folded += 1
        i = sql.indexOf("lower(", i + 1)
      }
    }
    assert(folded >= 40, s"expected the known lowercasing-twin family, got $folded folds")
  }

  test("canonical fold on the formerly-guarded hazard chars: query == twin semantics") {
    // İ and Σ — the two code points the retired guard rejected — now flow
    // end-to-end: simple_lower folds İ→i and Σ→σ in EVERY position
    // (context-free), exactly what sqlFold computes in DuckDB. vocab_topk
    // over a Greek/Turkish fixture exercises the whole tokenize path.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fullcase").toString
    Seq((1L, "İstanbul ΣΟΦΟΣ ΤΕΛΟΣ"), (2L, "σοφοσ istanbul Σ"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        graft.text.TextAnalysis.tokens($"text")).as("t"))
      .groupBy($"t").count().as[(String, Long)].collect().toMap
    assert(toks("istanbul") == 2L, s"İ must fold to plain i: $toks")
    assert(toks("σοφοσ") == 2L, "medial AND final Σ fold to σ — no ς anywhere")
    assert(toks("τελοσ") == 1L && toks("σ") == 1L)
    assert(!toks.keys.exists(_.contains("ς")), s"final sigma must not appear: $toks")
    assert(!toks.keys.exists(_.contains("̇")), "no combining dot from full-mapping İ")
  }
}
