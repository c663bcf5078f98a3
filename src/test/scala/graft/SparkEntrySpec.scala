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

  test("EVERY lowercasing oracle fails LOUDLY on a full-case-mapping fixture") {
    // The byte/code-unit twins absorb every encoding divergence except
    // one: Java's full case mapping vs utf8proc's code-point-wise
    // lower() (U+0130, Final_Sigma U+03A3). The guard must be wired to
    // every query whose DuckDB twin lowercases — enforced here at
    // RUNTIME against the final oracle SQL strings (helper-built twins
    // included), so a new lowercasing twin cannot ship unguarded: each
    // must produce the targeted error, not a red hash cell hours deep
    // in forensics.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fullcase").toString
    Seq((1L, "İstanbul borsası")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val lowercasing = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("lower(") => name
    }.toSeq.sorted
    assert(lowercasing.size >= 25,
      s"expected the known lowercasing-oracle family, got $lowercasing")
    val unguarded = lowercasing.filter { name =>
      try { SparkEntry.queries(name)(spark, dir).count(); true }
      catch {
        case e: IllegalArgumentException if e.getMessage.contains("full case mapping") => false
        case other: Throwable =>
          fail(s"$name reached past the guard (${other.getClass.getSimpleName}: " +
            s"${other.getMessage.linesIterator.next()})")
      }
    }
    assert(unguarded.isEmpty,
      s"lowercasing oracles whose query ran UNGUARDED on the İ fixture: $unguarded")
  }
}
