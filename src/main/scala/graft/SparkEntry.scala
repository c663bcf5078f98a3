package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SemDedup}
import graft.ingest.{CloneGraph, Corpus}
import graft.metrics.IrMetrics
import graft.multimodal.Multimodal
import graft.search.{Ann, Knn, LatticeKmeans}
import graft.streaming.Streaming
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB twin in `oracleSql` (same column
  * names, floats rounded identically on both sides) — as of round 14 with
  * NO exceptions: hash kernels replay over HUGEINT wraparound arithmetic,
  * iterative trainers (BPE merges, lattice KMeans cells and PQ codebooks)
  * replay as materialized per-round CTEs, and the GK quantile sketch is
  * exact (rank ceil(p·n)) below its accuracy parameter.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * top-10 cosine neighbors for a deterministic query subset. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_topk")(spark, "/root/testdata/sf0.001")

  // Fixed-size seeded query sample for k-NN benchmarks (T2): the reference
  // draws `num_samples` (default 500, main.py:21) queries unseeded
  // (bcb_utils.py:150); we pin determinism by ordering on a salted md5 of the
  // id and taking the first 500 — reproducible in any engine with md5, and
  // |Q| stays CONSTANT as the corpus grows (a %-based subset would scale
  // |Q| with |C| and eventually OOM the query broadcast). Spark plans
  // orderBy+limit as TakeOrderedAndProject: no full sort shuffle, each
  // partition keeps its local top-500.
  private val knnSampleSize = 500

  /** `ann_recall` SRP-LSH config — shared with AnnSpec, which pins both the
    * recall floor and a candidate-set-size ceiling at exactly this config so
    * it can't silently regress toward the broadcast-degenerate regime. */
  private[graft] val annRecallBits = 8
  private[graft] val annRecallTables = 64
  private def knnQueries(spark: SparkSession, dir: String): DataFrame =
    graft.bench.Sampling.seeded(Tables.embeddings(spark, dir), "vec_id", knnSampleSize)

  /** Cross-engine-stable 6-dp rounding: floor(x*1e6+0.5)/1e6 in plain IEEE
    * double arithmetic — bit-identical in any engine for identical inputs.
    * Spark's round() (shortest-string BigDecimal HALF_UP) and DuckDB's
    * round() (exact-binary) disagree when the value sits on a decimal half
    * boundary, which happens STRUCTURALLY for means of two 6-dp scores. */
  private def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Order-independent mean of a ≤6-dp score column: exact DECIMAL sum, then
    * one double division — immune to partial-aggregation summation order. */
  private def stableMean(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double") / count(c)

  /** Detailed results (one row per query×retrieved) with POJ-style relevance:
    * same `label` ⇒ relevant (poj_utils.py:188). Shared by the metric queries. */
  private def detailedResults(s: SparkSession, dir: String, k: Int): DataFrame = {
    val corpus = embParallel(s, dir)
    Knn.knnJoin(knnQueries(s, dir), "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = k, roundScoreTo = Some(6))
      .select(col("query_id"), col("vec_id").as("result_id"), col("rank"),
        col("score"), (col("label") === col("query_label")).as("is_relevant"))
  }

  /** Round-robin rebalance ONLY when the scan yields fewer splits than the
    * session has cores: the one-file test fixture reads as a single
    * partition, which would run CPU-heavy per-row kernels (shingling,
    * minhash, cosine scoring) single-threaded. A real-scale scan already
    * has thousands of splits and must NOT pay an extra full-corpus
    * exchange — this guard keeps the 100 TB plan shuffle-free (asserted in
    * PlanSpec: no RoundRobinPartitioning when splits ≥ parallelism). */
  private[graft] def rebalanced(df: DataFrame, s: SparkSession): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  private def docsParallel(s: SparkSession, dir: String): DataFrame =
    rebalanced(Tables.documents(s, dir), s)

  // The round-13 requireAsciiFixture guard is RETIRED (round 14): the
  // formerly code-point-folding oracle twins (winnow/simhash/embed/bpe/
  // multimodal/frame_hist) now emulate the kernels' exact UTF-8-byte /
  // UTF-16-unit views via sqlUtf8Bytes/sqlUtf16Units, so they hold on any
  // Unicode fixture (tools/nonascii_check.py replays them on one).
  //
  // Its round-14 successor requireSimpleCaseFixture (reject corpora
  // containing İ/Σ, where Java's FULL case mapping diverges from DuckDB's
  // simple lower()) is RETIRED too (round 15) — not by emulating Java in
  // SQL, but by removing full casing from the data path: the JDK's
  // Final_Sigma turned out to be BreakIterator-word-boundary-conditioned
  // (its backward scan crosses CJK/digits/marks — measured by exhaustive
  // probe), i.e. NOT the closed-form rule a regex twin could replay, and
  // Spark's own lower() is additionally default-locale-sensitive. The
  // engine now folds with the Unicode SIMPLE mapping
  // ([[graft.functions.simple_lower]]): context-free, locale-free, and
  // byte-identical to the DuckDB twins' [[sqlFold]] on EVERY Unicode
  // string — so there is nothing left to guard.

  /** Corpus content fingerprint for keying tmpdir artifact caches: one
    * cheap hash pass, order-independent and overflow-free (bit_xor; a sum
    * would trip the ANSI long-overflow check). Ids are unique so nothing
    * cancels. Build PARAMETERS are appended to the cache key separately —
    * the fingerprint pins the data, the suffix pins the config. */
  private def corpusFingerprint(df: DataFrame, cols: Column*): String =
    java.lang.Long.toHexString(df
      .agg(coalesce(bit_xor(xxhash64(cols: _*)), lit(0L)))
      .head().getLong(0))

  /** Embeddings corpus: cosine scoring of |Q|·|C| pairs parallelizes per
    * CORPUS partition (queries are broadcast), so a one-file corpus would
    * score on one core without the rebalance guard. */
  private def embParallel(s: SparkSession, dir: String): DataFrame =
    rebalanced(Tables.embeddings(s, dir), s)

  /** Execution-time floor assertion for the recall-scalar quality gates
    * (ivf/quant/ann recall queries): the driver can't oracle a seeded
    * KMeans/LSH recall value, so a silent degradation would read as just
    * "a lower number" in an artifact nobody diffs. Inlining the check into
    * the RESULT column (not a separate select that column pruning would
    * drop) makes a sub-floor recall throw at execution time — the driver
    * records `err` and the row goes red instead of green-with-garbage.
    * Floors mirror the value-level specs (IvfCollectionSpec, AnnSpec,
    * QuantizeSpec); RecallFloorSpec proves the forced-low path throws. */
  private[graft] def recallFloor(
      recall: DataFrame, floor: Double, q: String): DataFrame =
    recall.select(
      when(col("recall_at_k") < floor, raise_error(
        concat(lit(s"$q: recall_at_k "), col("recall_at_k").cast("string"),
          lit(s" is below the pinned floor $floor — quality regression, " +
            "not a valid result"))))
      .otherwise(col("recall_at_k")).as("recall_at_k"))

  /** Memoized LSH near-dup pair mining shared by the dedup family
    * (dedup_minhash, edit_sim_pairs, dedup_clusters, dedup_near_keep):
    * [[Dedup.minHashNearDups]] returns a MATERIALIZED frame
    * (localCheckpoint blocks), so the corpus-wide tokenize+shingle+MinHash
    * kernel — the dominant cost of all four queries — runs once per
    * (context, dir) and every consumer composes over the computed pair
    * set, exactly as a production curation pipeline would. Keyed by
    * applicationId because checkpoint blocks die with their context: a
    * fresh session re-mines rather than dereferencing dead blocks.
    * Determinism is untouched — consumers see the identical frame the
    * self-contained calls would compute. */
  private val minedPairsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
  private def minedNearDupPairs(s: SparkSession, dir: String): DataFrame =
    minedPairsCache.computeIfAbsent((s.sparkContext.applicationId, dir),
      _ => Dedup.minHashNearDups(docsParallel(s, dir), "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.8))

  /** BPE merge list per (app, dir) — training is a driver-side loop over
    * a bounded seeded sample (the production shape; see graft.text.Bpe),
    * memoized so bench warmup+passes train once. */
  private val bpeMergesCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), graft.text.Bpe.Merges]()
  /** Shared by the query config AND the oracle replay (bpeReplaySql) —
    * the SQL twin re-trains with these exact parameters. */
  private val bpeNumMerges = 64
  private val bpeSampleSize = 200
  private def bpeMerges(s: SparkSession, dir: String): graft.text.Bpe.Merges =
    bpeMergesCache.computeIfAbsent((s.sparkContext.applicationId, dir),
      _ => graft.text.Bpe.train(Tables.documents(s, dir), "doc_id", "text",
        numMerges = bpeNumMerges, sampleSize = bpeSampleSize))

  /** (files_total, files_read) of the most recent zorder_scan plan — the
    * bench main records it in the artifact so the pruning ratio is
    * visible per round, not just asserted in specs. */
  private val zorderStats =
    new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))
  private[graft] def lastZorderScanStats: (Int, Int) = zorderStats.get

  private[graft] def evictMinedPairs(s: SparkSession, dir: String): Unit =
    Option(minedPairsCache.remove((s.sparkContext.applicationId, dir)))
      .foreach(org.apache.spark.sql.GraftInternal.unpersistLocalCheckpoint)

  /** Release the per-dir memoized state (mined pair checkpoint blocks +
    * BPE merge lists). Long-lived sessions iterating over many corpus
    * dirs — the amplified scale sweep is one — would otherwise pin one
    * materialized corpus-wide pair frame per dir for the application's
    * lifetime. */
  private[graft] def evictDirCaches(s: SparkSession, dir: String): Unit = {
    evictMinedPairs(s, dir)
    bpeMergesCache.remove((s.sparkContext.applicationId, dir))
    // operator-internal checkpoint frames (DupSpans gram streams,
    // Selection's narrow base) — registered at creation, releasable only
    // here because their consumers run between registration and this
    // dir-boundary call
    org.apache.spark.sql.GraftInternal.releaseTrackedCheckpoints(s)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------------
    // A-group: relational aggregation (SURVEY §2.4; partial+final hash agg)
    // ------------------------------------------------------------------
    // Money sums run on DECIMAL so Spark and DuckDB agree bit-for-bit
    // (double summation order differs between engines); averages are
    // double-divisions of those exact sums.
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multi-table equi-join breadth (TPC-H Q3 shape): dimension filters
    // push to the scans, the customer dim broadcasts, AQE plans the rest.
    // Revenue on DECIMAL for cross-engine exactness; top-10 via
    // TakeOrderedAndProject.
    "q3_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1995-03-15"))
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1995-03-15"))
      broadcast(cust)
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), r6(col("revenue")).as("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Six-table join breadth (TPC-H Q5 shape): fact table streams through
    // one big-big shuffle join (lineitem x orders); region/nation are
    // explicit broadcasts; supplier/customer are left to AQE, which
    // broadcasts them at fixture scale and shuffles them at 100 TB — the
    // decision belongs to the runtime stats, not the query. Revenue on
    // DECIMAL for cross-engine exactness.
    "q5_join" -> ((s, dir) => {
      val asia = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(r6(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Corpus mixture surface: per-source doc/token counts, token share,
    // and the uniform-target sampling weight (total/(n_sources*tokens)) —
    // the mixture-balancing step of a training-data pipeline. The window
    // runs over the GROUPED frame (|sources| rows), not the corpus.
    "source_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val per = docsParallel(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"))
      val w = Window.partitionBy()
      per
        .withColumn("token_share",
          r6(col("n_tokens").cast("double") / sum(col("n_tokens")).over(w).cast("double")))
        .withColumn("sample_weight",
          r6(sum(col("n_tokens")).over(w).cast("double") /
            (count(lit(1)).over(w).cast("double") * col("n_tokens").cast("double"))))
        .orderBy(col("source"))
    }),

    // Multi-level aggregation: ROLLUP over (event_type, day) — per-day
    // cells, per-type subtotals, grand total in ONE pass (Spark expands
    // grouping sets map-side; no extra scan per level).
    "events_rollup" -> ((s, dir) => {
      Streaming.eventsBatch(s, dir)
        .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("value"))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)
    }),

    // CUBE completes the grouping-sets surface next to ROLLUP: all four
    // (type, day) aggregation levels in ONE pass — Spark's Expand plans a
    // single shuffle over the grouping-set-expanded rows, not four jobs.
    "events_cube" -> ((s, dir) => {
      Streaming.eventsBatch(s, dir)
        .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("value"))
        .cube(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)
    }),

    // Overlapping token-window chunking (32-token windows, stride 16) —
    // the pre-embedding step of a training/RAG pipeline. Chunk text rides
    // as md5 so the compare stays cell-sized; per-row compute only, no
    // shuffle below the output sort.
    "doc_chunks" -> ((s, dir) => {
      graft.text.Chunker.chunk(docsParallel(s, dir), Seq("doc_id"), "text",
          chunkSize = 32, stride = 16)
        .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Grouped exact quantiles: token-length p25/p50/p75 per language
    // (percentile ≡ quantile_cont interpolation; approx_percentile is the
    // documented 100 TB path, as in doc_len_quantiles).
    "lang_len_quantiles" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n"))
        .groupBy(col("lang"))
        .agg(
          r6(expr("percentile(n, 0.25)")).as("p25"),
          r6(expr("percentile(n, 0.5)")).as("p50"),
          r6(expr("percentile(n, 0.75)")).as("p75"))
        .orderBy(col("lang"))
    }),

    // ------------------------------------------------------------------
    // J2/T1/W3: the reference's core operator — exact per-query top-k
    // cosine search with self-exclusion (bcb_utils.py:168-176).
    // ------------------------------------------------------------------
    "knn_topk" -> ((s, dir) => {
      val corpus = embParallel(s, dir)
      Knn.knnJoin(knnQueries(s, dir), "vec_id", "embedding",
          corpus, "vec_id", "embedding", k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"),
          col("rank"), col("score"))
    }),

    // Euclid / Manhattan collection modes (the two remaining distance
    // metrics of a vector backend's collection config): same broadcast +
    // bounded-heap plan as knn_topk, but ranked ASCENDING — rank 1 is the
    // SMALLEST distance, ties still break on ascending id (the heap is fed
    // the negated distance; the entry carries the real one).
    "knn_euclid" -> ((s, dir) => {
      val corpus = embParallel(s, dir)
      Knn.knnJoin(knnQueries(s, dir), "vec_id", "embedding",
          corpus, "vec_id", "embedding", k = 10, metric = "euclid",
          roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"),
          col("rank"), col("score"))
    }),

    "knn_manhattan" -> ((s, dir) => {
      val corpus = embParallel(s, dir)
      Knn.knnJoin(knnQueries(s, dir), "vec_id", "embedding",
          corpus, "vec_id", "embedding", k = 10, metric = "manhattan",
          roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"),
          col("rank"), col("score"))
    }),

    // Payload-filtered vector search (the backend's `search` with payload
    // filters): the corpus predicate applies BEFORE scoring, so each
    // query's top-k ranks only qualifying rows — k results from the
    // filtered corpus, not a thinned unfiltered top-k. The predicate sits
    // directly above the parquet relation and reaches the scan as a pushed
    // filter (plan-asserted in KnnSpec); on the IvfCollection layout it
    // additionally composes with cell partition pruning.
    "knn_filtered" -> ((s, dir) => {
      val corpus = embParallel(s, dir)
      Knn.knnJoin(knnQueries(s, dir), "vec_id", "embedding",
          corpus, "vec_id", "embedding", k = 10, roundScoreTo = Some(6),
          corpusFilter = Some(col("label") < 5))
        .select(col("query_id"), col("vec_id").as("result_id"),
          col("rank"), col("score"))
    }),

    // Grouped search (the backend's `search_groups` API): per query, the
    // top-3 labels ranked by their best hit, two hits each — "best k
    // DISTINCT groups", which plain top-k can't express when one group
    // dominates. Within-group top-k via the bounded heap; group ranking
    // windows over |Q|·|groups| best rows only.
    "knn_groups" -> ((s, dir) => {
      val corpus = embParallel(s, dir)
      Knn.knnJoinGrouped(knnQueries(s, dir), "vec_id", "embedding",
          corpus, "vec_id", "embedding",
          groupCol = "label", groupSize = 2, kGroups = 3, roundScoreTo = Some(6))
        .select(col("query_id"), col("label"), col("group_rank"),
          col("vec_id").as("result_id"), col("rank"), col("score"))
        .orderBy(col("query_id"), col("group_rank"), col("rank"))
    }),

    // Grouped search with lookup (the backend's `search_groups` +
    // `with_lookup`): each surfaced group carries its group key's record
    // from a lookup collection — here per-label metadata (member count +
    // representative id). The grouped result is |Q|·kGroups·groupSize
    // rows by contract, so it BROADCASTS into the lookup scan: the
    // lookup collection can be corpus-sized and is probed, not shuffled.
    "knn_groups_lookup" -> ((s, dir) => {
      val corpus = embParallel(s, dir)
      val labelMeta = Tables.embeddings(s, dir).groupBy("label")
        .agg(count(lit(1)).as("n_members"), min("vec_id").as("rep_id"))
      Knn.knnJoinGrouped(knnQueries(s, dir), "vec_id", "embedding",
          corpus, "vec_id", "embedding",
          groupCol = "label", groupSize = 2, kGroups = 3, roundScoreTo = Some(6),
          withLookup = Some((labelMeta, "label")))
        .select(col("query_id"), col("label"), col("group_rank"),
          col("vec_id").as("result_id"), col("rank"), col("score"),
          col("lookup_n_members"), col("lookup_rep_id"))
        .orderBy(col("query_id"), col("group_rank"), col("rank"))
    }),

    // Recommendation search (the backend's `recommend` API): corpus ranked
    // against mean(positive examples) − mean(negative examples), examples
    // excluded. The composite vector is double-averaged then float32-cast
    // ONCE, so the DuckDB twin reproduces it bit-for-bit and certifies the
    // whole pipeline (vector arithmetic + scoring + ranking) cross-engine.
    "knn_recommend" -> ((s, dir) => {
      Knn.recommend(embParallel(s, dir), "vec_id", "embedding",
          positiveIds = Seq(0L, 1L, 2L), negativeIds = Seq(3L, 4L),
          k = 20, roundScoreTo = Some(6))
        .select(col("vec_id").as("result_id"), col("label"),
          col("rank"), col("score"))
    }),

    // Recommend with `lookup_from`: the example vectors resolve from a
    // DIFFERENT collection (here the same embeddings re-keyed +10000 —
    // a prototype collection in a foreign id space), so the searched
    // corpus does NOT exclude the example ids: the composite vector is
    // identical to knn_recommend's, but ids 0-4 are now eligible results
    // — the observable semantic difference of the lookup_from contract.
    "recommend_lookup" -> ((s, dir) => {
      val protos = Tables.embeddings(s, dir)
        .select((col("vec_id") + lit(10000L)).as("proto_id"), col("embedding"))
      Knn.recommend(embParallel(s, dir), "vec_id", "embedding",
          positiveIds = Seq(10000L, 10001L, 10002L),
          negativeIds = Seq(10003L, 10004L),
          k = 20, roundScoreTo = Some(6),
          lookupFrom = Some((protos, "proto_id", "embedding")))
        .select(col("vec_id").as("result_id"), col("label"),
          col("rank"), col("score"))
    }),

    // Discovery search (the backend's `discover` API): rank by the target
    // vector under context-pair constraints — lexicographically by how
    // many (positive, negative) pairs the candidate sides with, then by
    // target similarity. One map-side pass (example vectors are plan
    // literals inside codegen'd cosine kernels) into the global bounded
    // heap; fully SQL-expressible, so the oracle replays the whole
    // lexicographic ranking.
    "knn_discover" -> ((s, dir) => {
      Knn.discover(embParallel(s, dir), "vec_id", "embedding",
          targetId = 0L, contextPairs = Seq((1L, 2L), (3L, 4L)),
          k = 20, roundScoreTo = Some(6))
        .select(col("vec_id").as("result_id"), col("label"),
          col("context_score"), col("rank"), col("score"))
    }),

    // MMR-diversified search (Carbonell & Goldstein 1998): top-20 cosine
    // candidates per query re-ranked by λ·relevance − (1−λ)·max-sim-to-
    // selected, greedy k=5 — the "distinct clone families, not five copies
    // of one" retrieval mode. Greedy selection is inherently sequential,
    // but only over each query's ≤ fetchK candidates; the oracle replays
    // the identical selection as k chained argmax CTEs.
    "knn_mmr" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      graft.search.Mmr.diversifiedTopK(
          graft.bench.Sampling.seeded(Tables.embeddings(s, dir), "vec_id", 8),
          "vec_id", "embedding", emb, "vec_id", "embedding",
          k = 5, lambda = 0.5, fetchK = 20)
        .orderBy(col("query_id"), col("mmr_rank"))
    }),

    // Named multi-vector points (the backend's named-vectors surface):
    // each point stores SEVERAL vectors — here the full 64-d embedding
    // plus an 8-d head projection — registered by name with their dims in
    // collection metadata; a search picks one by name. Scoring the head
    // vector ranks differently from the full vector, which is the point:
    // one artifact, several retrieval geometries. The head slice is
    // deterministic (first 8 components), so the oracle reproduces the
    // whole path — build, select-by-name, cosine top-k — in SQL.
    "multi_vec_knn" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val fp = corpusFingerprint(emb, col("vec_id"), col("embedding"), col("label"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_vcoll_mv_$fp").toString
      val coll = graft.index.VectorCollection(s, root, "embeddings_mv")
      if (!coll.exists)
        coll.create("cosine", normalized = false,
          vectors = Seq("embedding" -> 64, "head_vec" -> 8))
      coll.upsert(emb.withColumn("head_vec", slice(col("embedding"), 1, 8)), "vec_id")
      val q = graft.bench.Sampling.seeded(emb, "vec_id", 10)
        .select(col("vec_id"), slice(col("embedding"), 1, 8).as("qv"))
      Knn.searchCollection(coll, q, "vec_id", "qv", "vec_id", "embedding",
          k = 10, roundScoreTo = Some(6), vectorName = Some("head_vec"))
        .select(col("query_id"), col("vec_id").as("result_id"),
          col("rank"), col("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Universal query with prefetch (the backend's multi-stage `query`
    // request): stage 1 ranks the top-50 per query on the CHEAP 8-d head
    // slice of each vector (matryoshka-style), stage 2 rescores ONLY
    // those candidates on the full 64-d vector for the final top-10. The
    // full-precision representation is touched for |Q|·prefetchK rows,
    // never the corpus — the plan shape of every refine-style retrieval.
    "query_prefetch" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      graft.search.Query.prefetchRescore(
          knnQueries(s, dir), "vec_id", "embedding",
          emb, "vec_id", "embedding",
          cheapVec = v => slice(v, 1, 8),
          prefetchK = 50, k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"),
          col("label"), col("rank"), col("score"))
    }),

    // Formula rescoring (the backend's score-boosting query): candidates
    // from an exact top-50 cosine prefetch are re-ranked by a FORMULA
    // over the similarity and a payload field — here a convex blend of
    // cosine and a linear category-decay boost (prefer labels near 5,
    // the recency/popularity-boost shape). The decay is pure IEEE
    // arithmetic and the blend is r6-floored, so every cell is
    // engine-stable; the formula is one codegen'd projection over the
    // |Q|·50 rescore rows — the corpus is probed by broadcast id join.
    "query_boosted" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      val q = knnQueries(s, dir)
      val candidates = Knn.knnJoin(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 50, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id"))
      graft.search.Query.rescoreFormula(candidates,
          q, "vec_id", "embedding", emb, "vec_id", "embedding", k = 10,
          formula = r6(lit(0.8) * col("sim") + lit(0.2) *
            graft.functions.lin_decay(col("label").cast("double"),
              lit(5.0), lit(5.0), lit(0.5))),
          roundSimTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"),
          col("label"), col("sim"), col("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Late-interaction MaxSim search (ColBERT scoring; the backend's
    // multivector comparator): each point's 64-d embedding is viewed as
    // 8 token-vectors × 8 dims, and score(q, d) = Σ over query tokens of
    // the best per-token cosine against any doc token. Same broadcast +
    // bounded-heap plan as knn_topk — only the comparator changes
    // (knnJoin's scoreFn hook); pairwise cosines are 1e-6-quantized
    // before the max so the winning token is engine-stable.
    "maxsim_knn" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      Knn.knnJoin(
          graft.bench.Sampling.seeded(Tables.embeddings(s, dir), "vec_id", 10),
          "vec_id", "embedding", emb, "vec_id", "embedding", k = 10,
          scoreFn = Some((a, b) =>
            floor(graft.functions.max_sim(a, b, 8) * lit(1e6) + lit(0.5)) / lit(1e6)))
        .select(col("query_id"), col("vec_id").as("result_id"),
          col("rank"), col("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Sparse-vector search (the backend's sparse-vector surface, the data
    // shape SPLADE-style learned-sparse models emit): documents carry
    // (indices, values) pairs and score by sparse dot product. The corpus
    // here is the embeddings table sparsified at |v| >= 0.1 (1-based
    // indices — the oracle mirrors the same construction in SQL), queries
    // a seeded 10-doc sample. Query components broadcast; the corpus
    // explodes streaming; per-pair sums are DECIMAL-summed over the 1e-12
    // grid and the top-k cut is the bounded heap.
    "sparse_knn" -> ((s, dir) => {
      val (idx, vals) = graft.search.Sparse.sparsify(col("embedding"), 0.1)
      val sparse = embParallel(s, dir)
        .select(col("vec_id"), idx.as("sidx"), vals.as("svals"))
      val q = graft.bench.Sampling.seeded(Tables.embeddings(s, dir), "vec_id", 10)
        .select(col("vec_id"), idx.as("sidx"), vals.as("svals"))
      graft.search.Sparse.knn(sparse, "vec_id", "sidx", "svals",
          q, "vec_id", "sidx", "svals", k = 10, roundScoreTo = Some(6))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Keyset-paginated scroll over a persisted collection (the backend's
    // `scroll` API) with a payload filter: id predicate + filter both push
    // into the scan; per-page cost is independent of scroll position (no
    // OFFSET). The collection artifact is fingerprint-keyed and reused
    // across calls; its contents equal the embeddings table (one idempotent
    // upsert), so the oracle runs on the source table directly.
    "collection_scroll" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // label rides the fingerprint because the query filters and outputs
      // it: a corpus whose payload changed under fixed ids/vectors must
      // miss the cache (build-params-in-key rule).
      val fp = corpusFingerprint(emb, col("vec_id"), col("embedding"), col("label"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_vcoll_$fp").toString
      val coll = graft.index.VectorCollection(s, root, "embeddings")
      if (!coll.exists) {
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        coll.create(graft.index.CollectionMeta(dim, "cosine", normalized = false))
      }
      // upsert every call: idempotent by key (complete artifact → anti-join
      // no-op), and it heals a partially-written cache from a crashed run
      coll.upsert(emb, "vec_id")
      coll.scroll("vec_id", limit = 50, after = Some(99L),
          filter = Some(col("label") < 5))
        .select(col("vec_id"), col("label"))
    }),

    // Ordered scroll (the backend's scroll `order_by`): keyset pagination
    // over (payload field, id) — the page after (label=4, vec_id=200),
    // O(page) with pushdown, stable under appends.
    "collection_scroll_by" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val fp = corpusFingerprint(emb, col("vec_id"), col("embedding"), col("label"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_vcoll_$fp").toString
      val coll = graft.index.VectorCollection(s, root, "embeddings")
      if (!coll.exists) {
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        coll.create(graft.index.CollectionMeta(dim, "cosine", normalized = false))
      }
      coll.upsert(emb, "vec_id")
      coll.scrollBy("label", "vec_id", limit = 40,
          after = Some((4, 200L)))
        .select(col("vec_id"), col("label"))
    }),

    // Facet counts (the backend's `facet` API): distinct payload values
    // with point counts under a filter, most-frequent first. One
    // partial+final aggregate over a single pruned column.
    "collection_facet" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val fp = corpusFingerprint(emb, col("vec_id"), col("embedding"), col("label"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_vcoll_$fp").toString
      val coll = graft.index.VectorCollection(s, root, "embeddings")
      if (!coll.exists) {
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        coll.create(graft.index.CollectionMeta(dim, "cosine", normalized = false))
      }
      coll.upsert(emb, "vec_id")
      coll.facet("label", filter = Some(col("vec_id") >= 100L), limit = 5)
    }),

    // Payload-partitioned collection (the backend's payload index, the
    // Spark way): data/ directory-partitioned by label, so label
    // predicates prune whole directories at planning time — searches,
    // scrolls, and counts over a label filter scan only that label's
    // partition regardless of collection size. The query counts per
    // label through the partitioned live view; the oracle counts the
    // source directly (one idempotent upsert ⇒ identical contents).
    "collection_partitioned" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val fp = corpusFingerprint(emb, col("vec_id"), col("embedding"), col("label"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_vcoll_part_$fp").toString
      val coll = graft.index.VectorCollection(s, root, "embeddings_bylabel")
      if (!coll.exists) {
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        coll.create(graft.index.CollectionMeta(dim, "cosine", normalized = false),
          partitionBy = "label")
      }
      coll.upsert(emb, "vec_id")
      coll.load().filter(col("label") < 5)
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
        .orderBy(col("label"))
    }),

    // Similarity matrix (the backend's `search_matrix_pairs` API):
    // pairwise top-k among a seeded 100-point sample — sample² work
    // bounded by the API contract, never corpus².
    "matrix_pairs" -> ((s, dir) => {
      Knn.searchMatrix(embParallel(s, dir), "vec_id", "embedding",
        sample = 100, k = 3, roundScoreTo = Some(6))
    }),

    // ------------------------------------------------------------------
    // A7: per-query score-separation stats (bcb_utils.py:179-215 shape:
    // query_id, avg clone/non-clone score, counts; 0.0 when a side is empty).
    // ------------------------------------------------------------------
    "query_stats" -> ((s, dir) => {
      detailedResults(s, dir, k = 10)
        .groupBy(col("query_id"))
        .agg(
          coalesce(r6(stableMean(when(col("is_relevant"), col("score")))), lit(0.0))
            .as("avg_clone_score"),
          coalesce(r6(stableMean(when(!col("is_relevant"), col("score")))), lit(0.0))
            .as("avg_non_clone_score"),
          count(when(col("is_relevant"), 1)).as("num_clones_found"),
          count(when(!col("is_relevant"), 1)).as("num_non_clones_found"))
        .orderBy(col("query_id"))
    }),

    // ------------------------------------------------------------------
    // A3-A6 + A8 via W1/W2: the reference's printed metric suite
    // (bcb_utils.py:255-277) as one distributed pass.
    // ------------------------------------------------------------------
    "ir_metrics" -> ((s, dir) => {
      val g = IrMetrics.global(IrMetrics.perQuery(detailedResults(s, dir, k = 10)),
        k = 10, apDenominator = lit(10))
      g.select(g.columns.map(c => r6(col(c)).as(c)): _*)
    }),

    // k=100 variant — the reference's default neighbor count
    // (main.py:22); exercises the bounded-heap aggregate at its real k.
    "ir_metrics_k100" -> ((s, dir) => {
      val k = 100
      val g = IrMetrics.global(IrMetrics.perQuery(detailedResults(s, dir, k)),
        k = k, apDenominator = lit(k))
      g.select(g.columns.map(c => r6(col(c)).as(c)): _*)
    }),

    // Exact-dup removal materialized (keep lowest id per distinct text).
    "dedup_keep_one" -> ((s, dir) => {
      Dedup.dropExactDuplicates(docsParallel(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------------------------
    // Output-schema parity with the reference's detailed_results sink
    // (POJ variant, poj_utils.py:196-222: query_id, result_id, result_type,
    // similarity_score, is_same_type).
    // ------------------------------------------------------------------
    "detailed_results" -> ((s, dir) => {
      detailedResults(s, dir, k = 10)
        .select(col("query_id"), col("result_id"),
          col("rank"), // keeps rows unique + sortable cross-engine
          col("score").as("similarity_score"),
          col("is_relevant").as("is_same_type"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ------------------------------------------------------------------
    // P5/J3 + A6(BCB): the BigCloneBench relevance path — ground-truth
    // clone sets as arrays (A1), membership relevance via array_contains
    // (bcb_utils.py:183), and the BCB MAP denominator min(|clones|, k)
    // (bcb_utils.py:250). The clone relation here (same label AND same
    // id mod 7) is chosen so most queries have |clones| < k, genuinely
    // exercising the BCB denominator.
    // ------------------------------------------------------------------
    "ir_metrics_bcb" -> ((s, dir) => {
      val k = 10
      val emb = Tables.embeddings(s, dir)
      val a = emb.select(col("vec_id").as("ida"), col("label").as("la"),
        (col("vec_id") % 7).as("ma"))
      val b = emb.select(col("vec_id").as("idb"), col("label").as("lb"),
        (col("vec_id") % 7).as("mb"))
      val pairs = a.join(b, col("la") === col("lb") && col("ma") === col("mb") &&
        col("ida") < col("idb")).select(col("ida"), col("idb"))
      val truth = CloneGraph.adjacencyWithCounts(pairs, "ida", "idb")
      val det = detailedResults(s, dir, k)
        .join(broadcast(truth.select(col("id").as("query_id"), col("clones"),
          col("num_clones"))), Seq("query_id"), "left")
        .withColumn("is_clone",
          coalesce(array_contains(col("clones"), col("result_id")), lit(false)))
      val pq = IrMetrics.perQuery(det, relCol = "is_clone")
        .join(broadcast(truth.select(col("id").as("query_id"),
          col("num_clones").as("nc"))), Seq("query_id"), "left")
        .na.fill(0, Seq("nc"))
      val g = IrMetrics.global(pq, k, apDenominator = least(col("nc"), lit(k)))
      g.select(g.columns.map(c => r6(col(c)).as(c)): _*)
    }),

    // ------------------------------------------------------------------
    // A1: clone-graph adjacency (symmetrize + collect-distinct) on a pair
    // table. Arrays are emitted string-joined so the cross-engine compare
    // is representation-stable.
    // ------------------------------------------------------------------
    "clone_adjacency" -> ((s, dir) => {
      val pairs = Tables.lineitem(s, dir).select(col("l_orderkey").as("a"), col("l_partkey").as("b"))
      CloneGraph.adjacencyWithCounts(pairs, "a", "b")
        .select(col("id"), concat_ws(",", col("clones")).as("clones"), col("num_clones"))
        .orderBy(col("id"))
    }),

    // ------------------------------------------------------------------
    // S4/F5: the reference's line-slice read, as a column op over documents
    // (space-delimited stand-in; semantics identical — python list slice).
    // ------------------------------------------------------------------
    "line_slice" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        Corpus.sliceLines(col("text"), lit(3), lit(8), delim = " ").as("sliced"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------------------------
    // Dedup suite (training-data curation): exact groups, all-pairs n-gram
    // Jaccard (oracle path), and MinHash+LSH near-dup (scale path). The LSH
    // query shares the exact-Jaccard oracle: on this corpus every
    // qualifying pair has j ≥ 0.8 with 128 hashes / 32 bands, so P(miss)
    // < 1e-14 — a green row here certifies LSH recall, not just shape.
    // ------------------------------------------------------------------
    "dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(docsParallel(s, dir), "doc_id", "text")
        .select(col("text_hash"), col("keeper"),
          concat_ws(",", col("ids")).as("ids"), col("group_size"))
        .orderBy(col("text_hash"))
    }),

    "dedup_jaccard_pairs" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(docsParallel(s, dir), "doc_id", "text",
          n = 3, threshold = 0.8)
        .withColumn("jaccard", r6(col("jaccard")))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_minhash" -> ((s, dir) => {
      minedNearDupPairs(s, dir)
        .withColumn("jaccard", r6(col("jaccard")))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Honest bench attribution for the shared mining: this entry EVICTS
    // the memoized pair frame and re-mines, so the corpus-wide
    // tokenize+shingle+MinHash kernel — paid in untimed warmup for every
    // other dedup-family query — is timed as its own named entry, and
    // dedup_minhash's ~0.07 s reads as "marginal over shared mining".
    // Output (and oracle) identical to dedup_minhash by construction.
    "pair_mining" -> ((s, dir) => {
      evictMinedPairs(s, dir)
      minedNearDupPairs(s, dir)
        .withColumn("jaccard", r6(col("jaccard")))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // EXACT similarity join at scale: prefix-filtered AllPairs-family
    // join (Dedup.jaccardJoinPrefix) — guaranteed-complete pair set, no
    // LSH miss probability, no O(n²) cross join. Shares the all-pairs
    // oracle: output identity with the reference IS the contract.
    "jaccard_join_pairs" -> ((s, dir) => {
      Dedup.jaccardJoinPrefix(docsParallel(s, dir), "doc_id", "text",
          n = 3, threshold = 0.8)
        .withColumn("jaccard", r6(col("jaccard")))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Type-2-style verification of the near-dup candidates: UTF-8-byte
    // edit distance (codegen'd byte_levenshtein — the engine-portable
    // unit, = DuckDB's levenshtein) and normalized edit similarity over
    // the LSH-mined pair set — the cheap "is it a rename/
    // literal-change clone" check layered on the bag-of-shingles miner.
    // Pairwise cost is O(len²) but runs only on verified near-dup PAIRS
    // (corpus-size-independent set), never the corpus.
    "edit_sim_pairs" -> ((s, dir) => {
      Dedup.editSimilarity(minedNearDupPairs(s, dir),
          Tables.documents(s, dir), "doc_id", "text")
        .withColumn("edit_sim", r6(col("edit_sim")))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Near-dup pairs → transitive dedup CLUSTERS: min-label propagation
    // with pointer jumping over the LSH pair output (the keeper-selection
    // step of a corpus dedup pipeline). Oracle: recursive-CTE transitive
    // closure over the same exact-Jaccard pair set (LSH recall is 1 on
    // this corpus — see dedup_minhash). The mined pair set comes from the
    // shared memoized pass (minedNearDupPairs) — the in-session analog of
    // the persisted graft.index.MinHashIndex artifact for pipelines that
    // run the dedup family together.
    "dedup_clusters" -> ((s, dir) => {
      Dedup.connectedComponents(
          docsParallel(s, dir).select(col("doc_id")), "doc_id",
          minedNearDupPairs(s, dir), "id_a", "id_b")
        .orderBy(col("id"))
    }),

    // End-to-end near-dup removal: pairs → clusters → keep min-id
    // representative per cluster + all unclustered docs.
    "dedup_near_keep" -> ((s, dir) => {
      Dedup.dropNearDuplicates(docsParallel(s, dir), "doc_id",
          minedNearDupPairs(s, dir))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Build-once/query-many near-dup removal: same semantics (and oracle)
    // as dedup_near_keep, answered from the persisted MinHash signature
    // index. The artifact is keyed by the data dir and reused when already
    // built, so repeated calls — e.g. the bench's warmup + timed passes —
    // pay the corpus-wide tokenize+shingle+MinHash kernel once and only
    // re-run band-candidate mining + exact verify over candidate docs:
    // the amortized path the index exists for, benchmarkable against the
    // self-contained dedup_near_keep.
    // EXPECTED at small SF: this query benches SLOWER than dedup_near_keep
    // (~4 s vs ~2.6 s at sf0.1) — artifact parquet reads + the candidate
    // semi-join outweigh the skipped kernel when the corpus is 17 MB. The
    // crossover favors the index as the corpus grows: the kernel it skips
    // scales with corpus bytes, the index read is ~constant per query. Not
    // a regression; see BASELINE.md's round-6 note.
    "index_near_keep" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      // The artifact root is keyed by a corpus CONTENT fingerprint (one
      // cheap hash pass — ~10× lighter than the shingle+MinHash kernel it
      // amortizes), so a changed corpus can never silently reuse a stale
      // index; an unchanged corpus reuses it across calls.
      val fp = corpusFingerprint(Tables.documents(s, dir), col("doc_id"), col("text"))
      // Build params are part of the cache key: a stale artifact built with
      // OLD n/numHashes/bands must never be silently reused after a config
      // change — its pinned meta would override the new parameters.
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_mh_idx_${fp}_n3_h128_b32").toString
      val idx = graft.index.MinHashIndex(s, root, "documents")
      if (!idx.exists) idx.build(docs, "doc_id", "text",
        n = 3, numHashes = 128, bands = 32)
      idx.dropNearDuplicatesExact(docs, "doc_id", "text", threshold = 0.8)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Incremental admission check: which docs of an incoming batch
    // near-duplicate something ALREADY INDEXED — candidates from the
    // batch's band keys joined against the persisted band table (corpus
    // kernel paid at build), exact-Jaccard verified. The batch here is a
    // seeded sample of the corpus itself, so the oracle is the exact
    // batch×corpus Jaccard join (LSH recall is 1 at 0.8 on this corpus,
    // same argument as dedup_minhash).
    "batch_near_dup" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val fp = corpusFingerprint(Tables.documents(s, dir), col("doc_id"), col("text"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_mh_idx_${fp}_n3_h128_b32").toString
      val idx = graft.index.MinHashIndex(s, root, "documents")
      if (!idx.exists) idx.build(docs, "doc_id", "text",
        n = 3, numHashes = 128, bands = 32)
      val batch = graft.bench.Sampling.seeded(Tables.documents(s, dir), "doc_id", 50)
      idx.nearDupAgainstExact(batch, "doc_id", "text", docs, "doc_id", "text",
          threshold = 0.8)
        .select(col("batch_id"), col("match_id"), r6(col("jaccard")).as("jaccard"))
        .orderBy(col("batch_id"), col("match_id"))
    }),

    // Benchmark decontamination: corpus docs sharing ≥1 distinct 5-gram
    // with any doc of a (seeded-sample stand-in) eval set. Eval shingles
    // broadcast; the corpus streams.
    "contamination" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val evalSet = graft.bench.Sampling.seeded(Tables.documents(s, dir), "doc_id", 50)
      Dedup.contaminationScan(docs, "doc_id", "text", evalSet, "doc_id", "text",
          n = 5, minOverlap = 1, excludeSameId = true)
        .orderBy(col("doc_id"), col("eval_id"))
    }),

    // Leakage-free train/val/test split: the split is a salted-md5 hash of
    // the near-dup COMPONENT (shared memoized pair mining), so a cluster
    // can never straddle a boundary — near-duplicates of training docs
    // cannot leak into eval. Oracle: recursive-CTE closure + the identical
    // first-8-hex/2^32 uniform convention as weighted_sample.
    "split_leakfree" -> ((s, dir) => {
      graft.dedup.Splits.leakFreeSplits(
          docsParallel(s, dir), "doc_id",
          minedNearDupPairs(s, dir), "id_a", "id_b")
        .orderBy(col("id"))
    }),

    // Token-budget selection: the best-quality slice whose inclusive
    // running token total fits a fixed budget. Exact two-phase prefix sum
    // (6-dp quality buckets → bounded cumulative sweep → one straddling
    // bucket's fine pass) — no corpus-sized single-partition window.
    "budget_select" -> ((s, dir) => {
      graft.text.Selection.tokenBudgetSelect(
          Tables.documents(s, dir), "doc_id",
          TextAnalysis.qualityScore(col("text")),
          TextAnalysis.tokenCount(col("text")),
          budget = 10000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // The END-TO-END curation pass as ONE declarative plan — the
    // composition story of the pipeline operators: exact dedup (keep
    // lowest id per content) → quality gate (6-dp heuristic score ≥
    // 0.45) → token-budget selection (greedy by quality under an 8k
    // budget, the bounded-bucket sweep) → per-language batch packing
    // (512-token bins). Catalyst sees the whole lineage, so column
    // pruning reaches the scan once per stage chain, the dedup and
    // packing windows shuffle only their key columns, and no stage
    // materializes an intermediate. Every stage is individually
    // hash-certified (dedup_keep_one / doc_quality / budget_select /
    // pack_batches); this entry certifies their COMPOSITION.
    "curation_pipeline" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val deduped = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      val gated = deduped.filter(
        r6(TextAnalysis.qualityScore(col("text"))) >= 0.45)
      val selected = graft.text.Selection.tokenBudgetSelect(
          gated, "doc_id",
          TextAnalysis.qualityScore(col("text")),
          TextAnalysis.tokenCount(col("text")),
          budget = 8000L)
        .withColumnRenamed("id", "doc_id")
      val withLang = selected
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.text.Packing.batches(withLang, Seq("lang"), "doc_id",
          col("n_tokens"), budget = 512L)
        .orderBy(col("lang"), col("batch_id"))
    }),

    // Z-order clustered scan: events rewritten once (artifact keyed by
    // corpus fingerprint) into Morton-clustered files with a per-file
    // min/max skipping manifest, then a two-column range predicate reads
    // only the files whose hyper-rectangle intersects it (ZOrder
    // .readPruned re-applies the exact predicate on top — pruning is a
    // strict superset, so the oracle is a plain filter over the original
    // table). Files-read vs files-total lands in the bench artifact via
    // lastZorderScanStats.
    "zorder_scan" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val fp = corpusFingerprint(ev, col("event_id"), col("user_id"), col("value"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_zorder_${fp}_uv_f48_b12").toString
      if (!graft.index.ZOrder.hasManifest(s, root))
        graft.index.ZOrder.writeClustered(ev, Seq("user_id", "value"), root,
          numFiles = 48)
      // pruning ranges are CLOSED and must contain the predicate: value
      // prunes on [50, 80] ⊇ the half-open [50, 80) filtered below
      val (cands, total, read) = graft.index.ZOrder.readPruned(s, root,
        Seq(("user_id", 100.0, 199.0), ("value", 50.0, 80.0)))
      zorderStats.set((total, read))
      cands.filter(col("user_id").between(100L, 199L) &&
          col("value") >= 50.0 && col("value") < 80.0)
        .select(col("event_id")).orderBy(col("event_id"))
    }),

    // T2 extension: per-class balanced sample — constant quota per lang
    // under the same salted-md5 order as the global seeded sample.
    "stratified_sample" -> ((s, dir) => {
      graft.bench.Sampling.stratified(Tables.documents(s, dir), "doc_id", "lang", 20)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Pattern surface for filtering/PII-screening: URL and email counts,
    // digit ratio, repeated-token fraction — cheap codegen'd passes with
    // exact SQL twins.
    "doc_patterns" -> ((s, dir) => {
      docsParallel(s, dir).select(
        col("doc_id"),
        TextAnalysis.urlCount(col("text")).as("n_urls"),
        TextAnalysis.emailCount(col("text")).as("n_emails"),
        r6(TextAnalysis.digitRatio(col("text"))).as("digit_ratio"),
        r6(TextAnalysis.repetitionRatio(col("text"))).as("rep_ratio"))
        .orderBy(col("doc_id"))
    }),

    // PII/pattern redaction: the removing transform behind the doc_patterns
    // screen — URLs/emails/long digit runs replaced with sentinels in a
    // single codegen'd regexp_replace cascade. `changed` pins that the
    // cascade actually fires on the fixture (an all-false column would mean
    // the patterns silently stopped matching).
    "doc_redact" -> ((s, dir) => {
      docsParallel(s, dir).select(
        col("doc_id"),
        TextAnalysis.redact(col("text")).as("redacted"),
        (TextAnalysis.redact(col("text")) =!= col("text")).as("changed"))
        .orderBy(col("doc_id"))
    }),

    // MassiveText repetition suite (Gopher's other half, Rae et al. 2021):
    // duplicate-line fraction, duplicate-line CHARACTER fraction, and the
    // modal bigram's share of all bigrams — the signals that catch
    // boilerplate headers/footers and degenerate loops that token-level
    // repetitionRatio dilutes. Line stats are pure map work (an O(L²)
    // lambda over each doc's own lines — L is small and per-row); the
    // bigram mode runs explode → (doc, bigram) count with map-side
    // combine → per-doc max/sum, so the shuffle carries distinct bigrams
    // only, never positions.
    "doc_repetition" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val lines = split(col("text"), "\n")
      val totalLineChars = aggregate(lines, lit(0), (acc, l) => acc + length(l))
      val dupLineChars = aggregate(lines, lit(0), (acc, l) =>
        acc + when(size(filter(lines, x => x === l)) > 1, length(l)).otherwise(0))
      val lineStats = docs.select(
        col("doc_id"),
        size(lines).as("n_lines"),
        r6(lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
          .as("dup_line_frac"),
        r6(when(totalLineChars === 0, 0.0)
          .otherwise(dupLineChars.cast("double") / totalLineChars))
          .as("dup_line_char_frac"))
      val bigramStats = docs
        .select(col("doc_id"), explode(TextAnalysis.bigrams(col("text"))).as("bigram"))
        .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_bigram_n"), sum(col("c")).as("n_bigrams"))
      lineStats.join(bigramStats, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"),
          col("dup_line_frac"), col("dup_line_char_frac"),
          coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          r6(when(coalesce(col("n_bigrams"), lit(0L)) === 0, 0.0)
            .otherwise(col("top_bigram_n").cast("double") / col("n_bigrams")))
            .as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    }),

    // Corpus-wide vocabulary: top-50 tokens by frequency. Explode →
    // partial+final count agg (map-side combine collapses each token to
    // one row per partition) → TakeOrderedAndProject: the shuffle carries
    // |vocab| rows, the sort keeps 50 per partition — both independent of
    // corpus row count.
    "vocab_topk" -> ((s, dir) => {
      docsParallel(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    }),

    // Per-document TF-IDF keywords (top-3 terms by tf·ln(N/df)): corpus
    // exploration / tag generation, sharing Bm25.tfFrame's tokenize+TF
    // kernel so keyword TF can never diverge from retrieval TF. The TF⋈DF
    // join shuffles by term (inherent — every document needs every term's
    // IDF, unlike BM25's query-term semi-join); per-doc top-3 windows over
    // document-length-bounded frames.
    "doc_keywords" -> ((s, dir) => {
      graft.text.Keywords.tfidfKeywords(docsParallel(s, dir),
          "doc_id", "text", topN = 3)
        .orderBy(col("doc_id"), col("kw_rank"))
    }),

    // Char-bigram LM perplexity (the CCNet-style quality filter, reduced
    // to an exactly-reproducible corpus-trained model): bits per
    // character transition under add-one-smoothed bigram probabilities;
    // junk text floats to the top. Model + scoring are two aggregations
    // and a broadcast join over a builtin-codegen bigram stream — no UDF,
    // no corpus shuffle.
    "doc_perplexity" -> ((s, dir) => {
      // Wire format is INTEGER-ONLY (doc_id, n_bigrams, q20_bits): the
      // driver's gate hash-compares cells against a DuckDB replay, and a
      // double derived from a HUGEINT aggregate proved environment-
      // sensitive (hash-red r9–r11 despite local cell-exactness). The
      // q20 fixed-point score is exact in BIGINT on both engines by
      // construction; readers derive bits_per_char = q20_bits/n/2²⁰.
      graft.text.Perplexity.bitsPerChar(docsParallel(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("q20_bits"))
        .orderBy(col("doc_id"))
    }),

    // Cross-document repeated 5-gram spans (the Lee et al. exact-substring
    // dedup signal in n-gram-hash form): per doc, how many token positions
    // start an n-gram that also occurs in ≥2 distinct documents. Spans are
    // keyed by md5 (same bytes in every engine; 16-byte shuffle keys);
    // two hash aggregates + one semi-ish join, nothing quadratic.
    "doc_dup_spans" -> ((s, dir) => {
      graft.text.DupSpans.duplicatedSpans(docsParallel(s, dir),
          "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }),

    // The fix-side twin: CUT every token covered by a cross-document
    // duplicated 5-gram from every doc except the gram's canonical owner
    // (min doc id) — exactly one copy of each duplicated passage survives
    // corpus-wide. Pure integer/string arithmetic; coverage merges
    // overlapping spans per-token.
    "dedup_span_cut" -> ((s, dir) => {
      graft.text.DupSpans.cutDuplicatedSpans(docsParallel(s, dir),
          "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }),

    // Index-backed span cut (build-once/query-many sibling of
    // index_near_keep / bm25_index_topk): ownership read from the
    // persisted hash-partitioned gram table instead of recomputing the
    // corpus kernel — output identical by construction, shares
    // dedup_span_cut's oracle.
    "index_span_cut" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val fp = corpusFingerprint(Tables.documents(s, dir), col("doc_id"), col("text"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_span_${fp}_n5_b64").toString
      val idx = graft.index.SpanIndex(s, root, "documents")
      if (!idx.exists) idx.build(docs, "doc_id", "text", n = 5)
      idx.cut(docs, "doc_id", "text", batchIsIndexed = true)
        .orderBy(col("doc_id"))
    }),

    // Exact corpus length quantiles (linear interpolation at p·(n−1) —
    // the same formula in Spark's percentile and DuckDB's quantile_cont).
    // Exact percentile sorts per group; for a single global group that is
    // one TakeOrdered-ish agg — at 100 TB use approx_percentile and drop
    // the oracle instead, documented here as the scale escape hatch.
    "doc_len_quantiles" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(TextAnalysis.tokenCount(col("text")).as("n"))
        .agg(
          r6(expr("percentile(n, 0.25)")).as("p25"),
          r6(expr("percentile(n, 0.5)")).as("p50"),
          r6(expr("percentile(n, 0.75)")).as("p75"),
          r6(expr("percentile(n, 0.95)")).as("p95"))
    }),

    // Token-length histogram: fixed arithmetic buckets of 50 tokens capped
    // at bucket 9 — one hash-agg pass, constant output size at any scale.
    "doc_len_hist" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(least(floor(TextAnalysis.tokenCount(col("text")) / 50), lit(9))
          .cast("int").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("bucket"))
    }),

    // ------------------------------------------------------------------
    // Embedding-cosine near-duplicate pairs (exact all-pairs oracle path;
    // Ann.nearDupPairsLsh is the scale path, certified by ann_recall).
    // ------------------------------------------------------------------
    "near_dup_cosine" -> ((s, dir) => {
      Ann.nearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.45, roundScoreTo = Some(6))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SemDeDup-style cell-bounded semantic dedup: embeddings routed to a
    // cell (Ivf.assign), cosine pairs mined ONLY within cells — the n²/C
    // scale path for embedding-level dedup. Centroids here are the
    // embeddings of the 8 smallest vec_ids (deterministic seed docs), so
    // the cell assignment — argmax cosine, smallest-index tie-break,
    // exactly NearestCentroids' selection rule — is expressible in DuckDB
    // and the oracle certifies routing AND pair mining cross-engine. The
    // production path swaps in Ivf.trainCentroids (seeded KMeans) without
    // touching the operator; SemDedupSpec pins KMeans-centroid behavior,
    // cross-cell exclusion, and the 1-cell ≡ all-pairs identity.
    "semantic_dedup" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      val seeds = Tables.embeddings(s, dir).orderBy(col("vec_id")).limit(8)
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray)
      SemDedup.cellNearDupPairs(emb, "vec_id", "embedding", seeds,
          threshold = 0.45, roundScoreTo = Some(6))
        .orderBy(col("cell"), col("id_a"), col("id_b"))
    }),

    // ------------------------------------------------------------------
    // ANN quality gate: recall@10 of the SRP-LSH join vs the exact kNN
    // join, as a single scalar row. Full DuckDB twin (annRecallSql): the
    // splitmix64 plane derivation replays in HUGEINT mod-2⁶⁴ SQL and the
    // projection sums via ordered list_reduce; AnnSpec additionally pins
    // a recall floor and candidate-set ceiling.
    // Config note: the fixture embeddings are near-isotropic (top-10
    // neighbor cosines ≈ 0.22–0.47), so signature selectivity is bought
    // with recall. bits=8/tables=64 measures recall ≈ 0.73 with a
    // candidate set ≈ 25% of the corpus per query — vs the earlier
    // bits=4/tables=8 whose 16 buckets/table collapsed toward broadcasting
    // |Q|·|C|. On production corpora (clustered, high neighbor cosine)
    // bits should rise toward the API default 12+; AnnSpec pins both the
    // recall floor and a candidate-set ceiling at this config.
    // ------------------------------------------------------------------
    "ann_recall" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      val q = knnQueries(s, dir)
      val exact = Knn.knnJoin(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"))
      val approx = Ann.knnJoinLsh(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, bits = annRecallBits, tables = annRecallTables,
          roundScoreTo = Some(6), maxBucketSize = 10000)
        .select(col("query_id"), col("vec_id").as("result_id"), lit(1).as("__found"))
      recallFloor(
        exact.join(approx, Seq("query_id", "result_id"), "left")
          .agg((sum(coalesce(col("__found"), lit(0))).cast("double") / count(lit(1)))
            .as("recall_at_k")),
        floor = 0.5, q = "ann_recall")
    }),

    // Int8 scalar quantization quality gate: recall@10 of exact search
    // over the 4x-compressed int8 codes vs full-float exact search. The
    // quantized corpus is a pure map off the scan (no fit pass); scoring
    // runs integer dot/norms on the codes. Full DuckDB oracle since r14
    // (quantRecallSql: exact code + integer-cosine replay); QuantizeSpec
    // pins recall ≥ 0.9. The compression is the point: at 100 TB the code
    // corpus is a quarter the bytes through scan, cache, and scoring.
    "quant_recall" -> ((s, dir) => {
      import graft.functions.quantize_int8
      val emb = embParallel(s, dir)
      val q = knnQueries(s, dir)
      val exact = Knn.knnJoin(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"))
      val codes = emb.select(col("vec_id"), quantize_int8(col("embedding")).as("code"))
      val qCodes = q.select(col("vec_id"), quantize_int8(col("embedding")).as("code"))
      val quant = Knn.knnJoin(qCodes, "vec_id", "code",
          codes, "vec_id", "code", k = 10, metric = "int8", roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"), lit(1).as("__found"))
      recallFloor(
        exact.join(quant, Seq("query_id", "result_id"), "left")
          .agg((sum(coalesce(col("__found"), lit(0))).cast("double") / count(lit(1)))
            .as("recall_at_k")),
        floor = 0.9, q = "quant_recall")
    }),

    // ------------------------------------------------------------------
    // E1 (SURVEY §2.8): text→vector embedding — TF-IDF pipeline behind the
    // Embedder trait (the reference's SentenceTransformer stand-in,
    // bcb_utils.py:101). Round 12: the embedder is engine-stable end to
    // end (FNV-1a hashing, q20 idf, fixed accumulation orders — see
    // graft.embed.TfIdfEmbedder), so BOTH queries carry full DuckDB
    // oracles (embedTfidfCtes); EmbedderSpec pins semantics.
    // ------------------------------------------------------------------
    "embed_corpus" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val model = new graft.embed.TfIdfEmbedder(dim = 256).fit(docs, "text")
      model.transform(docs, "text", "embedding")
        .select(col("doc_id"), size(col("embedding")).as("dim"),
          r6(graft.functions.l2_norm(col("embedding"))).as("norm"))
        .orderBy(col("doc_id"))
    }),

    // Full reference lifecycle on documents: fit → embed corpus → embed the
    // (seeded-sample) queries with the SAME model → exact top-5 cosine.
    // The embedded corpus feeds the query sample, the broadcast side, and
    // the streamed corpus side — persisted for the query's lifetime so the
    // TF-IDF transform runs once (same scoped-persist shape as the dedup
    // operators), with the small top-k result materialized eagerly.
    "embed_knn" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val model = new graft.embed.TfIdfEmbedder(dim = 256).fit(docs, "text")
      val vecs = model.transform(docs, "text", "vec").select(col("doc_id"), col("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val queries = graft.bench.Sampling.seeded(vecs, "doc_id", 100)
        Knn.knnJoin(queries, "doc_id", "vec", vecs, "doc_id", "vec",
            k = 5, roundScoreTo = Some(6))
          .select(col("query_id"), col("doc_id").as("result_id"),
            col("rank"), col("score"))
          .orderBy(col("query_id"), col("rank"))
          .localCheckpoint(true)
      } finally vecs.unpersist(false)
    }),

    // IVF quality gate: recall@10 of the inverted-file probe join vs exact
    // kNN. GRADUATED to a full DuckDB oracle (round 14, the BPE playbook):
    // centroid training is LatticeKmeans — bounded seeded sample, exact
    // integer Lloyd rounds, dyadic float centroids — so the oracle replays
    // training as 8 materialized CTE rounds, then cosine probe routing and
    // r6 scoring over the identical doubles (ivfRecallSql). The recall
    // floor stays as the quality gate; IvfSpec proves full-probe ≡ exact.
    "ivf_recall" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      val q = knnQueries(s, dir)
      val cents = graft.search.Ivf.trainCentroids(emb, "vec_id", "embedding",
        nList = 16, seed = 42L)
      val exact = Knn.knnJoin(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"))
      val approx = graft.search.Ivf.knnJoinIvf(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, centroids = cents, nProbe = 4,
          roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"), lit(1).as("__found"))
      recallFloor(
        exact.join(approx, Seq("query_id", "result_id"), "left")
          .agg((sum(coalesce(col("__found"), lit(0))).cast("double") / count(lit(1)))
            .as("recall_at_k")),
        floor = 0.3, q = "ivf_recall")
    }),

    // The PERSISTED pruning path at the driver surface: the same recall@10
    // measurement as ivf_recall, but the probe runs against the
    // cell-partitioned IvfCollection layout, so the scan reads only the
    // probed cell directories (static partition pruning — the 100 TB scan
    // shape, plan-asserted in IvfCollectionSpec). The artifact is keyed by
    // a corpus fingerprint and reused across calls (build-once/query-many,
    // like index_near_keep). Identical output to ivf_recall by
    // construction, so it shares ivfRecallSql verbatim (full oracle, r14).
    "ivf_partitioned_recall" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      val q = knnQueries(s, dir)
      val fp = corpusFingerprint(Tables.embeddings(s, dir), col("vec_id"), col("embedding"))
      // nList/seed in the key for the same stale-reuse reason as the
      // MinHash index cache above; the routing version too, so a cache
      // built under older (or pre-versioning) routing arithmetic misses
      // instead of tripping the collection's version guard.
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_ivfcol_${fp}_nl16_s42_lk1_rv${graft.index.IvfCollection.RoutingVersion}").toString
      val ivfc = graft.index.IvfCollection(s, root, "embeddings")
      if (!ivfc.exists) ivfc.build(emb, "vec_id", "embedding", nList = 16, seed = 42L)
      val exact = Knn.knnJoin(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"))
      val approx = ivfc.query(q, "vec_id", "embedding", "vec_id", "embedding",
          k = 10, nProbe = 4, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"), lit(1).as("__found"))
      recallFloor(
        exact.join(approx, Seq("query_id", "result_id"), "left")
          .agg((sum(coalesce(col("__found"), lit(0))).cast("double") / count(lit(1)))
            .as("recall_at_k")),
        floor = 0.3, q = "ivf_partitioned_recall")
    }),

    // The COMPRESSED persisted pruning path: same recall@10 measurement,
    // but the IvfCollection layout stores int8 codes + scales (4× fewer
    // vector bytes per probed cell) and scores code-vs-code in integer
    // arithmetic — cell pruning × int8 compression is the production
    // artifact shape for a 100 TB corpus. Recall vs full-float exact kNN
    // compounds BOTH losses (pruning + quantization); IvfCollectionSpec
    // pins its floor next to the uncompressed path's.
    "ivf_int8_recall" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      val q = knnQueries(s, dir)
      val fp = corpusFingerprint(Tables.embeddings(s, dir), col("vec_id"), col("embedding"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_ivfcol8_${fp}_nl16_s42_lk1_rv${graft.index.IvfCollection.RoutingVersion}").toString
      val ivfc = graft.index.IvfCollection(s, root, "embeddings")
      if (!ivfc.exists) ivfc.build(emb, "vec_id", "embedding", nList = 16, seed = 42L,
        int8 = true)
      val exact = Knn.knnJoin(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"))
      val approx = ivfc.query(q, "vec_id", "embedding", "vec_id", "embedding",
          k = 10, nProbe = 4, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"), lit(1).as("__found"))
      recallFloor(
        exact.join(approx, Seq("query_id", "result_id"), "left")
          .agg((sum(coalesce(col("__found"), lit(0))).cast("double") / count(lit(1)))
            .as("recall_at_k")),
        floor = 0.3, q = "ivf_int8_recall")
    }),

    // The MAXIMALLY-compressed persisted pruning path: IVF-PQ (Jégou 2011)
    // stores one BYTE per subspace — 32x fewer vector bytes at 64-dim/m=8
    // vs float (int8's 4x squared) — and scores the float query against
    // the codebook reconstruction (asymmetric: only the corpus side pays
    // quantization loss). recall@10 vs full-float exact kNN compounds
    // cell-pruning + PQ loss; IvfCollectionSpec pins the floor. Full
    // oracle since r14: lattice codebooks replay as m×iters Lloyd-round
    // CTEs + ADC reconstruction scoring (ivfPqRecallSql).
    "ivf_pq_recall" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      val q = knnQueries(s, dir)
      val fp = corpusFingerprint(Tables.embeddings(s, dir), col("vec_id"), col("embedding"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_ivfcolpq_${fp}_nl16_s42_m8_lk2_rv${graft.index.IvfCollection.RoutingVersion}").toString
      val ivfc = graft.index.IvfCollection(s, root, "embeddings")
      if (!ivfc.exists) ivfc.build(emb, "vec_id", "embedding", nList = 16, seed = 42L,
        pq = true, pqM = 8, pqCodebookSize = 256)
      val exact = Knn.knnJoin(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"))
      val approx = ivfc.query(q, "vec_id", "embedding", "vec_id", "embedding",
          k = 10, nProbe = 4, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"), lit(1).as("__found"))
      recallFloor(
        exact.join(approx, Seq("query_id", "result_id"), "left")
          .agg((sum(coalesce(col("__found"), lit(0))).cast("double") / count(lit(1)))
            .as("recall_at_k")),
        floor = 0.2, q = "ivf_pq_recall")
    }),

    // The bandwidth-extreme pruning path: IVF-binary stores 1 BIT per
    // dimension (32x, no codebooks) and recovers ranking quality by
    // rescoring k*oversample sign-sketch candidates at full precision —
    // only |Q|*k*oversample rows ever touch float vectors. Full oracle
    // since r14 (ivfBinaryRecallSql: sign-sketch candidates + rescore
    // replay); IvfCollectionSpec pins the rescored recall floor.
    "ivf_binary_recall" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      val q = knnQueries(s, dir)
      val fp = corpusFingerprint(Tables.embeddings(s, dir), col("vec_id"), col("embedding"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_ivfcolbin_${fp}_nl16_s42_lk1_rv${graft.index.IvfCollection.RoutingVersion}").toString
      val ivfc = graft.index.IvfCollection(s, root, "embeddings")
      if (!ivfc.exists) ivfc.build(emb, "vec_id", "embedding", nList = 16, seed = 42L,
        binary = true)
      val exact = Knn.knnJoin(q, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"))
      val approx = ivfc.query(q, "vec_id", "embedding", "vec_id", "embedding",
          k = 10, nProbe = 4, roundScoreTo = Some(6),
          rescore = Some(emb), oversample = 4)
        .select(col("query_id"), col("vec_id").as("result_id"), lit(1).as("__found"))
      recallFloor(
        exact.join(approx, Seq("query_id", "result_id"), "left")
          .agg((sum(coalesce(col("__found"), lit(0))).cast("double") / count(lit(1)))
            .as("recall_at_k")),
        floor = 0.3, q = "ivf_binary_recall")
    }),

    // BM25 full-text retrieval (Okapi ranking) — the lexical half of
    // hybrid search. One TF aggregate with dl riding as a grouping key,
    // query-term-restricted DF broadcast, DECIMAL-summed per-pair scores,
    // bounded-heap top-k. The only transcendental (idf) is 6dp-quantized
    // at the source, so the DuckDB twin reproduces scores cell-exactly.
    "bm25_topk" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val q = graft.bench.Sampling.seeded(Tables.documents(s, dir), "doc_id", 10)
      graft.search.Bm25.search(docs, "doc_id", "text", q, "doc_id", "text",
          k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("doc_id").as("result_id"),
          col("rank"), col("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Hybrid retrieval: BM25 top-20 and cosine top-20 fused by reciprocal
    // ranks (RRF k=60) — the scale-free lexical+vector combination every
    // modern retrieval stack ships. The fixture's doc_id and vec_id share
    // one id domain, so the sampled query docs drive both sides and the
    // fused ranking is fully oracle-expressible.
    "hybrid_rrf" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val emb = embParallel(s, dir)
      val qDocs = graft.bench.Sampling.seeded(Tables.documents(s, dir), "doc_id", 10)
      // lexical side reads the persisted inverted index (the production
      // hybrid-service shape); its answers are output-identical to the
      // self-contained operator by the shared-kernel construction, so the
      // oracle is unchanged.
      val fp = corpusFingerprint(Tables.documents(s, dir), col("doc_id"), col("text"))
      val idxRoot = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_bm25_${fp}_b64").toString
      val idx = graft.index.Bm25Index(s, idxRoot, "documents")
      if (!idx.exists) idx.build(docs, "doc_id", "text")
      val lexical = idx.query(qDocs, "doc_id", "text", k = 20,
          roundScoreTo = Some(6), outIdCol = "result_id")
        .select(col("query_id"), col("result_id"), col("rank"))
      val qVecs = Tables.embeddings(s, dir)
        .join(broadcast(qDocs.select(col("doc_id").as("vec_id"))), Seq("vec_id"))
      val vector = Knn.knnJoin(qVecs, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 20, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"), col("rank"))
      graft.search.Hybrid.rrf(Seq(lexical, vector), k = 60, topK = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Hybrid retrieval, weighted mode: the same BM25 top-20 + cosine
    // top-20 lists as hybrid_rrf, fused by min-max-normalized convex
    // combination (alpha = 0.5) instead of reciprocal ranks — the fusion
    // users reach for when score MAGNITUDES matter (RRF treats a near-tie
    // and a blowout identically). alpha = 0.5 is exactly representable in
    // binary, so the weighted contributions stay cross-engine exact.
    "hybrid_weighted" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val emb = embParallel(s, dir)
      val qDocs = graft.bench.Sampling.seeded(Tables.documents(s, dir), "doc_id", 10)
      val fp = corpusFingerprint(Tables.documents(s, dir), col("doc_id"), col("text"))
      val idxRoot = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_bm25_${fp}_b64").toString
      val idx = graft.index.Bm25Index(s, idxRoot, "documents")
      if (!idx.exists) idx.build(docs, "doc_id", "text")
      val lexical = idx.query(qDocs, "doc_id", "text", k = 20,
          roundScoreTo = Some(6), outIdCol = "result_id")
        .select(col("query_id"), col("result_id"), col("score"))
      val qVecs = Tables.embeddings(s, dir)
        .join(broadcast(qDocs.select(col("doc_id").as("vec_id"))), Seq("vec_id"))
      val vector = Knn.knnJoin(qVecs, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 20, roundScoreTo = Some(6))
        .select(col("query_id"), col("vec_id").as("result_id"), col("score"))
      graft.search.Hybrid.weighted(vector, lexical, alpha = 0.5, topK = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Index-backed BM25: same queries, same output (and same oracle) as
    // bm25_topk, answered from the persisted inverted index — the
    // build-once/query-many lexical path (sibling of index_near_keep).
    // Fingerprint+params-keyed artifact, reused across calls; the corpus
    // tokenize+TF kernel is paid at build only. Like index_near_keep, the
    // sf0.1 bench shows the amortized path near the self-contained one —
    // the crossover favors the index as the corpus grows.
    "bm25_index_topk" -> ((s, dir) => {
      val docs = docsParallel(s, dir)
      val fp = corpusFingerprint(Tables.documents(s, dir), col("doc_id"), col("text"))
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_bm25_${fp}_b64").toString
      val idx = graft.index.Bm25Index(s, root, "documents")
      if (!idx.exists) idx.build(docs, "doc_id", "text")
      val q = graft.bench.Sampling.seeded(Tables.documents(s, dir), "doc_id", 10)
      idx.query(q, "doc_id", "text", k = 10, roundScoreTo = Some(6),
          outIdCol = "result_id")
        .select(col("query_id"), col("result_id"), col("rank"), col("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Domain-mix reweighting: per-language sampling probabilities that
    // steer the corpus toward a target mixture (the data-mixing step of
    // every pretraining pipeline — fixed target shares here; a learned
    // DoReMi-style weighting plugs into the same shape). weight =
    // target/actual share; sample_prob normalizes by the max weight so the
    // most-underrepresented group keeps everything and the rest downsample
    // proportionally (feed sample_prob to Sampling.weighted). One tiny
    // grouped frame; the windows run over |langs| rows, never the corpus.
    "mix_weights" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val target = Seq("en" -> 0.40, "es" -> 0.15, "de" -> 0.15,
        "fr" -> 0.15, "zh" -> 0.15)
      val tcol = coalesce(element_at(
        map(target.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("lang")), lit(0.0))
      val w = Window.partitionBy()
      Tables.documents(s, dir)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .withColumn("__actual",
          col("n_docs").cast("double") / sum(col("n_docs")).over(w).cast("double"))
        .withColumn("__target", tcol)
        .withColumn("__weight", col("__target") / col("__actual"))
        .select(col("lang"), col("n_docs"),
          r6(col("__actual")).as("actual_share"),
          col("__target").as("target_share"),
          r6(col("__weight")).as("weight"),
          r6(col("__weight") / max(col("__weight")).over(w)).as("sample_prob"))
        .orderBy(col("lang"))
    }),

    // Embedding-corpus health: dims, L2-norm distribution, zero vectors —
    // the one-pass diagnostic run before building any index (a dim
    // mismatch or a batch of zero vectors silently poisons recall). One
    // partial+final agg, constant output at any corpus size.
    "embedding_stats" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(size(col("embedding")).as("dim"),
          r6(graft.functions.l2_norm(col("embedding"))).as("norm"))
        .agg(
          count(lit(1)).as("n_vecs"),
          min(col("dim")).as("dim_min"),
          max(col("dim")).as("dim_max"),
          r6(stableMean(col("norm"))).as("avg_norm"),
          min(col("norm")).as("min_norm"),
          max(col("norm")).as("max_norm"),
          count(when(col("norm") === 0.0, 1)).as("n_zero"))
    }),

    // Embedding-space outlier scan: mean cosine similarity to the 10
    // nearest neighbors WITHIN a seeded 500-vector reference sample, 20
    // strongest outliers (lowest density) first — the embedding-level
    // junk filter next to the Gopher text rules. The sample (not the
    // corpus) is broadcast, so the plan is one streaming corpus pass at
    // any scale; exact self-kNN density would be |C|².
    "embed_outliers" -> ((s, dir) => {
      val emb = embParallel(s, dir)
      graft.search.Outliers.topOutliers(
        emb, "vec_id", "embedding",
        graft.bench.Sampling.seeded(Tables.embeddings(s, dir), "vec_id", 500),
        "vec_id", "embedding", k = 10, n = 20)
    }),

    // SimHash near-dups: FNV-1a token hashes + Charikar bit votes — fully
    // deterministic integer arithmetic, replayed in SQL by the oracle
    // (simhashPairsSql); semantics also pinned in DedupSpec.
    "simhash_pairs" -> ((s, dir) => {
      Dedup.simHashNearDups(docsParallel(s, dir), "doc_id", "text",
          maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // MOSS-winnowing near-dups (rolling-hash fingerprints): the POSITIONAL
    // dedup scheme — any shared ≥ w+k-1-char run guarantees a shared
    // fingerprint, catching lifted blocks that bag-of-shingles similarity
    // dilutes. Full DuckDB oracle since r11 (winnowPairsSql replays the
    // Karp-Rabin fold over HUGEINT; encoding-faithful via UTF-16 units
    // since r14); the winnowing guarantee, locality, and skew cap are
    // pinned in WinnowingSpec/DedupSpec.
    // minShared=10: on this corpus shared-fingerprint counts are cleanly
    // bimodal — incidental short runs share 3-5, true near-dups 10+ (the
    // pair set then matches the jaccard-0.8 dedup_minhash family).
    "winnow_pairs" -> ((s, dir) => {
      Dedup.winnowNearDups(docsParallel(s, dir), "doc_id", "text",
          k = 12, w = 8, minShared = 10)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ------------------------------------------------------------------
    // Text-analysis suite (training-data curation): token counts, mean
    // token length, punctuation ratio, reflow-stable fingerprint (F-group
    // extensions), language id, and quality scoring — all builtin-only
    // column expressions with exact DuckDB twins.
    // ------------------------------------------------------------------
    "text_stats" -> ((s, dir) => {
      docsParallel(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("n_lex_tokens"),
        r6(TextAnalysis.avgTokenLen(col("text"))).as("avg_token_len"),
        r6(TextAnalysis.punctRatio(col("text"))).as("punct_ratio"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // REAL learned-subword tokenization (graft.text.Bpe): merges trained
    // driver-side on a bounded seeded sample (64 merges, 200 docs — the
    // production sample-train/map-encode split), corpus encoded in one
    // map-side codegen'd pass. FULL oracle since round 13: the iterative
    // merge training replays in SQL as 64 materialized CTE rounds
    // (pair-count, argmax, greedy merge over a double-space-joined
    // symbol string, where replace() IS the left-to-right merge pass),
    // and the encode replays as a recursive CTE applying the
    // lowest-ranked contained merge until none applies — see
    // bpeReplaySql. Encoding-faithful since round 14: the SQL tie-break
    // orders UTF-16 code-unit lists (sqlUtf16Units), matching Scala's
    // String.compareTo on any Unicode text. BpeSpec still pins training
    // and encoding against the hand-computed classic reference.
    "bpe_tokens" -> ((s, dir) => {
      val m = bpeMerges(s, dir)
      // coalesce: the kernel null-propagates (NULL text -> NULL count) but
      // the oracle's LEFT JOIN + COALESCE treats NULL text as zero words;
      // '' encodes to the empty token list, matching the oracle exactly
      val t = coalesce(col("text"), lit(""))
      Tables.documents(s, dir).select(col("doc_id"),
          graft.text.Bpe.tokenCount(t, m).as("n_subwords"),
          substring(md5(concat_ws("\u0001",
            graft.text.Bpe.encode(t, m))), 1, 16).as("sub_fp"))
        .orderBy(col("doc_id"))
    }),

    // Same pipeline, human-readable segmentation fingerprint: sub_fp
    // above joins subwords on  (a byte that cannot appear in a
    // whitespace-split word), seg_fp on a plain space — both certify the
    // learned segmentation; this entry is the one the round-13 verdict
    // named as the encode-half graduation deliverable.
    "bpe_encode" -> ((s, dir) => {
      val m = bpeMerges(s, dir)
      val t = coalesce(col("text"), lit("")) // NULL text = zero words (oracle parity)
      Tables.documents(s, dir).select(col("doc_id"),
          graft.text.Bpe.tokenCount(t, m).as("n_subwords"),
          substring(md5(concat_ws(" ",
            graft.text.Bpe.encode(t, m))), 1, 16).as("seg_fp"))
        .orderBy(col("doc_id"))
    }),

    "lang_id" -> ((s, dir) => {
      docsParallel(s, dir)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    "doc_quality" -> ((s, dir) => {
      docsParallel(s, dir)
        .select(col("doc_id"), r6(TextAnalysis.qualityScore(col("text"))).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Gopher document-level filter (Rae et al. 2021, App. A1.1): the
    // published heuristic suite as one codegen'd map-side pass — per-rule
    // inputs surfaced for auditing plus the composite keep decision (the
    // BOOLEAN is oracle-checked too: every term is a single integer-ratio
    // division, so thresholds compare identically cross-engine). At 100 TB
    // this is the cheap first cut that runs before any pairwise dedup.
    "doc_gopher" -> ((s, dir) => {
      val t = col("text")
      docsParallel(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(t).as("n_words"),
        r6(TextAnalysis.avgTokenLen(t)).as("mean_word_len"),
        r6(TextAnalysis.symbolWordRatio(t)).as("symbol_ratio"),
        r6(TextAnalysis.alphaWordRatio(t)).as("alpha_ratio"),
        r6(TextAnalysis.bulletLineRatio(t)).as("bullet_ratio"),
        r6(TextAnalysis.ellipsisLineRatio(t)).as("ellipsis_ratio"),
        TextAnalysis.gopherStopHits(t).as("stop_hits"),
        TextAnalysis.gopherKeep(t).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Per-group top-k OUTSIDE the knn context: best-3 docs by quality per
    // language through the same bounded-heap aggregate (top_k_rows) that
    // powers knn — certifying the aggregate against a SQL rank-window
    // oracle on a second, unrelated grouping. Shuffle carries ≤ 3 rows per
    // (partition, lang) partial, corpus-size independent.
    "top_docs_per_lang" -> ((s, dir) => {
      import graft.functions.top_k_rows
      val scored = docsParallel(s, dir).select(col("lang"), col("doc_id"),
        r6(TextAnalysis.qualityScore(col("text"))).as("quality"))
      scored.groupBy(col("lang"))
        .agg(top_k_rows(struct(col("doc_id"), col("quality")),
          col("quality"), col("doc_id").cast("long"), 3).as("__tk"))
        .select(col("lang"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
        .select(col("lang"), col("__e.doc_id").as("doc_id"),
          col("__e.quality").as("quality"),
          (col("__pos") + 1).cast("int").as("rank"))
        .orderBy(col("lang"), col("rank"))
    }),

    // ------------------------------------------------------------------
    // Multimodal columns: media as opaque binary + typed metadata struct
    // (graft.multimodal). media_meta is the oracle-checked schema slice;
    // multimodal_knn runs the full binary→features→knn pipeline with the
    // deterministic byte-histogram extractor — round 12: full DuckDB twin
    // (multimodalKnnSql replays the histogram kernel over the text's
    // exact UTF-8 bytes — encoding-faithful on any Unicode fixture).
    // Guard policy (r14, measured at 30x): the FULL-decode queries
    // (audio_env, audio_meta_decode, video_meta, video_frames) rebalance
    // via docsParallel — per-row decode CPU dominates and serializes on
    // an under-split scan; the header-only/stripe ones (media_meta,
    // frame_hist) deliberately do NOT — their per-row cost is too small
    // to repay the packText input shuffle (0.30→0.58 s regression when
    // tried).
    // ------------------------------------------------------------------
    "media_meta" -> ((s, dir) => {
      Multimodal.packText(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("meta.kind").as("kind"),
          col("meta.n_bytes").as("n_bytes"))
        .orderBy(col("doc_id"))
    }),

    "multimodal_knn" -> ((s, dir) => {
      val media = Multimodal.packText(docsParallel(s, dir), "doc_id", "text")
      val feats = Multimodal.extractFeatures(media, "media", "feat", buckets = 64)
        .select(col("doc_id"), col("feat"))
      val queries = graft.bench.Sampling.seeded(feats, "doc_id", 50)
      Knn.knnJoin(queries, "doc_id", "feat", feats, "doc_id", "feat",
          k = 5, roundScoreTo = Some(6))
        .select(col("query_id"), col("doc_id").as("result_id"),
          col("rank"), col("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Byte-stripe frame sampling — the codec-less fallback path
    // (Multimodal.sampleFrameFeatures; inter-frame codecs like H.264
    // have no JRE decoder): k byte stripes per payload reduced to
    // L2-normalized byte histograms, replayed exactly in SQL. MJPEG
    // payloads take the REAL decode path — video_meta / video_frames
    // below. The
    // twin reproduces the substr stripe RANGES (floor(L·f/k) bounds —
    // NOT per-element floor binning, which differs at non-divisible
    // lengths); ss sums are exact integers in double so accumulation
    // order is moot; wire = float-cast value rounded to 6dp, the
    // multimodal_knn contract. Stripes and bins run over the payload's
    // exact UTF-8 bytes in both engines (encoding-faithful).
    "frame_hist" -> ((s, dir) => {
      val media = Multimodal.packText(Tables.documents(s, dir), "doc_id", "text")
      Multimodal.sampleFrameFeatures(media, "media", "feat", k = 4, buckets = 8)
        .select(col("doc_id"), col("frame_idx"),
          posexplode(col("feat")).as(Seq("b", "v")))
        .select(col("doc_id"), col("frame_idx"), col("b"),
          r6(col("v").cast("double")).as("v"))
        .orderBy(col("doc_id"), col("frame_idx"), col("b"))
    }),

    // REAL audio decode over synthesized PCM WAV payloads (no audio files
    // ship in this container): synth_wav builds a seeded all-integer
    // sawtooth clip per doc, javax.sound decodes it back, and the oracle
    // replays the generating formula symbolically — a true round-trip
    // check of container parse + sample decode + envelope kernel. The
    // envelope rides the integer-only wire format (per-window |sample|
    // sums, the doc_perplexity playbook), keeping doubles off the wire.
    "audio_meta_decode" -> ((s, dir) => {
      val media = docsParallel(s, dir).select(col("doc_id"),
        graft.functions.synth_wav(col("doc_id"),
          (lit(800) + (col("doc_id") % 7) * 160).cast("int"), lit(8000)).as("media"))
      media.select(col("doc_id"), Multimodal.audioMeta(col("media")).as("m"))
        .select(col("doc_id"), col("m.sample_rate").as("sample_rate"),
          col("m.channels").as("channels"), col("m.bits").as("bits"),
          col("m.n_frames").as("n_frames"), col("m.format").as("format"))
        .orderBy(col("doc_id"))
    }),

    "audio_env" -> ((s, dir) => {
      val media = docsParallel(s, dir).select(col("doc_id"),
        graft.functions.synth_wav(col("doc_id"),
          (lit(800) + (col("doc_id") % 7) * 160).cast("int"), lit(8000)).as("media"))
      media.select(col("doc_id"),
          posexplode(graft.functions.audio_env_sums(col("media"), 8)))
        .select(col("doc_id"), col("pos").as("w"), col("col").as("sum_abs"))
        .orderBy(col("doc_id"), col("w"))
    }),

    // REAL video frame decode over synthesized MJPEG payloads (the
    // synth_wav playbook for video): synth_mjpeg hand-encodes k
    // solid-gray baseline JPEG frames per doc (single-component, all-ones
    // quant, DC-only blocks — bit-exact through any conformant decoder),
    // mjpeg_frames splits the stream on SOI/EOI markers, ImageIO decodes
    // each frame for real, and the oracle replays the generating formula
    // symbolically (gray of frame f = 16 + (doc_id·31 + f·7) mod 225) —
    // a true round-trip of container split + entropy decode + IDCT +
    // grid-feature kernel. No stub anywhere on this path.
    "video_meta" -> ((s, dir) => {
      val media = docsParallel(s, dir).select(col("doc_id"),
        graft.functions.synth_mjpeg(col("doc_id"),
          (lit(2) + col("doc_id") % 3).cast("int"), lit(16)).as("media"))
      Multimodal.videoFrameMeta(media, "media")
        .select(col("doc_id"), col("frame_idx"),
          col("frame_meta.width").as("width"),
          col("frame_meta.height").as("height"),
          col("frame_meta.format").as("format"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    "video_frames" -> ((s, dir) => {
      val media = docsParallel(s, dir).select(col("doc_id"),
        graft.functions.synth_mjpeg(col("doc_id"),
          (lit(2) + col("doc_id") % 3).cast("int"), lit(16)).as("media"))
      Multimodal.sampleVideoFrameFeatures(media, "media", "feat", grid = 1)
        .select(col("doc_id"), col("frame_idx"),
          posexplode(col("feat")).as(Seq("b", "v")))
        .select(col("doc_id"), col("frame_idx"), col("b"),
          r6(col("v").cast("double")).as("v"))
        .orderBy(col("doc_id"), col("frame_idx"), col("b"))
    }),

    // ------------------------------------------------------------------
    // Streaming surface, batch-checked: the SAME windowed event-time
    // aggregation graft.streaming drives through a real StreamingQuery
    // (watermark + tumbling window), oracle-checked here in batch mode —
    // Spark's unified Dataset API runs one plan for both. Window starts
    // are emitted as formatted strings: timestamp wire formats differ
    // between engines (LTZ vs naive), strings don't.
    // ------------------------------------------------------------------
    "events_windowed" -> ((s, dir) => {
      Streaming.windowedEventStats(Streaming.eventsBatch(s, dir))
        .withColumn("w_start", date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    // Cohort retention matrix: users grouped by first-active week, counted
    // per weekly offset they return in — the classic engagement analysis
    // (completes the events breadth next to funnel/sessions). Two hash
    // aggregates over (user, week) pairs; the distinct collapses to one
    // row per user-week before anything joins, so the join and the final
    // count are active-users-sized, not events-sized.
    "user_retention" -> ((s, dir) => {
      val weeks = Streaming.eventsBatch(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("act_week"))
        .distinct()
      val cohort = weeks.groupBy(col("user_id"))
        .agg(min(col("act_week")).as("cohort_week"))
      weeks.join(cohort, Seq("user_id"))
        .withColumn("week_offset",
          (datediff(col("act_week"), col("cohort_week")) / 7).cast("int"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Gap-based batch sessionization (30-min gap): the exact twin of the
    // streaming mapGroupsWithState sessionizer, as lag + running-sum
    // windows. Session starts/ends emitted as strings (cross-engine
    // timestamp wire formats differ); gap compared in whole-second
    // boundary counts on both engines.
    "events_sessions" -> ((s, dir) => {
      Streaming.sessionizeBatch(Streaming.eventsBatch(s, dir))
        .select(col("user_id"), col("session_id"), col("n_events"),
          date_format(col("t_start"), "yyyy-MM-dd HH:mm:ss").as("t_start"),
          date_format(col("t_end"), "yyyy-MM-dd HH:mm:ss").as("t_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Backward as-of join: each click enriched with the user's most recent
    // prior (or same-instant) view — the union+window operator, one
    // key-hash exchange per side, no range fan-out. Gap compared in
    // whole-second boundary counts (cross-engine exact); timestamps as
    // strings.
    "events_asof" -> ((s, dir) => {
      val ev = Streaming.eventsBatch(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ts"))
      graft.ops.AsOfJoin.backward(clicks, views, Seq("user_id"),
          leftTime = "ts", rightTime = "ts", rightPayload = Seq("event_id"),
          leftTie = "event_id", rightTie = "event_id")
        .select(col("user_id"), col("event_id").as("click_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("asof_event_id").as("view_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("asof_ts"))).as("gap_s"))
        .orderBy(col("user_id"), col("click_id"))
    }),

    // Interval join (batch twin of the stream-stream join): views within
    // the hour before each click, per user — key-anchored hash join +
    // range filter, the same function that runs watermark-bounded on
    // streams (StreamingSpec drives it live). Timestamps truncated to
    // whole seconds BEFORE the join: ns-vs-µs engine precision must not
    // decide boundary pairs.
    "events_interval_join" -> ((s, dir) => {
      val ev = Streaming.eventsBatch(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          date_trunc("second", col("ts")).as("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
          date_trunc("second", col("ts")).as("v_ts"))
      Streaming.intervalJoin(clicks, views, "user_id", "v_user_id",
          "ts", "v_ts", horizonSeconds = 3600L)
        .groupBy(col("user_id"), col("click_id"))
        .agg(count(lit(1)).as("n_views"), max(col("view_id")).as("last_view_id"))
        .orderBy(col("user_id"), col("click_id"))
    }),

    // Point-in-interval range join: every event matched into its
    // containing session interval via bin-bucketed equi-join (no
    // BroadcastNestedLoop), then counted per session. Self-validating:
    // n_points must equal the sessionization's own n_events. Bin width =
    // 1 day of epoch seconds ≈ typical session span fan-out of ~1-2 bins.
    "events_range_join" -> ((s, dir) => {
      val ev = Streaming.eventsBatch(s, dir)
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("t"))
      val sessions = Streaming.sessionizeBatch(Streaming.eventsBatch(s, dir))
        .select(col("user_id"), col("session_id"),
          unix_timestamp(col("t_start")).as("lo"),
          unix_timestamp(col("t_end")).as("hi"))
      graft.ops.RangeJoin.pointInInterval(ev, "t", sessions, "lo", "hi",
          binWidth = 86400L, equiKeys = Seq("user_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_points"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Corpus vocabulary cardinality: exact distinct-token count (the
    // shuffling distinct agg) + total tokens in one pass. The 100 TB path
    // swaps countDistinct for approx_count_distinct (HLL) — same plan
    // minus the distinct exchange; TextAnalysisSpec pins the HLL estimate
    // within 5% of this exact value.
    "vocab_size" -> ((s, dir) => {
      docsParallel(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .agg(countDistinct(col("token")).as("n_distinct"),
          count(lit(1)).as("n_total"))
    }),

    // JSON payload extraction over the events props column (the engine's
    // semi-structured surface: typed scalar out of a JSON string, grouped
    // aggregate over it).
    "events_props" -> ((s, dir) => {
      Streaming.eventsBatch(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // ------------------------------------------------------------------
    // Round-4 breadth: conditional-aggregation join (TPC-H Q14 shape),
    // event-transition windows, per-group tiering, set operations,
    // sequence packing, deterministic weighted sampling,
    // normalization-aware dedup, and bigram statistics.
    // ------------------------------------------------------------------

    // Conditional aggregation over a fact⋈dim join (TPC-H Q14 shape):
    // the date filter pushes to the lineitem scan, part joins on the key,
    // and the CASE lives inside the aggregate — one pass, no second scan
    // for the numerator. DECIMAL sums for cross-engine exactness.
    "q14_promo" -> ((s, dir) => {
      val one = lit(java.math.BigDecimal.ONE).cast("decimal(18,2)")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (one - col("l_discount").cast("decimal(18,2)"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-02-01"))
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .agg(r6(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)"))).cast("double") /
          sum(rev).cast("double")).as("promo_revenue"))
    }),

    // Event-transition (funnel) statistics: lag window per user → count of
    // each (prev_type → type) edge. The window and the ordering are keyed
    // on (ts, event_id) so ties can't flip cross-engine. One user-keyed
    // exchange; the transition-count aggregate is map-side partial.
    "user_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Streaming.eventsBatch(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("prev_type"), col("event_type"))
    }),

    // Curriculum tiering: quartile assignment (ntile) per language over the
    // 6-dp quality score (deterministic order: rounded score + doc_id), then
    // per-tier stats — the "sort corpus into quality buckets" step of a
    // curriculum/annealing data schedule. One lang-keyed exchange for the
    // window; the tier aggregate is partial map-side.
    "quality_tiers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang")).orderBy(col("quality"), col("doc_id"))
      docsParallel(s, dir)
        .select(col("lang"), col("doc_id"),
          r6(TextAnalysis.qualityScore(col("text"))).as("quality"))
        .withColumn("tier", ntile(4).over(w))
        .groupBy(col("lang"), col("tier"))
        .agg(count(lit(1)).as("n_docs"),
          r6(min(col("quality"))).as("min_q"),
          r6(max(col("quality"))).as("max_q"),
          r6(stableMean(col("quality"))).as("mean_q"))
        .orderBy(col("lang"), col("tier"))
    }),

    // Set operations (§2.7 INTERSECT/EXCEPT as real operators, not
    // rewrites): bigram vocabulary shared between two languages and
    // exclusive to each. Spark plans INTERSECT/EXCEPT as hash
    // left-semi/anti joins over the distinct sets — the exchange carries
    // distinct bigrams only, never the corpus.
    "vocab_overlap" -> ((s, dir) => {
      def vocab(lang: String) = docsParallel(s, dir)
        .filter(col("lang") === lang)
        .select(explode(TextAnalysis.bigrams(col("text"))).as("bigram"))
        .distinct()
      val en = vocab("en"); val es = vocab("es")
      en.intersect(es).withColumn("status", lit("both"))
        .unionAll(en.except(es).withColumn("status", lit("en_only")))
        .unionAll(es.except(en).withColumn("status", lit("es_only")))
        .orderBy(col("status"), col("bigram"))
    }),

    // Sequence packing: documents → fixed-token-budget training batches
    // (per-language; exclusive-prefix-sum rule, see graft.text.Packing).
    // Emits the batch manifest a shard writer consumes.
    "pack_batches" -> ((s, dir) => {
      graft.text.Packing.batches(docsParallel(s, dir), Seq("lang"), "doc_id",
          TextAnalysis.tokenCount(col("text")), budget = 512L)
        .orderBy(col("lang"), col("batch_id"))
    }),

    // Deterministic quality-weighted Bernoulli sample: keep probability =
    // 6-dp quality score, uniform = salted-md5(id) — bit-reproducible in
    // any engine with md5, layout-independent (unlike df.sample), pure
    // map-side filter (no shuffle at any scale).
    "weighted_sample" -> ((s, dir) => {
      graft.bench.Sampling.weighted(Tables.documents(s, dir), "doc_id",
          r6(TextAnalysis.qualityScore(col("text"))))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Normalization-aware exact dedup: group on md5 of the canonical
    // normal form (case/punctuation/reflow-insensitive) — catches the
    // trivial-variant duplicates raw-text hashing misses. Same map-side
    // digest + single hash-agg shuffle shape as dedup_exact.
    "normalize_dedup" -> ((s, dir) => {
      docsParallel(s, dir)
        .select(md5(TextAnalysis.normalize(col("text"))).as("norm_hash"), col("doc_id"))
        .groupBy(col("norm_hash"))
        .agg(min(col("doc_id")).as("keeper"),
          concat_ws(",", sort_array(collect_list(col("doc_id")))).as("ids"),
          count(lit(1)).as("group_size"))
        .orderBy(col("norm_hash"))
    }),

    // Corpus bigram top-k (collocation/n-gram-LM statistics): explode →
    // partial count agg → TakeOrderedAndProject. The exchange carries one
    // (bigram, partial_count) row per distinct bigram per map partition;
    // the global sort is top-20-bounded.
    "bigram_topk" -> ((s, dir) => {
      docsParallel(s, dir)
        .select(explode(TextAnalysis.bigrams(col("text"))).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    }),

    // PIVOT: per-day event-type counts as columns. The value list is
    // EXPLICIT — an unlisted pivot first runs a whole extra
    // collect-distinct job over the corpus to discover the columns; at
    // 100 TB the schema must come from the query, not a data scan. One
    // pass, map-side partial agg.
    "events_pivot" -> ((s, dir) => {
      Streaming.eventsBatch(s, dir)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day"))
    }),

    // Sliding event-time windows (1 h length, 30 min slide): each event
    // lands in exactly 2 windows via Spark's Expand — the cost is 2 rows
    // per event into a partial agg, not a range join. Same unified
    // batch/stream plan family as events_windowed.
    "events_sliding" -> ((s, dir) => {
      Streaming.windowedEventStats(Streaming.eventsBatch(s, dir),
          slide = Some("30 minutes"))
        .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("event_type"), col("n_events").as("n"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    // Per-user trailing moving average (last 5 events): rows-frame window
    // on the user-keyed exchange; DECIMAL sums so partial-order summation
    // can't drift cross-engine. Deterministic frame: (ts, event_id) order.
    "events_moving_avg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 0)
      Streaming.eventsBatch(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("mov_avg",
          r6(sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
            count(lit(1)).over(w)))
        .select(col("user_id"), col("event_id"), col("mov_avg"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // The 100 TB quantile path made concrete (not just documented): the
    // mergeable single-pass GK sketch behind approx_percentile. Round 14
    // graduation: below the accuracy parameter (n ≤ 10000 — every oracle
    // fixture) the GK summary never compresses, so the sketch answer IS
    // the exact element at rank ceil(p·n) — a convention
    // TextAnalysisSpec pins on awkward sizes (n = 3..50, where ceil(p·n)
    // differs from other textbook quantile rules) and the DuckDB twin
    // replays by rank. Above the accuracy the sketch approximates (the
    // 100 TB point of the operator); the spec separately pins estimates
    // within 5% of exact at fixture scale.
    "doc_len_quantiles_approx" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(TextAnalysis.tokenCount(col("text")).as("n"))
        .agg(percentile_approx(col("n"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"))
        .select(col("qs")(0).cast("double").as("p25"),
          col("qs")(1).cast("double").as("p50"),
          col("qs")(2).cast("double").as("p75"))
    }),

    // Validation profile (expectations pass): null/empty/constraint
    // violations + key uniqueness in ONE aggregate scan — the pre-ingest
    // data-quality gate of a pipeline. All conditional counts ride the
    // same partial agg; no per-check rescan.
    "corpus_profile" -> ((s, dir) => {
      Tables.documents(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count(when(col("text").isNull, 1)).as("n_null_text"),
        count(when(length(col("text")) === 0, 1)).as("n_empty_text"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        count(when(col("n_chars") =!= length(col("text")), 1)).as("n_chars_mismatch"),
        countDistinct(col("doc_id")).as("n_distinct_ids"))
    }),

    // Incremental corpus merge (upsert, latest-version-wins): base ∪
    // updates → one `max_by(row, version)` hash aggregate — the partial
    // agg collapses superseded versions map-side, so the single exchange
    // carries ≤ one row per doc per map partition (same shape as
    // dropExactDuplicates). The update batch is derived deterministically
    // from the fixture (docs with id % 5 = 0 get a v2 edit).
    "corpus_merge" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = docs.select(col("doc_id"), col("text"), lit(1L).as("version"))
      val updates = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" [v2]")).as("text"),
          lit(2L).as("version"))
      base.unionAll(updates)
        .groupBy(col("doc_id"))
        .agg(max_by(struct(col("version"), col("text")), col("version")).as("__r"))
        .select(col("doc_id"), col("__r.version").as("version"),
          md5(col("__r.text")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // Snapshot diff: added/removed/changed docs between two corpus
    // versions via a full-outer join of (id, digest) frames — digests are
    // computed map-side, so the join shuffles 16-byte hashes + ids, never
    // text. Snapshots are derived deterministically from the fixture
    // (A drops id % 7 = 0; B drops id % 5 = 0 and edits id % 3 = 0).
    "snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // presence is tracked with explicit markers, NOT digest nullness —
      // a NULL-text doc has a NULL digest yet still exists in its
      // snapshot; `<=>` keeps two NULL digests comparing as unchanged
      val a = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("h_a"), lit(1).as("in_a"))
      val b = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 3 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text"))).as("h_b"), lit(1).as("in_b"))
      a.join(b, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("in_a").isNull, "added")
            .when(col("in_b").isNull, "removed")
            .when(!(col("h_a") <=> col("h_b")), "changed")
            .otherwise("same"))
        .filter(col("status") =!= "same")
        .select(col("doc_id"), col("status"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------------------------
    // F1: deterministic UUIDv5 point identity over documents. DuckDB has
    // no uuid5, so the oracle (r12) replays the full SHA-1 in recursive
    // SQL; RFC 4122 vectors are pinned in ExpressionsSpec.
    // ------------------------------------------------------------------
    "corpus_uuid" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), graft.functions.uuid5(col("doc_id").cast("string")).as("code_uuid"))
        .orderBy(col("doc_id"))
    }),
  )

  /** DuckDB twin of the engine's canonical case fold
    * ([[graft.functions.simple_lower]]): utf8proc's `lower()` IS the
    * Unicode simple mapping except three code points whose mappings
    * postdate its tables (U+A7C7→A7C8, U+A7C9→A7CA, U+A7F5→A7F6 —
    * established by an exhaustive all-code-point sweep of
    * `Character.toLowerCase` against `lower(chr(cp))`); pre-replacing
    * those three makes the two engines byte-identical on EVERY Unicode
    * string. Applied by [[oracleSql]] as a post-pass over the literal
    * `lower(text)` / `lower(qtext)` spellings, so no twin — present or
    * future — can lowercase behind the fold's back (pinned by
    * SparkEntrySpec: the FINAL SQL may contain `lower(` only in this
    * form). */
  private[graft] def sqlFold(x: String): String =
    s"lower(replace(replace(replace($x, chr(42951), chr(42952)), " +
      "chr(42953), chr(42954)), chr(42997), chr(42998)))"

  def oracleSql: Map[String, String] = rawOracleSql.map { case (name, sql) =>
    name -> sql
      .replace("lower(text)", sqlFold("text"))
      .replace("lower(qtext)", sqlFold("qtext"))
  }

  private def rawOracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey,
        |  FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |  FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "source_mix" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(SUM(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source
        |)
        |SELECT source, n_docs, n_tokens,
        |  FLOOR(CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS token_share,
        |  FLOOR(CAST(SUM(n_tokens) OVER () AS DOUBLE) / (CAST(COUNT(*) OVER () AS DOUBLE) * CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS sample_weight
        |FROM per ORDER BY source""".stripMargin,

    "events_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,

    "events_cube" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY CUBE(event_type, strftime(ts, '%Y-%m-%d'))
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,

    "doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) <= 32 THEN 1 ELSE CAST(ceil((len(toks) - 32) / 16.0) AS INT) + 1 END AS nc
        |  FROM t
        |)
        |SELECT doc_id, CAST(u.i AS INT) AS chunk_id,
        |  CAST(len(toks[u.i*16+1 : u.i*16+32]) AS INT) AS n_chunk_tokens,
        |  md5(array_to_string(toks[u.i*16+1 : u.i*16+32], ' ')) AS chunk_md5
        |FROM c, unnest(range(0, nc)) AS u(i)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // percentile_approx below its accuracy never compresses the GK
    // summary -> exact element at rank ceil(p*n) (convention pinned by
    // TextAnalysisSpec on awkward sizes); replayed here by rank.
    "doc_len_quantiles_approx" ->
      """WITH t AS (
        |  SELECT len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS n
        |  FROM documents
        |), o AS (
        |  -- percentile_approx skips NULLs; rank over non-null counts only
        |  SELECT n, row_number() OVER (ORDER BY n) AS r, count(*) OVER () AS cnt
        |  FROM t WHERE n IS NOT NULL
        |)
        |SELECT
        |  CAST(max(CASE WHEN r = CAST(ceil(0.25 * cnt) AS BIGINT) THEN n END) AS DOUBLE) AS p25,
        |  CAST(max(CASE WHEN r = CAST(ceil(0.5 * cnt) AS BIGINT) THEN n END) AS DOUBLE) AS p50,
        |  CAST(max(CASE WHEN r = CAST(ceil(0.75 * cnt) AS BIGINT) THEN n END) AS DOUBLE) AS p75
        |FROM o""".stripMargin,

    "lang_len_quantiles" ->
      """WITH t AS (
        |  SELECT lang, len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS n
        |  FROM documents
        |)
        |SELECT lang,
        |  FLOOR(quantile_cont(n, 0.25) * 1000000.0 + 0.5) / 1000000.0 AS p25,
        |  FLOOR(quantile_cont(n, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS p50,
        |  FLOOR(quantile_cont(n, 0.75) * 1000000.0 + 0.5) / 1000000.0 AS p75
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "knn_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), scored AS (
        |  SELECT q.qid AS query_id, c.vec_id AS result_id,
        |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |), ranked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, result_id, rank, score FROM ranked WHERE rank <= 10""".stripMargin,

    "knn_euclid" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), scored AS (
        |  SELECT q.qid AS query_id, c.vec_id AS result_id,
        |    ROUND(list_distance(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |), ranked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score ASC, result_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, result_id, rank, score FROM ranked WHERE rank <= 10""".stripMargin,

    "knn_manhattan" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), scored AS (
        |  SELECT q.qid AS query_id, c.vec_id AS result_id,
        |    ROUND(list_sum(list_transform(list_zip(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), x -> ABS(x[1] - x[2]))), 6) AS score
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |), ranked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score ASC, result_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, result_id, rank, score FROM ranked WHERE rank <= 10""".stripMargin,

    "knn_filtered" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), scored AS (
        |  SELECT q.qid AS query_id, c.vec_id AS result_id,
        |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid AND c.label < 5
        |), ranked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, result_id, rank, score FROM ranked WHERE rank <= 10""".stripMargin,

    "knn_groups" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), scored AS (
        |  SELECT q.qid AS query_id, c.vec_id AS result_id, c.label,
        |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |), wg AS (
        |  SELECT query_id, label, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id, label ORDER BY score DESC, result_id ASC) AS rank
        |  FROM scored QUALIFY rank <= 2
        |), best AS (
        |  SELECT query_id, label, score AS best FROM wg WHERE rank = 1
        |), gr AS (
        |  SELECT query_id, label,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY best DESC, label ASC) AS group_rank
        |  FROM best QUALIFY group_rank <= 3
        |)
        |SELECT wg.query_id, wg.label, gr.group_rank, wg.result_id, wg.rank, wg.score
        |FROM wg JOIN gr ON wg.query_id = gr.query_id AND wg.label = gr.label
        |ORDER BY wg.query_id, gr.group_rank, wg.rank""".stripMargin,

    "knn_groups_lookup" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), scored AS (
        |  SELECT q.qid AS query_id, c.vec_id AS result_id, c.label,
        |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |), wg AS (
        |  SELECT query_id, label, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id, label ORDER BY score DESC, result_id ASC) AS rank
        |  FROM scored QUALIFY rank <= 2
        |), best AS (
        |  SELECT query_id, label, score AS best FROM wg WHERE rank = 1
        |), gr AS (
        |  SELECT query_id, label,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY best DESC, label ASC) AS group_rank
        |  FROM best QUALIFY group_rank <= 3
        |), meta AS (
        |  SELECT label, count(*) AS lookup_n_members, min(vec_id) AS lookup_rep_id
        |  FROM embeddings GROUP BY label
        |)
        |SELECT wg.query_id, wg.label, gr.group_rank, wg.result_id, wg.rank, wg.score,
        |  meta.lookup_n_members, meta.lookup_rep_id
        |FROM wg
        |JOIN gr ON wg.query_id = gr.query_id AND wg.label = gr.label
        |JOIN meta ON meta.label = wg.label
        |ORDER BY wg.query_id, gr.group_rank, wg.rank""".stripMargin,

    // lookup_from twin: the SAME composite vector as knn_recommend (the
    // prototype collection re-keys ids only), but NO example exclusion —
    // the searched corpus never contained the example ids.
    "recommend_lookup" ->
      """WITH pos AS (
        |  SELECT u.i AS i, avg(CAST(e.embedding[u.i] AS DOUBLE)) AS v
        |  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS u(i)
        |  WHERE e.vec_id IN (0, 1, 2) GROUP BY u.i
        |), neg AS (
        |  SELECT u.i AS i, avg(CAST(e.embedding[u.i] AS DOUBLE)) AS v
        |  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS u(i)
        |  WHERE e.vec_id IN (3, 4) GROUP BY u.i
        |), qv AS (
        |  SELECT CAST(list(CAST(pos.v - neg.v AS FLOAT) ORDER BY pos.i) AS DOUBLE[]) AS v
        |  FROM pos JOIN neg ON pos.i = neg.i
        |), scored AS (
        |  SELECT c.vec_id AS result_id, c.label,
        |    ROUND(list_cosine_similarity(qv.v, CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM embeddings c, qv
        |), ranked AS (
        |  SELECT result_id, label, score,
        |    ROW_NUMBER() OVER (ORDER BY score DESC, result_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT result_id, label, rank, score FROM ranked WHERE rank <= 20""".stripMargin,

    // The composite query vector is rebuilt exactly as the engine does it:
    // per-dimension double means over the example vectors, subtracted, then
    // cast to FLOAT (float32) — so both engines score the IDENTICAL vector.
    "knn_recommend" ->
      """WITH pos AS (
        |  SELECT u.i AS i, avg(CAST(e.embedding[u.i] AS DOUBLE)) AS v
        |  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS u(i)
        |  WHERE e.vec_id IN (0, 1, 2) GROUP BY u.i
        |), neg AS (
        |  SELECT u.i AS i, avg(CAST(e.embedding[u.i] AS DOUBLE)) AS v
        |  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS u(i)
        |  WHERE e.vec_id IN (3, 4) GROUP BY u.i
        |), qv AS (
        |  SELECT CAST(list(CAST(pos.v - neg.v AS FLOAT) ORDER BY pos.i) AS DOUBLE[]) AS v
        |  FROM pos JOIN neg ON pos.i = neg.i
        |), scored AS (
        |  SELECT c.vec_id AS result_id, c.label,
        |    ROUND(list_cosine_similarity(qv.v, CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM embeddings c, qv
        |  WHERE c.vec_id NOT IN (0, 1, 2, 3, 4)
        |), ranked AS (
        |  SELECT result_id, label, score,
        |    ROW_NUMBER() OVER (ORDER BY score DESC, result_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT result_id, label, rank, score FROM ranked WHERE rank <= 20""".stripMargin,

    "knn_discover" ->
      """WITH tgt AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0
        |), p1 AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 1
        |), n1 AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 2
        |), p2 AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 3
        |), n2 AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 4
        |), scored AS (
        |  SELECT c.vec_id AS result_id, c.label,
        |    (CASE WHEN ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), p1.v), 6)
        |             > ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), n1.v), 6) THEN 1 ELSE 0 END
        |     + CASE WHEN ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), p2.v), 6)
        |             > ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), n2.v), 6) THEN 1 ELSE 0 END) AS context_score,
        |    ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), tgt.v), 6) AS score
        |  FROM embeddings c, tgt, p1, n1, p2, n2
        |  WHERE c.vec_id NOT IN (0, 1, 2, 3, 4)
        |), ranked AS (
        |  SELECT result_id, label, context_score, score,
        |    ROW_NUMBER() OVER (ORDER BY context_score DESC, score DESC, result_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT result_id, label, context_score, rank, score FROM ranked WHERE rank <= 20""".stripMargin,

    "knn_mmr" -> mmrOracleSql(nQ = 8, fetchK = 20, k = 5),

    "embed_outliers" ->
      """WITH ref AS (
        |  SELECT vec_id AS rid, CAST(embedding AS DOUBLE[]) AS rv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), sims AS (
        |  SELECT e.vec_id, ref.rid,
        |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ref.rv), 6) AS sim
        |  FROM embeddings e CROSS JOIN ref
        |  WHERE e.vec_id <> ref.rid
        |), topk AS (
        |  SELECT vec_id, sim FROM (
        |    SELECT vec_id, sim,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, rid ASC) AS rn
        |    FROM sims) WHERE rn <= 10
        |), scored AS (
        |  SELECT vec_id,
        |    FLOOR(CAST(SUM(CAST(sim AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS mean_knn_sim
        |  FROM topk GROUP BY vec_id
        |), top AS (
        |  SELECT vec_id, mean_knn_sim FROM scored
        |  ORDER BY mean_knn_sim ASC, vec_id ASC LIMIT 20
        |)
        |SELECT vec_id, mean_knn_sim,
        |  ROW_NUMBER() OVER (ORDER BY mean_knn_sim ASC, vec_id ASC) AS outlier_rank
        |FROM top""".stripMargin,

    "collection_scroll_by" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE label > 4 OR (label = 4 AND vec_id > 200)
        |ORDER BY label, vec_id LIMIT 40""".stripMargin,

    // The faceted collection's contents equal the embeddings table (one
    // idempotent upsert), so facet counts are expressible on the source.
    "collection_facet" ->
      """SELECT label AS value, COUNT(*) AS count FROM embeddings
        |WHERE vec_id >= 100
        |GROUP BY label ORDER BY count DESC, value ASC LIMIT 5""".stripMargin,

    // Partitioned-collection contents equal the embeddings table; the
    // label type survives the directory roundtrip as int.
    "collection_partitioned" ->
      """SELECT label, COUNT(*) AS n FROM embeddings
        |WHERE label < 5
        |GROUP BY label ORDER BY label""".stripMargin,

    "matrix_pairs" ->
      """WITH s AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 100
        |), scored AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS score
        |  FROM s a CROSS JOIN s b
        |  WHERE a.vec_id <> b.vec_id
        |), ranked AS (
        |  SELECT id_a, id_b, score,
        |    ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY score DESC, id_b ASC) AS rank
        |  FROM scored
        |)
        |SELECT id_a, id_b, rank, score FROM ranked WHERE rank <= 3""".stripMargin,

    // The scrolled collection's contents equal the embeddings table (one
    // idempotent upsert), so the page is expressible on the source table.
    "collection_scroll" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE vec_id > 99 AND label < 5
        |ORDER BY vec_id LIMIT 50""".stripMargin,

    "query_stats" -> (knnOracleCte +
      """SELECT query_id,
        |  COALESCE(FLOOR(CAST(SUM(CAST(CASE WHEN is_relevant THEN score END AS DECIMAL(28,6))) AS DOUBLE) / COUNT(CASE WHEN is_relevant THEN score END) * 1000000.0 + 0.5) / 1000000.0, 0.0) AS avg_clone_score,
        |  COALESCE(FLOOR(CAST(SUM(CAST(CASE WHEN NOT is_relevant THEN score END AS DECIMAL(28,6))) AS DOUBLE) / COUNT(CASE WHEN NOT is_relevant THEN score END) * 1000000.0 + 0.5) / 1000000.0, 0.0) AS avg_non_clone_score,
        |  COUNT(CASE WHEN is_relevant THEN 1 END) AS num_clones_found,
        |  COUNT(CASE WHEN NOT is_relevant THEN 1 END) AS num_non_clones_found
        |FROM topk GROUP BY query_id ORDER BY query_id""".stripMargin),

    "ir_metrics" -> irMetricsOracleSql(10),

    "ir_metrics_k100" -> irMetricsOracleSql(100),

    "dedup_keep_one" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin,

    "detailed_results" -> (knnOracleCte +
      """SELECT query_id, result_id, rank, score AS similarity_score,
        |  is_relevant AS is_same_type
        |FROM topk ORDER BY query_id, rank""".stripMargin),

    "ir_metrics_bcb" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), scored AS (
        |  SELECT q.qid AS query_id, c.vec_id AS result_id,
        |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |), ranked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM scored
        |), truthp AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id % 7 = b.vec_id % 7 AND a.vec_id < b.vec_id
        |), sym AS (
        |  SELECT ida AS id, idb AS other FROM truthp
        |  UNION ALL SELECT idb AS id, ida AS other FROM truthp
        |), truth AS (
        |  SELECT id, list(DISTINCT other) AS clones, count(DISTINCT other) AS nc
        |  FROM sym GROUP BY id
        |), topk AS (
        |  SELECT r.query_id, r.result_id, r.rank, r.score,
        |    COALESCE(list_contains(t.clones, r.result_id), false) AS is_clone,
        |    COALESCE(t.nc, 0) AS nc
        |  FROM ranked r LEFT JOIN truth t ON r.query_id = t.id
        |  WHERE r.rank <= 10
        |), topk2 AS (
        |  SELECT *, SUM(CASE WHEN is_clone THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY query_id ORDER BY rank ROWS UNBOUNDED PRECEDING) AS cum_rel
        |  FROM topk
        |), perq AS (
        |  SELECT query_id, ANY_VALUE(nc) AS nc,
        |    COUNT(CASE WHEN is_clone THEN 1 END) AS hits,
        |    MIN(CASE WHEN is_clone THEN rank END) AS first_rel_rank,
        |    SUM(CASE WHEN is_clone THEN CAST(cum_rel AS DOUBLE) / rank ELSE 0.0 END) AS ap_numerator,
        |    COALESCE(CAST(SUM(CAST(CASE WHEN is_clone THEN score END AS DECIMAL(28,6))) AS DOUBLE) / COUNT(CASE WHEN is_clone THEN score END), 0.0) AS avg_rel,
        |    COALESCE(CAST(SUM(CAST(CASE WHEN NOT is_clone THEN score END AS DECIMAL(28,6))) AS DOUBLE) / COUNT(CASE WHEN NOT is_clone THEN score END), 0.0) AS avg_irrel
        |  FROM topk2 GROUP BY query_id
        |)
        |SELECT
        |  FLOOR(AVG(CASE WHEN hits > 0 THEN 1.0 ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS success_rate,
        |  FLOOR(AVG(CAST(hits AS DOUBLE) / 10) * 1000000.0 + 0.5) / 1000000.0 AS mean_precision_at_k,
        |  FLOOR(AVG(COALESCE(1.0 / first_rel_rank, 0.0)) * 1000000.0 + 0.5) / 1000000.0 AS mrr,
        |  FLOOR(AVG(CASE WHEN LEAST(nc, 10) > 0 THEN ap_numerator / LEAST(nc, 10) ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS map_at_k,
        |  FLOOR(AVG(avg_rel) * 1000000.0 + 0.5) / 1000000.0 AS avg_relevant_score,
        |  FLOOR(AVG(avg_irrel) * 1000000.0 + 0.5) / 1000000.0 AS avg_irrelevant_score
        |FROM perq""".stripMargin,

    "clone_adjacency" ->
      """WITH pairs AS (SELECT l_orderkey AS a, l_partkey AS b FROM lineitem),
        |sym AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs)
        |SELECT a AS id,
        |  array_to_string(list_sort(list(DISTINCT b)), ',') AS clones,
        |  CAST(count(DISTINCT b) AS INT) AS num_clones
        |FROM sym GROUP BY a ORDER BY id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper,
        |  array_to_string(list_sort(list(doc_id)), ',') AS ids,
        |  count(*) AS group_size
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin,

    "dedup_jaccard_pairs" -> jaccardPairsOracle,

    // prefix-filtered exact join: same semantics, same oracle
    "jaccard_join_pairs" -> jaccardPairsOracle,

    "winnow_pairs" -> winnowPairsSql,

    "simhash_pairs" -> simhashPairsSql,

    "ann_recall" -> annRecallSql,

    "corpus_uuid" -> corpusUuidSql,

    "embed_corpus" -> embedCorpusSql,

    "embed_knn" -> embedKnnSql,

    "multimodal_knn" -> multimodalKnnSql,

    "dedup_minhash" -> jaccardPairsOracle,
    // pair_mining = dedup_minhash re-mined after cache eviction (a bench
    // attribution entry); identical output, identical oracle.
    "pair_mining" -> jaccardPairsOracle,

    // ivf_recall: the full training+routing+scoring replay (ivfRecallSql);
    // ivf_partitioned_recall runs the identical pipeline through the
    // persisted cell-partitioned layout, so it shares the oracle verbatim.
    "ivf_recall" -> ivfRecallSql(nList = 16, nProbe = 4, iters = 8,
      sampleN = 2048, k = 10, nQueries = 500, salt = "graftivf42:"),
    "ivf_partitioned_recall" -> ivfRecallSql(nList = 16, nProbe = 4, iters = 8,
      sampleN = 2048, k = 10, nQueries = 500, salt = "graftivf42:"),
    "ivf_int8_recall" -> ivfInt8RecallSql(nList = 16, nProbe = 4, iters = 8,
      sampleN = 2048, k = 10, nQueries = 500, salt = "graftivf42:"),
    "ivf_binary_recall" -> ivfBinaryRecallSql(nList = 16, nProbe = 4, iters = 8,
      sampleN = 2048, k = 10, oversample = 4, nQueries = 500, salt = "graftivf42:"),
    "quant_recall" -> quantRecallSql(k = 10, nQueries = 500),
    "ivf_pq_recall" -> ivfPqRecallSql(nList = 16, nProbe = 4, iters = 8,
      sampleN = 2048, k = 10, nQueries = 500, salt = "graftivf42:",
      m = 8, codebookSize = 256, pqIters = 8, dim = 64),

    // zorder_scan re-applies its exact predicate after file pruning, so
    // the clustered+pruned read must equal a plain filter on the source.
    "zorder_scan" ->
      """SELECT event_id FROM events
        |WHERE user_id BETWEEN 100 AND 199 AND value >= 50.0 AND value < 80.0
        |ORDER BY event_id""".stripMargin,

    "edit_sim_pairs" ->
      ("WITH " + jaccardShinglesCte + """, sel AS (
        |  SELECT id_a, id_b FROM pairs WHERE j >= 0.8
        |)
        |SELECT sel.id_a, sel.id_b,
        |  levenshtein(a.text, b.text) AS lev,
        |  FLOOR((1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) / greatest(strlen(a.text), strlen(b.text))) * 1000000.0 + 0.5) / 1000000.0 AS edit_sim
        |FROM sel
        |JOIN documents a ON a.doc_id = sel.id_a
        |JOIN documents b ON b.doc_id = sel.id_b
        |ORDER BY sel.id_a, sel.id_b""".stripMargin),

    "dedup_clusters" -> dedupClustersOracle,

    // same component closure; split = salted-md5 uniform of the COMPONENT
    // (identical hex-prefix convention as weighted_sample) → any near-dup
    // cluster lands whole in one split by construction
    "split_leakfree" ->
      ("WITH RECURSIVE " + componentClosureCte + """
        |SELECT id, component,
        |  CASE
        |    WHEN CAST(CAST(('0x' || substr(md5('graft42:' || CAST(component AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.8 THEN 'train'
        |    WHEN CAST(CAST(('0x' || substr(md5('graft42:' || CAST(component AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.9 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM comp ORDER BY id""".stripMargin),

    // inclusive prefix-sum cutoff over (quality desc, id asc) — the naive
    // global-window definition; the Spark side's two-phase bucket plan is
    // output-identical by construction (buckets never split rounded-quality
    // ties)
    "budget_select" ->
      ("WITH " + qualityCte + """
        |, d AS (
        |  SELECT q.doc_id, q.quality, h.n_tok AS n_tokens
        |  FROM q JOIN h ON q.doc_id = h.doc_id
        |), sel AS (
        |  SELECT doc_id, quality, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT doc_id, quality, n_tokens FROM sel WHERE cum <= 10000
        |ORDER BY doc_id""".stripMargin),

    // curation_pipeline: the composed twin chains the four certified
    // stage oracles — md5-dedup QUALIFY, the shared qualityCte, the
    // cum-≤-budget selection window, and the pack_batches bin formula —
    // over each other's outputs.
    "curation_pipeline" ->
      ("WITH " + qualityCte + """
        |, surv AS (
        |  SELECT doc_id FROM documents
        |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        |), g AS (
        |  SELECT q.doc_id, q.quality, h.n_tok AS n_tokens
        |  FROM q JOIN h ON q.doc_id = h.doc_id JOIN surv s ON s.doc_id = q.doc_id
        |  WHERE q.quality >= 0.45
        |), sel AS (
        |  SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM g
        |), wl AS (
        |  SELECT k.doc_id, k.n_tokens, d.lang
        |  FROM (SELECT doc_id, n_tokens FROM sel WHERE cum <= 8000) k
        |  JOIN documents d USING (doc_id)
        |), a AS (
        |  SELECT lang, doc_id, n_tokens,
        |    CAST(FLOOR(CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE) / 512) AS BIGINT) AS batch_id
        |  FROM wl
        |)
        |SELECT lang, batch_id, count(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM a GROUP BY lang, batch_id ORDER BY lang, batch_id""".stripMargin),

    "dedup_near_keep" ->
      ("WITH RECURSIVE " + componentClosureCte + "\n" +
      """SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN comp c ON d.doc_id = c.id
        |WHERE c.id = c.component ORDER BY d.doc_id""".stripMargin),

    // Output-identical to dedup_near_keep by construction (shared
    // candidate definition + the same exact-Jaccard verify) — same oracle.
    "index_near_keep" ->
      ("WITH RECURSIVE " + componentClosureCte + "\n" +
      """SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN comp c ON d.doc_id = c.id
        |WHERE c.id = c.component ORDER BY d.doc_id""".stripMargin),

    "contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, greatest(len(t) - 4, 0) + 1)]) AS sh
        |  FROM toks
        |), ev AS (
        |  SELECT doc_id AS eval_id, sh AS esh FROM sh
        |  WHERE doc_id IN (SELECT doc_id FROM documents
        |    ORDER BY md5('graft42:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 50)
        |)
        |SELECT c.doc_id, e.eval_id, CAST(len(list_intersect(c.sh, e.esh)) AS BIGINT) AS n_shared
        |FROM sh c CROSS JOIN ev e
        |WHERE c.doc_id <> e.eval_id AND len(list_intersect(c.sh, e.esh)) >= 1
        |ORDER BY doc_id, eval_id""".stripMargin,

    "stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY md5('graft42:' || CAST(doc_id AS VARCHAR)), doc_id) <= 20
        |ORDER BY doc_id""".stripMargin,

    "doc_patterns" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INT) AS n_urls,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  FLOOR((CASE WHEN len(text) = 0 THEN 0.0
        |    ELSE CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / len(text) END) * 1000000.0 + 0.5) / 1000000.0 AS digit_ratio,
        |  FLOOR((CASE WHEN len(toks) = 0 THEN 0.0
        |    ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END) * 1000000.0 + 0.5) / 1000000.0 AS rep_ratio
        |FROM t ORDER BY doc_id""".stripMargin,

    "doc_redact" ->
      """WITH r AS (
        |  SELECT doc_id, text,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{8,}', '<NUM>', 'g') AS redacted
        |  FROM documents
        |)
        |SELECT doc_id, redacted, redacted <> text AS changed
        |FROM r ORDER BY doc_id""".stripMargin,

    "vocab_topk" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents
        |) GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,

    // IDF goes through the q20 kernel on both engines (see doc_perplexity)
    // and ranking runs on the exact BIGINT tf·qidf score.
    "doc_keywords" ->
      s"""WITH RECURSIVE tk AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term
        |), st AS (
        |  SELECT count(*) AS n FROM documents
        |), dft AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), isrc AS (
        |  SELECT dft.term, CAST(st.n AS BIGINT) AS num, CAST(dft.df AS BIGINT) AS den
        |  FROM dft CROSS JOIN st
        |), ${graft.expr.DetMath.duckdbLog2q20("isrc", "qidf", "term")}, scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf * qidf.qlog AS qtfidf
        |  FROM tf JOIN qidf USING (term)
        |), ranked AS (
        |  SELECT doc_id, term, qtfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY qtfidf DESC, term ASC) AS kw_rank
        |  FROM scored
        |)
        |SELECT doc_id, term AS keyword, kw_rank,
        |  FLOOR((CAST(qtfidf AS DOUBLE) / 1048576.0) * 1000000.0 + 0.5) / 1000000.0 AS tfidf
        |FROM ranked WHERE kw_rank <= 3
        |ORDER BY doc_id, kw_rank""".stripMargin,

    // The bigram log-probability goes through the q20 shift-and-square
    // kernel (graft.expr.DetMath) on BOTH engines — libm log2 differs in
    // the last ulp between engines and flips quantization cells.
    "doc_perplexity" ->
      s"""WITH RECURSIVE t AS (
        |  SELECT doc_id, lower(text) AS t FROM documents WHERE len(lower(text)) >= 2
        |), big AS (
        |  SELECT doc_id, substr(t, i, 2) AS bg
        |  FROM t, unnest(range(1, len(t))) AS u(i)
        |), tf AS (
        |  SELECT doc_id, bg, count(*) AS tf FROM big GROUP BY doc_id, bg
        |), cbg AS (
        |  SELECT bg, count(*) AS c FROM big GROUP BY bg
        |), ctx AS (
        |  SELECT substr(bg, 1, 1) AS a, SUM(c) AS ca FROM cbg GROUP BY 1
        |), v AS (
        |  SELECT count(DISTINCT substr(bg, 2, 1)) AS v FROM cbg
        |), msrc AS (
        |  SELECT cbg.bg, CAST(cbg.c + 1 AS BIGINT) AS num,
        |    CAST(ctx.ca + v.v AS BIGINT) AS den
        |  FROM cbg JOIN ctx ON substr(cbg.bg, 1, 1) = ctx.a CROSS JOIN v
        |), ${graft.expr.DetMath.duckdbLog2q20("msrc", "model", "bg")}, s AS (
        |  SELECT tf.doc_id, SUM(tf.tf * model.qlog) AS sq, SUM(tf.tf) AS n
        |  FROM tf JOIN model USING (bg) GROUP BY tf.doc_id
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams, CAST(-sq AS BIGINT) AS q20_bits
        |FROM s ORDER BY doc_id""".stripMargin,

    "doc_dup_spans" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, md5(array_to_string(toks[i:i+4], ' ')) AS h
        |  FROM tk, unnest(range(1, len(toks) - 3)) AS u(i)
        |  WHERE len(toks) >= 5
        |), dup AS (
        |  SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |)
        |SELECT g.doc_id, count(*) AS n_spans, count(dup.h) AS n_dup_spans,
        |  FLOOR((CAST(count(dup.h) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
        |FROM g LEFT JOIN dup USING (h)
        |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin,

    "dedup_span_cut" -> spanCutSql,

    // the index-backed path is output-identical by construction (shared
    // cut kernel + ownership from the persisted gram table) — same oracle
    "index_span_cut" -> spanCutSql,

    "doc_len_quantiles" ->
      """WITH t AS (
        |  SELECT len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS n
        |  FROM documents
        |)
        |SELECT
        |  FLOOR(quantile_cont(n, 0.25) * 1000000.0 + 0.5) / 1000000.0 AS p25,
        |  FLOOR(quantile_cont(n, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS p50,
        |  FLOOR(quantile_cont(n, 0.75) * 1000000.0 + 0.5) / 1000000.0 AS p75,
        |  FLOOR(quantile_cont(n, 0.95) * 1000000.0 + 0.5) / 1000000.0 AS p95
        |FROM t""".stripMargin,

    "doc_len_hist" ->
      """SELECT CAST(LEAST(FLOOR(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) / 50), 9) AS INT) AS bucket,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Cell assignment mirrors NearestCentroids' selection rule: rank by
    // cosine against each (L2-normalized — ranking-equivalent) seed
    // centroid, smallest centroid index on ties.
    "semantic_dedup" ->
      """WITH seeds AS (
        |  SELECT embedding AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cix
        |  FROM embeddings ORDER BY vec_id LIMIT 8
        |), scored AS (
        |  SELECT e.vec_id, s.cix,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(s.cv AS DOUBLE[])) DESC, s.cix) AS rn
        |  FROM embeddings e CROSS JOIN seeds s
        |), assign AS (
        |  SELECT vec_id, cix AS cell FROM scored WHERE rn = 1
        |)
        |SELECT aa.cell AS cell, a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings a
        |JOIN assign aa ON a.vec_id = aa.vec_id
        |JOIN embeddings b ON a.vec_id < b.vec_id
        |JOIN assign ab ON b.vec_id = ab.vec_id AND aa.cell = ab.cell
        |WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
        |ORDER BY cell, id_a, id_b""".stripMargin,

    "near_dup_cosine" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,

    "events_windowed" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "user_retention" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
        |), c AS (
        |  SELECT user_id, min(act_week) AS cohort_week FROM w GROUP BY user_id
        |)
        |SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', c.cohort_week, w.act_week) / 7 AS INT) AS week_offset,
        |  count(DISTINCT w.user_id) AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "events_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > 1800
        |      THEN 1 ELSE 0 END AS b
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
        |  FROM g
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS t_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS t_end
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    "events_asof" ->
      // Same union+window form as the Spark operator (not DuckDB's ASOF
      // JOIN syntax): identical tie semantics by construction — right rows
      // sort before left at equal ts, greatest event_id among equal-ts
      // rights wins. date_diff('second', ...) counts second boundaries,
      // matching Spark's unix_timestamp subtraction.
      """WITH u AS (
        |  SELECT user_id, ts, 0 AS side, event_id,
        |    struct_pack(r_ts := ts, r_event := event_id) AS p
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, 1 AS side, event_id, NULL AS p
        |  FROM events WHERE event_type = 'click'
        |), w AS (
        |  SELECT user_id, ts, side, event_id,
        |    last_value(p IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, side, event_id
        |      ROWS UNBOUNDED PRECEDING) AS m
        |  FROM u
        |)
        |SELECT user_id, event_id AS click_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  m.r_event AS view_id,
        |  date_diff('second', m.r_ts, ts) AS gap_s
        |FROM w WHERE side = 1
        |ORDER BY user_id, click_id""".stripMargin,

    "events_interval_join" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, date_trunc('second', ts) AS ts
        |  FROM events WHERE event_type = 'click'
        |), v AS (
        |  SELECT user_id, event_id AS view_id, date_trunc('second', ts) AS v_ts
        |  FROM events WHERE event_type = 'view'
        |)
        |SELECT c.user_id, c.click_id, count(*) AS n_views, max(v.view_id) AS last_view_id
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.v_ts >= c.ts - INTERVAL 3600 SECOND AND v.v_ts <= c.ts
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_range_join" ->
      // Sessions rebuilt with the events_sessions CTE, then a plain
      // inequality containment join: flooring to epoch seconds on the
      // Spark side cannot move an event across a >1800 s session gap, so
      // membership is identical to this full-precision BETWEEN.
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > 1800
        |      THEN 1 ELSE 0 END AS b
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
        |  FROM g
        |), sess AS (
        |  SELECT user_id, session_id, min(ts) AS t0, max(ts) AS t1
        |  FROM s GROUP BY 1, 2
        |)
        |SELECT e.user_id, sess.session_id, count(*) AS n_points
        |FROM events e JOIN sess
        |  ON e.user_id = sess.user_id AND e.ts BETWEEN sess.t0 AND sess.t1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "vocab_size" ->
      """SELECT count(DISTINCT token) AS n_distinct, count(*) AS n_total
        |FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents
        |)""".stripMargin,

    "events_props" ->
      // DuckDB's SUM(INT) widens to HUGEINT (int128); Spark's sum(int) is
      // BIGINT — cast the oracle sum so the hashed output types agree.
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "media_meta" ->
      """SELECT doc_id, 'text/plain' AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "frame_hist" ->
      // stripes and histograms run over the payload's UTF-8 BYTES
      // (packText): L is the BYTE length and each byte bins at byte//32
      """WITH docs AS (SELECT doc_id, strlen(text) AS L, text FROM documents),
        |frames AS (
        |  SELECT d.doc_id, ff.f, (d.L * ff.f) // 4 AS s, (d.L * (ff.f + 1)) // 4 AS e
        |  FROM docs d, unnest(range(0, 4)) AS ff(f)
        |), chars AS (
        |  SELECT doc_id, i,
        |    CAST(('0x' || substr(hex(encode(text)), CAST(2 * i + 1 AS INT), 2)) AS INT) // 32 AS b
        |  FROM docs, unnest(range(0, L)) AS u(i)
        |), hist AS (
        |  SELECT c.doc_id, f.f, c.b, count(*) AS n
        |  FROM chars c JOIN frames f
        |    ON f.doc_id = c.doc_id AND c.i >= f.s AND c.i < f.e
        |  GROUP BY 1, 2, 3
        |), grid AS (
        |  SELECT d.doc_id, ff.f, bb.b
        |  FROM (SELECT DISTINCT doc_id FROM documents) d,
        |    unnest(range(0, 4)) AS ff(f), unnest(range(0, 8)) AS bb(b)
        |), dense AS (
        |  SELECT g.doc_id, g.f, g.b, CAST(coalesce(h.n, 0) AS DOUBLE) AS n
        |  FROM grid g LEFT JOIN hist h
        |    ON h.doc_id = g.doc_id AND h.f = g.f AND h.b = g.b
        |), ssq AS (
        |  SELECT doc_id, f, sum(n * n) AS ss FROM dense GROUP BY 1, 2
        |)
        |SELECT d.doc_id, CAST(d.f AS INT) AS frame_idx, CAST(d.b AS INT) AS b,
        |  FLOOR(CAST(CAST(CASE WHEN s.ss = 0 THEN 0.0
        |    ELSE d.n * (1.0 / sqrt(s.ss)) END AS REAL) AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS v
        |FROM dense d JOIN ssq s ON s.doc_id = d.doc_id AND s.f = d.f
        |ORDER BY d.doc_id, frame_idx, b""".stripMargin,

    // Audio round-trip twins: the WAV payload is synthesized from an
    // all-integer formula (graft.expr.AudioOps.synthWav — sawtooth,
    // period 3 + doc_id mod 29, sample (((i%p)*2048)/p − 1024)*16), so
    // the oracle replays the formula symbolically; Spark's side actually
    // encodes the container and decodes it through javax.sound. Integer
    // division is trunc-vs-floor-identical here (all operands
    // non-negative).
    "audio_meta_decode" ->
      """SELECT doc_id, 8000 AS sample_rate, 1 AS channels, 16 AS bits,
        |  CAST(800 + (doc_id % 7) * 160 AS BIGINT) AS n_frames,
        |  'audio/wav' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Video round-trip twins: the MJPEG payload is hand-encoded from an
    // all-integer formula (graft.expr.VideoOps — solid gray per frame,
    // g = 16 + (doc_id·31 + f·7) mod 225, frames = 2 + doc_id mod 3), so
    // the oracle replays the formula symbolically; Spark's side actually
    // encodes the JPEG container, splits it on markers, and decodes it
    // through ImageIO. All operands non-negative, so % == floorMod.
    "video_meta" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  16 AS width, 16 AS height, 'image/jpeg' AS format
        |FROM documents, unnest(range(0, 2 + doc_id % 3)) AS u(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "video_frames" ->
      """WITH frames AS (
        |  SELECT doc_id, f, 16 + (doc_id * 31 + f * 7) % 225 AS g
        |  FROM documents, unnest(range(0, 2 + doc_id % 3)) AS u(f)
        |)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx, CAST(b AS INT) AS b,
        |  FLOOR(CAST(CAST(g / 255.0 AS REAL) AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS v
        |FROM frames, unnest(range(0, 3)) AS bb(b)
        |ORDER BY doc_id, frame_idx, b""".stripMargin,

    "audio_env" ->
      """WITH docs AS (
        |  SELECT doc_id, CAST(800 + (doc_id % 7) * 160 AS BIGINT) AS n,
        |         CAST(3 + (doc_id % 29) AS BIGINT) AS p
        |  FROM documents
        |), samples AS (
        |  SELECT d.doc_id, CAST((u.i * 8) // d.n AS INT) AS w,
        |         ABS((((u.i % d.p) * 2048) // d.p - 1024) * 16) AS a
        |  FROM docs d, unnest(range(0, d.n)) AS u(i)
        |)
        |SELECT doc_id, w, CAST(SUM(a) AS BIGINT) AS sum_abs
        |FROM samples GROUP BY doc_id, w ORDER BY doc_id, w""".stripMargin,

    // Full BPE replay twins (training + encode — see bpeReplaySql).
    // sub_fp joins subwords on  (chr(1)), seg_fp on a space — both
    // fingerprint the learned segmentation, not just the word stream.
    "bpe_tokens" -> bpeReplaySql(
      """CAST(COALESCE(SUM(len(f.syms)), 0) AS INT) AS n_subwords,
        |  substring(md5(COALESCE(string_agg(array_to_string(f.syms, chr(1)), chr(1) ORDER BY c.j), '')), 1, 16) AS sub_fp""".stripMargin),

    "bpe_encode" -> bpeReplaySql(
      """CAST(COALESCE(SUM(len(f.syms)), 0) AS INT) AS n_subwords,
        |  substring(md5(COALESCE(string_agg(array_to_string(f.syms, ' '), ' ' ORDER BY c.j), '')), 1, 16) AS seg_fp""".stripMargin),

    "text_stats" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_lex_tokens,
        |  FLOOR((CASE WHEN len(list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)) = 0 THEN 0.0
        |    ELSE CAST(len(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)) END) * 1000000.0 + 0.5) / 1000000.0 AS avg_token_len,
        |  FLOOR((CASE WHEN len(text) = 0 THEN 0.0
        |    ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9_\s]')) AS DOUBLE) / len(text) END) * 1000000.0 + 0.5) / 1000000.0 AS punct_ratio,
        |  substring(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, text,
        |    len(list_intersect(toks, ['the','and','of','to','in','is','that','it','was','for'])) AS en,
        |    len(list_intersect(toks, ['el','los','las','que','y','una','por','como','pero','con'])) AS es,
        |    len(list_intersect(toks, ['der','die','das','und','ist','ein','eine','zu','den','von'])) AS de,
        |    len(list_intersect(toks, ['le','les','et','est','une','des','du','dans','pour','sur'])) AS fr
        |  FROM t
        |)
        |SELECT doc_id,
        |  CASE WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
        |       WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
        |       WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
        |       WHEN de >= fr AND de > 0 THEN 'de'
        |       WHEN fr > 0 THEN 'fr'
        |       ELSE 'und' END AS lang_pred
        |FROM h ORDER BY doc_id""".stripMargin,

    "doc_quality" ->
      ("WITH " + qualityCte + "\nSELECT doc_id, quality FROM q ORDER BY doc_id"),

    "bm25_topk" -> bm25TopkSql,

    // the index-backed path is output-identical by construction (shared
    // scoring kernel) — same oracle
    "bm25_index_topk" -> bm25TopkSql,

    "hybrid_rrf" ->
      ("""WITH RECURSIVE q AS (
        |  SELECT doc_id AS qid, text AS qtext FROM documents
        |  ORDER BY md5('graft42:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 10
        |), qt AS (
        |  SELECT DISTINCT qid, unnest(list_distinct(list_filter(string_split_regex(lower(qtext), '\s+'), x -> len(x) > 0))) AS term
        |  FROM q
        |), tk AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS dl,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM tk GROUP BY doc_id, dl, term
        |), st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0))) AS DOUBLE) / count(*) AS avgdl
        |  FROM documents
        |), dft AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), """.stripMargin + bm25IdfCtes + """, c AS (
        |  SELECT idf.qid AS query_id, tf.doc_id AS result_id,
        |    CAST(FLOOR(idf.idf * tf.tf * (1.2 + 1.0) / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl / st.avgdl)) * 1e12 + 0.5) / 1e12 AS DECIMAL(28,12)) AS c
        |  FROM tf JOIN idf USING (term) CROSS JOIN st
        |), sc AS (
        |  SELECT query_id, result_id,
        |    FLOOR(CAST(SUM(c) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM c WHERE result_id <> query_id GROUP BY query_id, result_id
        |), bm AS (
        |  SELECT query_id, result_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM sc QUALIFY rank <= 20
        |), vs AS (
        |  SELECT q.qid AS query_id, e2.vec_id AS result_id,
        |    ROUND(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])), 6) AS score
        |  FROM q JOIN embeddings e1 ON e1.vec_id = q.qid
        |  CROSS JOIN embeddings e2
        |  WHERE e2.vec_id <> q.qid
        |), vv AS (
        |  SELECT query_id, result_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM vs QUALIFY rank <= 20
        |), contrib AS (
        |  SELECT query_id, result_id, CAST(FLOOR(1.0 / (60 + rank) * 1e12 + 0.5) / 1e12 AS DECIMAL(28,12)) AS r FROM bm
        |  UNION ALL
        |  SELECT query_id, result_id, CAST(FLOOR(1.0 / (60 + rank) * 1e12 + 0.5) / 1e12 AS DECIMAL(28,12)) AS r FROM vv
        |), fused AS (
        |  SELECT query_id, result_id,
        |    FLOOR(CAST(SUM(r) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM contrib GROUP BY query_id, result_id
        |), franked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM fused
        |)
        |SELECT query_id, result_id, rank, score FROM franked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),

    "multi_vec_knn" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding[1:8] AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 10
        |), scored AS (
        |  SELECT q.qid AS query_id, c.vec_id AS result_id,
        |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding[1:8] AS DOUBLE[])), 6) AS score
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |), ranked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, result_id, rank, score FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    "query_prefetch" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), pre AS (
        |  SELECT q.qid, c.vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
        |      ROUND(list_cosine_similarity(CAST(q.qv[1:8] AS DOUBLE[]), CAST(c.embedding[1:8] AS DOUBLE[])), 6) DESC,
        |      c.vec_id ASC) AS rn
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |), resc AS (
        |  SELECT p.qid AS query_id, p.vec_id AS result_id, c.label,
        |    ROUND(list_cosine_similarity(CAST(q2.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM pre p
        |  JOIN embeddings c ON c.vec_id = p.vec_id
        |  JOIN q q2 ON q2.qid = p.qid
        |  WHERE p.rn <= 50
        |), ranked AS (
        |  SELECT query_id, result_id, label, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM resc
        |)
        |SELECT query_id, result_id, label, rank, score FROM ranked WHERE rank <= 10""".stripMargin,

    "query_boosted" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
        |), cand AS (
        |  SELECT q.qid, c.vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
        |      ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
        |      c.vec_id ASC) AS rn
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |), resc AS (
        |  SELECT p.qid AS query_id, p.vec_id AS result_id, c.label,
        |    ROUND(list_cosine_similarity(CAST(q2.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim
        |  FROM cand p
        |  JOIN embeddings c ON c.vec_id = p.vec_id
        |  JOIN q q2 ON q2.qid = p.qid
        |  WHERE p.rn <= 50
        |), sc AS (
        |  SELECT query_id, result_id, label, sim,
        |    FLOOR((0.8 * sim + 0.2 * GREATEST(0.0,
        |      1.0 - (1.0 - 0.5) / 5.0 * ABS(CAST(label AS DOUBLE) - 5.0)))
        |      * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM resc
        |), ranked AS (
        |  SELECT query_id, result_id, label, sim, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM sc
        |)
        |SELECT query_id, result_id, label, sim, score, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    "maxsim_knn" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 10
        |), qt AS (
        |  SELECT qid, i, CAST(list_slice(qv, 8*i + 1, 8*i + 8) AS DOUBLE[]) AS tv
        |  FROM q, unnest(range(0, 8)) AS u(i)
        |), ct AS (
        |  SELECT vec_id, j, CAST(list_slice(embedding, 8*j + 1, 8*j + 8) AS DOUBLE[]) AS tv
        |  FROM embeddings, unnest(range(0, 8)) AS u(j)
        |), best AS (
        |  SELECT qt.qid, ct.vec_id, qt.i,
        |    MAX(FLOOR(list_cosine_similarity(qt.tv, ct.tv) * 1000000.0 + 0.5) / 1000000.0) AS b
        |  FROM qt CROSS JOIN ct
        |  WHERE ct.vec_id <> qt.qid
        |  GROUP BY qt.qid, ct.vec_id, qt.i
        |), scored AS (
        |  SELECT qid AS query_id, vec_id AS result_id,
        |    FLOOR(CAST(SUM(CAST(b AS DECIMAL(28,6))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM best GROUP BY qid, vec_id
        |), ranked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, result_id, rank, score FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    "sparse_knn" ->
      """WITH q AS (
        |  SELECT vec_id AS qid FROM embeddings
        |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 10
        |), sp AS (
        |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |  WHERE abs(CAST(embedding[i] AS DOUBLE)) >= 0.1
        |), qsp AS (
        |  SELECT sp.vec_id, sp.i, sp.v FROM sp JOIN q ON sp.vec_id = q.qid
        |), c AS (
        |  SELECT qsp.vec_id AS query_id, sp.vec_id AS result_id,
        |    CAST(FLOOR(qsp.v * sp.v * 1e12 + 0.5) / 1e12 AS DECIMAL(28,12)) AS c
        |  FROM qsp JOIN sp ON qsp.i = sp.i
        |), sc AS (
        |  SELECT query_id, result_id,
        |    FLOOR(CAST(SUM(c) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM c WHERE result_id <> query_id GROUP BY query_id, result_id
        |), ranked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM sc
        |)
        |SELECT query_id, result_id, score, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    "hybrid_weighted" ->
      ("""WITH RECURSIVE q AS (
        |  SELECT doc_id AS qid, text AS qtext FROM documents
        |  ORDER BY md5('graft42:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 10
        |), qt AS (
        |  SELECT DISTINCT qid, unnest(list_distinct(list_filter(string_split_regex(lower(qtext), '\s+'), x -> len(x) > 0))) AS term
        |  FROM q
        |), tk AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS dl,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM tk GROUP BY doc_id, dl, term
        |), st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0))) AS DOUBLE) / count(*) AS avgdl
        |  FROM documents
        |), dft AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), """.stripMargin + bm25IdfCtes + """, c AS (
        |  SELECT idf.qid AS query_id, tf.doc_id AS result_id,
        |    CAST(FLOOR(idf.idf * tf.tf * (1.2 + 1.0) / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl / st.avgdl)) * 1e12 + 0.5) / 1e12 AS DECIMAL(28,12)) AS c
        |  FROM tf JOIN idf USING (term) CROSS JOIN st
        |), sc AS (
        |  SELECT query_id, result_id,
        |    FLOOR(CAST(SUM(c) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM c WHERE result_id <> query_id GROUP BY query_id, result_id
        |), bm AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM sc QUALIFY rank <= 20
        |), vs AS (
        |  SELECT q.qid AS query_id, e2.vec_id AS result_id,
        |    ROUND(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])), 6) AS score
        |  FROM q JOIN embeddings e1 ON e1.vec_id = q.qid
        |  CROSS JOIN embeddings e2
        |  WHERE e2.vec_id <> q.qid
        |), vv AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM vs QUALIFY rank <= 20
        |), vn AS (
        |  SELECT query_id, result_id,
        |    CASE WHEN MAX(score) OVER (PARTITION BY query_id) = MIN(score) OVER (PARTITION BY query_id) THEN 1.0
        |         ELSE (score - MIN(score) OVER (PARTITION BY query_id)) /
        |              (MAX(score) OVER (PARTITION BY query_id) - MIN(score) OVER (PARTITION BY query_id)) END AS n
        |  FROM vv
        |), bn AS (
        |  SELECT query_id, result_id,
        |    CASE WHEN MAX(score) OVER (PARTITION BY query_id) = MIN(score) OVER (PARTITION BY query_id) THEN 1.0
        |         ELSE (score - MIN(score) OVER (PARTITION BY query_id)) /
        |              (MAX(score) OVER (PARTITION BY query_id) - MIN(score) OVER (PARTITION BY query_id)) END AS n
        |  FROM bm
        |), contrib AS (
        |  SELECT query_id, result_id, CAST(FLOOR(0.5 * n * 1e12 + 0.5) / 1e12 AS DECIMAL(28,12)) AS r FROM vn
        |  UNION ALL
        |  SELECT query_id, result_id, CAST(FLOOR(0.5 * n * 1e12 + 0.5) / 1e12 AS DECIMAL(28,12)) AS r FROM bn
        |), fused AS (
        |  SELECT query_id, result_id,
        |    FLOOR(CAST(SUM(r) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM contrib GROUP BY query_id, result_id
        |), franked AS (
        |  SELECT query_id, result_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
        |  FROM fused
        |)
        |SELECT query_id, result_id, rank, score FROM franked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),

    "batch_near_dup" ->
      """WITH bsel AS (
        |  SELECT doc_id AS batch_id FROM documents
        |  ORDER BY md5('graft42:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 50
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t) - 2, 0) + 1)]) AS sh
        |  FROM toks
        |), pairs AS (
        |  SELECT a.doc_id AS batch_id, c.doc_id AS match_id,
        |    CAST(len(list_intersect(a.sh, c.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, c.sh))) AS j
        |  FROM sh a JOIN bsel ON a.doc_id = bsel.batch_id
        |  CROSS JOIN sh c
        |  WHERE a.doc_id <> c.doc_id AND len(list_distinct(list_concat(a.sh, c.sh))) > 0
        |)
        |SELECT batch_id, match_id, FLOOR(j * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |FROM pairs WHERE j >= 0.8 ORDER BY batch_id, match_id""".stripMargin,

    "mix_weights" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        |), t AS (
        |  SELECT lang, n_docs,
        |    CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE) AS actual,
        |    CASE lang WHEN 'en' THEN CAST(0.40 AS DOUBLE) WHEN 'es' THEN CAST(0.15 AS DOUBLE)
        |      WHEN 'de' THEN CAST(0.15 AS DOUBLE) WHEN 'fr' THEN CAST(0.15 AS DOUBLE)
        |      WHEN 'zh' THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS target
        |  FROM c
        |), w AS (
        |  SELECT lang, n_docs, actual, target, target / actual AS weight FROM t
        |)
        |SELECT lang, n_docs,
        |  FLOOR(actual * 1000000.0 + 0.5) / 1000000.0 AS actual_share,
        |  target AS target_share,
        |  FLOOR(weight * 1000000.0 + 0.5) / 1000000.0 AS weight,
        |  FLOOR(weight / MAX(weight) OVER () * 1000000.0 + 0.5) / 1000000.0 AS sample_prob
        |FROM w ORDER BY lang""".stripMargin,

    "embedding_stats" ->
      """WITH n AS (
        |  SELECT len(embedding) AS dim,
        |    FLOOR(sqrt(COALESCE(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 0.0)) * 1000000.0 + 0.5) / 1000000.0 AS norm
        |  FROM embeddings
        |)
        |SELECT count(*) AS n_vecs,
        |  min(dim) AS dim_min, max(dim) AS dim_max,
        |  FLOOR(CAST(SUM(CAST(norm AS DECIMAL(28,6))) AS DOUBLE) / count(norm) * 1000000.0 + 0.5) / 1000000.0 AS avg_norm,
        |  min(norm) AS min_norm, max(norm) AS max_norm,
        |  count(CASE WHEN norm = 0.0 THEN 1 END) AS n_zero
        |FROM n""".stripMargin,

    "doc_repetition" ->
      """WITH l AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS lines FROM documents
        |), ls AS (
        |  SELECT doc_id, len(lines) AS n_lines,
        |    FLOOR((1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)) * 1000000.0 + 0.5) / 1000000.0 AS dup_line_frac,
        |    FLOOR((CASE WHEN COALESCE(list_sum(list_transform(lines, x -> len(x))), 0) = 0 THEN 0.0
        |      ELSE CAST(list_sum(list_transform(lines, y -> CASE WHEN len(list_filter(lines, x -> x = y)) > 1 THEN len(y) ELSE 0 END)) AS DOUBLE)
        |        / list_sum(list_transform(lines, x -> len(x))) END) * 1000000.0 + 0.5) / 1000000.0 AS dup_line_char_frac
        |  FROM l
        |), t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS bigram
        |  FROM t, unnest(range(1, len(toks))) AS u(i)
        |), bc AS (
        |  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
        |), bs AS (
        |  SELECT doc_id, max(c) AS top_bigram_n, CAST(sum(c) AS BIGINT) AS n_bigrams
        |  FROM bc GROUP BY doc_id
        |)
        |SELECT ls.doc_id, ls.n_lines, ls.dup_line_frac, ls.dup_line_char_frac,
        |  COALESCE(bs.top_bigram_n, 0) AS top_bigram_n,
        |  COALESCE(bs.n_bigrams, 0) AS n_bigrams,
        |  FLOOR((CASE WHEN COALESCE(bs.n_bigrams, 0) = 0 THEN 0.0
        |    ELSE CAST(bs.top_bigram_n AS DOUBLE) / bs.n_bigrams END) * 1000000.0 + 0.5) / 1000000.0 AS top_bigram_frac
        |FROM ls LEFT JOIN bs ON ls.doc_id = bs.doc_id
        |ORDER BY ls.doc_id""".stripMargin,

    "doc_gopher" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks,
        |    string_split(text, chr(10)) AS lines,
        |    len(regexp_replace(text, '\s+', '', 'g')) AS nws_chars,
        |    len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS n_sym
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, len(toks) AS n_words,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(nws_chars AS DOUBLE) / len(toks) END AS mwl,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(n_sym AS DOUBLE) / len(toks) END AS swr,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(toks) END AS awr,
        |    CASE WHEN len(lines) = 0 THEN 0.0 ELSE CAST(len(list_filter(lines, l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS DOUBLE) / len(lines) END AS blr,
        |    CASE WHEN len(lines) = 0 THEN 0.0 ELSE CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '\.\.\.$'))) AS DOUBLE) / len(lines) END AS elr,
        |    len(list_intersect(toks, ['the','be','to','of','and','that','have','with'])) AS stop_hits
        |  FROM g
        |)
        |SELECT doc_id, n_words,
        |  FLOOR(mwl * 1000000.0 + 0.5) / 1000000.0 AS mean_word_len,
        |  FLOOR(swr * 1000000.0 + 0.5) / 1000000.0 AS symbol_ratio,
        |  FLOOR(awr * 1000000.0 + 0.5) / 1000000.0 AS alpha_ratio,
        |  FLOOR(blr * 1000000.0 + 0.5) / 1000000.0 AS bullet_ratio,
        |  FLOOR(elr * 1000000.0 + 0.5) / 1000000.0 AS ellipsis_ratio,
        |  stop_hits,
        |  ((n_words BETWEEN 50 AND 100000) AND mwl BETWEEN 3.0 AND 10.0
        |    AND swr <= 0.1 AND blr <= 0.9 AND elr <= 0.3 AND awr >= 0.8
        |    AND stop_hits >= 2) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "top_docs_per_lang" ->
      ("WITH " + qualityCte + """
        |SELECT lang, doc_id, quality,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS INT) AS rank
        |FROM q QUALIFY rank <= 3 ORDER BY lang, rank""".stripMargin),

    "line_slice" ->
      // python text.split(' ')[3:8] == DuckDB 1-based inclusive [4:8]
      """SELECT doc_id,
        |  array_to_string(string_split(text, ' ')[4:8], ' ') AS sliced
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q14_promo" ->
      """SELECT FLOOR(100.0 *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |  * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""".stripMargin,

    "user_funnel" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |)
        |SELECT prev_type, event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type ORDER BY prev_type, event_type""".stripMargin,

    "quality_tiers" ->
      ("WITH " + qualityCte + """
        |, tiered AS (
        |  SELECT lang, doc_id, quality,
        |    CAST(ntile(4) OVER (PARTITION BY lang ORDER BY quality, doc_id) AS INT) AS tier
        |  FROM q
        |)
        |SELECT lang, tier, count(*) AS n_docs,
        |  FLOOR(MIN(quality) * 1000000.0 + 0.5) / 1000000.0 AS min_q,
        |  FLOOR(MAX(quality) * 1000000.0 + 0.5) / 1000000.0 AS max_q,
        |  FLOOR(CAST(SUM(CAST(quality AS DECIMAL(28,6))) AS DOUBLE) / COUNT(quality) * 1000000.0 + 0.5) / 1000000.0 AS mean_q
        |FROM tiered GROUP BY lang, tier ORDER BY lang, tier""".stripMargin),

    "vocab_overlap" ->
      (bigramCte + """
        |, en AS (SELECT DISTINCT bigram FROM bg WHERE lang = 'en')
        |, es AS (SELECT DISTINCT bigram FROM bg WHERE lang = 'es')
        |SELECT bigram, status FROM (
        |  SELECT bigram, 'both' AS status FROM (SELECT bigram FROM en INTERSECT SELECT bigram FROM es)
        |  UNION ALL
        |  SELECT bigram, 'en_only' AS status FROM (SELECT bigram FROM en EXCEPT SELECT bigram FROM es)
        |  UNION ALL
        |  SELECT bigram, 'es_only' AS status FROM (SELECT bigram FROM es EXCEPT SELECT bigram FROM en)
        |) ORDER BY status, bigram""".stripMargin),

    "pack_batches" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents
        |), a AS (
        |  SELECT lang, doc_id, n_tokens,
        |    CAST(FLOOR(CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE) / 512) AS BIGINT) AS batch_id
        |  FROM t
        |)
        |SELECT lang, batch_id, count(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM a GROUP BY lang, batch_id ORDER BY lang, batch_id""".stripMargin,

    "weighted_sample" ->
      ("WITH " + qualityCte + """
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN q ON d.doc_id = q.doc_id
        |WHERE CAST(CAST(('0x' || substr(md5('graft42:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |  / 4294967296.0 < q.quality
        |ORDER BY d.doc_id""".stripMargin),

    "normalize_dedup" ->
      // whitespace spelled out, not \s: Java's \s and RE2's \s disagree
      // on vertical tab (TextAnalysis.normalize does the same)
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \t\n\r\f]', '', 'g'), '[ \t\n\r\f]+', ' ', 'g'))) AS norm_hash,
        |  min(doc_id) AS keeper,
        |  array_to_string(list_sort(list(doc_id)), ',') AS ids,
        |  count(*) AS group_size
        |FROM documents GROUP BY norm_hash ORDER BY norm_hash""".stripMargin,

    "bigram_topk" ->
      (bigramCte + """
        |SELECT bigram, count(*) AS n FROM bg
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin),

    "events_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    "events_sliding" ->
      // two shifted 30-min-aligned starts per event == Spark's sliding
      // window expansion (1h length / 30min slide, epoch-aligned)
      """WITH w AS (
        |  SELECT event_type,
        |    make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - u.o * 1800) * 1000000 AS BIGINT)) AS ws
        |  FROM events, unnest([0, 1]) AS u(o)
        |)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
        |  count(*) AS n
        |FROM w GROUP BY w_start, event_type ORDER BY w_start, event_type""".stripMargin,

    "events_moving_avg" ->
      """SELECT user_id, event_id,
        |  FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) /
        |    COUNT(*) OVER w * 1000000.0 + 0.5) / 1000000.0 AS mov_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "corpus_profile" ->
      """SELECT count(*) AS n_rows,
        |  count(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
        |  count(CASE WHEN len(text) = 0 THEN 1 END) AS n_empty_text,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  count(CASE WHEN n_chars <> len(text) THEN 1 END) AS n_chars_mismatch,
        |  count(DISTINCT doc_id) AS n_distinct_ids
        |FROM documents""".stripMargin,

    "corpus_merge" ->
      """WITH all_rows AS (
        |  SELECT doc_id, text, 1 AS version FROM documents
        |  UNION ALL
        |  SELECT doc_id, text || ' [v2]' AS text, 2 AS version FROM documents
        |  WHERE doc_id % 5 = 0
        |)
        |SELECT doc_id, CAST(max(version) AS BIGINT) AS version,
        |  md5(arg_max(text, version)) AS text_md5
        |FROM all_rows GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "snapshot_diff" ->
      """WITH a AS (
        |  SELECT doc_id, md5(text) AS h_a FROM documents WHERE doc_id % 7 <> 0
        |), b AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 3 = 0 THEN text || ' edited' ELSE text END) AS h_b
        |  FROM documents WHERE doc_id % 5 <> 0
        |)
        |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN h_a IS DISTINCT FROM h_b THEN 'changed'
        |       ELSE 'same' END AS status
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        |WHERE (CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN h_a IS DISTINCT FROM h_b THEN 'changed'
        |       ELSE 'same' END) <> 'same'
        |ORDER BY doc_id""".stripMargin,
  )

  /** Shared CTE chain `t → h → q`: tokenized documents → stopword hits →
    * rounded quality score per doc (the SQL twin of
    * [[TextAnalysis.qualityScore]], rational arithmetic only), with `lang`
    * carried for per-group consumers. */
  private val qualityCte: String =
    """t AS (
      |  SELECT doc_id, lang, text,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, lang, text, len(toks) AS n_tok,
      |    len(list_intersect(toks, ['the','and','of','to','in','is','that','it','was','for'])) +
      |    len(list_intersect(toks, ['el','los','las','que','y','una','por','como','pero','con'])) +
      |    len(list_intersect(toks, ['der','die','das','und','ist','ein','eine','zu','den','von'])) +
      |    len(list_intersect(toks, ['le','les','et','est','une','des','du','dans','pour','sur'])) AS stop_hits
      |  FROM t
      |), q AS (
      |  SELECT doc_id, lang,
      |    FLOOR((LEAST(1.0, CAST(n_tok AS DOUBLE) / 100.0) *
      |      (1.0 - CASE WHEN len(text) = 0 THEN 0.0
      |        ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9_\s]')) AS DOUBLE) / len(text) END) *
      |      (0.5 + 0.5 * CAST(LEAST(stop_hits, 5) AS DOUBLE) / 5.0)) * 1000000.0 + 0.5) / 1000000.0 AS quality
      |  FROM h
      |)""".stripMargin

  /** Shared DuckDB CTE: adjacent-token bigrams per doc with `lang` carried
    * (twin of [[TextAnalysis.bigrams]]; `range(1, len)` is empty below two
    * tokens, matching the Spark guard). */
  /** MMR oracle: replays [[graft.search.Mmr.diversifiedTopK]]'s greedy
    * selection as `k` chained argmax CTEs — sel1 is the plain relevance
    * argmax (empty selected set ⇒ no diversity penalty), each later step
    * scores the not-yet-selected candidates by
    * `0.5·rel − 0.5·max(sim to selected)` with the pairwise sims
    * floor-quantized to the same 1e-6 grid as the Scala greedy loop, and
    * picks the (score desc, id asc) winner. λ = 0.5 inlined. */
  private def mmrOracleSql(nQ: Int, fetchK: Int, k: Int): String = {
    val header =
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $nQ
         |), scored AS (
         |  SELECT q.qid AS query_id, c.vec_id AS result_id,
         |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS rel,
         |    CAST(c.embedding AS DOUBLE[]) AS cv
         |  FROM q CROSS JOIN embeddings c
         |  WHERE c.vec_id <> q.qid
         |), cand AS (
         |  SELECT query_id, result_id, rel, cv FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, result_id ASC) AS rn
         |    FROM scored) WHERE rn <= $fetchK
         |), sel1 AS (
         |  SELECT query_id, result_id, rel, cv, 1 AS mmr_rank, 0.5 * rel AS m FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, result_id ASC) AS rn
         |    FROM cand) WHERE rn = 1
         |)""".stripMargin
    val steps = (2 to k).map { i =>
      val prev = s"sel${i - 1}"
      s""", gen$i AS (
         |  SELECT c.query_id, c.result_id, c.rel, c.cv,
         |    0.5 * c.rel - 0.5 * (
         |      SELECT MAX(FLOOR(list_cosine_similarity(c.cv, s.cv) * 1000000.0 + 0.5) / 1000000.0)
         |      FROM $prev s WHERE s.query_id = c.query_id) AS m
         |  FROM cand c
         |  WHERE NOT EXISTS (SELECT 1 FROM $prev x
         |    WHERE x.query_id = c.query_id AND x.result_id = c.result_id)
         |), pick$i AS (
         |  SELECT query_id, result_id, rel, cv, $i AS mmr_rank, m FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY m DESC, result_id ASC) AS rn
         |    FROM gen$i) WHERE rn = 1
         |), sel$i AS (
         |  SELECT * FROM $prev UNION ALL SELECT * FROM pick$i
         |)""".stripMargin
    }.mkString
    header + steps +
      s"""
         |SELECT query_id, result_id, mmr_rank,
         |  FLOOR(m * 1000000.0 + 0.5) / 1000000.0 AS mmr_score,
         |  rel AS score
         |FROM sel$k ORDER BY query_id, mmr_rank""".stripMargin
  }

  /** Span-cut oracle — shared verbatim by `dedup_span_cut` and
    * `index_span_cut` (both route through `DupSpans.cutWithOwners` with
    * identical ownership, so their outputs are identical by
    * construction). */
  private def spanCutSql: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(toks[i:i+4], ' ')) AS h
      |  FROM tk, unnest(range(1, len(toks) - 3)) AS u(i)
      |  WHERE len(toks) >= 5
      |), own AS (
      |  SELECT h, min(doc_id) AS owner
      |  FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
      |), cov AS (
      |  SELECT DISTINCT g.doc_id, j AS i
      |  FROM g JOIN own USING (h), unnest(range(g.pos, g.pos + 5)) AS v(j)
      |  WHERE g.doc_id <> own.owner
      |), tok AS (
      |  SELECT doc_id, i, toks[i] AS tok
      |  FROM tk, unnest(range(1, len(toks) + 1)) AS v(i)
      |)
      |SELECT tok.doc_id, count(*) AS n_tokens, count(cov.i) AS n_cut,
      |  coalesce(string_agg(CASE WHEN cov.i IS NULL THEN tok.tok END, ' ' ORDER BY tok.i), '') AS text_clean
      |FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.i
      |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin

  /** winnow_pairs oracle — exact SQL replay of the fused Karp-Rabin +
    * murmur-mix + sliding-minimum winnowing kernel
    * (`expr/Winnowing.scala`) at the query's pinned parameters
    * (k=12, w=8, minShared=10, cap=10000). Java's wraparound 64-bit
    * arithmetic is emulated over HUGEINT: values ride UNSIGNED in
    * [0, 2⁶⁴); multiplies split the 64-bit constant into 32-bit halves so
    * no intermediate exceeds the signed-128 range; xor drops to signed
    * BIGINT (same bits) and returns. The selected-fingerprint SET is
    * order-and-tie-rule independent (ties share the value), so a plain
    * 8-wide window minimum over the SIGNED hash reproduces the
    * monotonic-deque selection exactly. Validated cell-exact against the
    * kernel on the full sf0.01 fixture. */
  // --- wraparound-64-bit arithmetic emulated in DuckDB SQL over HUGEINT:
  // values ride UNSIGNED in [0, 2⁶⁴); multiplies split the 64-bit constant
  // into 32-bit halves so no intermediate exceeds the signed-128 range;
  // xor drops to the identical signed-BIGINT bits and returns. Shared by
  // the winnowing and simhash kernel replays. ---
  private val u64 = "CAST('18446744073709551616' AS HUGEINT)"
  private def u64Signed(v: String) =
    s"(CASE WHEN $v >= CAST('9223372036854775808' AS HUGEINT) " +
      s"THEN CAST($v - $u64 AS BIGINT) ELSE CAST($v AS BIGINT) END)"
  private def u64Uns(v: String) =
    s"(CASE WHEN $v < 0 THEN CAST($v AS HUGEINT) + $u64 ELSE CAST($v AS HUGEINT) END)"
  /** x * C mod 2⁶⁴ with C = ch·2³² + cl. */
  private def u64MulC(v: String, ch: Long, cl: Long) =
    s"((($v * $cl) % $u64 + (($v * $ch) % 4294967296) * 4294967296) % $u64)"

  // --- Encoding-faithful character access (round 14, retiring the ASCII
  // fixture guard): the kernels fold UTF-8 BYTES (simhash/TF-IDF token
  // FNV, byte-histogram features) or UTF-16 CODE UNITS (winnowing's
  // charAt Karp-Rabin, Java-string tie-breaks), while naive SQL folds
  // CODE POINTS — identical on ASCII, divergent beyond. These helpers
  // emulate the exact Java views in DuckDB, so the twins hold on any
  // Unicode text. (Case folding needs no emulation at all since round 15:
  // the engine folds with the Unicode SIMPLE mapping — simple_lower —
  // which IS DuckDB's lower() modulo the three stale-table code points
  // sqlFold pre-replaces.) ---

  /** UTF-8 bytes of VARCHAR `s` as a DuckDB list of INTs (one per byte):
    * hex(encode(s)) parsed in 2-char pairs — encode() is DuckDB's
    * VARCHAR→UTF-8-BLOB, so this is the exact `String.getBytes(UTF_8)` /
    * UTF8String byte sequence the kernels fold. */
  private def sqlUtf8Bytes(s: String): String =
    s"list_transform(range(0, strlen($s)), j -> " +
      s"CAST(('0x' || substr(hex(encode($s)), CAST(2 * j + 1 AS INT), 2)) AS INT))"

  /** UTF-16 code units of VARCHAR `s` as a DuckDB list of INTs — each
    * code point expanded to its surrogate pair above U+FFFF; the exact
    * Java `charAt` sequence, and (as a list) the exact Java
    * `String.compareTo` sort key, since DuckDB orders lists
    * lexicographically element-wise. */
  private def sqlUtf16Units(s: String): String =
    s"flatten(list_transform(" +
      s"list_transform(range(1, len($s) + 1), i -> unicode(substr($s, CAST(i AS INT), 1)))," +
      s" cp -> CASE WHEN cp < 65536 THEN [cp] " +
      s"ELSE [55296 + (cp - 65536) // 1024, 56320 + (cp - 65536) % 1024] END))"

  private def winnowPairsSql: String = {
    def signed(v: String) = u64Signed(v)
    def uns(v: String) = u64Uns(v)
    // x ^ (x >>> 33): the shift is an exact HUGEINT division (x is
    // non-negative), xor runs on the identical signed-BIGINT bits.
    def uxorsh(v: String) = uns(s"xor(${signed(v)}, CAST($v // 8589934592 AS BIGINT))")
    def umul(v: String, ch: Long, cl: Long) = u64MulC(v, ch, cl)
    // 257^j mod 2^64 for j = 11..0 — the Karp-Rabin base powers.
    val pows = Seq("5462812792530078465", "8706299010550139393",
        "2617856364451727617", "584403925891549185", "74051159531521793",
        "288136807515649", "1121154893057", "4362470401", "16974593",
        "66049", "257", "1")
      .map(p => s"CAST('$p' AS HUGEINT)").mkString("[", ", ", "]")
    s"""WITH reps AS (
       |  SELECT min(doc_id) AS id, text, count(*) AS fam
       |  FROM documents GROUP BY text
       |), codes0 AS (
       |  -- the kernel's Karp-Rabin folds charAt = UTF-16 code units, and
       |  -- its length/gram counts are UTF-16 lengths
       |  SELECT id, fam, ${sqlUtf16Units("text")} AS cs FROM reps
       |), codes AS (
       |  SELECT id, fam, len(cs) AS n, cs FROM codes0 WHERE len(cs) >= 12
       |), g0 AS (
       |  SELECT id, fam, i, n - 11 AS grams,
       |    list_sum(list_transform(range(0, 12),
       |      j -> CAST(cs[i + j] AS HUGEINT) * ($pows)[j + 1])) % $u64 AS x
       |  FROM codes, unnest(range(1, n - 10)) AS u(i)
       |), m1 AS (SELECT id, fam, i, grams, ${uxorsh("x")} AS x FROM g0
       |), m2 AS (SELECT id, fam, i, grams, ${umul("x", 4283543511L, 3981806797L)} AS x FROM m1
       |), m3 AS (SELECT id, fam, i, grams, ${uxorsh("x")} AS x FROM m2
       |), m4 AS (SELECT id, fam, i, grams, ${umul("x", 3301882366L, 444984403L)} AS x FROM m3
       |), m5 AS (SELECT id, fam, i, grams, ${uxorsh("x")} AS x FROM m4
       |), hashes AS (SELECT id, fam, i, grams, ${signed("x")} AS fp FROM m5
       |), winmin AS (
       |  SELECT id, fam, i, grams,
       |    min(fp) OVER (PARTITION BY id ORDER BY i ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS mn
       |  FROM hashes
       |), fps AS (
       |  SELECT DISTINCT id, fam, mn AS fp FROM winmin WHERE i >= 8 OR i = grams
       |), oversized AS (
       |  SELECT fp FROM fps GROUP BY fp HAVING sum(fam) > 10000
       |), capped AS (
       |  SELECT fps.id, fps.fp FROM fps LEFT JOIN oversized USING (fp)
       |  WHERE oversized.fp IS NULL
       |), repPairs AS (
       |  SELECT l.id AS ra, r.id AS rb, count(*) AS n_shared
       |  FROM capped l JOIN capped r ON l.fp = r.fp AND l.id < r.id
       |  GROUP BY 1, 2 HAVING count(*) >= 10
       |), members AS (
       |  SELECT d.doc_id AS mid, r.id AS rid FROM documents d JOIN reps r USING (text)
       |), crossp AS (
       |  SELECT least(ma.mid, mb.mid) AS id_a, greatest(ma.mid, mb.mid) AS id_b, p.n_shared
       |  FROM repPairs p JOIN members ma ON ma.rid = p.ra JOIN members mb ON mb.rid = p.rb
       |), selfShared AS (
       |  SELECT id AS rid, count(*) AS n_shared FROM capped GROUP BY id HAVING count(*) >= 10
       |), within AS (
       |  SELECT a.mid AS id_a, b.mid AS id_b, s.n_shared
       |  FROM members a JOIN members b ON a.rid = b.rid AND a.mid < b.mid
       |  JOIN selfShared s ON s.rid = a.rid
       |)
       |SELECT id_a, id_b, n_shared FROM crossp
       |UNION ALL SELECT id_a, id_b, n_shared FROM within
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** simhash_pairs oracle — exact SQL replay of the FNV-1a-64 + Charikar
    * SimHash kernel (`expr/SimHash.scala`) and the quarter-banded
    * candidate join (`Dedup.simHashNearDups`, maxHamming=3, cap=10000).
    * The per-token FNV fold runs as a `list_reduce` over the token's
    * exact UTF-8 bytes (sqlUtf8Bytes — the kernel folds
    * UTF8String.getBytes); bit votes, quarter keys and Hamming verify are
    * plain integer SQL. Validated cell-exact against the kernel on the
    * full sf0.01 fixture. */
  private def simhashPairsSql: String = {
    // FNV-1a step: acc' = ((acc ^ byte) · 0x100000001b3) mod 2⁶⁴.
    val step = u64MulC(
      u64Uns(s"xor(${u64Signed("acc")}, CAST(c AS BIGINT))"), 256L, 435L)
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS t
       |  FROM documents
       |), th AS (
       |  -- FNV-1a folds the token's UTF-8 BYTES (UTF8String.getBytes)
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |        list_transform(${sqlUtf8Bytes("t")}, c -> CAST(c AS HUGEINT))),
       |      (acc, c) -> $step) AS h
       |  FROM tok
       |), bits AS (
       |  SELECT doc_id, b,
       |    CASE WHEN sum(CASE WHEN (h // (CAST(1 AS HUGEINT) << b)) % 2 = 1 THEN 1 ELSE -1 END) > 0
       |      THEN CAST(1 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END AS bit
       |  FROM th, unnest(range(0, 64)) AS u(b)
       |  GROUP BY doc_id, b
       |), fps0 AS (
       |  SELECT doc_id, sum(bit * (CAST(1 AS HUGEINT) << b)) AS fpu FROM bits GROUP BY doc_id
       |), fps AS (
       |  SELECT d.doc_id AS id, coalesce(f.fpu, CAST(0 AS HUGEINT)) AS fpu,
       |    ${u64Signed("coalesce(f.fpu, CAST(0 AS HUGEINT))")} AS fp
       |  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN fps0 f USING (doc_id)
       |), banded0 AS (
       |  SELECT id, fp, q, CAST((fpu // (CAST(1 AS HUGEINT) << (16 * q))) % 65536 AS BIGINT) AS qh
       |  FROM fps, unnest(range(0, 4)) AS u(q)
       |), oversized AS (
       |  SELECT q, qh FROM banded0 GROUP BY q, qh HAVING count(*) > 10000
       |), banded AS (
       |  SELECT b.* FROM banded0 b LEFT JOIN oversized o ON b.q = o.q AND b.qh = o.qh
       |  WHERE o.qh IS NULL
       |), cand AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.fp AS fa, r.fp AS fb
       |  FROM banded l JOIN banded r ON l.q = r.q AND l.qh = r.qh AND l.id < r.id
       |)
       |SELECT id_a, id_b, bit_count(xor(fa, fb)) AS hamming
       |FROM cand WHERE bit_count(xor(fa, fb)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** bpe_tokens / bpe_encode oracles — FULL SQL replay of the BPE
    * pipeline (graft.text.Bpe.train + expr/BpeKernel.encode), training
    * included. A word's symbol sequence rides as ONE VARCHAR in
    * double-space-joined form, `'␣␣' + join(syms,'␣␣') + '␣␣'` (symbols
    * are whitespace-free, so the gaps are unambiguous), which makes the
    * greedy left-to-right merge pass a single `replace(state,
    * '␣a␣␣b␣', '␣ab␣')`: the pattern's outer single spaces enforce
    * whole-symbol boundaries, the leftover space on each side of the
    * replacement restores the double-space format, and adjacent
    * occurrences still match because each match leaves its neighbors'
    * boundary spaces intact.
    *
    * TRAINING: `bpeNumMerges` chained CTE rounds over the
    * `bpeSampleSize`-doc salted-md5 sample — pair counts (unnest of
    * adjacent symbol pairs weighted by word frequency), the argmax with
    * the kernel's exact tie rule (count desc, then (left, right)
    * lexicographic), and the merge pass above. CTEs are MATERIALIZED:
    * each round is referenced twice, and DuckDB's default inlining would
    * expand the 64-round chain exponentially.
    *
    * ENCODE: a recursive CTE over the DISTINCT corpus words; each step
    * computes the lowest-ranked merge whose pattern the state still
    * CONTAINS (exactly the kernel's min-rank adjacent pair: the pattern
    * is present iff the pair is adjacent) and applies it; words exit the
    * recursion when no pattern matches. States strictly shrink, so each
    * word surfaces exactly once in the final set.
    *
    * Validated cell-exact (both columns, all docs) against the kernel on
    * the full sf0.01 fixture; tie-breaks order UTF-16 code-unit lists
    * (sqlUtf16Units), matching Java string order on any Unicode text. */
  /** ivf_recall / ivf_partitioned_recall oracle — full DuckDB replay of
    * the IVF pipeline (round 14, the BPE playbook applied to KMeans):
    *
    * TRAINING ([[graft.search.LatticeKmeans]]): the 2048-vector salted-md5
    * sample is quantized to the 2⁻²⁰ integer lattice
    * (`CAST(FLOOR(x*1048576 + 0.5) AS BIGINT)` over the exact
    * float→double values — bit-identical to the Scala quantizer), Forgy
    * init takes the first nList DISTINCT lattice points in sample order,
    * and each of the `iters` Lloyd rounds is one MATERIALIZED CTE pair:
    * assignment = argmin of the exact integer squared L2 (ROW_NUMBER over
    * dist ASC, cell ASC — the kernel's strict-< keeps the lowest cell on
    * ties), mean = the positive-offset truncating division
    * `(2s + n + 2n·2²²)//(2n) − 2²²` (DuckDB `//` truncates like Java `/`;
    * the offset makes truncation = floor in both). Empty cells keep the
    * previous centroid via LEFT JOIN + COALESCE.
    *
    * ROUTING: centroids exit the lattice as `c/1048576.0` — dyadic
    * rationals exact in float32 AND double, so
    * `list_inner_product(v, cd)/sqrt(list_inner_product(cd, cd))`
    * computes the identical doubles as [[graft.expr.NearestCentroidOps]]
    * (same sequential summation as the green knn cosine oracles; ties →
    * lower cell). Corpus rows take their top-1 cell, queries probe the
    * top-nProbe.
    *
    * SCORING: cosine r6 + (score DESC, id ASC) top-k — verbatim the
    * hash-green knn_topk contract. recall = found/|exact|, one double
    * division (the playbook's single-correctly-rounded-op rule). */
  private def ivfRecallSql(
      nList: Int, nProbe: Int, iters: Int, sampleN: Int,
      k: Int, nQueries: Int, salt: String): String =
    s"""${ivfPipelineCtes(nList, nProbe, iters, sampleN, nQueries, salt)}, approx AS MATERIALIZED (
       |  SELECT query_id, result_id FROM (
       |    SELECT p.qid AS query_id, e.vec_id AS result_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY
       |        ROUND(list_cosine_similarity(CAST(p.qv AS DOUBLE[]),
       |          CAST(e.embedding AS DOUBLE[])), 6) DESC, e.vec_id ASC) AS rank
       |    FROM probes p
       |    JOIN (SELECT emb.vec_id, emb.embedding, cc.cell
       |          FROM embeddings emb JOIN corpcell cc USING (vec_id)) e
       |      ON p.cell = e.cell
       |    WHERE e.vec_id <> p.qid
       |  ) WHERE rank <= $k
       |), ${ivfExactCte(k)}
       |${recallSelect}""".stripMargin

  /** The shared IVF replay prefix (starts with WITH, ends after `probes`):
    * lattice training rounds, dyadic centroids, cosine cell assignment of
    * the corpus, the md5 query sample, and each query's top-nProbe probe
    * cells. Scoring-specific tails (float cosine / int8 codes / binary
    * sign sketch + rescore) append their own CTEs. */
  private def ivfPipelineCtes(
      nList: Int, nProbe: Int, iters: Int, sampleN: Int,
      nQueries: Int, salt: String): String = {
    val off = LatticeKmeans.Scale * 4 // 2^22, matches LatticeKmeans.Off
    val rounds = (0 until iters).map { i =>
      s"""asg$i AS MATERIALIZED (
         |  SELECT vec_id, q, cell FROM (
         |    SELECT l.vec_id, l.q, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY l.vec_id ORDER BY
         |        list_sum(list_transform(list_zip(l.q, c.c),
         |          p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, c.cell ASC) AS rk
         |    FROM lat l CROSS JOIN cent$i c
         |  ) WHERE rk = 1
         |), sums$i AS (
         |  SELECT a.cell, u.d, CAST(SUM(a.q[CAST(u.d + 1 AS INT)]) AS BIGINT) AS s,
         |    COUNT(*) AS n
         |  FROM asg$i a, unnest(range(0, len(a.q))) AS u(d)
         |  GROUP BY a.cell, u.d
         |), cent${i + 1} AS MATERIALIZED (
         |  SELECT c.cell, COALESCE(m.c2, c.c) AS c
         |  FROM cent$i c LEFT JOIN (
         |    SELECT cell, list((2*s + n + 2*n*$off) // (2*n) - $off ORDER BY d) AS c2
         |    FROM sums$i GROUP BY cell
         |  ) m USING (cell)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH lat AS MATERIALIZED (
       |  SELECT vec_id,
       |    row_number() OVER (ORDER BY md5('$salt' || CAST(vec_id AS VARCHAR)), vec_id) AS rn,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(FLOOR(x * ${LatticeKmeans.Scale} + 0.5) AS BIGINT)) AS q
       |  FROM (
       |    SELECT vec_id, embedding FROM embeddings
       |    ORDER BY md5('$salt' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $sampleN
       |  )
       |), cent0 AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY rn) - 1 AS INT) AS cell, q AS c
       |  FROM (SELECT q, min(rn) AS rn FROM lat GROUP BY q ORDER BY rn LIMIT $nList)
       |), $rounds, cnorm AS MATERIALIZED (
       |  SELECT cell, cd, sqrt(list_inner_product(cd, cd)) AS nrm FROM (
       |    SELECT cell,
       |      list_transform(c, x -> CAST(x AS DOUBLE) / ${LatticeKmeans.Scale}.0) AS cd
       |    FROM cent$iters
       |  )
       |), corpcell AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, ct.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        (CASE WHEN ct.nrm > 0 THEN
       |          list_inner_product(CAST(e.embedding AS DOUBLE[]), ct.cd) / ct.nrm
       |         ELSE 0 END) DESC, ct.cell ASC) AS rk
       |    FROM embeddings e CROSS JOIN cnorm ct
       |  ) WHERE rk = 1
       |), qs AS (
       |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $nQueries
       |), probes AS (
       |  SELECT qid, qv, cell FROM (
       |    SELECT q.qid, q.qv, ct.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |        (CASE WHEN ct.nrm > 0 THEN
       |          list_inner_product(CAST(q.qv AS DOUBLE[]), ct.cd) / ct.nrm
       |         ELSE 0 END) DESC, ct.cell ASC) AS rk
       |    FROM qs q CROSS JOIN cnorm ct
       |  ) WHERE rk <= $nProbe
       |)""".stripMargin
  }

  /** Exact-kNN CTE over the `qs` sample (the hash-green knn_topk
    * contract: cosine r6, score DESC, id ASC, self excluded). */
  private def ivfExactCte(k: Int): String =
    s"""exact AS (
       |  SELECT query_id, result_id FROM (
       |    SELECT q.qid AS query_id, c.vec_id AS result_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |        ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |          CAST(c.embedding AS DOUBLE[])), 6) DESC, c.vec_id ASC) AS rank
       |    FROM qs q CROSS JOIN embeddings c
       |    WHERE c.vec_id <> q.qid
       |  ) WHERE rank <= $k
       |)""".stripMargin

  /** Int8 code CTEs over `embeddings` — exact replay of
    * [[graft.expr.Int8VectorOps]]: scale inverse = one double division
    * `127.0/max|v|`, code = round-half-up `FLOOR(x*inv + 0.5)` (Java
    * `Math.round` is floor(x+0.5)), zero vector → all-zero codes; `cn`
    * adds the exact integer squared norm for the code-vs-code cosine. */
  private val int8CodeCtes: String =
    """codes AS MATERIALIZED (
      |  SELECT vec_id, CASE WHEN mx > 0 THEN
      |      list_transform(v, x -> CAST(FLOOR(x * (127.0 / mx) + 0.5) AS BIGINT))
      |    ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS c
      |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |          list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS mx
      |        FROM embeddings)
      |), cn AS MATERIALIZED (
      |  SELECT vec_id, c, CAST(list_sum(list_transform(c, x -> x*x)) AS BIGINT) AS n2
      |  FROM codes
      |)""".stripMargin

  /** Code-vs-code int8 cosine (Int8VectorOps.cosine): integer dot over
    * the two BIGINT code lists, one double division by the sqrt-norm
    * product, 0.0 on either zero norm, rounded to the 6-dp wire. */
  private def int8ScoreSql(qa: String, cb: String): String =
    s"""ROUND(CASE WHEN $qa.n2 = 0 OR $cb.n2 = 0 THEN 0.0
       |        ELSE CAST(list_sum(list_transform(list_zip($qa.c, $cb.c),
       |               p -> p[1]*p[2])) AS DOUBLE)
       |             / (sqrt(CAST($qa.n2 AS DOUBLE)) * sqrt(CAST($cb.n2 AS DOUBLE))) END, 6)""".stripMargin

  /** quant_recall oracle: recall@10 of exact int8-code search vs exact
    * float search — both fully replayable (codes from int8CodeCtes,
    * scoring int8ScoreSql, exact side the knn_topk contract). */
  private def quantRecallSql(k: Int, nQueries: Int): String =
    s"""WITH qs AS (
       |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $nQueries
       |), $int8CodeCtes, approx AS MATERIALIZED (
       |  SELECT query_id, result_id FROM (
       |    SELECT q.qid AS query_id, cb.vec_id AS result_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |        ${int8ScoreSql("qa", "cb")} DESC, cb.vec_id ASC) AS rank
       |    FROM qs q JOIN cn qa ON qa.vec_id = q.qid, cn cb
       |    WHERE cb.vec_id <> q.qid
       |  ) WHERE rank <= $k
       |), ${ivfExactCte(k)}
       |$recallSelect""".stripMargin

  /** ivf_int8_recall oracle: the IVF pipeline (float routing on the
    * lattice centroids) with code-vs-code int8 scoring inside the probed
    * cells — compression loss and pruning loss compound, exactly the
    * persisted IvfCollection int8 layout. */
  private def ivfInt8RecallSql(
      nList: Int, nProbe: Int, iters: Int, sampleN: Int,
      k: Int, nQueries: Int, salt: String): String =
    s"""${ivfPipelineCtes(nList, nProbe, iters, sampleN, nQueries, salt)}, $int8CodeCtes, approx AS MATERIALIZED (
       |  SELECT query_id, result_id FROM (
       |    SELECT p.qid AS query_id, e.vec_id AS result_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY
       |        ${int8ScoreSql("qa", "e")} DESC, e.vec_id ASC) AS rank
       |    FROM probes p
       |    JOIN cn qa ON qa.vec_id = p.qid
       |    JOIN (SELECT cc.vec_id, cc.cell, kk.c, kk.n2
       |          FROM corpcell cc JOIN cn kk USING (vec_id)) e
       |      ON p.cell = e.cell
       |    WHERE e.vec_id <> p.qid
       |  ) WHERE rank <= $k
       |), ${ivfExactCte(k)}
       |$recallSelect""".stripMargin

  /** ivf_binary_recall oracle: sign-sketch candidate ranking (asymmetric
    * [[graft.expr.BitVectorOps.cosine]] — float query vs the ±1
    * reconstruction; every sign vector has norm √dim, so the RAW double
    * signed sum ranks, id tie-break) over the probed cells, k·oversample
    * candidates, then the exact-cosine r6 rescore to the final k —
    * verbatim IvfCollection.query's rescore path. */
  private def ivfBinaryRecallSql(
      nList: Int, nProbe: Int, iters: Int, sampleN: Int,
      k: Int, oversample: Int, nQueries: Int, salt: String): String =
    s"""${ivfPipelineCtes(nList, nProbe, iters, sampleN, nQueries, salt)}, signs AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CASE WHEN x > 0 THEN 1.0 ELSE -1.0 END) AS s
       |  FROM embeddings
       |), cand AS MATERIALIZED (
       |  SELECT query_id, result_id FROM (
       |    SELECT p.qid AS query_id, e.vec_id AS result_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY
       |        (CASE WHEN p.nq = 0 THEN 0.0 ELSE
       |          list_inner_product(CAST(p.qv AS DOUBLE[]), e.s)
       |          / (sqrt(p.nq) * sqrt(CAST(len(p.qv) AS DOUBLE))) END) DESC,
       |        e.vec_id ASC) AS rank
       |    FROM (SELECT qid, qv, cell,
       |            list_inner_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS nq
       |          FROM probes) p
       |    JOIN (SELECT cc.vec_id, cc.cell, sg.s
       |          FROM corpcell cc JOIN signs sg USING (vec_id)) e
       |      ON p.cell = e.cell
       |    WHERE e.vec_id <> p.qid
       |  ) WHERE rank <= ${k * oversample}
       |), approx AS MATERIALIZED (
       |  SELECT query_id, result_id FROM (
       |    SELECT c.query_id, c.result_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.query_id ORDER BY
       |        ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |          CAST(f.embedding AS DOUBLE[])), 6) DESC, c.result_id ASC) AS rank
       |    FROM cand c
       |    JOIN qs q ON q.qid = c.query_id
       |    JOIN embeddings f ON f.vec_id = c.result_id
       |  ) WHERE rank <= $k
       |), ${ivfExactCte(k)}
       |$recallSelect""".stripMargin

  /** ivf_pq_recall oracle — the deepest replay in the repo: IVF lattice
    * training (ivfPipelineCtes) PLUS per-subspace PQ codebook training
    * ([[graft.search.Pq.trainCodebooks]]: the `graftpq42:` lattice sample
    * sliced into m subspaces, each trained m×iters materialized Lloyd-
    * round CTEs exactly like the cell training), then:
    * encode = per-(vector, subspace) argmin of the sequential-double L2
    * to the dyadic sub-centroids (list_inner_product of the diff with
    * itself — the kernel's `d += diff*diff` loop order; strict-< = lowest
    * cell on ties); reconstruction = subspace-ordered concatenation of
    * the chosen centroids with `nx` accumulated by an explicitly
    * SEQUENTIAL list_reduce (the kernel's `nx += normSq(j)(c)` j-order);
    * scoring = asymmetric ADC cosine `dot(q, recon)/(√nq·√nx)` rounded to
    * the 6-dp wire, inside the probed cells ([[graft.expr.PqVectorOps
    * .cosine]] verbatim). */
  private def ivfPqRecallSql(
      nList: Int, nProbe: Int, iters: Int, sampleN: Int,
      k: Int, nQueries: Int, salt: String,
      m: Int, codebookSize: Int, pqIters: Int, dim: Int): String = {
    require(dim % m == 0)
    val dsub = dim / m
    val off = LatticeKmeans.Scale * 4
    val pqSalt = "graftpq42:"
    val subTraining = (0 until m).map { j =>
      val lo = j * dsub + 1
      val hi = (j + 1) * dsub
      val rounds = (0 until pqIters).map { i =>
        s"""s${j}asg$i AS MATERIALIZED (
           |  SELECT rn, q, cell FROM (
           |    SELECT l.rn, l.q, c.cell,
           |      ROW_NUMBER() OVER (PARTITION BY l.rn ORDER BY
           |        list_sum(list_transform(list_zip(l.q, c.c),
           |          p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, c.cell ASC) AS rk
           |    FROM s${j}lat l CROSS JOIN s${j}cent$i c
           |  ) WHERE rk = 1
           |), s${j}sums$i AS (
           |  SELECT a.cell, u.d, CAST(SUM(a.q[CAST(u.d + 1 AS INT)]) AS BIGINT) AS s,
           |    COUNT(*) AS n
           |  FROM s${j}asg$i a, unnest(range(0, len(a.q))) AS u(d)
           |  GROUP BY a.cell, u.d
           |), s${j}cent${i + 1} AS MATERIALIZED (
           |  SELECT c.cell, COALESCE(mm.c2, c.c) AS c
           |  FROM s${j}cent$i c LEFT JOIN (
           |    SELECT cell, list((2*s + n + 2*n*$off) // (2*n) - $off ORDER BY d) AS c2
           |    FROM s${j}sums$i GROUP BY cell
           |  ) mm USING (cell)
           |)""".stripMargin
      }.mkString(", ")
      s"""s${j}lat AS MATERIALIZED (
         |  SELECT rn, q[$lo:$hi] AS q FROM plat
         |), s${j}cent0 AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY rn) - 1 AS INT) AS cell, q AS c
         |  FROM (SELECT q, min(rn) AS rn FROM s${j}lat GROUP BY q
         |        ORDER BY rn LIMIT $codebookSize)
         |), $rounds""".stripMargin
    }.mkString(", ")
    val cbUnion = (0 until m).map { j =>
      s"SELECT $j AS sub, cell, list_transform(c, x -> CAST(x AS DOUBLE) / ${LatticeKmeans.Scale}.0) AS cd FROM s${j}cent$pqIters"
    }.mkString(" UNION ALL ")
    s"""${ivfPipelineCtes(nList, nProbe, iters, sampleN, nQueries, salt)}, plat AS MATERIALIZED (
       |  SELECT row_number() OVER (
       |      ORDER BY md5('$pqSalt' || CAST(vec_id AS VARCHAR)), vec_id) AS rn,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(FLOOR(x * ${LatticeKmeans.Scale} + 0.5) AS BIGINT)) AS q
       |  FROM (
       |    SELECT vec_id, embedding FROM embeddings
       |    ORDER BY md5('$pqSalt' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $sampleN
       |  )
       |), $subTraining, cbn AS MATERIALIZED (
       |  SELECT sub, cell, cd, list_inner_product(cd, cd) AS ns FROM ($cbUnion)
       |), pcode AS MATERIALIZED (
       |  SELECT vec_id, sub, cell FROM (
       |    SELECT vec_id, sub, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY
       |        list_inner_product(df, df) ASC, cell ASC) AS rk
       |    FROM (
       |      SELECT e.vec_id, b.sub, b.cell,
       |        list_transform(
       |          list_zip(e.v[b.sub*$dsub+1 : (b.sub+1)*$dsub], b.cd),
       |          p -> p[1]-p[2]) AS df
       |      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
       |      CROSS JOIN cbn b
       |    )
       |  ) WHERE rk = 1
       |), precon AS MATERIALIZED (
       |  SELECT p.vec_id, flatten(list(b.cd ORDER BY p.sub)) AS recon,
       |    list_reduce(list_prepend(0.0, list(b.ns ORDER BY p.sub)),
       |      (acc, x) -> acc + x) AS nx
       |  FROM pcode p JOIN cbn b ON b.sub = p.sub AND b.cell = p.cell
       |  GROUP BY p.vec_id
       |), approx AS MATERIALIZED (
       |  SELECT query_id, result_id FROM (
       |    SELECT p.qid AS query_id, e.vec_id AS result_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY
       |        ROUND(CASE WHEN p.nq = 0 OR e.nx = 0 THEN 0.0
       |          ELSE list_inner_product(CAST(p.qv AS DOUBLE[]), e.recon)
       |               / (sqrt(p.nq) * sqrt(e.nx)) END, 6) DESC,
       |        e.vec_id ASC) AS rank
       |    FROM (SELECT qid, qv, cell,
       |            list_inner_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS nq
       |          FROM probes) p
       |    JOIN (SELECT cc.vec_id, cc.cell, r.recon, r.nx
       |          FROM corpcell cc JOIN precon r USING (vec_id)) e
       |      ON p.cell = e.cell
       |    WHERE e.vec_id <> p.qid
       |  ) WHERE rank <= $k
       |), ${ivfExactCte(k)}
       |$recallSelect""".stripMargin
  }

  /** recall = |approx ∩ exact| / |exact|: one double division (the
    * single-correctly-rounded-op rule), identical to the Spark side's
    * `sum(found).cast(double) / count(*)`. */
  private val recallSelect: String =
    """SELECT CAST(CAST(SUM(CASE WHEN a.result_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
      |  / COUNT(*) AS recall_at_k
      |FROM exact e LEFT JOIN approx a
      |  ON e.query_id = a.query_id AND e.result_id = a.result_id""".stripMargin

  private def bpeReplaySql(finalCols: String): String = {
    val rounds = (0 until bpeNumMerges).map { i =>
      s"""pairs$i AS MATERIALIZED (
         |  SELECT l[j] AS a, l[j+1] AS b, CAST(SUM(freq) AS BIGINT) AS c
         |  FROM (SELECT freq, list_filter(string_split(state, '  '), x -> len(x) > 0) AS l FROM st$i),
         |       unnest(range(1, len(l))) AS u(j)
         |  GROUP BY 1, 2
         |), best$i AS MATERIALIZED (
         |  -- tie-break is Java String.compareTo = UTF-16 code-unit order
         |  -- (DuckDB's native string ORDER BY is UTF-8-byte = code-point
         |  -- order, which flips for [U+E000,U+FFFF] vs astral symbols)
         |  SELECT a, b FROM pairs$i
         |  ORDER BY c DESC, ${sqlUtf16Units("a")}, ${sqlUtf16Units("b")} LIMIT 1
         |), st${i + 1} AS MATERIALIZED (
         |  SELECT w, freq,
         |    CASE WHEN (SELECT count(*) FROM best$i) = 0 THEN state
         |    ELSE replace(state,
         |      ' ' || (SELECT a FROM best$i) || '  ' || (SELECT b FROM best$i) || ' ',
         |      ' ' || (SELECT a FROM best$i) || (SELECT b FROM best$i) || ' ')
         |    END AS state
         |  FROM st$i)""".stripMargin
    }.mkString(",\n")
    val mgUnion = (0 until bpeNumMerges)
      .map(i => s"SELECT $i AS rank, a, b FROM best$i").mkString(" UNION ALL ")
    s"""WITH RECURSIVE sample AS (
       |  SELECT text FROM documents
       |  ORDER BY md5('graft42:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT $bpeSampleSize
       |), swords AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS w
       |    FROM sample
       |  ) GROUP BY w
       |), st0 AS (
       |  SELECT w, freq,
       |    '  ' || array_to_string(list_transform(range(1, len(w) + 1), i -> substr(w, CAST(i AS INT), 1)), '  ') || '  ' AS state
       |  FROM swords
       |),
       |$rounds,
       |mg AS ($mgUnion),
       |ctoks AS (
       |  SELECT doc_id, j, lw[j] AS w
       |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS lw FROM documents),
       |       unnest(range(1, len(lw) + 1)) AS u(j)
       |), dw AS (SELECT DISTINCT w FROM ctoks),
       |w0 AS (
       |  SELECT w,
       |    '  ' || array_to_string(list_transform(range(1, len(w) + 1), i -> substr(w, CAST(i AS INT), 1)), '  ') || '  ' AS state
       |  FROM dw
       |), enc AS (
       |  SELECT w, state FROM w0
       |  UNION ALL
       |  SELECT x.w, replace(x.state, ' ' || m.a || '  ' || m.b || ' ', ' ' || m.a || m.b || ' ') AS state
       |  FROM (SELECT e.w, e.state,
       |          (SELECT min(m2.rank) FROM mg m2
       |           WHERE contains(e.state, ' ' || m2.a || '  ' || m2.b || ' ')) AS br
       |        FROM enc e) x
       |  JOIN mg m ON m.rank = x.br
       |), final AS (
       |  SELECT w, list_filter(string_split(state, '  '), x -> len(x) > 0) AS syms
       |  FROM enc e
       |  WHERE NOT EXISTS (SELECT 1 FROM mg m WHERE contains(e.state, ' ' || m.a || '  ' || m.b || ' '))
       |)
       |SELECT d.doc_id,
       |  $finalCols
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN ctoks c ON c.doc_id = d.doc_id
       |LEFT JOIN final f ON f.w = c.w
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** ann_recall oracle — exact SQL replay of the SRP-LSH pipeline
    * (`Ann.knnJoinLsh` over `expr/HyperplaneSig.scala`): the splitmix64
    * plane-sign derivation runs in HUGEINT mod-2⁶⁴ arithmetic (the
    * winnow/simhash wraparound idioms), the per-(table,bit) projection
    * replays the kernel's sequential double accumulation via an ordered
    * `list_reduce` (list_transform preserves index order, list_reduce
    * folds left-to-right — the same IEEE addition sequence as the Scala
    * while-loop), and candidate mining + top-k ranking are plain SQL.
    * Sign decisions depend on FP only through `s > 0` on sums whose
    * magnitude is O(1) — a flip would need a sum within ~1e-16 of zero.
    * All decimal constants are derived from the Scala hex literals at
    * build time (no hand conversion). Validated cell-exact against the
    * kernel on the full sf0.01 fixture. */
  private def annRecallSql: String = {
    def uns(l: Long) = java.lang.Long.toUnsignedString(l)
    def uxorsh(v: String, shift: Int) =
      u64Uns(s"xor(${u64Signed(v)}, CAST($v // ${1L << shift} AS BIGINT))")
    def umul(v: String, c: Long) = u64MulC(v, c >>> 32, c & 0xffffffffL)
    // HyperplaneOps key mix: seed·C1 + bit·C2 + dim, then splitmix64.
    val c1 = 0x517cc1b7L
    val c2 = uns(0x2545F4914F6CDD1DL)
    val golden = uns(0x9e3779b97f4a7c15L)
    val (m1, m2) = (0xbf58476d1ce4e5b9L, 0x94d049bb133111ebL)
    val (tables, bits) = (annRecallTables, annRecallBits)
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
       |), exact AS (
       |  SELECT query_id, result_id FROM (
       |    SELECT q.qid AS query_id, c.vec_id AS result_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid
       |        ORDER BY ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.qid
       |  ) WHERE rank <= 10
       |), k0 AS (
       |  SELECT t, b, d,
       |    (CAST(42 + t * 1000003 AS HUGEINT) * $c1
       |     + CAST(b AS HUGEINT) * CAST('$c2' AS HUGEINT)
       |     + d) % $u64 AS x
       |  FROM unnest(range(0, $tables)) AS ut(t),
       |       unnest(range(0, $bits)) AS ub(b),
       |       unnest(range(0, (SELECT max(len(embedding)) FROM embeddings))) AS ud(d)
       |), k1 AS (SELECT t, b, d, (x + CAST('$golden' AS HUGEINT)) % $u64 AS x FROM k0
       |), k2 AS (SELECT t, b, d, ${uxorsh("x", 30)} AS x FROM k1
       |), k3 AS (SELECT t, b, d, ${umul("x", m1)} AS x FROM k2
       |), k4 AS (SELECT t, b, d, ${uxorsh("x", 27)} AS x FROM k3
       |), k5 AS (SELECT t, b, d, ${umul("x", m2)} AS x FROM k4
       |), k6 AS (SELECT t, b, d, ${uxorsh("x", 31)} AS x FROM k5
       |), planes AS (
       |  SELECT t, b, list(CASE WHEN x % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY d) AS sgns
       |  FROM k6 GROUP BY t, b
       |), proj AS (
       |  SELECT e.vec_id, p.t, p.b,
       |    list_reduce(list_transform(range(1, len(e.embedding) + 1),
       |      i -> p.sgns[i] * CAST(e.embedding[i] AS DOUBLE)), (a, x) -> a + x) AS s
       |  FROM embeddings e CROSS JOIN planes p
       |), sig AS (
       |  SELECT vec_id, t,
       |    CAST(SUM(CASE WHEN s > 0 THEN (1 << b) ELSE 0 END) AS BIGINT) AS sig
       |  FROM proj GROUP BY vec_id, t
       |), oversized AS (
       |  SELECT t, sig FROM sig GROUP BY t, sig HAVING count(*) > 10000
       |), csig AS (
       |  SELECT s.* FROM sig s LEFT JOIN oversized o ON s.t = o.t AND s.sig = o.sig
       |  WHERE o.sig IS NULL
       |), cand AS (
       |  SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS cid
       |  FROM (SELECT s.* FROM sig s JOIN q ON q.qid = s.vec_id) qs
       |  JOIN csig cs ON qs.t = cs.t AND qs.sig = cs.sig
       |), approx AS (
       |  SELECT query_id, cid AS result_id FROM (
       |    SELECT cand.query_id, cand.cid,
       |      ROW_NUMBER() OVER (PARTITION BY cand.query_id
       |        ORDER BY ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(cv.embedding AS DOUBLE[])), 6) DESC,
       |                 cand.cid ASC) AS rank
       |    FROM cand JOIN embeddings cv ON cv.vec_id = cand.cid
       |    JOIN q ON q.qid = cand.query_id
       |    WHERE cand.cid <> cand.query_id
       |  ) WHERE rank <= 10
       |)
       |SELECT CAST(SUM(CASE WHEN a.result_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall_at_k
       |FROM exact e LEFT JOIN approx a ON a.query_id = e.query_id AND a.result_id = e.result_id""".stripMargin
  }

  /** corpus_uuid oracle — full SHA-1 replayed in recursive DuckDB SQL
    * (driver DuckDB has no sha1()). Exactness is structural: SHA-1 is pure
    * 32-bit integer arithmetic, replayed here in BIGINT mod-2³² — no FP
    * anywhere. The query's uuid5 input is the DNS namespace (16 bytes) +
    * the decimal rendering of doc_id (≤ 20 ASCII bytes), so the padded
    * message is ALWAYS one 64-byte block (≤ 55 payload bytes) — the replay
    * is single-block by construction, not by fixture luck. The w-schedule
    * extension and the 80 compression rounds each run as a lockstep
    * recursive CTE over all docs; version/variant bit surgery and hex
    * formatting are plain list SQL. Validated against RFC 4122 uuid5 on
    * the full sf0.01 fixture (kernel: `expr/Uuid5.scala:22-66`). */
  private def corpusUuidSql: String = {
    val m32 = 4294967296L
    def rotl(x: String, n: Int) =
      s"((($x) * ${1L << n}) % $m32 + (($x) // ${1L << (32 - n)}))"
    val ns = Seq(0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
      0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).mkString("[", ", ", "]")
    s"""WITH RECURSIVE msg AS (
       |  SELECT doc_id,
       |    $ns ||
       |    list_transform(range(1, len(CAST(doc_id AS VARCHAR)) + 1),
       |      i -> unicode(substr(CAST(doc_id AS VARCHAR), i, 1))) ||
       |    [128] ||
       |    list_transform(range(0, 39 - len(CAST(doc_id AS VARCHAR))), i -> 0) ||
       |    [0, 0, 0, 0, 0, 0, ((16 + len(CAST(doc_id AS VARCHAR))) * 8) // 256,
       |     ((16 + len(CAST(doc_id AS VARCHAR))) * 8) % 256] AS m
       |  FROM documents
       |), w16 AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 16),
       |      j -> m[4*j + 1] * 16777216 + m[4*j + 2] * 65536 + m[4*j + 3] * 256 + m[4*j + 4]) AS w
       |  FROM msg
       |), wext AS (
       |  SELECT doc_id, 16 AS i, w FROM w16
       |  UNION ALL
       |  SELECT doc_id, i + 1,
       |    w || [${rotl("xor(xor(w[i - 2], w[i - 7]), xor(w[i - 13], w[i - 15]))", 1)}]
       |  FROM wext WHERE i < 80
       |), wfull AS (
       |  SELECT doc_id, w FROM wext WHERE i = 80
       |), rounds AS (
       |  SELECT doc_id, 0 AS t,
       |    CAST(1732584193 AS BIGINT) AS a, CAST(4023233417 AS BIGINT) AS b,
       |    CAST(2562383102 AS BIGINT) AS c, CAST(271733878 AS BIGINT) AS d,
       |    CAST(3285377520 AS BIGINT) AS e, w
       |  FROM wfull
       |  UNION ALL
       |  SELECT doc_id, t + 1,
       |    (${rotl("a", 5)}
       |     + CASE WHEN t < 20 THEN (b & c) | ((4294967295 - b) & d)
       |            WHEN t < 40 THEN xor(xor(b, c), d)
       |            WHEN t < 60 THEN (b & c) | (b & d) | (c & d)
       |            ELSE xor(xor(b, c), d) END
       |     + e + w[t + 1]
       |     + CASE WHEN t < 20 THEN 1518500249 WHEN t < 40 THEN 1859775393
       |            WHEN t < 60 THEN 2400959708 ELSE 3395469782 END) % $m32 AS a,
       |    a AS b, ${rotl("b", 30)} AS c, c AS d, d AS e, w
       |  FROM rounds WHERE t < 80
       |), dig AS (
       |  SELECT doc_id,
       |    (1732584193 + a) % $m32 AS h0, (4023233417 + b) % $m32 AS h1,
       |    (2562383102 + c) % $m32 AS h2, (271733878 + d) % $m32 AS h3,
       |    (3285377520 + e) % $m32 AS h4
       |  FROM rounds WHERE t = 80
       |), bytes AS (
       |  SELECT doc_id,
       |    [h0 // 16777216, (h0 // 65536) % 256, (h0 // 256) % 256, h0 % 256,
       |     h1 // 16777216, (h1 // 65536) % 256, (h1 // 256) % 256, h1 % 256,
       |     h2 // 16777216, (h2 // 65536) % 256, (h2 // 256) % 256, h2 % 256,
       |     h3 // 16777216, (h3 // 65536) % 256, (h3 // 256) % 256, h3 % 256] AS hb
       |  FROM dig
       |), fixed AS (
       |  SELECT doc_id,
       |    list_transform(range(1, 17),
       |      i -> CASE WHEN i = 7 THEN (hb[i] % 16) | 80
       |                WHEN i = 9 THEN (hb[i] % 64) | 128
       |                ELSE hb[i] END) AS fb
       |  FROM bytes
       |), hx AS (
       |  SELECT doc_id,
       |    list_transform(fb, x -> substr('0123456789abcdef', CAST(x // 16 AS INT) + 1, 1) ||
       |                            substr('0123456789abcdef', CAST(x % 16 AS INT) + 1, 1)) AS h
       |  FROM fixed
       |)
       |SELECT doc_id,
       |  h[1] || h[2] || h[3] || h[4] || '-' || h[5] || h[6] || '-' ||
       |  h[7] || h[8] || '-' || h[9] || h[10] || '-' ||
       |  h[11] || h[12] || h[13] || h[14] || h[15] || h[16] AS code_uuid
       |FROM hx ORDER BY doc_id""".stripMargin
  }

  /** Shared TF-IDF embedding replay for the `embed_*` oracles — the exact
    * SQL twin of [[graft.embed.TfIdfEmbedder]] (dim 256, normalized):
    * per-token FNV-1a-64 fold (the simhash oracle's HUGEINT wraparound
    * idiom) → unsigned mod-256 buckets → tf / df aggregates → q20 idf
    * (`DetMath.duckdbLog2q20` + the shared 6-dp ln quantization) → dense
    * vector assembly via an ordered grid join → sequential sum-of-squares
    * normalize → float32 cast. Every FP step is correctly-rounded IEEE
    * arithmetic in both engines; binds `vec(doc_id, v REAL[])`. Must be
    * spliced into a `WITH RECURSIVE` chain. */
  private def embedTfidfCtes: String = {
    val fnvStep = u64MulC(
      u64Uns(s"xor(${u64Signed("acc")}, CAST(c AS BIGINT))"), 256L, 435L)
    s"""tok AS (
       |  SELECT doc_id,
       |    unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS t
       |  FROM documents
       |), th AS (
       |  -- FNV-1a folds the token's UTF-8 BYTES (UTF8String.getBytes)
       |  SELECT doc_id,
       |    CAST(list_reduce(
       |      list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |        list_transform(${sqlUtf8Bytes("t")}, c -> CAST(c AS HUGEINT))),
       |      (acc, c) -> $fnvStep) % 256 AS INT) AS b
       |  FROM tok
       |), tfb AS (
       |  SELECT doc_id, b, count(*) AS tf FROM th GROUP BY doc_id, b
       |), dfb AS (
       |  SELECT b, count(DISTINCT doc_id) AS df FROM th GROUP BY b
       |), esrc AS (
       |  SELECT dfb.b, CAST(cnt.m + 1 AS BIGINT) AS num,
       |    CAST(dfb.df + 1 AS BIGINT) AS den
       |  FROM dfb CROSS JOIN (SELECT count(*) AS m FROM documents) cnt
       |), """.stripMargin +
      graft.expr.DetMath.duckdbLog2q20("esrc", "eqlg", "b") +
    s""", eidf AS (
       |  SELECT b,
       |    FLOOR((qlog / 1048576.0) * ${graft.expr.DetMath.Ln2} * 1000000.0 + 0.5) / 1000000.0 AS idf
       |  FROM eqlg
       |), egrid AS (
       |  SELECT d.doc_id, i
       |  FROM (SELECT DISTINCT doc_id FROM documents) d, unnest(range(0, 256)) AS u(i)
       |), evals AS (
       |  SELECT tfb.doc_id, tfb.b AS i, tfb.tf * eidf.idf AS v
       |  FROM tfb JOIN eidf USING (b)
       |), edense AS (
       |  SELECT g.doc_id, list(coalesce(e.v, 0.0) ORDER BY g.i) AS vd
       |  FROM egrid g LEFT JOIN evals e ON e.doc_id = g.doc_id AND e.i = g.i
       |  GROUP BY g.doc_id
       |), enrm AS (
       |  SELECT doc_id, vd,
       |    sqrt(list_reduce(list_transform(vd, x -> x * x), (a, b) -> a + b)) AS nm
       |  FROM edense
       |), vec AS (
       |  SELECT doc_id,
       |    CASE WHEN nm = 0 THEN list_transform(vd, x -> CAST(0.0 AS REAL))
       |         ELSE list_transform(vd, x -> CAST(x / nm AS REAL)) END AS v
       |  FROM enrm
       |)""".stripMargin
  }

  private def embedCorpusSql: String =
    s"""WITH RECURSIVE $embedTfidfCtes
       |SELECT doc_id, 256 AS dim,
       |  FLOOR(sqrt(list_reduce(list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |    (a, b) -> a + b)) * 1000000.0 + 0.5) / 1000000.0 AS norm
       |FROM vec ORDER BY doc_id""".stripMargin

  private def embedKnnSql: String =
    s"""WITH RECURSIVE $embedTfidfCtes, q AS (
       |  SELECT doc_id AS qid, v AS qv FROM vec
       |  ORDER BY md5('graft42:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 100
       |), scored AS (
       |  SELECT q.qid AS query_id, c.doc_id AS result_id,
       |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.v AS DOUBLE[])), 6) AS score
       |  FROM q CROSS JOIN vec c WHERE c.doc_id <> q.qid
       |), ranked AS (
       |  SELECT query_id, result_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, result_id, rank, score FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** multimodal_knn oracle — SQL replay of the byte-histogram feature
    * kernel (`expr/ByteHistogram.scala`: bucket = (byte·64)»8 = byte÷4
    * for 64 buckets, L2-normalized via `count · (1/√Σcount²)` — the
    * kernel multiplies by the reciprocal, so the twin does too; every
    * step correctly-rounded IEEE) + the seeded-sample top-5 cosine join.
    * The media payload is the document text's UTF-8 bytes (packText),
    * and the SQL folds those exact bytes (sqlUtf8Bytes). */
  private def multimodalKnnSql: String =
    s"""WITH hist AS (
       |  -- the payload is the text's UTF-8 BYTES (packText); 64 buckets
       |  -- -> bucket = byte // 4, exactly the kernel's (byte·64)»8
       |  SELECT doc_id, b, count(*) AS n FROM (
       |    SELECT doc_id, unnest(${sqlUtf8Bytes("text")}) // 4 AS b
       |    FROM documents
       |  ) GROUP BY doc_id, b
       |), hgrid AS (
       |  SELECT d.doc_id, i
       |  FROM (SELECT DISTINCT doc_id FROM documents) d, unnest(range(0, 64)) AS u(i)
       |), hdense AS (
       |  SELECT g.doc_id, list(CAST(coalesce(h.n, 0) AS DOUBLE) ORDER BY g.i) AS cd
       |  FROM hgrid g LEFT JOIN hist h ON h.doc_id = g.doc_id AND h.b = g.i
       |  GROUP BY g.doc_id
       |), hvec AS (
       |  SELECT doc_id,
       |    CASE WHEN inv IS NULL THEN list_transform(cd, x -> CAST(0.0 AS REAL))
       |         ELSE list_transform(cd, x -> CAST(x * inv AS REAL)) END AS v
       |  FROM (
       |    SELECT doc_id, cd,
       |      CASE WHEN ss = 0 THEN NULL ELSE 1.0 / sqrt(ss) END AS inv
       |    FROM (SELECT doc_id, cd,
       |      list_reduce(list_transform(cd, x -> x * x), (a, b) -> a + b) AS ss
       |      FROM hdense)
       |  )
       |), q AS (
       |  SELECT doc_id AS qid, v AS qv FROM hvec
       |  ORDER BY md5('graft42:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 50
       |), scored AS (
       |  SELECT q.qid AS query_id, c.doc_id AS result_id,
       |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.v AS DOUBLE[])), 6) AS score
       |  FROM q CROSS JOIN hvec c WHERE c.doc_id <> q.qid
       |), ranked AS (
       |  SELECT query_id, result_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, result_id, rank, score FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Engine-stable BM25 idf CTE chain, spliced after a `dft(term, df)`
    * CTE in a `WITH RECURSIVE` query: binds `idf(qid, term, idf)` for the
    * query-term table `qt(qid, term)`. idf(t) = ln((2N+2)/(2df+1)) via
    * the q20 kernel × the ln-2 literal — the exact twin of
    * `Bm25.scoreTf`'s Spark expression. */
  private def bm25IdfCtes: String =
    """isrc AS (
      |  SELECT dft.term, CAST(2 * cnt.n + 2 AS BIGINT) AS num,
      |    CAST(2 * dft.df + 1 AS BIGINT) AS den
      |  FROM dft CROSS JOIN (SELECT count(*) AS n FROM documents) cnt
      |), """.stripMargin +
      graft.expr.DetMath.duckdbLog2q20("isrc", "qlg", "term") +
    """, idf AS (
      |  SELECT qt.qid, qt.term,
      |    FLOOR((qlg.qlog / 1048576.0) * 0.6931471805599453 * 1000000.0 + 0.5) / 1000000.0 AS idf
      |  FROM qt JOIN qlg USING (term)
      |)""".stripMargin

  /** BM25 oracle — shared verbatim by `bm25_topk` and `bm25_index_topk`
    * (both route through `Bm25.scoreTf`, so their outputs are identical by
    * construction). */
  private def bm25TopkSql: String =
    """WITH RECURSIVE q AS (
      |  SELECT doc_id AS qid, text AS qtext FROM documents
      |  ORDER BY md5('graft42:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 10
      |), qt AS (
      |  SELECT DISTINCT qid, unnest(list_distinct(list_filter(string_split_regex(lower(qtext), '\s+'), x -> len(x) > 0))) AS term
      |  FROM q
      |), tk AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS dl,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, dl, term, count(*) AS tf FROM tk GROUP BY doc_id, dl, term
      |), st AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0))) AS DOUBLE) / count(*) AS avgdl
      |  FROM documents
      |), dft AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term
      |), """.stripMargin + bm25IdfCtes + """, c AS (
      |  SELECT idf.qid AS query_id, tf.doc_id AS result_id,
      |    CAST(FLOOR(idf.idf * tf.tf * (1.2 + 1.0) / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl / st.avgdl)) * 1e12 + 0.5) / 1e12 AS DECIMAL(28,12)) AS c
      |  FROM tf JOIN idf USING (term) CROSS JOIN st
      |), sc AS (
      |  SELECT query_id, result_id,
      |    FLOOR(CAST(SUM(c) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS score
      |  FROM c WHERE result_id <> query_id GROUP BY query_id, result_id
      |), ranked AS (
      |  SELECT query_id, result_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
      |  FROM sc
      |)
      |SELECT query_id, result_id, rank, score FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  private val bigramCte: String =
    """WITH t AS (
      |  SELECT lang, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents
      |), bg AS (
      |  SELECT lang, array_to_string(toks[i:i+1], ' ') AS bigram
      |  FROM t, unnest(range(1, len(toks))) AS u(i)
      |)""".stripMargin

  /** Shared CTE list: distinct 3-gram shingles per doc → all-pairs exact
    * Jaccard (`pairs` with raw similarity `j`). */
  private val jaccardShinglesCte: String =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t) - 2, 0) + 1)]) AS sh
      |  FROM toks
      |), pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_distinct(list_concat(a.sh, b.sh))) > 0
      |)""".stripMargin

  /** Exact all-pairs 3-gram Jaccard ≥ 0.8 — oracle for both the brute-force
    * and the MinHash+LSH near-dup queries (LSH recall is 1 on this corpus,
    * see the `queries` comment). */
  private val jaccardPairsOracle: String =
    "WITH " + jaccardShinglesCte + "\n" +
    """SELECT id_a, id_b, FLOOR(j * 1000000.0 + 0.5) / 1000000.0 AS jaccard
      |FROM pairs WHERE j >= 0.8 ORDER BY id_a, id_b""".stripMargin

  /** Transitive closure of the ≥0.8 near-dup pairs as a CTE list ending in
    * `comp(id, component)`: every doc labeled with the min doc_id reachable
    * through the pair graph (singletons label themselves). Shared by the
    * `dedup_clusters` and `dedup_near_keep` oracles so the closure can
    * never drift between them. */
  private val componentClosureCte: String =
    jaccardShinglesCte + ",\n" +
    """dup AS (SELECT id_a, id_b FROM pairs WHERE j >= 0.8),
      |edges AS (SELECT id_a AS a, id_b AS b FROM dup
      |          UNION ALL SELECT id_b AS a, id_a AS b FROM dup),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a
      |), comp AS (
      |  SELECT id, min(r) AS component FROM reach GROUP BY id
      |)""".stripMargin

  /** Oracle for [[graft.dedup.Dedup.connectedComponents]]. */
  private val dedupClustersOracle: String =
    "WITH RECURSIVE " + componentClosureCte + "\n" +
    "SELECT id, component FROM comp ORDER BY id"

  /** Shared DuckDB CTE: deterministic query subset → exact cosine top-k with
    * self-exclusion, POJ-style relevance, and the running relevant count (W2). */
  private def knnOracleCteK(k: Int): String =
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qv, label AS qlabel
      |  FROM embeddings
      |  ORDER BY md5('graft42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 500
      |), scored AS (
      |  SELECT q.qid AS query_id, c.vec_id AS result_id, c.label AS rlabel, q.qlabel,
      |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
      |  FROM q CROSS JOIN embeddings c
      |  WHERE c.vec_id <> q.qid
      |), ranked AS (
      |  SELECT query_id, result_id, score, (rlabel = qlabel) AS is_relevant,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, result_id ASC) AS rank
      |  FROM scored
      |), topk AS (
      |  SELECT *, SUM(CASE WHEN is_relevant THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY query_id ORDER BY rank ROWS UNBOUNDED PRECEDING) AS cum_rel
      |  FROM ranked WHERE rank <= $k
      |)
      |""".stripMargin

  private val knnOracleCte: String = knnOracleCteK(10)

  /** POJ-variant global IR metrics SQL over the topk CTE at a given k. */
  private def irMetricsOracleSql(k: Int): String = knnOracleCteK(k) +
    s""", perq AS (
      |  SELECT query_id,
      |    COUNT(CASE WHEN is_relevant THEN 1 END) AS hits,
      |    MIN(CASE WHEN is_relevant THEN rank END) AS first_rel_rank,
      |    SUM(CASE WHEN is_relevant THEN CAST(cum_rel AS DOUBLE) / rank ELSE 0.0 END) AS ap_numerator,
      |    COALESCE(CAST(SUM(CAST(CASE WHEN is_relevant THEN score END AS DECIMAL(28,6))) AS DOUBLE) / COUNT(CASE WHEN is_relevant THEN score END), 0.0) AS avg_rel,
      |    COALESCE(CAST(SUM(CAST(CASE WHEN NOT is_relevant THEN score END AS DECIMAL(28,6))) AS DOUBLE) / COUNT(CASE WHEN NOT is_relevant THEN score END), 0.0) AS avg_irrel
      |  FROM topk GROUP BY query_id
      |)
      |SELECT
      |  FLOOR(AVG(CASE WHEN hits > 0 THEN 1.0 ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS success_rate,
      |  FLOOR(AVG(CAST(hits AS DOUBLE) / $k) * 1000000.0 + 0.5) / 1000000.0 AS mean_precision_at_k,
      |  FLOOR(AVG(COALESCE(1.0 / first_rel_rank, 0.0)) * 1000000.0 + 0.5) / 1000000.0 AS mrr,
      |  FLOOR(AVG(ap_numerator / $k) * 1000000.0 + 0.5) / 1000000.0 AS map_at_k,
      |  FLOOR(AVG(avg_rel) * 1000000.0 + 0.5) / 1000000.0 AS avg_relevant_score,
      |  FLOOR(AVG(avg_irrel) * 1000000.0 + 0.5) / 1000000.0 AS avg_irrelevant_score
      |FROM perq""".stripMargin
}
