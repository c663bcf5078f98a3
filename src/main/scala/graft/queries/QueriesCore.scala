package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.SparkEntry._
import graft.dedup.{Dedup, SemDedup}
import graft.ingest.{CloneGraph, Corpus}
import graft.metrics.IrMetrics
import graft.multimodal.Multimodal
import graft.search.{Ann, Knn, LatticeKmeans}
import graft.streaming.Streaming
import graft.text.TextAnalysis

/** Query definitions, part 1 of the round-15 file split (VERDICT #6):
  * relational aggregation/joins, the reference's kNN + collection API
  * surface, IR metrics, and the dedup/curation family. VERBATIM moves
  * out of [[graft.SparkEntry]] — names, bodies, plans and oracle twins
  * unchanged; shared helpers stay on SparkEntry (imported above). */
private[graft] object QueriesCore {
  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // Honest bench attribution for the shared exact baseline (r21, the
    // pair_mining pattern): this entry EVICTS the memoized exact-knn frame
    // and re-scores, so the |Q|·|C| cosine cost — reused by the recall
    // gates and the k=10 metric suite — is timed as its own named entry.
    // Output (and oracle) identical to the pre-memo query by construction.
    "knn_topk" -> ((s, dir) => {
      evictExactKnn(s, dir)
      exactKnnBaseline(s, dir)
        .select(col("query_id"), col("vec_id").as("result_id"),
          col("rank"), col("score"))
    }),

    // String-keyed (uuid-style) corpus — the reference's POJ id space
    // (poj_utils.py:62 keys points by UUIDv5 strings). Since r17 string
    // ids take the SAME |Q|·k bounded-heap plan as integral ids (the heap
    // tie-break compares UTF8String bytes = DuckDB's binary VARCHAR
    // collation), not the |Q|·|corpus| rank-window fallback — plan-pinned
    // in TopKRowsSpec. md5 ids shuffle lexicographic order away from
    // insertion order, so tie-breaks genuinely exercise byte comparison.
    "knn_uuid" -> ((s, dir) => {
      val corpus = embParallel(s, dir)
        .select(md5(concat(lit("id:"), col("vec_id"))).as("sid"), col("embedding"))
      Knn.knnJoin(graft.bench.Sampling.seeded(corpus, "sid", knnSampleSize),
          "sid", "embedding", corpus, "sid", "embedding",
          k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("sid").as("result_id"),
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
    // Pricing entry for the shared grouped search (r21, the pair_mining
    // pattern): evicts + re-scores, so the |Q|·|C| grouped scoring cost is
    // timed here while knn_groups_lookup reads the memoized frame. Output
    // (and oracle) identical to the pre-memo query by construction.
    "knn_groups" -> ((s, dir) => {
      evictGroupedKnn(s, dir)
      groupedKnnBaseline(s, dir)
        .select(col("query_id"), col("label"), col("group_rank"),
          col("vec_id").as("result_id"), col("rank"), col("score"))
        .orderBy(col("query_id"), col("group_rank"), col("rank"))
    }),

    // Grouped search on a STRING (uuid stand-in) id space (r18): the
    // within-group heap ranks md5 ids on UTF8 byte order — the
    // knnJoinGrouped path was generalized to string tie-keys in r17 but
    // only spec-covered; this row pins it cross-engine through the driver
    // (the r17 near-miss class: a silently-empty uuid corpus would go red
    // here, not just in a spec). Group keys (labels) stay integral.
    "knn_groups_uuid" -> ((s, dir) => {
      val sid = md5(concat(lit("id:"), col("vec_id")))
      val corpus = embParallel(s, dir)
        .select(sid.as("sid"), col("label"), col("embedding"))
      val q = graft.bench.Sampling.seeded(
        Tables.embeddings(s, dir).select(sid.as("sid"), col("embedding")),
        "sid", knnSampleSize)
      Knn.knnJoinGrouped(q, "sid", "embedding",
          corpus, "sid", "embedding",
          groupCol = "label", groupSize = 2, kGroups = 3, roundScoreTo = Some(6))
        .select(col("query_id"), col("label"), col("group_rank"),
          col("sid").as("result_id"), col("rank"), col("score"))
        .orderBy(col("query_id"), col("group_rank"), col("rank"))
    }),

    // Grouped search with lookup (the backend's `search_groups` +
    // `with_lookup`): each surfaced group carries its group key's record
    // from a lookup collection — here per-label metadata (member count +
    // representative id). The grouped result is |Q|·kGroups·groupSize
    // rows by contract, so it BROADCASTS into the lookup scan: the
    // lookup collection can be corpus-sized and is probed, not shuffled.
    "knn_groups_lookup" -> ((s, dir) => {
      val labelMeta = Tables.embeddings(s, dir).groupBy("label")
        .agg(count(lit(1)).as("n_members"), min("vec_id").as("rep_id"))
      // the grouped search itself is the shared memoized frame (priced by
      // knn_groups); this entry re-dresses it with the lookup — the same
      // attachGroupLookup code path knnJoinGrouped(withLookup) delegates to
      Knn.attachGroupLookup(groupedKnnBaseline(s, dir), "label",
          labelMeta, "label")
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

    // knn_mmr on a STRING (uuid stand-in) id space (r18): md5 ids reorder
    // the corpus relative to numeric order, so every tie — the stage-1
    // heap cut, the greedy argmax — must resolve on UTF8 byte order to
    // match DuckDB's binary VARCHAR collation. Completes the r17 string-id
    // sweep's last retrieval surface (VERDICT r17 next-round #2).
    "knn_mmr_uuid" -> ((s, dir) => {
      val sid = md5(concat(lit("id:"), col("vec_id")))
      val emb = embParallel(s, dir).select(sid.as("sid"), col("embedding"))
      val q = graft.bench.Sampling.seeded(
        Tables.embeddings(s, dir).select(sid.as("sid"), col("embedding")), "sid", 8)
      graft.search.Mmr.diversifiedTopK(q, "sid", "embedding",
          emb, "sid", "embedding", k = 5, lambda = 0.5, fetchK = 20)
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

    // Universal query with prefetch on a STRING (uuid stand-in) id space
    // (r18): the rescore stage is Query.rescoreExact — one of the r17
    // heap sites that silently returned EMPTY on uuid corpora before the
    // tieKeyFor fix — so this row pins the whole prefetch→rescore
    // composition cross-engine through the driver for string ids, the
    // last of the Query family covered only by specs.
    "query_prefetch_uuid" -> ((s, dir) => {
      val sid = md5(concat(lit("id:"), col("vec_id")))
      val corpus = embParallel(s, dir)
        .select(sid.as("sid"), col("label"), col("embedding"))
      graft.search.Query.prefetchRescore(
          graft.bench.Sampling.seeded(corpus, "sid", knnSampleSize)
            .select(col("sid"), col("embedding")),
          "sid", "embedding", corpus, "sid", "embedding",
          cheapVec = v => slice(v, 1, 8),
          prefetchK = 50, k = 10, roundScoreTo = Some(6))
        .select(col("query_id"), col("sid").as("result_id"),
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
            graft.functions.round6(graft.functions.max_sim(a, b, 8))))
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
    // Entry point B end-to-end (r17): the FULL runPoj composition —
    // TF-IDF fit + embed → seeded sample → uuid-string-keyed top-k
    // (bounded heap, no rank window) → same-label relevance → the three
    // reference outputs — driven through Pipelines.runPojCorpus ITSELF,
    // so a green row certifies the composition the CLI actually runs
    // (main.py:92-148), not a reconstruction of its parts. Corpus =
    // documents wearing the POJ schema (md5 uuid stand-ins for the
    // uuid5 point ids; lang as the class label).
    // ------------------------------------------------------------------
    // The METRICS row evicts + rebuilds the memoized composition (the
    // pair_mining pattern): it prices the full fit+knn lineage exactly
    // once per bench pass, while _detailed/_stats read the materialized
    // result and time as "marginal over the shared composition" — the
    // honest attribution the r18 verdict asked for (#5).
    "pipeline_poj" -> ((s, dir) => {
      evictPipeline(s, dir, "poj")
      val m = pojPipeline(s, dir).metrics
      m.select(m.columns.map(c => r6(col(c)).as(c)): _*)
    }),

    "pipeline_poj_detailed" -> ((s, dir) =>
      pojPipeline(s, dir).detailed
        .orderBy(col("query_id"), col("similarity_score").desc, col("result_id"))),

    "pipeline_poj_stats" -> ((s, dir) => {
      pojPipeline(s, dir).queryStats
        .select(col("query_id"), col("query_type"),
          r6(col("avg_same_type_score")).as("avg_same_type_score"),
          r6(col("avg_diff_type_score")).as("avg_diff_type_score"),
          col("num_same_type_found"), col("num_diff_type_found"))
        .orderBy(col("query_id"))
    }),

    // ------------------------------------------------------------------
    // Entry point A end-to-end (r18): the FULL runBcb composition from the
    // corpus frame down — TF-IDF fit on the clone-graph-joined corpus →
    // seeded sample on the integral func_id → bounded-heap top-k →
    // clone-SET membership relevance (P5, bcb_utils.py:183) → the three
    // BCB outputs incl. the min(|clones|, k) MAP denominator
    // (bcb_utils.py:250) — driven through Pipelines.runBcbCorpus ITSELF,
    // certifying the composition the CLI runs (main.py:42-90). Corpus =
    // documents wearing the BCB schema; the clone truth is the same
    // same-lang ∧ same-(id mod 7) relation ir_metrics_bcb uses, inner-
    // joined exactly as Corpus.bcb drops functions absent from the clone
    // graph (J1 drop-on-miss semantics).
    // ------------------------------------------------------------------
    // Evict+rebuild on the metrics row — same honest-attribution pattern
    // as pipeline_poj above.
    "pipeline_bcb" -> ((s, dir) => {
      evictPipeline(s, dir, "bcb")
      val m = bcbPipeline(s, dir).metrics
      m.select(m.columns.map(c => r6(col(c)).as(c)): _*)
    }),

    "pipeline_bcb_detailed" -> ((s, dir) =>
      bcbPipeline(s, dir).detailed
        .orderBy(col("query_id"), col("similarity_score").desc, col("result_id"))),

    "pipeline_bcb_stats" -> ((s, dir) => {
      bcbPipeline(s, dir).queryStats
        .select(col("query_id"),
          r6(col("avg_clone_score")).as("avg_clone_score"),
          r6(col("avg_non_clone_score")).as("avg_non_clone_score"),
          col("num_clones_found"), col("num_non_clones_found"))
        .orderBy(col("query_id"))
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
      if (!idx.foldCurrent) idx.build(docs, "doc_id", "text",
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
      if (!idx.foldCurrent) idx.build(docs, "doc_id", "text",
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
      if (!idx.foldCurrent) idx.build(docs, "doc_id", "text", n = 5)
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
  )

  /** Memoized [[graft.cli.Pipelines.BenchmarkOutput]] per (app, dir,
    * dataset) — the `minedNearDupPairs` pattern (SparkEntry): the
    * composition's scored top-k frame is MATERIALIZED inside
    * `runPojCorpus`/`runBcbCorpus` (localCheckpoint — output-sized), so
    * the three per-family bench/oracle rows price the TF-IDF fit + knn
    * ONCE and then compose over the computed result set, exactly as the
    * CLI's one invocation does — instead of re-running the full lineage
    * per row (~10 s of redundant bench work per family, r18 verdict #5).
    * Keyed by applicationId because checkpoint blocks die with their
    * context; evicted per-dir by [[evictPipelines]]. */
  /** Memoized grouped-kNN result over the embeddings corpus — shared by
    * `knn_groups` (the evict-and-rebuild pricing entry, the pair_mining
    * pattern) and `knn_groups_lookup` (which re-dresses the identical
    * grouped frame with the label-metadata lookup via
    * [[graft.search.Knn.attachGroupLookup]] instead of re-scoring
    * |Q|·|C|). Output-sized (|Q|·kGroups·groupSize rows), mode-aware
    * eager; (applicationId, dir)-keyed — dies with the session, never a
    * cross-run cache. */
  private val groupedKnnCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
  private[graft] def groupedKnnBaseline(s: SparkSession, dir: String): DataFrame = {
    SparkEntry.pruneStaleApps(groupedKnnCache, s.sparkContext.applicationId)(_._1)(
      Dedup.releaseStale(_, s))
    groupedKnnCache.computeIfAbsent((s.sparkContext.applicationId, dir),
      _ => Dedup.eagerResult(
        Knn.knnJoinGrouped(knnQueries(s, dir), "vec_id", "embedding",
          embParallel(s, dir), "vec_id", "embedding",
          groupCol = "label", groupSize = 2, kGroups = 3,
          roundScoreTo = Some(6)), "knngrp"))
  }
  private[graft] def evictGroupedKnn(s: SparkSession, dir: String): Unit =
    Option(groupedKnnCache.remove((s.sparkContext.applicationId, dir)))
      .foreach(Dedup.releaseEager)

  private val pipelineCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), graft.cli.Pipelines.BenchmarkOutput]()

  private def memoizedPipeline(s: SparkSession, dir: String, dataset: String)(
      build: => graft.cli.Pipelines.BenchmarkOutput): graft.cli.Pipelines.BenchmarkOutput = {
    // Stale-app hygiene via the shared policy (SparkEntry.pruneStaleApps —
    // same rule as minedPairsCache/bpeMergesCache). The release hook
    // frees a pruned output's durable backing dir at eviction (the
    // pinned read-back carries the registry fast path; the detailed
    // frame rides along for the plan-walk fallback).
    val app = s.sparkContext.applicationId
    graft.SparkEntry.pruneStaleApps(pipelineCache, app)(_._1) { out =>
      graft.dedup.Dedup.releaseStale(out.backing.getOrElse(out.detailed), s)
    }
    pipelineCache.computeIfAbsent((app, dir, dataset), _ => build)
  }

  /** Release the memoized pipeline outputs for `dir` (sweep-loop hygiene,
    * same contract as SparkEntry.evictMinedPairs). Releasing any one
    * output frame frees the shared top-k materialization — checkpoint
    * blocks AND durable-mode backing files (Dedup.releaseEager walks the
    * plan for both) — and all three frames contain the same one. The
    * materialization is lineage-CUT, so the eviction contract mirrors
    * unpersist-of-a-checkpoint: callers must have fully consumed every
    * frame of the evicted BenchmarkOutput first (the bench/Verify loops
    * consume each query's frame before invoking the next). */
  private[graft] def evictPipelines(s: SparkSession, dir: String): Unit = {
    Seq("poj", "bcb").foreach(evictPipeline(s, dir, _))
    evictGroupedKnn(s, dir)
  }

  private def evictPipeline(s: SparkSession, dir: String, ds: String): Unit =
    Option(pipelineCache.remove((s.sparkContext.applicationId, dir, ds)))
      .foreach(o => graft.dedup.Dedup.releaseEager(o.detailed))

  /** Shared builder for the `pipeline_poj*` oracle queries: the documents
    * table wearing the POJ corpus schema, through the real entry-point
    * composition. 100 queries / k=10 keeps the DuckDB replay (a full
    * TF-IDF embed + |Q|·|corpus| rescore in SQL) fixture-sized. */
  private def pojPipeline(s: SparkSession, dir: String): graft.cli.Pipelines.BenchmarkOutput =
    memoizedPipeline(s, dir, "poj") {
    val corpus = docsParallel(s, dir).select(
      md5(concat(lit("id:"), col("doc_id"))).as("code_uuid"),
      col("lang").as("clone_type"),
      col("text").as("code_contents"))
    graft.cli.Pipelines.runPojCorpus(s, corpus, k = 10, numSamples = 100,
      dim = 256, normalized = true)
    }

  /** Shared builder for the `pipeline_bcb*` oracle queries: the documents
    * table wearing the BCB corpus schema — func_id = doc_id, point uuid =
    * md5 stand-in, clone truth = same-lang ∧ same-(id mod 7) adjacency
    * (the `ir_metrics_bcb` relation) — INNER-joined as [[Corpus.bcb]]
    * joins the clone graph, then through the real entry-point composition.
    * 100 queries / k=10 keeps the DuckDB replay fixture-sized; the clone
    * relation leaves most queries with |clones| < k, so the BCB MAP
    * denominator min(|clones|, k) is genuinely exercised. */
  private def bcbPipeline(s: SparkSession, dir: String): graft.cli.Pipelines.BenchmarkOutput =
    memoizedPipeline(s, dir, "bcb") {
    val docs = docsParallel(s, dir)
    val a = docs.select(col("doc_id").as("ida"), col("lang").as("la"),
      (col("doc_id") % 7).as("ma"))
    val b = docs.select(col("doc_id").as("idb"), col("lang").as("lb"),
      (col("doc_id") % 7).as("mb"))
    val pairs = a.join(b, col("la") === col("lb") && col("ma") === col("mb") &&
      col("ida") < col("idb")).select(col("ida"), col("idb"))
    val truth = CloneGraph.adjacencyWithCounts(pairs, "ida", "idb")
    // Materialize the DERIVED corpus once (r21): this join-built frame
    // feeds the fit aggregate, the query sample, and the knn corpus side —
    // three statically-planned consumers that would each replay the
    // self-join + collect_set adjacency + corpus join. Mode-aware
    // (Dedup.eagerTracked), same one-scan discipline as Selection/DupSpans.
    val corpus = graft.dedup.Dedup.eagerTracked(
      docs.join(truth.withColumnRenamed("id", "func_id"),
          col("doc_id") === col("func_id"), "inner")
        .select(
          md5(concat(lit("fid:"), col("doc_id"))).as("code_uuid"),
          col("func_id"),
          col("text").as("code_contents"),
          col("clones")), "bcbcorpus")
    graft.cli.Pipelines.runBcbCorpus(s, corpus, k = 10, numSamples = 100,
      dim = 256, normalized = true)
    }
}
