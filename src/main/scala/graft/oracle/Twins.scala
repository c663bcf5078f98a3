package graft.oracle


/** The DuckDB oracle twins — one ANSI-ish SQL statement per entry in
  * [[graft.SparkEntry.queries]], executed by the driver against the same
  * parquet tables and compared cell-exact. Moved VERBATIM out of
  * SparkEntry in the round-15 file split (VERDICT #6); the map the
  * driver sees is still [[graft.SparkEntry.oracleSql]], which applies
  * the canonical-fold post-pass (sqlFold) over these raw strings. The
  * SQL-builder helpers the entries reference live in [[SqlKit]]. */
private[graft] object Twins extends SqlKit {
  def raw: Map[String, String] = Map(
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

    // String-keyed kNN: ROW_NUMBER's `result_id ASC` tie-break on VARCHAR
    // uses DuckDB's binary (memcmp) collation — the same unsigned-UTF-8-
    // byte order the Spark heap's UTF8String comparator and the window
    // path's string sort use, so tie order is engine-stable.
    "knn_uuid" ->
      """WITH c AS (
        |  SELECT md5('id:' || CAST(vec_id AS VARCHAR)) AS sid, embedding
        |  FROM embeddings
        |), q AS (
        |  SELECT sid AS qid, embedding AS qv FROM c
        |  ORDER BY md5('graft42:' || sid), qid LIMIT 500
        |), scored AS (
        |  SELECT q.qid AS query_id, c.sid AS result_id,
        |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM q CROSS JOIN c
        |  WHERE c.sid <> q.qid
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

    // String-id grouped search: the corpus re-keyed to md5 VARCHAR ids;
    // the within-group rank tie-break is binary VARCHAR collation — the
    // same order as the engine's UTF8String heap tie-key.
    "knn_groups_uuid" ->
      """WITH e AS (
        |  SELECT md5('id:' || CAST(vec_id AS VARCHAR)) AS sid, label, embedding
        |  FROM embeddings
        |), q AS (
        |  SELECT sid AS qid, embedding AS qv FROM e
        |  ORDER BY md5('graft42:' || sid), sid LIMIT 500
        |), scored AS (
        |  SELECT q.qid AS query_id, c.sid AS result_id, c.label,
        |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM q CROSS JOIN e c
        |  WHERE c.sid <> q.qid
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

    // String-id MMR: identical machinery on the md5 key space — VARCHAR
    // binary collation everywhere an id breaks a tie.
    "knn_mmr_uuid" -> mmrOracleSql(nQ = 8, fetchK = 20, k = 5,
      idExpr = "md5('id:' || CAST(vec_id AS VARCHAR))"),

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

    // String-id twin of embed_outliers: identical pipeline on the
    // md5-re-keyed id space — the reference sample orders on the salted
    // md5 of the STRING id (Sampling.seeded over sid), ties inside the
    // per-document top-10 break on the rid VARCHAR (binary collation =
    // the heap's UTF8String byte compare), and the final ordering ties on
    // sid. 1:1 row-preserving re-key, so row counts match embed_outliers.
    "embed_outliers_uuid" ->
      """WITH keyed AS (
        |  SELECT md5('id:' || CAST(vec_id AS VARCHAR)) AS sid,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), ref AS (
        |  SELECT sid AS rid, v AS rv FROM keyed
        |  ORDER BY md5('graft42:' || sid), sid LIMIT 500
        |), sims AS (
        |  SELECT k.sid, ref.rid,
        |    ROUND(list_cosine_similarity(k.v, ref.rv), 6) AS sim
        |  FROM keyed k CROSS JOIN ref
        |  WHERE k.sid <> ref.rid
        |), topk AS (
        |  SELECT sid, sim FROM (
        |    SELECT sid, sim,
        |      ROW_NUMBER() OVER (PARTITION BY sid ORDER BY sim DESC, rid ASC) AS rn
        |    FROM sims) WHERE rn <= 10
        |), scored AS (
        |  SELECT sid,
        |    FLOOR(CAST(SUM(CAST(sim AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS mean_knn_sim
        |  FROM topk GROUP BY sid
        |), top AS (
        |  SELECT sid, mean_knn_sim FROM scored
        |  ORDER BY mean_knn_sim ASC, sid ASC LIMIT 20
        |)
        |SELECT sid, mean_knn_sim,
        |  ROW_NUMBER() OVER (ORDER BY mean_knn_sim ASC, sid ASC) AS outlier_rank
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

    // Entry point B end-to-end (the runPoj composition, Pipelines.scala):
    // one CTE chain replays embed → sample → uuid-keyed top-k → relevance,
    // three tails replay the three reference outputs.
    "pipeline_poj" -> pojPipelineMetricsSql(100, 10),
    "pipeline_poj_detailed" -> pojPipelineDetailedSql(100, 10),
    "pipeline_poj_stats" -> pojPipelineStatsSql(100, 10),

    // Entry point A (BCB) end-to-end — same nQ/k as the POJ pipeline rows.
    "pipeline_bcb" -> bcbPipelineMetricsSql(100, 10),
    "pipeline_bcb_detailed" -> bcbPipelineDetailedSql(100, 10),
    "pipeline_bcb_stats" -> bcbPipelineStatsSql(100, 10),

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
    // ivf_topk_uuid: identical training/cell replay, string-keyed probe
    // top-k rows (binary VARCHAR collation = the heap's UTF8String order).
    "ivf_topk_uuid" -> ivfUuidTopkSql(nList = 16, nProbe = 4, iters = 8,
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
    // bm25_uuid: the identical Okapi replay with md5-re-keyed doc ids —
    // sample and ties ride DuckDB's binary VARCHAR collation.
    "bm25_uuid" -> bm25TopkSqlFor("md5('id:' || CAST(doc_id AS VARCHAR))"),

    // the index-backed path is output-identical by construction (shared
    // scoring kernel) — same oracle
    "bm25_index_topk" -> bm25TopkSql,

    "hybrid_rrf" -> hybridRrfSqlFor(),

    // Hybrid RRF on md5-re-keyed (uuid stand-in) ids for BOTH tables —
    // the shared topKPerQuery heap's string tie-break, driver-oracled.
    "hybrid_uuid" -> hybridRrfSqlFor(
      docIdExpr = "md5('id:' || CAST(doc_id AS VARCHAR))",
      vecIdExpr = "md5('id:' || CAST(vec_id AS VARCHAR))"),

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

    // String-keyed prefetch→rescore: both stages tie-break on the md5 sid
    // with DuckDB's binary VARCHAR collation == the Spark heap's
    // UTF8String byte order (same argument as knn_uuid).
    "query_prefetch_uuid" ->
      """WITH c AS (
        |  SELECT md5('id:' || CAST(vec_id AS VARCHAR)) AS sid, label, embedding
        |  FROM embeddings
        |), q AS (
        |  SELECT sid AS qid, embedding AS qv FROM c
        |  ORDER BY md5('graft42:' || sid), qid LIMIT 500
        |), pre AS (
        |  SELECT q.qid, c.sid,
        |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
        |      ROUND(list_cosine_similarity(CAST(q.qv[1:8] AS DOUBLE[]), CAST(c.embedding[1:8] AS DOUBLE[])), 6) DESC,
        |      c.sid ASC) AS rn
        |  FROM q CROSS JOIN c
        |  WHERE c.sid <> q.qid
        |), resc AS (
        |  SELECT p.qid AS query_id, p.sid AS result_id, c.label,
        |    ROUND(list_cosine_similarity(CAST(q2.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score
        |  FROM pre p
        |  JOIN c ON c.sid = p.sid
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
}
