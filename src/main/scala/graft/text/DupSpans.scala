package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cross-document repeated-span detection — the exact-substring duplication
 * signal of Lee et al., "Deduplicating Training Data Makes Language Models
 * Better" (2022), in its standard n-gram-hash approximation: a token
 * position is *duplicated* when the n-gram starting there also occurs in
 * at least one OTHER document. Corpora duplicate at span granularity
 * (boilerplate headers, license blocks, quoted passages) long before
 * whole documents collide, so per-document duplicated-span fractions are
 * the filter signal document-level dedup cannot see.
 *
 * Definitions (pinned for the oracle twin):
 *  - spans = the `len − n + 1` sliding n-grams over [[TextAnalysis.tokens]]
 *    (the canonical tokenizer); docs with fewer than `n` tokens have no
 *    spans and are dropped;
 *  - a span is duplicated iff its n-gram text occurs in ≥ 2 DISTINCT
 *    documents (within-doc repetition alone does not count — that is
 *    [[TextAnalysis]] repetition's job);
 *  - `dup_frac` = duplicated spans ÷ spans as an IEEE double, wire-rounded
 *    to 6 dp by the engine's one rounding rule
 *    ([[graft.functions.round6]] — floor(x·1e6 + 0.5)/1e6, round-half-up;
 *    the DuckDB twin applies the identical expression).
 *
 * Scale shape: n-grams are keyed by `md5` of the span text (the same
 * bytes in every engine, so the oracle reproduces the keys without
 * shipping span text through the shuffle — 16-byte keys instead of
 * ~100-byte strings). Grams collapse to (doc, hash, positions) with
 * map-side combine before anything shuffles; the duplicate set is one
 * count over those pre-deduped rows and only the DUPLICATED subset —
 * typically a small fraction of the gram vocabulary — flows into the
 * join back. Nothing is quadratic and no driver-side state exists, so
 * the plan survives a 100× scale-up as shuffles keyed by (hash) and
 * (doc) — the same shape the published suffix-array pipelines reduce to
 * when implemented over MapReduce-style engines.
 */
object DupSpans {

  /** Per-document duplicated-span stats. Output: `idCol`, `n_spans`,
    * `n_dup_spans`, `dup_frac` (6-dp). */
  def duplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = docs
      // fused gram kernel (r21) — see [[gramFrame]]; empty arrays from
      // short docs vanish under explode exactly like the old length filter
      .select(col(idCol), explode(
        graft.functions.word_grams(col(textCol), n)).as("__g"))
      .select(col(idCol), md5(col("__g")).as("__h"))
    // Collapse to (doc, hash, positions) FIRST: the explode runs once, the
    // partial aggregate combines map-side, and the (doc, hash) shuffle
    // carries at most one row per distinct gram per doc. On those
    // pre-deduped rows "occurs in >= 2 distinct docs" is a plain count.
    // MATERIALIZED (same one-scan discipline as Selection's base): gcnt
    // feeds both the duplicate-set aggregate and the join back, and the
    // static planner would otherwise re-run the tokenize+gram kernel for
    // each consumer (measured: 2 FileScans / 12.5 s → 1 scan at the 30×
    // sweep). ~25 B/row narrow vs re-tokenizing the corpus — but one row
    // per (doc, distinct gram): CORPUS-scale at 100 TB, so the
    // materialization is mode-aware (Dedup.eagerTracked) — on a
    // preemptible cluster with spark.graft.checkpointDir set it lives as
    // durable parquet, not lineage-cut local blocks a lost executor
    // destroys unrecoverably.
    val gcnt = graft.dedup.Dedup.eagerTracked(
      grams.groupBy(col(idCol), col("__h"))
        .agg(count(lit(1)).as("__c")), "spangcnt")
    val dup = gcnt.groupBy(col("__h"))
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("__h"))
    val r6: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      graft.functions.round6 // the one wire-rounding definition
    gcnt
      .join(dup.withColumn("__dup", lit(1L)), Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("n_spans"),
        coalesce(sum(col("__c") * col("__dup")), lit(0L)).as("n_dup_spans"))
      .select(col(idCol), col("n_spans"), col("n_dup_spans"),
        r6(col("n_dup_spans").cast("double") / col("n_spans")).as("dup_frac"))
  }

  /**
   * The fix-side twin of [[duplicatedSpans]] — Lee et al.'s span CUT:
   * every token covered by a cross-document duplicated n-gram is removed
   * from every document EXCEPT the span's canonical owner (the smallest
   * doc id containing the gram — deterministic, and exactly one copy of
   * each duplicated passage survives corpus-wide). Overlapping duplicated
   * spans merge naturally: coverage is per-token, not per-span.
   *
   * Output: `idCol`, `n_tokens` (before), `n_cut` (tokens removed),
   * `text_clean` — the kept tokens joined by single spaces (empty string
   * when everything was cut): by default the CANONICAL tokenization
   * (lowercased, whitespace-normalized; the oracle-pinned form), or the
   * original-case tokens when `preserveCase` — gram KEYS always fold, so
   * detection is case-insensitive either way, and folding never moves
   * whitespace, so the two token sequences index identically. Documents
   * shorter than `n` tokens pass through untouched — INCLUDING
   * zero-token docs (empty/whitespace/null text), which emit
   * (0, 0, "") rather than disappearing. Integer/string
   * arithmetic only — the oracle twin is cell-exact with no float
   * discipline needed.
   *
   * Scale shape: gram hashes shuffle once keyed by hash (min-doc + count
   * aggregate, map-side combined), duplicated-owner rows join back to the
   * gram stream by hash, coverage explodes ≤ n rows per duplicated
   * position and collapses to (doc, token-index) distinct; the rebuild is
   * one aggregate keyed by doc whose state is bounded by document length
   * (same bound as the tokenizer itself). Nothing is quadratic and no
   * driver-side state exists.
   *
   * `materializeGrams` picks the storage-vs-recompute trade for the
   * positioned gram stream, which feeds BOTH the ownership aggregate and
   * the coverage join. `true` (default) localCheckpoints it so the
   * tokenize + md5 kernel runs ONCE (measured 2× faster at sf0.1–30×,
   * where the frame fits executor storage comfortably) — but the frame is
   * TOKEN-COUNT-sized (~28 B/token): at 100 TB that is storage on the
   * order of the corpus itself, held as lineage-free executor blocks
   * where a single lost executor fails the job. Past roughly the point
   * where the gram stream stops fitting the cluster's storage-memory+disk
   * headroom, flip to `false`: the kernel runs once per consumer (2×
   * compute) but nothing is pinned and recovery is plain lineage replay.
   * The index-backed admission path ([[graft.index.SpanIndex]].cut) —
   * the shape a 100 TB deployment should use anyway — reads its grams
   * from parquet and never faces the trade.
   */
  def cutDuplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, n: Int,
      preserveCase: Boolean = false,
      materializeGrams: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val gramsRaw = gramFrame(docs, idCol, textCol, n)
    // Mode-aware (Dedup.eagerTracked): the positioned gram stream is
    // TOKEN-COUNT-sized — with spark.graft.checkpointDir set it
    // materializes as durable parquet instead of local blocks (the
    // storage-vs-recompute trade in the scaladoc above still applies;
    // durable mode additionally survives executor loss).
    val grams =
      if (materializeGrams) graft.dedup.Dedup.eagerTracked(gramsRaw, "spangrams")
      else gramsRaw
    val owners = grams.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__owner"), countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("__h"), col("__owner"))
    cutWithOwners(docs, idCol, textCol, n, grams, owners, preserveCase)
  }

  /** The positioned gram stream: `(idCol, __pos, __h)` with 1-based token
    * positions and md5-of-span-text keys. Shared by the self-contained
    * [[cutDuplicatedSpans]] and the persisted
    * [[graft.index.SpanIndex]], so both derive identical keys. */
  private[graft] def gramFrame(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      // fused gram kernel (r21): one byte pass emits the position-ordered
      // gram array — the original tokenize → size-guard → interpreted
      // transform(sequence, slice, array_join) chain ran as a
      // CodegenFallback higher-order function and allocated per gram;
      // short docs yield an empty array, which posexplode drops exactly
      // like the old `__len >= n` filter did
      .select(col(idCol), posexplode(
        graft.functions.word_grams(col(textCol), n)).as(Seq("__p0", "__g")))
      // posexplode is 0-based; token indices are 1-based throughout
      .select(col(idCol), (col("__p0") + 1).as("__pos"), md5(col("__g")).as("__h"))

  /** Shared cut kernel: given the doc frame, ITS gram stream and an
    * ownership table `(__h, __owner)` covering every duplicated gram,
    * remove covered tokens from every doc that is not the gram's owner
    * and rebuild. Both the direct operator and the index-backed path end
    * here, so their outputs are identical by construction. */
  private[graft] def cutWithOwners(
      docs: DataFrame, idCol: String, textCol: String, n: Int,
      grams: DataFrame, owners: DataFrame,
      preserveCase: Boolean): DataFrame = {
    val rebuildToks =
      if (preserveCase) filter(split(col(textCol), "\\s+"), t => length(t) > 0)
      else TextAnalysis.tokens(col(textCol))
    // Token indices covered by a duplicated gram this doc does not own.
    val covered = grams
      .join(owners, Seq("__h"))
      .filter(col(idCol) =!= col("__owner"))
      .select(col(idCol),
        explode(expr(s"sequence(__pos, __pos + ${n - 1})")).as("__i"))
      .distinct()
    // posexplode_OUTER: a zero-token document (empty/whitespace-only/null
    // text) still emits one (null, null) row, so the doc survives the
    // groupBy as (n_tokens=0, n_cut=0, text_clean="") instead of
    // vanishing from the output — the pass-through contract, and for
    // cutStream the difference between an empty file landing in the
    // clean corpus and being silently lost. count(__t) skips the stub
    // row's null token; the null __i joins nothing and array_join drops
    // the null element.
    docs
      .select(col(idCol), posexplode_outer(rebuildToks).as(Seq("__i0", "__t")))
      .select(col(idCol), (col("__i0") + 1).as("__i"), col("__t"))
      .join(covered.withColumn("__cut", lit(1L)), Seq(idCol, "__i"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__t")).as("n_tokens"),
        coalesce(sum(col("__cut")), lit(0L)).as("n_cut"),
        array_join(transform(array_sort(collect_list(
          when(col("__cut").isNull, struct(col("__i"), col("__t"))))),
          e => e.getField("__t")), " ").as("text_clean"))
  }
}
