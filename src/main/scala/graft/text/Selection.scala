package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/**
 * Token-budget corpus selection: keep the best documents (by a quality
 * key, descending) whose running token total stays within a fixed budget —
 * the "data selection under a token budget" step of a training-data
 * pipeline (pick the top-quality slice that fits the planned token count).
 *
 * The naive formulation is a running sum over a GLOBAL order
 * (`sum(tokens) over (order by quality desc, id)`), which Spark executes
 * as a single-partition window — the exact anti-pattern this engine's
 * plan guards exist to catch. This implementation computes the SAME
 * inclusive-prefix-sum cutoff exactly, with every operator bounded:
 *
 *  1. *Cell pass*: quantize the quality key to its 6-dp fixed-point
 *     integer (the repo's wire rounding, so bucket boundaries coincide
 *     with the oracle's rounded values) and sub-divide each bucket into
 *     ≤`idBands` deterministic id bands whose boundaries come from
 *     SAMPLED ID QUANTILES (one narrow id-only reservoir-sample pass,
 *     collected once driver-side — a bounded long sample, weighted
 *     quantiles computed in the LONG domain — and embedded as plan
 *     literals); hash-aggregate per-(bucket, band) token sums.
 *     Rolled up to per-bucket totals, the cumulative sweep runs over
 *     ≤10⁶ rows REGARDLESS of corpus size (quality ∈ [0,1] at 6 dp) — a
 *     bounded single-partition window, not the corpus. The id-banding
 *     exists because a heavily-tied quality column (e.g. a capped score
 *     where most of the corpus saturates) can put nearly all documents
 *     into the ONE bucket that straddles the budget cutoff; without
 *     bands, its in-bucket running sum would degenerate to a single
 *     corpus-sized window partition. (Measured: the 30× N-clone scale
 *     sweep — every quality duplicated 30-fold — ran 15.9 s
 *     single-banded vs linear-trend multi-banded.) QUANTILE boundaries
 *     rather than global-[min,max] range slices: a clustered id space
 *     (snowflake ids from one epoch inside a wide long range) collapses
 *     range bands into one, re-creating the corpus-sized partition,
 *     while quantile bands stay ~1/idBands-sized under ANY id
 *     distribution. Bands stay monotone in id (quantiles of an ordered
 *     key), which the fine cutoff's id ordering requires — hash bands
 *     would be cheaper but break it.
 *  2. *Selection pass*: one more corpus scan broadcast-joins each row to
 *     its bucket's decision (`__before` = tokens consumed by strictly
 *     better buckets) and, for the single straddling bucket, its band's
 *     offset (`__sbBefore`, swept over ≤`idBands` rows); the running sum
 *     window is PARTITIONED by (bucket, band) — partitions are
 *     ~bucket/idBands sized even under total quality skew. The global
 *     prefix-sum rule decomposes exactly as
 *     `__before + __sbBefore + run ≤ budget`: for a fully-fitting
 *     bucket the inequality holds automatically (run ≤ cell sum, so the
 *     left side is ≤ the bucket's cumulative total ≤ budget — such rows
 *     need no band offset at all), and for the straddling bucket it is
 *     the exact fine cutoff since bands partition the bucket in id
 *     order.
 *
 * A document is selected iff its inclusive running total over the order
 * (quality desc, id asc) is ≤ `budget` — bit-identical to the naive
 * global-window definition (ties inside a bucket are broken by id; buckets
 * never split ties because equal rounded quality means equal bucket).
 * Total cost: one narrow id-only scan, ONE full scan (the narrow
 * quality/token projection is materialized once and re-read by the cell
 * aggregate and the selection pass — see the checkpoint note at `base`),
 * one bounded broadcast, one candidate-sized shuffle. No corpus-sized
 * single-partition operator at any scale or skew.
 */
object Selection {

  private val Fp = 1000000L // 6-dp fixed point — matches the oracle wire rounding

  /** Distinct, sorted id-quantile band boundaries (≤ idBands−1 LONGS):
    * one narrow id-only scan with a per-partition seeded reservoir, a
    * bounded driver-side collect, exact weighted quantiles over the
    * merged sample. Everything stays in the LONG domain end-to-end —
    * `approxQuantile`/`percentile_approx` sketch in doubles, where a ULP
    * at snowflake-id magnitude (≈2⁶²) is 512 and thousands of
    * consecutive ids collapse onto a handful of representable values,
    * silently degrading the skew defense to near-single-band.
    * Approximation error in the SAMPLE only skews band sizes slightly —
    * correctness needs boundaries that are deterministic within the
    * call and monotone in id, both of which literals trivially are.
    * Bounded: each partition keeps ≤4·idBands sampled ids (weighted by
    * its true row count at merge time), so the collect is
    * O(partitions · min(4·idBands, target/partitions)) longs. */
  private[text] def idBandBoundaries(
      docs: DataFrame, idCol: String, idBands: Int): Array[Long] =
    if (idBands <= 1) Array.empty
    else {
      // nulls are counted, not pre-filtered: a column whose every value
      // casts to NULL (wrong declared type reaching this far, or an
      // all-null id column) must fail LOUDLY below, not silently collapse
      // the skew defense to a single band — the failure the old
      // approxQuantile path produced by accident and this path must keep
      // on purpose.
      val ids = docs.select(col(idCol).cast(LongType).as("id"))
      val rdd = ids.queryExecution.toRdd // InternalRow, no row codec overhead
      val nPart = math.max(1, rdd.getNumPartitions)
      // target ~64 samples per requested boundary overall; clamp so a
      // 10k-partition cluster scan still collects only O(100k) longs
      val perPart = math.max(32, math.min(4 * idBands, 64 * idBands / nPart))
      // (rowCount, reservoir) per partition — seeded by partition index,
      // deterministic for a fixed input partitioning (the boundaries are
      // computed ONCE and ride both passes as plan literals, so cross-plan
      // stability is what matters, and literals trivially have it)
      val parts = rdd.mapPartitionsWithIndex { (pi, it) =>
        val rnd = new java.util.Random(0x9E3779B97F4A7C15L ^ pi.toLong)
        val res = new Array[Long](perPart)
        var n = 0L
        var nulls = 0L
        while (it.hasNext) {
          val row = it.next()
          if (row.isNullAt(0)) nulls += 1
          else {
            val v = row.getLong(0)
            if (n < perPart) res(n.toInt) = v
            else { val j = (rnd.nextDouble() * (n + 1)).toLong; if (j < perPart) res(j.toInt) = v }
            n += 1
          }
        }
        Iterator.single((n, nulls, res.take(math.min(n, perPart.toLong).toInt)))
      }.collect()
      val total = parts.map(_._1).sum
      val nullIds = parts.map(_._2).sum
      // strict: ids are unique-and-non-null by contract, so ANY null-cast
      // id means a wrong type or corrupt values — a mostly-null column
      // would otherwise pass a weaker all-null check and band only the
      // parsed sliver, silently shedding the skew defense for the rest
      require(nullIds == 0,
        s"$idCol: $nullIds id(s) cast to NULL as LONG — banding would " +
          "silently exclude them from the skew defense; fix the id " +
          "column's type or values upstream")
      if (total == 0) Array.empty
      else {
        // weighted exact quantiles: each sampled id stands for n_p/k_p rows
        val weighted = parts.filter(_._3.nonEmpty).flatMap { case (n, _, s) =>
          val w = n.toDouble / s.length; s.map(v => (v, w))
        }.sortBy(_._1)
        val cum = weighted.scanLeft(0.0)(_ + _._2).tail
        val tw = cum.last
        // One merged forward sweep: targets ascend and cum is
        // non-decreasing, so the first-index-≥-target pointer is
        // monotone — O(samples + idBands) instead of a fresh
        // O(samples) indexWhere scan per band (~10⁸ driver
        // comparisons at idBands=1024 over a big sample set).
        val out = Array.newBuilder[Long]
        var j = 0
        var i = 1
        while (i < idBands) {
          val target = tw * i / idBands
          while (j < cum.length && cum(j) < target) j += 1
          out += weighted(math.min(j, weighted.length - 1))._1
          i += 1
        }
        out.result().distinct.sorted
      }
    }

  /** Band of an id under sorted LONG boundaries: a binary-search kernel
    * ([[graft.expr.BandOf]]) — O(log idBands) comparisons per row with the
    * boundary array riding as a plan reference. Comparisons are
    * long-vs-long (no double round trip, exact at any magnitude). Ties at
    * a boundary go right; any fixed rule works because both passes
    * evaluate this identical expression.
    * (r21: replaced the original balanced when-tree, which executed
    * O(log n) but GENERATED O(n) code — at idBands=1024 its ~1023 inlined
    * comparisons overflowed janino's 64 KB method limit inside the
    * curation_pipeline/budget_select projections and dropped the stage out
    * of compiled execution. [[bandColumnTree]] keeps the original tree as
    * the SelectionSpec equivalence reference.) */
  private[text] def bandColumn(id: Column, bnds: Array[Long]): Column = {
    import org.apache.spark.sql.GraftInternal
    if (bnds.isEmpty) lit(0)
    else GraftInternal.column(graft.expr.BandOf(
      GraftInternal.expression(id.cast(LongType)), bnds))
  }

  /** The pre-fusion when-tree spelling of [[bandColumn]] — kept as the
    * SelectionSpec equivalence reference. */
  private[text] def bandColumnTree(id: Column, bnds: Array[Long]): Column = {
    val v = id.cast(LongType)
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi - 1) / 2
        when(v < lit(bnds(mid)), tree(lo, mid)).otherwise(tree(mid + 1, hi))
      }
    if (bnds.isEmpty) lit(0) else tree(0, bnds.length)
  }

  /**
   * @param docs     one row per document
   * @param idCol    unique document id; integral types get id-quantile
   *                 banding (the skew defense above), other orderable
   *                 types fall back to one band per bucket
   * @param quality  sort key in [0, 1] (higher = better), e.g.
   *                 [[TextAnalysis.qualityScore]]; quantized to 6 dp
   * @param tokens   per-document token count column (non-negative)
   * @param budget   inclusive token budget
   * @param idBands  max id-range bands per quality bucket
   * @return (id, quality, n_tokens) of the selected documents — quality is
   *         the 6-dp rounded value the ordering used
   */
  def tokenBudgetSelect(
      docs: DataFrame, idCol: String,
      quality: Column, tokens: Column, budget: Long,
      idBands: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(idBands > 0, s"idBands must be positive, got $idBands")
    val integralId = docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }

    // Deterministic order-aligned bands from sampled id quantiles: the
    // boundaries are computed ONCE (a bounded driver collect) and ride
    // both passes as the SAME plan literals, so the band of a row is
    // bit-stable across every plan that computes it (a range-repartition
    // + partition-id scheme would not guarantee that across
    // exchange-reuse boundaries, and a per-pass sample could disagree
    // with itself).
    val withBand =
      if (!integralId) docs.withColumn("__sb", lit(0))
      else {
        val bnds = idBandBoundaries(docs, idCol, idBands)
        docs.withColumn("__sb", bandColumn(col(idCol), bnds))
      }
    // ONE wide scan, not two: the narrow (id, bucket, tokens, band)
    // projection is persisted and EAGERLY materialized, so the text scan
    // and the (expensive) per-row quality kernel run exactly once and
    // every consumer — cell aggregate, both broadcast decision tables,
    // and the selection window — reads the ~32 B/row narrow frame
    // instead. (Exchange reuse cannot do this declaratively: the static
    // planner plans each broadcast subtree separately — measured
    // 4 FileScans / 26.9 s at 30× with a shared pre-partitioned base and
    // no checkpoint, vs 2 scans / 16.8 s checkpointing cells only, vs
    // 1 scan / 6.7 s materialized.) localCheckpoint — NOT persist() —
    // deliberately: persist's CacheManager keys on the ANALYZED PLAN, so
    // the cache outlives this call and a later call over the same path
    // silently serves the old blocks even if the files were rewritten
    // (stale answers), while also hiding the scan cost from any repeated
    // measurement (tried: passes 2+ read the cross-call cache). A
    // checkpoint is private to this invocation: fresh data every call,
    // honest cost every call. The known trade: checkpointed blocks have
    // no lineage, so at cluster scale a lost executor fails the job
    // instead of recomputing — acceptable for a narrow frame consumed
    // within the same query, the same exposure every shuffle's map
    // output has without an external shuffle service. Storage cost is
    // corpus-sized but narrow (~32 B/row vs re-running the quality
    // kernel per consumer).
    // tracked for scoped release (Dedup.releaseTracked at sweep
    // boundaries) — a long session looping many dirs must not accumulate
    // one pinned base per call while waiting on driver GC +
    // ContextCleaner. Mode-aware: the base is corpus-sized (narrow), so
    // with spark.graft.checkpointDir set it materializes as durable
    // parquet instead of the lineage-free blocks described above —
    // preemptible clusters keep the one-scan economics without the
    // lost-executor-fails-the-job exposure.
    val base = graft.dedup.Dedup.eagerTracked(
      withBand.select(
        col(idCol).as("id"),
        floor(quality * lit(Fp) + lit(0.5)).cast("long").as("__qb"),
        tokens.cast("long").as("n_tokens"),
        col("__sb")), "selbase")

    // Cell pass: per-(bucket, band) sums over the CHECKPOINTED base. The
    // cell frame feeds three consumers (bucket rollup → sweep,
    // straddle-band sweep, and both broadcast decision tables); each
    // broadcast subtree re-executes this aggregate, but over the narrow
    // materialized base — a cheap re-read, not the corpus-wide quality
    // scan it used to be (the r12 measurement that motivated
    // checkpointing here: 8 FileScans / 24 s at 30× — is now prevented
    // one level down, at base).
    val cells = base.groupBy(col("__qb"), col("__sb"))
      .agg(sum(col("n_tokens")).as("__cbt"))
    val buckets = cells.groupBy(col("__qb")).agg(sum(col("__cbt")).as("__bt"))
    val sweep = Window.orderBy(col("__qb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val decided = buckets
      .withColumn("__cum", sum(col("__bt")).over(sweep))
      .select(col("__qb"), (col("__cum") - col("__bt")).as("__before"),
        col("__cum"))

    // Band offsets exist only for the (single) straddling bucket; the
    // sweep input is ≤idBands rows.
    val bandSweep = Window.orderBy(col("__sb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `__before <= budget` (not <): when preceding buckets consume EXACTLY
    // the budget, this bucket's leading zero-token docs still satisfy the
    // inclusive rule (cum == budget) and must stay selectable; the bucket
    // is still unique — any earlier straddler would push this one's
    // __before past the budget.
    val straddleBands = cells
      .join(broadcast(decided.filter(col("__cum") > budget && col("__before") <= budget)
        .select(col("__qb"))), Seq("__qb"))
      .withColumn("__sbCum", sum(col("__cbt")).over(bandSweep))
      .select(col("__qb"), col("__sb"),
        (col("__sbCum") - col("__cbt")).as("__sbBefore"))

    // Selection pass: candidate buckets either fit entirely or straddle;
    // everything else is pruned before the window, whose partitions are
    // (bucket, band)-sized.
    val fine = Window.partitionBy(col("__qb"), col("__sb")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(decided), Seq("__qb"))
      .filter(col("__cum") <= budget || col("__before") <= budget)
      .join(broadcast(straddleBands), Seq("__qb", "__sb"), "left")
      .withColumn("__run", sum(col("n_tokens")).over(fine))
      .filter(col("__before") + coalesce(col("__sbBefore"), lit(0L)) +
        col("__run") <= budget)
      .select(col("id"),
        (col("__qb").cast("double") / lit(Fp.toDouble)).as("quality"),
        col("n_tokens"))
  }
}
