package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // (id, quality, tokens) triples
  private def corpus(rows: (Long, Double, Long)*): DataFrame =
    rows.toDF("doc_id", "q", "n")

  private def select(df: DataFrame, budget: Long): Seq[(Long, Double, Long)] =
    Selection.tokenBudgetSelect(df, "doc_id", col("q"), col("n"), budget)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq

  /** The definitional single-window reference the two-phase plan must equal. */
  private def naive(rows: Seq[(Long, Double, Long)], budget: Long): Seq[(Long, Double, Long)] = {
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val ordered = rows.map { case (id, q, n) => (id, r6(q), n) }
      .sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    ordered.flatMap { case t @ (_, _, n) =>
      cum += n; if (cum <= budget) Some(t) else None
    }.sortBy(_._1)
  }

  test("tokenBudgetSelect equals the inclusive global prefix-sum definition") {
    val rows = Seq(
      (1L, 0.9, 40L), (2L, 0.9, 40L), (3L, 0.85, 30L),
      (4L, 0.5, 100L), (5L, 0.5, 10L), (6L, 0.5, 10L),
      (7L, 0.1, 5L), (8L, 0.0, 1L), (9L, 0.45, 0L), (10L, 0.05, 0L))
    for (budget <- Seq(0L, 39L, 40L, 80L, 110L, 120L, 200L, 221L, 235L, 236L, 1000L))
      assert(select(corpus(rows: _*), budget) == naive(rows, budget),
        s"budget=$budget")
  }

  test("boundary bucket: rounded-quality ties are cut by id, lower ids first") {
    // one bucket (q=0.5) of four 10-token docs straddling the budget
    val rows = Seq((9L, 0.5, 10L), (3L, 0.5, 10L), (5L, 0.5, 10L), (7L, 0.5, 10L))
    assert(select(corpus(rows: _*), 25L).map(_._1) == Seq(3L, 5L))
    assert(select(corpus(rows: _*), 30L).map(_._1) == Seq(3L, 5L, 7L))
  }

  test("quality quantization: values rounding to the same 6-dp bucket tie") {
    // 0.1234564 and 0.1234556 both round to 0.123456 -> same bucket, id order
    val rows = Seq((2L, 0.1234564, 10L), (1L, 0.1234556, 10L))
    assert(select(corpus(rows: _*), 10L).map(_._1) == Seq(1L))
    assert(select(corpus(rows: _*), 20L).map(_._1) == Seq(1L, 2L))
    // emitted quality is the rounded sort key
    assert(select(corpus(rows: _*), 20L).map(_._2).distinct == Seq(0.123456))
  }

  test("randomized: two-phase equals naive on 300 docs across budgets") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 300L).map(id =>
      (id, rnd.nextInt(1000) / 1000.0, 1L + rnd.nextInt(50).toLong))
    val df = corpus(rows: _*)
    val total = rows.map(_._3).sum
    for (budget <- Seq(0L, total / 10, total / 3, total / 2, total - 1, total, total + 10))
      assert(select(df, budget) == naive(rows, budget), s"budget=$budget")
  }

  test("total quality skew: one bucket holds the corpus, id bands still cut exactly") {
    // every doc ties at quality 0.5 -> ONE bucket straddles any partial
    // budget; the id-band decomposition must reproduce the naive cutoff
    // including sparse/unbalanced id spaces (ids cluster at both extremes)
    val rows = (1L to 50L).map(id => (id, 0.5, 7L)) ++
      (9000L to 9040L).map(id => (id, 0.5, 3L))
    val df = corpus(rows: _*)
    val total = rows.map(_._3).sum
    for (budget <- Seq(0L, 6L, 7L, 100L, 349L, 350L, 353L, total - 1, total)) {
      val got = Selection.tokenBudgetSelect(df, "doc_id", col("q"), col("n"),
        budget, idBands = 8).as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
      assert(got == naive(rows, budget), s"budget=$budget")
    }
  }

  test("randomized with few bands: banded result equals naive") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(id =>
      (id * 13 % 4096, rnd.nextInt(4) / 10.0, 1L + rnd.nextInt(20).toLong))
      .distinctBy(_._1).map { case (id, q, n) => (id, q, n) }
    val df = corpus(rows: _*)
    val total = rows.map(_._3).sum
    for (budget <- Seq(total / 7, total / 3, total / 2))
      assert(Selection.tokenBudgetSelect(df, "doc_id", col("q"), col("n"),
        budget, idBands = 3).as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
        == naive(rows, budget), s"budget=$budget")
  }

  test("non-integral id falls back to one band per bucket, same answer") {
    val rows = Seq(("d", 0.5, 10L), ("a", 0.5, 10L), ("c", 0.9, 5L), ("b", 0.5, 10L))
    val df = rows.toDF("doc_id", "q", "n")
    val got = Selection.tokenBudgetSelect(df, "doc_id", col("q"), col("n"), 25L)
      .as[(String, Double, Long)].collect().sortBy(_._1).toSeq
    // order: c (0.9, 5) then a, b, d (0.5) by id -> c + a + b = 25
    assert(got.map(_._1) == Seq("a", "b", "c"))
  }

  test("clustered id space: quantile bands still split a tied-quality bucket") {
    // ids packed into a sliver of the long range (one snowflake epoch):
    // global-[min,max] range bands would collapse every row into band 0,
    // re-creating the corpus-sized window partition under total quality
    // skew. Quantile boundaries must keep (bucket, band) cells ~n/idBands.
    val base = Long.MaxValue / 2
    val rows = (0L until 4000L).map(i => (base + i, 0.5, 3L)) ++
      Seq((1L, 0.5, 3L), (Long.MaxValue - 7, 0.5, 3L)) // two far outliers
    val df = corpus(rows: _*)
    val idBands = 16
    val bnds = Selection.idBandBoundaries(df, "doc_id", idBands)
    assert(bnds.length >= idBands / 2,
      s"clustered ids must still yield many distinct boundaries, got ${bnds.length}")
    val sizes = df.select(Selection.bandColumn(col("doc_id"), bnds).as("b"))
      .groupBy($"b").count().collect().map(_.getLong(1))
    assert(sizes.length >= idBands / 2, s"got ${sizes.length} non-empty bands")
    assert(sizes.max <= 4L * rows.size / idBands,
      s"worst band ${sizes.max} of ${rows.size} rows across $idBands bands")
    // and the selection output is still exactly the naive definition
    val total = rows.map(_._3).sum
    for (budget <- Seq(total / 3, total / 2, total - 1))
      assert(Selection.tokenBudgetSelect(df, "doc_id", col("q"), col("n"),
        budget, idBands = idBands).as[(Long, Double, Long)].collect()
        .sortBy(_._1).toSeq == naive(rows, budget), s"budget=$budget")
  }

  test("band_of kernel == original when-tree (incl. boundary ties, extremes, null)") {
    // r21: bandColumn swapped its O(n)-code when-tree for the
    // binary-search BandOf expression; band assignment feeds the
    // deterministic selection sweep, so the two spellings must agree on
    // every id — exact boundary hits (ties go right), band interiors,
    // Long extremes, and NULL (the tree's all-null predicates fell through
    // to the rightmost band, never NULL).
    val bnds = Array(-5000L, -1L, 0L, 7L, 123456789L, Long.MaxValue - 1)
    val probe = (bnds.flatMap(b => Seq(b - 1, b, b + 1)) ++
      Seq(Long.MinValue, Long.MaxValue, 42L)).distinct
    val df = probe.toSeq.map(Option(_)).:+(Option.empty[Long]).toDF("id")
    val bad = df.select(
        Selection.bandColumn($"id", bnds).as("fused"),
        Selection.bandColumnTree($"id", bnds).as("orig"))
      .filter(not($"fused" <=> $"orig"))
    assert(bad.count() === 0)
    // empty boundary set: both spellings are the constant 0
    val bad0 = df.select(
        Selection.bandColumn($"id", Array.empty[Long]).as("fused"),
        Selection.bandColumnTree($"id", Array.empty[Long]).as("orig"))
      .filter(not($"fused" <=> $"orig"))
    assert(bad0.count() === 0)
  }

  test("exact-budget boundary: zero-token docs in the next bucket stay selected") {
    // better buckets consume EXACTLY the budget; the following bucket's
    // leading zero-token docs still satisfy the inclusive rule (cum ==
    // budget) and must not be dropped by a strict __before < budget prune
    val rows = Seq((1L, 0.9, 50L), (2L, 0.5, 0L), (3L, 0.5, 10L), (4L, 0.5, 0L))
    assert(select(corpus(rows: _*), 50L) == naive(rows, 50L))
    assert(select(corpus(rows: _*), 50L).map(_._1) == Seq(1L, 2L))
    // and with the zero-token bucket entirely zero: all of it selected
    val rows2 = Seq((1L, 0.9, 50L), (2L, 0.5, 0L), (3L, 0.5, 0L), (4L, 0.1, 1L))
    assert(select(corpus(rows2: _*), 50L) == naive(rows2, 50L))
    assert(select(corpus(rows2: _*), 50L).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("empty corpus and zero budget are empty, full budget keeps everything") {
    assert(select(corpus(), 100L).isEmpty)
    val rows = Seq((1L, 0.3, 5L), (2L, 0.7, 5L))
    assert(select(corpus(rows: _*), 0L).isEmpty)
    assert(select(corpus(rows: _*), 10L).map(_._1) == Seq(1L, 2L))
  }

  test("idBandBoundaries: an id column that casts to all-NULL fails loudly") {
    // A non-empty corpus whose every id is NULL under CAST AS LONG would
    // silently fall back to a single band — the skew defense gone with no
    // signal. The sampler counts nulls in the same scan and rejects.
    val df = Seq("x", "y", "z").toDF("text")
      .withColumn("doc_id", lit(null).cast("long"))
    val e = intercept[IllegalArgumentException] {
      Selection.idBandBoundaries(df, "doc_id", 8)
    }
    assert(e.getMessage.contains("cast to NULL"))
    // a genuinely EMPTY corpus is still fine (no bands, no error)
    assert(Selection.idBandBoundaries(
      spark.emptyDataset[Long].toDF("doc_id"), "doc_id", 8).isEmpty)
  }
}
