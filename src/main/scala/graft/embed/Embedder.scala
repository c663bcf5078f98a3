package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.{DetMath, TfIdfBuckets, TfIdfVector}

/**
 * Text→vector embedding stage (SURVEY §2.8): the reference embeds every
 * snippet with a SentenceTransformer (`bcb_utils.py:101`,
 * `poj_utils.py:108`; model registry `embedding_models.yml:1-73`) before
 * ingest and at query time — with the SAME fitted model on both sides.
 * That two-phase contract (fit once on the corpus, transform corpus AND
 * queries) is what these traits pin down; the TF-IDF implementation is the
 * public-knowledge stand-in for the neural encoder.
 */
trait Embedder {
  /** One corpus pass producing a reusable model (the analogue of loading
    * a trained encoder). */
  def fit(corpus: DataFrame, textCol: String): EmbedModel
}

trait EmbedModel {
  /** Adds `vecCol: array<float>` computed from `textCol`. */
  def transform(df: DataFrame, textCol: String, vecCol: String): DataFrame
  def dim: Int
}

/**
 * Hashed TF-IDF embedder, ENGINE-STABLE end to end: lowercase whitespace
 * tokens → FNV-1a-64 feature hashing (unsigned mod `dim`) → 6-dp
 * q20-quantized idf `ln((m+1)/(df+1))` → optional L2 normalization →
 * `array<float>`. Interoperable with every graft vector kernel and with
 * the reference's `--normalized` knob (`main.py:19,30-34` — normalized
 * vectors make cosine a plain dot).
 *
 * The whole pipeline avoids libm (the q20 shift-and-square log kernel,
 * [[graft.expr.DetMath]]) and fixes every accumulation order, so embedded
 * vectors — and every score computed from them — replay bit-identically
 * in DuckDB SQL; `embed_corpus`/`embed_knn` are full hash-checked oracle
 * rows, not rows-only.
 *
 * Scale shape (better than the previous Spark-ML delegation): the fit is
 * ONE exploded-distinct-buckets aggregate producing an O(dim) df table
 * collected to the driver (the model — the analogue of downloaded encoder
 * weights); transform is a single fused map-side kernel
 * ([[graft.expr.TfIdfVector]]) with the idf table riding as a plan
 * constant. Nothing shuffles row data in either phase.
 */
final class TfIdfEmbedder(
    val dim: Int = 256,
    val normalized: Boolean = true,
    val minDocFreq: Int = 0) extends Embedder {
  require(dim >= 1, s"dim must be positive, got $dim")

  private def tokens(c: Column): Column = graft.text.TextAnalysis.tokens(c)

  override def fit(corpus: DataFrame, textCol: String): EmbedModel = {
    require(corpus.columns.contains(textCol), s"missing text column $textCol")
    import org.apache.spark.sql.GraftInternal
    // One aggregate over exploded per-doc distinct buckets → df(bucket),
    // plus the doc count in the same job. The explode carries one INT per
    // (doc, distinct bucket) — bounded by dim per doc regardless of text
    // size.
    val bucketCol = GraftInternal.column(
      TfIdfBuckets(GraftInternal.expression(tokens(col(textCol))), dim))
    // The doc count rides the SAME corpus pass as the df aggregate via an
    // observed metric (r21: a separate corpus.count() re-executed the whole
    // corpus lineage — joins included for derived corpora — once more per
    // fit; the CollectMetrics node sits below the explode, so it sees every
    // corpus row exactly once).
    val obs = org.apache.spark.sql.Observation()
    val dfRows = corpus
      .observe(obs, count(lit(1)).as("__m"))
      .select(explode(bucketCol).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__df"))
      .collect()
    val m = obs.get("__m").asInstanceOf[Long]
    val dfArr = new Array[Long](dim)
    dfRows.foreach(r => dfArr(r.getInt(0)) = r.getLong(1))
    val idf6 = new Array[Double](dim)
    var b = 0
    while (b < dim) {
      idf6(b) =
        if (dfArr(b) < minDocFreq.toLong) 0.0
        else DetMath.ln6FromQ20(DetMath.log2q20Long(m + 1, dfArr(b) + 1))
      b += 1
    }
    new TfIdfModel(idf6, normalized, fitTextCol = textCol)
  }
}

private final class TfIdfModel(
    idf6: Array[Double], normalized: Boolean,
    fitTextCol: String) extends EmbedModel {
  override val dim: Int = idf6.length
  override def transform(df: DataFrame, textCol: String, vecCol: String): DataFrame = {
    // The model's idf table was computed against the fit-time column's
    // vocabulary — a mismatched name would silently embed the wrong
    // column, so reject it loudly (same contract as the ML version).
    require(textCol == fitTextCol,
      s"model was fit on column '$fitTextCol' but transform was asked for '$textCol'")
    require(df.columns.contains(textCol), s"missing text column $textCol")
    import org.apache.spark.sql.GraftInternal
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    df.withColumn(vecCol, GraftInternal.column(
      TfIdfVector(GraftInternal.expression(toks), idf6, normalized)))
  }
}
