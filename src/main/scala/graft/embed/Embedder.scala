package graft.embed

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
 * TF-IDF embedder: RegexTokenizer → HashingTF(dim) → IDF → optional L2
 * Normalizer, emitting `array<float>` (interoperable with every graft
 * vector kernel and with the reference's `--normalized` knob,
 * `main.py:19,30-34` — normalized vectors make cosine a plain dot).
 *
 * Scale shape: tokenize+hash are per-row map work; the IDF fit is one
 * treeAggregate over the corpus (document frequencies, O(dim) state);
 * transform is again pure map — nothing here shuffles row data.
 */
final class TfIdfEmbedder(
    val dim: Int = 256,
    val normalized: Boolean = true,
    val minDocFreq: Int = 0) extends Embedder {

  override def fit(corpus: DataFrame, textCol: String): EmbedModel = {
    val stages = pipeline(textCol)
    val model = new Pipeline().setStages(stages).fit(corpus)
    new TfIdfModel(model, dim, normalized, fitTextCol = textCol)
  }

  private def pipeline(textCol: String) = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__tf").setNumFeatures(dim)
    val idf = new IDF()
      .setInputCol("__tf").setOutputCol("__tfidf").setMinDocFreq(minDocFreq)
    val base = Array(tok, tf, idf)
    if (normalized)
      base :+ new Normalizer().setInputCol("__tfidf").setOutputCol("__vec").setP(2.0)
    else base
  }
}

private final class TfIdfModel(
    model: PipelineModel, val dim: Int, normalized: Boolean,
    fitTextCol: String) extends EmbedModel {
  override def transform(df: DataFrame, textCol: String, vecCol: String): DataFrame = {
    val outCol = if (normalized) "__vec" else "__tfidf"
    // The fitted tokenizer reads its fit-time input column no matter what
    // is passed here — a mismatched name would silently embed the wrong
    // column, so reject it loudly.
    require(textCol == fitTextCol,
      s"model was fit on column '$fitTextCol' but transform was asked for '$textCol'")
    require(df.columns.contains(textCol),
      s"missing text column $textCol")
    model.transform(df)
      .withColumn(vecCol, vector_to_array(col(outCol), "float32"))
      .drop("__tokens", "__tf", "__tfidf", "__vec")
  }
}
