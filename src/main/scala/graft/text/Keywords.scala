package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.search.Bm25

/**
 * Per-document TF-IDF keyword extraction: the `topN` terms of each document
 * by `tf · log2(N/df)` (Salton TF-IDF — the log base only scales every
 * score by a positive constant, so ranks are identical to the ln form;
 * df ≥ 1 for any term that occurs, so no smoothing is needed) — the
 * standard "what is this document about" summarization used for corpus
 * exploration, tag generation, and cluster labeling in a training-data
 * pipeline.
 *
 * Shares [[Bm25.tfFrame]]'s tokenize+TF kernel (one explode + hash
 * aggregate over the corpus, document length riding as a grouping key) so
 * keyword TF can never diverge from retrieval TF. DF is a vocabulary-sized
 * aggregate of that same frame; the TF⋈DF equi-join shuffles both sides by
 * term — inherent, since unlike BM25 (which semi-joins DF down to query
 * terms) every document's every term needs its IDF. Per-document top-N
 * runs as a rank window partitioned by document: frames are bounded by
 * document length, so the sort is per-document-sized, never corpus-sized.
 *
 * Determinism discipline: IDF comes from [[graft.expr.DetMath.log2q20]]
 * as a q20 fixed-point BIGINT (engine-stable by construction — libm `ln`
 * differs between engines in the last ulp, which can flip a rank when
 * ln(N/df) lands on a quantization boundary); `tf · qidf` is exact
 * integer arithmetic, so ranking is deterministic everywhere, with ties
 * broken by ascending term (binary UTF-8 order in Spark and any
 * binary-collation oracle engine). The wire-format `tfidf` is one double
 * division off the integer score, floor-quantized to 6 dp.
 */
object Keywords {
  /**
   * Output: `doc_id` (named after `idCol`), `keyword`, `kw_rank` (1-based
   * within document), `tfidf` (6-dp). Documents with fewer distinct terms
   * than `topN` emit fewer rows.
   */
  def tfidfKeywords(
      docs: DataFrame, idCol: String, textCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val n = docs.count() // one metadata-sized scalar, same as Bm25.corpusStats
    val tf = Bm25.tfFrame(docs, idCol, textCol)
    // qidf rides on the vocabulary-sized DF table so the 84-step q20 fold
    // runs once per TERM, not once per corpus TF row.
    val dfTable = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
      .withColumn("__qidf", graft.expr.DetMath.log2q20(lit(n), col("__df")))
    val r6: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      graft.functions.round6 // the one wire-rounding definition
    val w = Window.partitionBy(col("__d"))
      .orderBy(col("__qtfidf").desc, col("__t").asc)
    tf.join(dfTable, Seq("__t"))
      .withColumn("__qtfidf", col("__tf") * col("__qidf")) // exact BIGINT score
      .withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= topN)
      .select(col("__d").as(idCol), col("__t").as("keyword"),
        col("kw_rank"),
        r6(col("__qtfidf").cast("double") / lit(graft.expr.DetMath.Q.toDouble))
          .as("tfidf"))
  }
}
