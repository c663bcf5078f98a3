package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Token-window document chunking — the step between cleaning and embedding
 * in a training/RAG pipeline: long documents become overlapping windows of
 * `chunkSize` tokens advanced by `stride` (stride < chunkSize overlaps,
 * stride == chunkSize tiles). A doc with ≤ chunkSize tokens yields exactly
 * one chunk; otherwise `ceil((n-chunkSize)/stride)+1`, the last chunk
 * clipped at the end of the doc.
 *
 * Pure per-row compute (tokenize → transform over a chunk-index sequence →
 * posexplode): no shuffle, no state, embarrassingly parallel at any corpus
 * size. Output amplification is bounded by n/stride rows per doc, each
 * carrying only its own window's text.
 */
object Chunker {

  /** @return one row per chunk: all of `idCols`, `chunk_id` (0-based int),
    *         `n_chunk_tokens`, `chunk_text` (tokens joined by single
    *         spaces — the canonical whitespace-normalized form). */
  def chunk(
      df: DataFrame,
      idCols: Seq[String],
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val n = size(col("__toks"))
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      ceil((n - chunkSize).cast("double") / stride).cast("int") + 1)
    def window(i: Column): Column = slice(col("__toks"), i * stride + 1, lit(chunkSize))
    df.select(idCols.map(col) :+ TextAnalysis.tokens(col(textCol)).as("__toks"): _*)
      .select(idCols.map(col) :+ posexplode(
        transform(sequence(lit(0), nChunks - 1),
          i => struct(
            size(window(i)).as("n_chunk_tokens"),
            array_join(window(i), " ").as("chunk_text"))))
          .as(Seq("chunk_id", "__c")): _*)
      .select(idCols.map(col) ++ Seq(
        col("chunk_id").cast("int").as("chunk_id"),
        col("__c.n_chunk_tokens").as("n_chunk_tokens"),
        col("__c.chunk_text").as("chunk_text")): _*)
  }
}
