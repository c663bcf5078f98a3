package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.Bm25

/**
 * Persisted BM25 inverted index — build-once/query-many lexical retrieval,
 * the text-side sibling of [[MinHashIndex]] (near-dup) and
 * [[IvfCollection]] (vectors). [[graft.search.Bm25.search]] recomputes the
 * corpus-wide tokenize + TF kernel inside every call; a retrieval service
 * answering many query batches should pay it once and read the artifact.
 *
 * Layout: `<root>/<name>/tf/` (parquet: doc, dl, term, tf), `df/`
 * (parquet: term, df — the full vocabulary), `_meta.json` (N,
 * totalTokens — pinned so scoring can never mix statistics from a
 * different corpus state). Queries score through THE shared kernel
 * ([[Bm25.scoreTf]]), so index answers are output-identical to the
 * self-contained operator at the same parameters — `bm25_index_topk`
 * shares `bm25_topk`'s oracle.
 *
 * 100 TB note: `tf/` is written plain here; at real scale partition or
 * bucket it by a term-hash prefix so a query-term semi-join prunes to the
 * touched shards instead of scanning the full posting store.
 */
class Bm25Index(
    protected val spark: SparkSession,
    protected val root: String,
    val name: String) extends FsArtifact {
  private lazy val tfPath = new org.apache.hadoop.fs.Path(base, "tf").toString
  private lazy val dfPath = new org.apache.hadoop.fs.Path(base, "df").toString

  def build(docs: DataFrame, idCol: String, textCol: String): this.type = {
    invalidateMeta()
    Bm25.tfFrame(docs, idCol, textCol)
      .select(col("__d").as("doc"), col("__dl").as("dl"),
        col("__t").as("term"), col("__tf").as("tf"))
      .write.mode(SaveMode.Overwrite).parquet(tfPath)
    // DF derived from the PERSISTED frame: one columnar scan of (term),
    // never a second pass over the text kernel.
    spark.read.parquet(tfPath)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode(SaveMode.Overwrite).parquet(dfPath)
    val (n, totalTokens) = Bm25.corpusStats(docs, textCol)
    writeMetaJson(s"""{"n":$n,"totalTokens":$totalTokens}""")
    this
  }

  /** Incremental ingest: sign and append TF rows for docs whose id is not
    * already indexed (idempotent by key, like the sibling artifacts), then
    * refresh the DF table (one columnar scan of the stored frame — never a
    * second text pass) and the pinned corpus statistics. An upserted index
    * is EXACTLY the index a full rebuild over the union would produce
    * (same TF row set, DF and stats recomputed from it) — pinned in
    * Bm25Spec. Single-writer; `exists` is false for the whole refresh
    * window (FsArtifact protocol). */
  def upsert(batch: DataFrame, idCol: String, textCol: String): Unit = {
    require(exists, s"index $name does not exist - build() it first")
    val m = readMetaJson()
    val n0 = metaField(m, "n").toLong
    val tt0 = metaField(m, "totalTokens").toLong
    invalidateMeta()
    val indexed = spark.read.parquet(tfPath).select(col("doc")).distinct()
    // Eagerly pin the admitted batch BEFORE any write: `fresh` reads tfPath
    // (through the anti-join) and may be non-deterministic upstream, so a
    // lazy plan re-executed after the TF append could resolve to DIFFERENT
    // rows than the ones just appended — the stats delta below must come
    // from the exact row set the append wrote, or N/avgdl silently corrupt
    // every later score.
    val fresh = batch.dropDuplicates(idCol)
      .join(indexed, batch(idCol) === indexed("doc"), "left_anti")
      .select(col(idCol), col(textCol))
      .localCheckpoint(true)
    val (nF, ttF) = Bm25.corpusStats(fresh, textCol)
    Bm25.tfFrame(fresh, idCol, textCol)
      .select(col("__d").as("doc"), col("__dl").as("dl"),
        col("__t").as("term"), col("__tf").as("tf"))
      .write.mode(SaveMode.Append).parquet(tfPath)
    spark.read.parquet(tfPath)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode(SaveMode.Overwrite).parquet(dfPath)
    writeMetaJson(s"""{"n":${n0 + nF},"totalTokens":${tt0 + ttF}}""")
  }

  /** Top-`k` BM25 matches per query from the artifact. Same output
    * contract (and values) as [[graft.search.Bm25.search]]. */
  def query(
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = true,
      roundScoreTo: Option[Int] = None,
      outIdCol: String = "doc"): DataFrame = {
    require(exists, s"index $name does not exist - build() it first")
    val m = readMetaJson()
    val n = metaField(m, "n").toLong
    val avgdl = metaField(m, "totalTokens").toLong.toDouble / n
    val tf = spark.read.parquet(tfPath)
      .select(col("doc").as("__d"), col("dl").as("__dl"),
        col("term").as("__t"), col("tf").as("__tf"))
    val dfTable = spark.read.parquet(dfPath)
      .select(col("term").as("__t"), col("df").as("__df"))
    Bm25.scoreTf(tf, dfTable, n, avgdl, queries, queryIdCol, queryTextCol,
      k, k1, b, excludeSelf, roundScoreTo, outIdCol)
  }
}

object Bm25Index {
  def apply(spark: SparkSession, root: String, name: String): Bm25Index =
    new Bm25Index(spark, root, name)
}
