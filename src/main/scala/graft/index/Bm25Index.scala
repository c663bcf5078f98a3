package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.Bm25
import graft.text.TextAnalysis

/**
 * Persisted BM25 inverted index — build-once/query-many lexical retrieval,
 * the text-side sibling of [[MinHashIndex]] (near-dup) and
 * [[IvfCollection]] (vectors). [[graft.search.Bm25.search]] recomputes the
 * corpus-wide tokenize + TF kernel inside every call; a retrieval service
 * answering many query batches should pay it once and read the artifact.
 *
 * Layout: `<root>/<name>/tf/` (parquet: doc, dl, term, tf — PARTITIONED by
 * `bucket` = term-hash mod `buckets`), `df/` (parquet: term, df — the full
 * vocabulary), `_meta.json` (N, totalTokens, buckets — pinned so scoring
 * can never mix statistics from a different corpus state). Queries score
 * through THE shared kernel ([[Bm25.scoreTf]]), so index answers are
 * output-identical to the self-contained operator at the same parameters —
 * `bm25_index_topk` shares `bm25_topk`'s oracle.
 *
 * 100 TB shape: the term-hash partitioning is what makes the artifact a
 * real inverted index rather than a cached TF table — a query touches only
 * the posting shards its terms hash into (static partition pruning turns
 * |query vocabulary| / buckets into skipped I/O, the IVF-cells move applied
 * to text). `df/` stays unpartitioned: it is vocabulary-sized (bounded by
 * distinct terms, not corpus size) and is read once per query batch.
 * Pre-bucketing-era artifacts (no `buckets` meta field) stay readable —
 * they scan the full posting store as before.
 */
class Bm25Index(
    protected val spark: SparkSession,
    protected val root: String,
    val name: String) extends FsArtifact {
  private lazy val tfPath = new Path(base, "tf").toString
  private lazy val dfPath = new Path(base, "df").toString

  private def bucketOf(term: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(term), lit(buckets.toLong)).cast("int")

  def build(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64): this.type = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    invalidateMeta()
    Bm25.tfFrame(docs, idCol, textCol)
      .select(col("__d").as("doc"), col("__dl").as("dl"),
        col("__t").as("term"), col("__tf").as("tf"))
      .withColumn("bucket", bucketOf(col("term"), buckets))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(tfPath)
    // DF derived from the PERSISTED frame: one columnar scan of (term),
    // never a second pass over the text kernel.
    spark.read.parquet(tfPath)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode(SaveMode.Overwrite).parquet(dfPath)
    val (n, totalTokens) = Bm25.corpusStats(docs, textCol)
    writeMetaJson(s"""{"n":$n,"totalTokens":$totalTokens,"buckets":$buckets$foldStampJson}""")
    this
  }

  /** Incremental ingest: sign and append TF rows for docs whose id is not
    * already indexed (idempotent by key, like the sibling artifacts), then
    * merge a vocabulary-sized DF DELTA into the stored table and bump the
    * pinned corpus statistics — every step is O(batch) plus one
    * vocabulary-sized join, never a rescan of the posting store. An
    * upserted index is EXACTLY the index a full rebuild over the union
    * would produce (same TF row set, same DF counts, same stats) — pinned
    * in Bm25Spec. Single-writer; `exists` is false for the whole refresh
    * window (FsArtifact protocol). */
  def upsert(batch: DataFrame, idCol: String, textCol: String): Unit = {
    require(exists, s"index $name does not exist - build() it first")
    val m = readMetaJson()
    requireFoldCurrent(m) // postings derive from folded token text
    val n0 = metaField(m, "n").toLong
    val tt0 = metaField(m, "totalTokens").toLong
    val buckets = metaFieldOpt(m, "buckets").map(_.toInt)
    invalidateMeta()
    // Eagerly pin the admitted batch BEFORE any write: `fresh` reads tfPath
    // (through the anti-join) and may be non-deterministic upstream, so a
    // lazy plan re-executed after the TF append could resolve to DIFFERENT
    // rows than the ones just appended — the stats delta below must come
    // from the exact row set the append wrote, or N/avgdl silently corrupt
    // every later score. Reversed anti probe ([[graft.plans.Joins]]): one
    // streaming pass over the postings' doc column, no global distinct of
    // the |docs × terms|-row table and no shuffle of it per batch.
    // Plain localCheckpoint, deliberately NOT the durable mode
    // (spark.graft.checkpointDir): the frame is BATCH-sized and consumed
    // within this call — the TF append below is the durable artifact,
    // and a mid-call executor loss just re-runs admit() from its input.
    val fresh = graft.plans.Joins.antiSmallLeft(batch.dropDuplicates(idCol),
        spark.read.parquet(tfPath).select(col("doc").as(idCol)), idCol)
      .select(col(idCol), col(textCol))
      .localCheckpoint(true)
    val (nF, ttF) = Bm25.corpusStats(fresh, textCol)
    val freshTf = Bm25.tfFrame(fresh, idCol, textCol)
      .select(col("__d").as("doc"), col("__dl").as("dl"),
        col("__t").as("term"), col("__tf").as("tf"))
    val writer = buckets.fold(freshTf) { b =>
      freshTf.withColumn("bucket", bucketOf(col("term"), b))
    }.write.mode(SaveMode.Append)
    buckets.fold(writer)(_ => writer.partitionBy("bucket")).parquet(tfPath)
    // Incremental DF refresh: aggregate the FRESH rows only (batch-sized)
    // and full-outer-merge into the stored vocabulary — O(vocab), not
    // O(posting store).
    val delta = freshTf.groupBy(col("term")).agg(count(lit(1)).as("__delta"))
    val merged = spark.read.parquet(dfPath)
      .join(delta, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("__delta"), lit(0L))).as("df"))
    overwriteViaShadow(new Path(dfPath), merged)
    writeMetaJson(s"""{"n":${n0 + nF},"totalTokens":${tt0 + ttF}""" +
      buckets.fold("")(b => s""","buckets":$b""") + foldStampJson + "}")
  }

  /** Fold the per-[[upsert]] appended posting files into ~target-sized
    * ones ([[Compaction.compactDir]]) — the same scheduled maintenance as
    * [[MinHashIndex.compact]]: every upsert appends one file per touched
    * bucket, and a daily-ingest deployment would otherwise accumulate
    * files linear in batches ever ingested. Row-identical rewrite; on a
    * bucketed layout the hive partitioning is preserved (readers keep
    * pruning on `bucket=`) with a floor of one file per present bucket.
    * `df/` needs no pass — upsert shadow-rewrites it whole. Run between
    * ingests under the index's single-writer contract; see MAINTENANCE.md. */
  def compact(targetFileBytes: Long = 128L << 20, minFiles: Int = 8): (Int, Int) = {
    require(exists, s"index $name does not exist - build() it first")
    val buckets = metaFieldOpt(readMetaJson(), "buckets")
    Compaction.compactDir(spark, tfPath, targetFileBytes, minFiles,
      partitionBy = if (buckets.isDefined) Seq("bucket") else Nil)
  }

  /** Overwrite `target` with `rows` when the plan READS `target`: write a
    * shadow directory, then swap via two renames (self-overwrite would
    * either fail or corrupt the input mid-scan). Crash inside the swap can
    * leave the dir needing a manual rename — single-writer contract, and
    * `exists` is false for the whole window. Rename-atomicity caveat
    * centralized in MAINTENANCE.md. */
  private def overwriteViaShadow(target: Path, rows: DataFrame): Unit = {
    val shadow = new Path(base, target.getName + "_shadow")
    fs.delete(shadow, true)
    rows.write.mode(SaveMode.Overwrite).parquet(shadow.toString)
    val old = new Path(base, target.getName + "_old")
    fs.delete(old, true)
    require(fs.rename(target, old), s"could not stage old ${target.getName} of $name")
    require(fs.rename(shadow, target), s"could not swap new ${target.getName} of $name")
    fs.delete(old, true)
    ()
  }

  /** Top-`k` BM25 matches per query from the artifact. Same output
    * contract (and values) as [[graft.search.Bm25.search]]. On a bucketed
    * layout the posting scan is pruned to the shards the query terms hash
    * into (the query vocabulary is driver-collected — metadata-sized by
    * the small-query-batch contract, same precedent as IvfCollection's
    * probe-cell union — and becomes a LITERAL partition filter). */
  def query(
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = true,
      roundScoreTo: Option[Int] = None,
      outIdCol: String = "doc"): DataFrame = {
    require(exists, s"index $name does not exist - build() it first")
    val m = readMetaJson()
    requireFoldCurrent(m) // postings derive from folded token text
    val n = metaField(m, "n").toLong
    val avgdl = metaField(m, "totalTokens").toLong.toDouble / n
    val tfAll = spark.read.parquet(tfPath)
    val tfPruned = metaFieldOpt(m, "buckets").map(_.toInt) match {
      case Some(bk) =>
        val touched = queries
          .select(explode(array_distinct(TextAnalysis.tokens(col(queryTextCol)))).as("__t"))
          .distinct()
          .select(bucketOf(col("__t"), bk).as("bucket"))
          .distinct().collect().map(_.getInt(0)).toSeq
        tfAll.filter(col("bucket").isin(touched: _*))
      case None => tfAll // pre-bucketing artifact: full posting scan
    }
    val tf = tfPruned
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
