package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.DupSpans

/**
 * Persisted span-dedup index — build-once/query-many duplicated-span
 * removal, the span-level sibling of [[MinHashIndex]] (document near-dup)
 * and [[Bm25Index]] (lexical retrieval). [[DupSpans.cutDuplicatedSpans]]
 * recomputes the corpus-wide gram kernel inside every call; a pipeline
 * admitting many incoming batches against a stable reference corpus — the
 * 100 TB decontamination/dedup shape — should pay that kernel once and cut
 * each batch against the artifact.
 *
 * Layout: `<root>/<name>/grams/` (parquet: h, owner, n_docs — PARTITIONED
 * by `bucket` = xxhash64(h) mod `buckets`) + `_meta.json` (n, buckets —
 * pinned so a cut can never mix gram sizes with a mismatched artifact).
 * The partitioning is what makes the artifact an index rather than a
 * cached table: a foreign-batch cut joins on (bucket, h), so dynamic
 * partition pruning skips every shard the batch's grams don't hash into
 * (a batchIsIndexed cut necessarily reads all buckets — see [[cut]]).
 *
 * Two cut modes (see [[cut]]):
 *  - `batchIsIndexed = true` — the batch IS the indexed corpus
 *    (re-running dedup over the same data): ownership comes verbatim
 *    from the stored `n_docs >= 2` grams, and the result is identical by
 *    construction to the direct operator (`index_span_cut` shares
 *    `dedup_span_cut`'s oracle).
 *  - `batchIsIndexed = false` — a FOREIGN batch being admitted: a batch
 *    token is cut when its gram exists in the corpus at all (the corpus
 *    copy is already committed, so the corpus always owns it), or when
 *    the gram is duplicated WITHIN the batch (batch-min doc id owns it).
 *    Id spaces must be disjoint from the corpus for the ownership test
 *    to be meaningful — the caller's contract, same as every keyed
 *    upsert in this package.
 */
class SpanIndex(
    protected val spark: SparkSession,
    protected val root: String,
    val name: String) extends FsArtifact {
  private lazy val gramsPath = new Path(base, "grams").toString

  private def bucketOf(h: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(h), lit(buckets.toLong)).cast("int")

  def build(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, buckets: Int = 64): this.type = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    invalidateMeta()
    DupSpans.gramFrame(docs, idCol, textCol, n)
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as("owner"), countDistinct(col(idCol)).as("n_docs"))
      .select(col("__h").as("h"), col("owner"), col("n_docs"))
      .withColumn("bucket", bucketOf(col("h"), buckets))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(gramsPath)
    writeMetaJson(s"""{"n":$n,"buckets":$buckets$foldStampJson}""")
    this
  }

  /** Gram size the artifact was built with. */
  def n: Int = metaField(checkedMeta(), "n").toInt

  private def buckets: Int = metaField(checkedMeta(), "buckets").toInt

  /** Meta with the fold stamp enforced — grams derive from folded text. */
  private def checkedMeta(): String = {
    val m = readMetaJson()
    requireFoldCurrent(m)
    m
  }

  /** Admit a batch: merge its gram statistics into the stored table —
    * the step AFTER [[cut]] in an admission pipeline, so later batches
    * dedup against this one too. The merge is one batch-sized aggregate
    * full-outer-joined into the gram table (O(stored vocabulary), never a
    * corpus rescan): `n_docs` adds the batch's distinct-doc counts and
    * ownership keeps the stored owner when present (its copy is already
    * committed) — under the disjoint-and-higher-id batch contract this
    * equals the min-doc-id owner a full rebuild over the union would
    * pick, so an upserted index IS the rebuilt index (pinned in
    * SpanIndexSpec). Single-writer; `exists` is false for the whole
    * refresh window (FsArtifact protocol). */
  def upsert(batch: DataFrame, idCol: String, textCol: String): Unit = {
    require(exists, s"span index $name does not exist - build() it first")
    val m = checkedMeta()
    val nGram = metaField(m, "n").toInt
    val b = metaField(m, "buckets").toInt
    invalidateMeta()
    val delta = DupSpans.gramFrame(batch, idCol, textCol, nGram)
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as("__bowner"),
        countDistinct(col(idCol)).as("__bnd"))
    val merged = spark.read.parquet(gramsPath)
      .join(delta, col("h") === col("__h"), "full_outer")
      .select(
        coalesce(col("h"), col("__h")).as("h"),
        coalesce(col("owner"), col("__bowner")).as("owner"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("__bnd"), lit(0L)))
          .as("n_docs"))
      .withColumn("bucket", bucketOf(col("h"), b))
    overwriteViaShadow(new Path(gramsPath), merged, partitionBy = Some("bucket"))
    writeMetaJson(s"""{"n":$nGram,"buckets":$b$foldStampJson}""")
  }

  /** Shadow + two-rename swap; assumes atomic directory rename — caveat
    * and deployment guidance centralized in MAINTENANCE.md. */
  private def overwriteViaShadow(target: Path, rows: DataFrame,
      partitionBy: Option[String]): Unit = {
    val shadow = new Path(base, target.getName + "_shadow")
    fs.delete(shadow, true)
    val w = rows.write.mode(SaveMode.Overwrite)
    partitionBy.fold(w)(w.partitionBy(_)).parquet(shadow.toString)
    val old = new Path(base, target.getName + "_old")
    fs.delete(old, true)
    require(fs.rename(target, old), s"could not stage old ${target.getName} of $name")
    require(fs.rename(shadow, target), s"could not swap new ${target.getName} of $name")
    fs.delete(old, true)
    ()
  }

  /** Cut duplicated spans from `batch` against the indexed corpus; output
    * schema and semantics of [[DupSpans.cutDuplicatedSpans]]. */
  def cut(batch: DataFrame, idCol: String, textCol: String,
      batchIsIndexed: Boolean = false,
      preserveCase: Boolean = false): DataFrame = {
    require(exists, s"span index $name does not exist - build() it first")
    val nGram = n
    val b = buckets
    val grams = DupSpans.gramFrame(batch, idCol, textCol, nGram)
    val stored = spark.read.parquet(gramsPath)
    val owners =
      if (batchIsIndexed)
        // Ownership verbatim from the artifact: bit-identical to the
        // direct operator over the same corpus. This path reads ALL
        // buckets by design — the batch IS the indexed corpus, so its
        // grams hash into every shard and partition pruning has nothing
        // to skip (unlike the foreign path below, where a small batch
        // touches few buckets and the (bucket, h) join prunes the rest).
        stored.filter(col("n_docs") >= 2)
          .select(col("h").as("__h"), col("owner").as("__owner"))
      else {
        // Foreign batch: the corpus always owns grams it contains (its
        // copy is committed); batch-internal duplicates fall to the
        // batch-min doc. countDistinct makes within-doc repetition alone
        // non-duplicating, matching the direct operator's rule.
        val bstats = grams.groupBy(col("__h"))
          .agg(min(col(idCol)).as("__bowner"),
            countDistinct(col(idCol)).as("__bnd"))
        bstats
          .withColumn("bucket", bucketOf(col("__h"), b))
          .join(stored.withColumnRenamed("h", "__h"),
            Seq("bucket", "__h"), "left")
          .filter(col("n_docs").isNotNull || col("__bnd") >= 2)
          .select(col("__h"),
            coalesce(col("owner"), col("__bowner")).as("__owner"))
      }
    DupSpans.cutWithOwners(batch, idCol, textCol, nGram, grams, owners,
      preserveCase)
  }
}

object SpanIndex {
  def apply(spark: SparkSession, root: String, name: String): SpanIndex =
    new SpanIndex(spark, root, name)
}
