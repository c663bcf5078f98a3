package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet-backed vector collection — the engine's stand-in for the
 * reference's external vector store (collection create `main.py:60-65`,
 * existence check `main.py:59`, point upsert `bcb_utils.py:117-121`).
 *
 * Layout: `<root>/<name>/data/` (parquet, bucket-friendly) +
 * `<root>/<name>/_meta.json` (dim, metric, normalized flag — the knobs the
 * reference encodes in its collection name, `main.py:28-34`, kept as real
 * metadata instead of name-mangling).
 *
 * Idempotency: the reference skips ingest when the collection exists and
 * relies on deterministic UUID point ids for re-upload safety; here upsert
 * anti-joins new rows against existing ids so re-ingesting a batch is a
 * no-op (exactly-once by key, not by attempt). Note: read-then-append is
 * not atomic under CONCURRENT writers — single-writer-per-collection is
 * the supported contract (same as the reference's sequential ingest loop).
 *
 * Scale notes: all filesystem access goes through the Hadoop `FileSystem`
 * API resolved from the session's Hadoop conf, so the same code runs on
 * local disk, HDFS, or S3A. Data is plain parquet → any number of
 * executors can scan it with pushdown/pruning; the upsert anti-join
 * shuffles only on the id key and broadcast-flips automatically when one
 * side is small. For 100 TB collections the id anti-join is the one
 * full-shuffle op — partitioning `data/` by a stable id prefix (bucketing)
 * makes it a co-located join.
 */
final case class CollectionMeta(dim: Int, metric: String, normalized: Boolean)

class VectorCollection(
    protected val spark: SparkSession,
    protected val root: String,
    val name: String) extends FsArtifact {
  private lazy val dataPath = new Path(base, "data")

  def create(meta: CollectionMeta): this.type = {
    writeMetaJson(
      s"""{"dim":${meta.dim},"metric":"${meta.metric}","normalized":${meta.normalized}}""")
    this
  }

  def meta: CollectionMeta = {
    val s = readMetaJson()
    CollectionMeta(metaField(s, "dim").toInt, metaField(s, "metric"),
      metaField(s, "normalized").toBoolean)
  }

  /** Append rows whose `idCol` is not already present (idempotent by key).
    * One Spark job: the anti-join feeds the write directly — no pre-count.
    * Appending zero rows is a valid no-op write. */
  def upsert(df: DataFrame, idCol: String): Unit = {
    val fresh =
      if (!fs.exists(dataPath)) df
      else df.join(load().select(col(idCol)), Seq(idCol), "left_anti")
    fresh.write.mode(SaveMode.Append).parquet(dataPath.toString)
  }

  def load(): DataFrame = spark.read.parquet(dataPath.toString)

  /** Delete points matching `predicate` (the backend's delete-by-filter
    * API; pass `col(id).isin(...)` for delete-by-ids). Parquet is
    * immutable, so deletion rewrites the SURVIVORS — rows where the
    * predicate is not true (null-predicate rows survive, standard SQL
    * delete semantics) — into a shadow directory, then swaps it in and
    * drops the old data. At collection scale, batch deletes and prefer
    * predicates on partition-prunable columns; the swap is two renames,
    * so a crash inside it can leave the collection needing a manual
    * rename — acceptable under the documented single-writer contract
    * (same caveat as the reference's non-transactional ingest loop). */
  def delete(predicate: org.apache.spark.sql.Column): Unit =
    rewriteData(_.filter(coalesce(!predicate, lit(true))))

  /** Update payload columns for points matching `predicate` (the backend's
    * `set_payload` API): each assigned column takes its new value on
    * matching rows and keeps its old value elsewhere. Same survivor-
    * rewrite + swap as [[delete]]; assignments must target EXISTING
    * columns (adding columns would fork the schema for old rows). */
  def setPayload(predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Unit = {
    val existing = load().columns.toSet
    val unknown = assignments.keySet -- existing
    require(unknown.isEmpty, s"setPayload targets unknown columns: $unknown")
    rewriteData { df =>
      assignments.foldLeft(df) { case (acc, (name, value)) =>
        acc.withColumn(name, when(predicate, value).otherwise(col(name)))
      }
    }
  }

  /** Exact point count, optionally filtered (the backend's `count` API) —
    * the predicate pushes into the scan, so a filtered count reads only
    * the touched row groups' statistics and columns. */
  def count(filter: Option[org.apache.spark.sql.Column] = None): Long =
    filter.fold(load())(load().filter).count()

  /** Full-rewrite mutation: write the transformed collection into a shadow
    * directory, swap it in (two renames), drop the old data. A crash
    * inside the swap can leave the collection needing a manual rename —
    * acceptable under the documented single-writer contract. */
  private def rewriteData(transform: DataFrame => DataFrame): Unit = {
    if (!fs.exists(dataPath)) return
    val shadow = new Path(base, "data_shadow")
    fs.delete(shadow, true) // leftover from a crashed earlier rewrite
    transform(load())
      .write.mode(SaveMode.Overwrite).parquet(shadow.toString)
    val old = new Path(base, "data_old")
    fs.delete(old, true)
    require(fs.rename(dataPath, old), s"could not stage old data dir of $name")
    require(fs.rename(shadow, dataPath), s"could not swap new data dir of $name")
    fs.delete(old, true)
    ()
  }

  /** Keyset-paginated point listing (the backend's `scroll` API): the
    * first `limit` rows with `idCol` strictly greater than `after`,
    * optionally `filter`-restricted, ordered by id — the page's last id is
    * the next page's `after`. Keyset instead of OFFSET by design: OFFSET m
    * re-scans and discards m rows per page (a full scroll goes quadratic
    * at collection scale), while the id predicate and the filter both push
    * into the parquet scan and each page plans as one TakeOrdered over the
    * qualifying remainder — per-page cost is O(qualifying rows) with
    * row-group skipping, independent of scroll position. */
  def scroll(idCol: String, limit: Int, after: Option[Any] = None,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val base = load()
    val fromKey = after.fold(base)(a => base.filter(col(idCol) > lit(a)))
    filter.fold(fromKey)(fromKey.filter)
      .orderBy(col(idCol))
      .limit(limit)
  }
}

object VectorCollection {
  def apply(spark: SparkSession, root: String, name: String): VectorCollection =
    new VectorCollection(spark, root, name)

  /** Create (or open) a collection for `(dataset, model)` with the dim
    * DERIVED from the model registry — the reference's `setup_qdrant`
    * shape (`main.py:59-65` + `draft.py:1-2`: name from
    * dataset/model/normalized, size from the encoder), so callers never
    * hand-pass a dim that can drift from the embedder actually used.
    * Idempotent: an existing collection is returned as-is after a
    * dim check (a registry/meta mismatch is a corrupt pairing — fail). */
  def createFor(spark: SparkSession, root: String, dataset: String,
      model: String, normalized: Boolean,
      metric: String = "cosine"): VectorCollection = {
    val spec = graft.embed.EmbedderRegistry(model)
    val c = new VectorCollection(spark, root,
      CollectionNaming.collectionName(dataset, model, normalized))
    if (!c.exists) c.create(CollectionMeta(spec.dim, metric, normalized))
    else require(c.meta.dim == spec.dim,
      s"collection ${c.name} has dim ${c.meta.dim} but model $model embeds " +
        s"at ${spec.dim} — refusing to mix")
    c
  }
}
