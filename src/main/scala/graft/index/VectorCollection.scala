package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
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

class VectorCollection(spark: SparkSession, root: String, val name: String) {
  private val base = new Path(s"$root/$name")
  private val dataPath = new Path(base, "data")
  private val metaPath = new Path(base, "_meta.json")

  /** FileSystem for this collection's scheme (local/HDFS/S3A), from the
    * session's Hadoop configuration. */
  private def fs: FileSystem =
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(metaPath)

  def create(meta: CollectionMeta): this.type = {
    fs.mkdirs(base)
    val json =
      s"""{"dim":${meta.dim},"metric":"${meta.metric}","normalized":${meta.normalized}}"""
    val out = fs.create(metaPath, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    this
  }

  def meta: CollectionMeta = {
    val in = fs.open(metaPath)
    val s =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      finally in.close()
    def field(k: String): String =
      s.split(s""""$k":""")(1).split("[,}]")(0).trim.stripPrefix("\"").stripSuffix("\"")
    CollectionMeta(field("dim").toInt, field("metric"), field("normalized").toBoolean)
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

  def drop(): Unit = {
    fs.delete(base, true)
    ()
  }
}

object VectorCollection {
  def apply(spark: SparkSession, root: String, name: String): VectorCollection =
    new VectorCollection(spark, root, name)
}
