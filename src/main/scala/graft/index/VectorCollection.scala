package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

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
 * no-op (exactly-once by key, not by attempt).
 *
 * Scale notes: data is plain parquet → any number of executors can scan it
 * with pushdown/pruning; the upsert anti-join shuffles only on the id key
 * and broadcast-flips automatically when one side is small. For 100 TB
 * collections the id anti-join is the one full-shuffle op — partitioning
 * `data/` by a stable id prefix (bucketing) makes it a co-located join.
 */
final case class CollectionMeta(dim: Int, metric: String, normalized: Boolean)

class VectorCollection(spark: SparkSession, root: String, val name: String) {
  private val base = s"$root/$name"
  private val dataPath = s"$base/data"
  private val metaPath = s"$base/_meta.json"

  def exists: Boolean = Files.exists(Paths.get(metaPath))

  def create(meta: CollectionMeta): this.type = {
    Files.createDirectories(Paths.get(base))
    val json =
      s"""{"dim":${meta.dim},"metric":"${meta.metric}","normalized":${meta.normalized}}"""
    Files.write(Paths.get(metaPath), json.getBytes(StandardCharsets.UTF_8))
    this
  }

  def meta: CollectionMeta = {
    val s = new String(Files.readAllBytes(Paths.get(metaPath)), StandardCharsets.UTF_8)
    def field(k: String): String =
      s.split(s""""$k":""")(1).split("[,}]")(0).trim.stripPrefix("\"").stripSuffix("\"")
    CollectionMeta(field("dim").toInt, field("metric"), field("normalized").toBoolean)
  }

  /** Append rows whose `idCol` is not already present (idempotent by key). */
  def upsert(df: DataFrame, idCol: String): Long = {
    val fresh =
      if (!Files.exists(Paths.get(dataPath))) df
      else df.join(load().select(col(idCol)), Seq(idCol), "left_anti")
    val n = fresh.count()
    if (n > 0) fresh.write.mode(SaveMode.Append).parquet(dataPath)
    n
  }

  def load(): DataFrame = spark.read.parquet(dataPath)

  def drop(): Unit = {
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(rm(_))
      Files.deleteIfExists(p)
    }
    rm(Paths.get(base))
  }
}

object VectorCollection {
  def apply(spark: SparkSession, root: String, name: String): VectorCollection =
    new VectorCollection(spark, root, name)
}
