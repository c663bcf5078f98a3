package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/**
 * Persisted MinHash signature index — the build-once/query-many artifact
 * for near-duplicate work over a stable corpus. [[Dedup.minHashNearDups]]
 * recomputes the shingle+MinHash kernel inside every call (cached for the
 * call's lifetime); a pipeline that runs MANY near-dup queries — different
 * thresholds, repeated cluster refreshes, incremental batches — should pay
 * the kernel once and query the artifact, exactly like [[IvfCollection]]
 * amortizes centroid assignment.
 *
 * Layout: `<root>/<name>/sig/` (parquet: id, sig array<long>) +
 * `<root>/<name>/_meta.json` (n, numHashes, bands — pinned so queries can
 * never mix parameters with a mismatched artifact). Band keys are NOT
 * stored: they derive from the stored signature with builtin column ops
 * (slice + xxhash64 — trivial next to the text kernel the artifact
 * amortizes), halving storage.
 *
 * Docs with fewer than n tokens have no shingles and can never pass an
 * exact-Jaccard verify; they are excluded at build time (their sentinel
 * signatures would otherwise all collide and estimate-match each other).
 *
 * Verification is by SIGNATURE ESTIMATE (agreement fraction,
 * ±≈sqrt(j(1−j)/numHashes)): the artifact deliberately does not carry the
 * text. Pipelines needing exact-Jaccard confirmation re-join the candidate
 * ids to the corpus and use [[Dedup.jaccard]] — candidates are tiny, so
 * that join is cheap.
 */
final case class MinHashIndexMeta(n: Int, numHashes: Int, bands: Int)

class MinHashIndex(spark: SparkSession, root: String, val name: String) {
  private val base = new Path(s"$root/$name")
  private val sigPath = new Path(base, "sig")
  private val metaPath = new Path(base, "_meta.json")

  private def fs: FileSystem =
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(metaPath)

  def build(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32): this.type = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val sh = Dedup.shingles(col(textCol), n)
    df.select(col(idCol).as("id"), Dedup.minHashSignature(sh, numHashes).as("sig"))
      .where(size(sh) > 0)
      .write.mode(SaveMode.Overwrite).parquet(sigPath.toString)
    val json = s"""{"n":$n,"numHashes":$numHashes,"bands":$bands}"""
    val out = fs.create(metaPath, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    this
  }

  def meta: MinHashIndexMeta = {
    val in = fs.open(metaPath)
    val s =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      finally in.close()
    def field(k: String): String = s.split(s""""$k":""")(1).split("[,}]")(0).trim
    MinHashIndexMeta(field("n").toInt, field("numHashes").toInt, field("bands").toInt)
  }

  /** (id, sig) as stored. */
  def signatures(): DataFrame = spark.read.parquet(sigPath.toString)

  /** (id, band) — one salted 64-bit key per band, derived from the stored
    * signature (slice + xxhash64; band index salts the key so bands can't
    * collide across positions). */
  def bandTable(): DataFrame = {
    val m = meta
    val rows = m.numHashes / m.bands
    val keys = array((0 until m.bands).map { b =>
      xxhash64(lit(b) +: (0 until rows).map(i =>
        element_at(col("sig"), b * rows + i + 1)): _*)
    }: _*)
    signatures().select(col("id"), explode(keys).as("band"))
  }

  /**
   * Near-duplicate pairs from the artifact alone: LSH band candidates
   * (skew-capped like [[Dedup.minHashNearDups]]) verified by signature
   * estimate. @return (id_a, id_b, jaccard_est) with id_a < id_b.
   */
  def nearDupPairs(threshold: Double, maxBucketSize: Int = 10000): DataFrame = {
    val bands = bandTable()
    val oversized = bands.groupBy(col("band")).count()
      .filter(col("count") > maxBucketSize).select(col("band"))
    val capped = bands.join(broadcast(oversized), Seq("band"), "left_anti")
    val cand = capped.as("l")
      .join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val sa = signatures().select(col("id").as("id_a"), col("sig").as("__sa"))
    val sb = signatures().select(col("id").as("id_b"), col("sig").as("__sb"))
    cand.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("jaccard_est", Dedup.minHashEstimate(col("__sa"), col("__sb")))
      .filter(col("jaccard_est") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard_est"))
  }

  def drop(): Unit = {
    fs.delete(base, true)
    ()
  }
}

object MinHashIndex {
  def apply(spark: SparkSession, root: String, name: String): MinHashIndex =
    new MinHashIndex(spark, root, name)
}
