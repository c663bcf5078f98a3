package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Shared filesystem plumbing for persisted artifacts (vector collections,
 * signature indexes): `<root>/<name>` layout, Hadoop `FileSystem`
 * resolution from the session conf (same code on local disk, HDFS, S3A),
 * and the `_meta.json` lifecycle.
 *
 * Build protocol: implementations call [[invalidateMeta]] BEFORE
 * overwriting data files and [[writeMetaJson]] AFTER — so `exists` is
 * false for the whole rebuild window and a crash mid-build can't leave an
 * artifact that looks readable but pairs old metadata with new data.
 */
private[index] trait FsArtifact {
  protected def spark: SparkSession
  protected def root: String
  def name: String

  protected final lazy val base = new Path(s"$root/$name")
  private lazy val metaPath = new Path(base, "_meta.json")

  protected final def fs: FileSystem =
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  final def exists: Boolean = fs.exists(metaPath)

  /** Drop the meta marker before touching data files (rebuild window). */
  protected final def invalidateMeta(): Unit = {
    fs.delete(metaPath, false)
    ()
  }

  protected final def writeMetaJson(json: String): Unit = {
    fs.mkdirs(base)
    val out = fs.create(metaPath, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  protected final def readMetaJson(): String = {
    val in = fs.open(metaPath)
    try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Field extractor for the flat one-object meta JSON artifacts write
    * (a real tokenizer, [[FlatJson]] — quoted commas/braces in values
    * parse correctly). */
  protected final def metaField(json: String, k: String): String =
    FlatJson.parse(json).getOrElse(k,
      throw new IllegalArgumentException(s"$name: meta has no field '$k': $json"))

  /** Like [[metaField]] but None when the field is absent — for fields
    * added after artifacts of this kind already existed on disk. */
  protected final def metaFieldOpt(json: String, k: String): Option[String] =
    FlatJson.parse(json).get(k)

  /** The `"fold"` meta stamp for TEXT-KEY artifacts (signatures, grams,
    * postings all derive from the canonical fold): the JSON fragment to
    * append at write, the loud check at read, and the silent-currency
    * probe the engine's own tmpdir caches use to rebuild instead of
    * refuse. An ABSENT stamp means a pre-versioning artifact built under
    * Spark's full-mapping lower() — incompatible by construction. */
  protected final def foldStampJson: String =
    s""","fold":"${graft.expr.SimpleCaseFold.Version}""""

  protected final def requireFoldCurrent(json: String): Unit = {
    val got = metaFieldOpt(json, "fold")
    require(got.contains(graft.expr.SimpleCaseFold.Version),
      s"$name: artifact was built under canonical fold " +
        s"${got.getOrElse("<pre-versioning full-mapping lower()>")} but this " +
        s"engine folds with ${graft.expr.SimpleCaseFold.Version} — its text " +
        "keys would silently disagree on İ/Σ-class characters; rebuild the " +
        "artifact (rebuildIfStale(...) does this in place)")
  }

  /** Migration path for USER-OWNED artifacts hitting the
    * [[requireFoldCurrent]] refusal (the engine's own tmpdir caches
    * auto-rebuild via [[foldCurrent]]; user artifacts should opt in
    * explicitly): when the artifact is absent or carries a stale fold
    * stamp, run `build` — the caller's own `build(...)` invocation, which
    * the FsArtifact build protocol (invalidate → write data → stamp meta)
    * makes crash-safe — and return true. A current artifact is left
    * untouched (false). The closure must rebuild THIS artifact; a closure
    * that doesn't restamp it is a caller bug and fails loudly rather than
    * leaving the stale artifact to refuse again later. Only meaningful for
    * FOLD-STAMPED artifacts (MinHashIndex, SpanIndex, Bm25Index) — an
    * un-stamped artifact kind (vector collections) reads as never-current
    * and would rebuild every call. */
  final def rebuildIfStale(build: => Unit): Boolean =
    if (foldCurrent) false
    else {
      build
      require(foldCurrent,
        s"$name: the rebuildIfStale closure ran but the artifact still is " +
          "not current — it must invoke this artifact's own build(...)")
      true
    }

  /** True iff the artifact exists AND was built under the current fold —
    * the rebuild predicate for engine-owned caches. */
  final def foldCurrent: Boolean =
    exists && metaFieldOpt(readMetaJson(), "fold")
      .contains(graft.expr.SimpleCaseFold.Version)

  def drop(): Unit = {
    fs.delete(base, true)
    ()
  }
}
