package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Collection aliases (the vector-backend alias API: `update_aliases` /
 * `get_aliases`): a stable indirection name that can be atomically
 * repointed at a different collection — the standard blue/green pattern
 * for reindexing (build `docs_v2`, repoint alias `docs`, drop `docs_v1`)
 * without touching readers.
 *
 * Registry: one JSON object at `<root>/_aliases.json` (alias →
 * collection name), rewritten whole on every change — it is aliases-
 * sized (handfuls of entries by contract), so the rewrite is metadata
 * I/O, never data I/O. Same single-writer contract as the collections
 * themselves. Names are restricted to path-safe tokens so the registry
 * needs no escaping and an alias can never smuggle a path.
 *
 * Resolution rules (the backend's): an alias may not shadow an existing
 * collection name (ambiguous reads), and setting an alias to a missing
 * collection fails loudly — a dangling alias is a silent 404 later.
 */
object Aliases {
  private val Token = "^[A-Za-z0-9._-]+$".r

  private def requireToken(kind: String, s: String): Unit =
    require(Token.findFirstIn(s).isDefined,
      s"$kind must match [A-Za-z0-9._-]+, got '$s'")

  private def regPath(root: String) = new Path(s"$root/_aliases.json")

  private def fs(spark: SparkSession, root: String) =
    regPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All aliases under `root`, alias → collection name. */
  def list(spark: SparkSession, root: String): Map[String, String] = {
    val p = regPath(root)
    val f = fs(spark, root)
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // registry is machine-written: flat {"a":"b",...} of token-safe
      // names, so a token-level parse is exact
      "\"([A-Za-z0-9._-]+)\"\\s*:\\s*\"([A-Za-z0-9._-]+)\"".r
        .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
    }
  }

  private def write(spark: SparkSession, root: String,
      entries: Map[String, String]): Unit = {
    val json = entries.toSeq.sorted
      .map { case (a, c) => s""""$a":"$c"""" }
      .mkString("{", ",", "}")
    val f = fs(spark, root)
    // Write-then-rename so a concurrent reader never observes a TRUNCATED
    // registry. Atomicity of the final swap is filesystem-dependent: HDFS
    // renames atomically; for file:// URIs Hadoop's FileContext falls back
    // to delete-then-rename, so go through java.nio ATOMIC_MOVE there. A
    // reader can thus see old bytes or new bytes, never a partial file.
    val tmp = new org.apache.hadoop.fs.Path(
      regPath(root).getParent, s"._aliases.json.tmp-${java.util.UUID.randomUUID}")
    var renamed = false
    try {
      if ("file" == f.getUri.getScheme) {
        // The whole file:// path stays in java.nio: writing the temp file
        // through f.create would go through Hadoop's ChecksumFileSystem,
        // whose .crc sidecar the nio move below would orphan on EVERY
        // successful write — and a stale ._aliases.json.crc left by any
        // earlier checksummed-FS write makes every subsequent f.open throw
        // ChecksumException. So: nio write, drop any stale destination
        // sidecar, nio atomic move.
        val dst = java.nio.file.Paths.get(regPath(root).toUri.getPath)
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp.toUri.getPath),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.deleteIfExists(
          dst.resolveSibling("." + dst.getFileName.toString + ".crc"))
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp.toUri.getPath), dst,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } else {
        val out = f.create(tmp, true)
        try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        org.apache.hadoop.fs.FileContext
          .getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
          .rename(tmp, regPath(root), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
      renamed = true
    } finally {
      // A failed write or rename must not leak the UUID-named temp file —
      // repeated failures would accumulate garbage in the registry root.
      // (f.delete on a ChecksumFileSystem also removes the .crc sidecar.)
      if (!renamed) {
        try f.delete(tmp, false)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  /** Point `alias` at `collection` (create or atomically repoint). */
  def set(spark: SparkSession, root: String, alias: String,
      collection: String): Unit = {
    requireToken("alias", alias)
    requireToken("collection", collection)
    require(VectorCollection(spark, root, collection).exists,
      s"alias '$alias' would dangle: collection '$collection' does not exist under $root")
    require(!VectorCollection(spark, root, alias).exists,
      s"alias '$alias' would shadow an existing collection of the same name")
    write(spark, root, list(spark, root) + (alias -> collection))
  }

  /** Remove `alias`; removing an absent alias fails loudly. */
  def remove(spark: SparkSession, root: String, alias: String): Unit = {
    val cur = list(spark, root)
    require(cur.contains(alias), s"alias '$alias' does not exist under $root")
    write(spark, root, cur - alias)
  }

  /** Resolve a name that may be an alias: aliases win only for names
    * that are not themselves collections (set() forbids creating that
    * ambiguity, but a collection created AFTER the alias must keep
    * winning for reads to stay stable). */
  def resolve(spark: SparkSession, root: String, nameOrAlias: String): String =
    if (VectorCollection(spark, root, nameOrAlias).exists) nameOrAlias
    else list(spark, root).getOrElse(nameOrAlias, nameOrAlias)
}
