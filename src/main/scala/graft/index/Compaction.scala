package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/**
 * Small-file compaction for APPEND-ONLY parquet artifacts — the
 * maintenance half of the streaming-admission story. Every micro-batch
 * of [[graft.streaming.Streaming.admitStream]] / `cutStream` appends one
 * small file to its sink dir, and [[MinHashIndex.upsert]] appends one to
 * the signature table; at genuine scale that is the classic
 * file-explosion failure: per-batch listing cost grows linearly in
 * batches ever admitted, parquet row-group pruning degrades (thousands
 * of tiny row groups), and the NameNode/object-store metadata bill grows
 * without bound. Lakehouse formats solve it with scheduled OPTIMIZE /
 * rewrite jobs; this is the same job for the engine's plain-parquet
 * artifacts.
 *
 * One pass: list the data files, and if they are both numerous
 * (`minFiles`) and small on average (under `targetFileBytes`), rewrite
 * the dir to ~`totalBytes / targetFileBytes` files via a shadow
 * directory and a two-rename swap. NOT a streaming-state mutation — the
 * rewritten rows are byte-identical, so replay guards, indexes and
 * readers see the same table; only the file layout changes.
 *
 * Crash safety (single-writer contract, run BETWEEN batches — same
 * contract as every artifact mutation here): the swap stages
 * `dir → dir__old`, `shadow → dir`, `delete dir__old`, and every entry
 * point first HEALS a torn predecessor — `dir` missing with `dir__old`
 * present (crash between the renames) restores the old layout and
 * re-compacts; `dir__old` present alongside `dir` (crash before the
 * final delete) just drops the leftover. Re-running compact after any
 * crash therefore converges; a crash can never lose rows because the
 * original files are only deleted after the new layout is in place.
 *
 * The guarantee above assumes ATOMIC DIRECTORY RENAME — true on HDFS and
 * POSIX filesystems (the same assumption VectorCollection.compact and
 * SpanIndex's shadow swap already make). Raw object stores emulate
 * rename as copy+delete: a crash MID-rename can leave both dirs
 * partially populated, a state the heal protocol cannot distinguish
 * from a completed swap. Deployments on S3-class storage should run
 * compaction through a committer/table layer with atomic semantics
 * (or tolerate re-listing the union of both dirs during manual
 * recovery) — the standard caveat for every rename-based maintenance
 * job. MAINTENANCE.md at the repo root is the single operational
 * inventory of those jobs and the deployment guidance.
 */
object Compaction {

  /** Compact `dir` in place. Returns (filesBefore, filesAfter);
    * filesBefore == filesAfter means the pass was a no-op (below the
    * thresholds, or the dir does not exist). `partitionBy` must name the
    * dir's partition columns when it is hive-partitioned (e.g.
    * SpanIndex's `bucket`), so the rewrite preserves the layout readers
    * prune on. */
  def compactDir(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L << 20,
      minFiles: Int = 8,
      partitionBy: Seq[String] = Nil): (Int, Int) = {
    val path = new Path(dir)
    val old = new Path(dir + "__old")
    val shadow = new Path(dir + "__shadow")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // heal a torn swap from a crashed predecessor (see scaladoc)
    if (!fs.exists(path) && fs.exists(old))
      require(fs.rename(old, path), s"could not heal torn compaction of $dir")
    if (fs.exists(old)) fs.delete(old, true)
    fs.delete(shadow, true)
    if (!fs.exists(path)) return (0, 0)

    val files = listDataFiles(fs, path)
    val before = files.size
    if (before < minFiles) return (before, before)
    val totalBytes = files.map(_.getLen).sum
    val target = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (target >= before) return (before, before)
    // Partitioned layout: repartitioning by size alone would fan every
    // output task across every partition value (up to target × values
    // files — MORE than before, and a rewrite loop that never
    // converges). Hash on the partition columns instead, giving exactly
    // one file per present partition-value combo; once the dir is
    // already at that floor (combos counted from the listing — free),
    // further passes are no-ops.
    val combos = files.map(_.getPath.getParent.toString).distinct.size
    if (partitionBy.nonEmpty && before <= combos) return (before, before)

    val rows = spark.read.parquet(dir)
    val repart =
      if (partitionBy.nonEmpty)
        rows.repartition(target, partitionBy.map(org.apache.spark.sql.functions.col): _*)
      else rows.repartition(target)
    val w = repart.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(shadow.toString)
    require(fs.rename(path, old), s"could not stage old layout of $dir")
    require(fs.rename(shadow, path), s"could not swap compacted layout of $dir")
    // hidden SUBDIRECTORIES under the target (a '_'/'.'-prefixed dir a
    // caller nested here — e.g. a misplaced sidecar — or a crashed
    // write's `_temporary`) are invisible to the parquet read above, so
    // the rewrite would silently destroy them with `old`: carry them
    // into the new layout instead, byte-untouched — recursing through
    // non-hidden subdirs so a hidden dir nested inside a hive partition
    // dir (e.g. bucket=3/_temporary) is carried to the same relative
    // location, not destroyed with the regenerated partition dirs. Every
    // rename is require-checked: a failed carry must abort BEFORE the
    // recursive delete of `old`, or the carry silently destroys the exact
    // data it exists to preserve.
    def carryHidden(from: Path, to: Path): Unit =
      fs.listStatus(from).foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory) {
          if (n.startsWith("_") || n.startsWith(".")) {
            if (!fs.exists(to))
              require(fs.mkdirs(to), s"could not recreate $to for hidden-dir carry")
            require(fs.rename(s.getPath, new Path(to, n)),
              s"could not carry hidden dir ${s.getPath} into $to")
          } else carryHidden(s.getPath, new Path(to, n))
        }
      }
    carryHidden(old, path)
    fs.delete(old, true)
    (before, listDataFiles(fs, path).size)
  }

  /** Recursive data-file listing: skips `_SUCCESS`/dot files AND any
    * file under a hidden subdirectory (Spark's readers ignore those, so
    * they are not this dir's data and must not skew the size/count
    * triggers); descends into hive partition dirs. */
  private def listDataFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      path: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val base = fs.makeQualified(path).toString
    val it = fs.listFiles(path, true)
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toString.stripPrefix(base).stripPrefix("/")
      if (!rel.split('/').exists(c => c.startsWith("_") || c.startsWith(".")))
        out += f
    }
    out.result()
  }
}
