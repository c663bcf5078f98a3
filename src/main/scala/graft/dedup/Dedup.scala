package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Document deduplication for large-scale corpus curation: exact, n-gram
 * Jaccard, and MinHash+LSH near-dup. All operators are declarative DataFrame
 * plans (codegen'd higher-order functions, no UDFs in the hot path).
 *
 * Scale design:
 *  - exact: one hash-aggregate shuffle on a 128-bit digest — the digest is
 *    computed map-side so the shuffle carries 16 bytes + id per row, not the
 *    document text.
 *  - MinHash+LSH: signatures are computed map-side (k hash passes over the
 *    shingle array); candidate generation shuffles once on (band, bandHash)
 *    — never all-pairs. The exact-Jaccard verify runs only on candidates.
 *    This is the standard sub-quadratic near-dup pipeline; at 100 TB the
 *    band-bucket join is the only shuffle and bucket skew (e.g. boilerplate
 *    docs) is handled by AQE skew-join or dropping oversized buckets.
 *  - all-pairs n-gram Jaccard is provided for oracle-checking and small
 *    sets only; the LSH path is the production path.
 *
 * Eager results: the near-dup/cluster operators return frames materialized
 * via `localCheckpoint` (executor-local blocks) by default. Caveat for
 * clusters with dynamic allocation or preemption: local checkpoint blocks
 * die with their executor and are NOT recomputable (lineage is cut) — on
 * such clusters set `spark.graft.checkpointDir` to a directory on a
 * fault-tolerant filesystem (HDFS/S3A) and every mined-pair output and
 * CC round state materializes as parquet there instead (write +
 * read-back), surviving any executor loss. See [[CheckpointDirConf]].
 */
object Dedup {

  /** Session conf key for the DURABLE eager-materialization mode: when set
    * (non-empty), [[eagerPairs]] outputs and the connected-components
    * round state are written as parquet under this directory and read
    * back, instead of `localCheckpoint`'s executor-local blocks. Flip it
    * on clusters with dynamic allocation or preemptible/spot executors —
    * there a lost executor destroys local-checkpoint blocks that are NOT
    * recomputable (lineage is cut) and kills a multi-hour dedup job,
    * while durable parquet rounds survive any executor loss and even let
    * failed STAGES recompute from the last round's files. Cost: each
    * materialization becomes a filesystem write + read-back rather than
    * local block writes, and the CC convergence check becomes one extra
    * scan of the round's skinny (id, comp, prev) parquet per round
    * (the observe-metric ride-along needs the materializing action to run
    * through the frame's own QueryExecution, which a parquet write does
    * not).
    *
    * Lifecycle: superseded CC rounds are deleted as the loop advances;
    * operator-internal frames ([[eagerTracked]]) are freed by
    * [[releaseTracked]] at sweep boundaries; FINAL outputs (the returned
    * pair/label frames) keep their backing files for the caller's
    * lifetime — release them via [[releaseEager]], or sweep this JVM's
    * leftovers with [[cleanCheckpoints]] between runs (the same contract
    * as `sparkContext.setCheckpointDir`, made callable). Concurrent runs
    * MAY share a directory: every dir name embeds its application's tag
    * (`graft_ckpt_<app>_...`), so each run's sweep claims only its own
    * JVM's dirs unless explicitly widened. */
  val CheckpointDirConf = "spark.graft.checkpointDir"

  private def durableRoot(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption(CheckpointDirConf)
      .map(_.trim).filter(_.nonEmpty)

  /** The applicationId reduced to a filename-safe tag — embedded in every
    * durable dir name so ownership is recoverable from the DIRECTORY
    * LISTING alone: [[cleanCheckpoints]] must be able to tell this JVM's
    * dirs from a concurrent run's over a shared root, and JVM-local
    * registries cannot see the other JVM. `_` maps to `-` so the tag
    * never collides with the `_`-separated name fields. */
  private def tagOf(applicationId: String): String =
    applicationId.replaceAll("[^A-Za-z0-9-]", "-")
  private def appTag(spark: org.apache.spark.sql.SparkSession): String =
    tagOf(spark.sparkContext.applicationId)

  /** Durable dir-name prefix for THIS session's writes:
    * `graft_ckpt_<appTag>_`. The `graft_ckpt_` namespace is deliberately
    * narrower than `graft_` — the repo's own fixture caches and probe
    * work dirs (`graft_scale_*`, `graft_admit_probe*`) may legitimately
    * live under the same root (e.g. both defaulted to the tmp dir), and
    * a checkpoint sweep must never claim them. */
  private[graft] def durableDirPrefix(
      spark: org.apache.spark.sql.SparkSession): String =
    s"graft_ckpt_${appTag(spark)}_"

  /** Durable-backed frame → its backing dir, so [[releaseEager]] can
    * delete exactly the files behind a superseded round. Weak keys: a
    * frame the driver dropped without releasing stays GC-collectable and
    * its (tiny) entry is pruned by the map itself; its files follow the
    * documented clean-the-directory-between-runs contract (made callable
    * by [[cleanCheckpoints]]). */
  private val durableBacking =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[DataFrame, String]())

  /** Qualified `<root>/graft_ckpt_` prefix — the namespace every durable
    * dir this module writes lives under, in the filesystem's own URI form
    * so it compares equal to `HadoopFsRelation.rootPaths`. App-agnostic
    * on purpose: the plan walk in [[releaseEager]] matches dirs a frame's
    * plan actually REFERENCES, which is ownership enough. */
  private def qualifiedPrefix(
      spark: org.apache.spark.sql.SparkSession, root: String): String = {
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(rp).toString.stripSuffix("/") + "/graft_ckpt_"
  }

  /** Every (applicationId, qualified `<root>/graft_ckpt_` prefix) a
    * [[writeReadBack]] of this JVM actually wrote to — captured at WRITE
    * time, so [[releaseEager]]'s derived-frame plan walk and
    * [[cleanCheckpoints]] keep working even if the session conf is unset
    * or re-pointed between materialization and release (a mid-sweep
    * reconfigure would otherwise silently skip the cleanup and leak the
    * backing dirs). Entries for STOPPED applications are kept —
    * [[cleanCheckpoints]] uses them to sweep a previous session's
    * leftovers. Bounded: one entry per distinct configured root per
    * application. */
  private val writtenRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Dir NAMES with a parquet write in flight: registered BEFORE the
    * write starts, dropped once the read-back frame is in
    * [[durableBacking]] — so a concurrently-invoked [[cleanCheckpoints]]
    * (itself a boundary-contract violation, but one that must stay
    * recoverable) can never delete a directory between its write and its
    * registration. */
  private val pendingWrites =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** This app's write-time qualified `<root>/graft_ckpt_` prefixes, plus
    * the session's CURRENT conf root if set — the one definition of
    * "roots to search" shared by [[releaseEager]]'s plan walk and
    * [[cleanCheckpoints]]. */
  private def knownPrefixes(
      spark: org.apache.spark.sql.SparkSession,
      onlyApp: Option[String]): Set[String] = {
    val b = Set.newBuilder[String]
    val it = writtenRoots.iterator()
    while (it.hasNext) {
      val (a, p) = it.next()
      if (onlyApp.forall(_ == a)) b += p
    }
    spark.conf.getOption(CheckpointDirConf).map(_.trim).filter(_.nonEmpty)
      .foreach(r => b += qualifiedPrefix(spark, r))
    b.result()
  }

  /** Operator-INTERNAL durable materializations ([[eagerTracked]]):
    * (applicationId, backing dir, weak ref to the frame). The durable twin
    * of [[org.apache.spark.sql.GraftInternal.trackLocalCheckpoint]]'s
    * registry — drained by [[releaseTracked]] at the caller's
    * nothing-in-flight boundaries. Frame refs are weak so
    * [[cleanCheckpoints]] can tell live from abandoned, but an entry is
    * NEVER dropped on GC alone: it carries the deletion duty for its
    * parquet dir until [[releaseTracked]] deletes the dir and retires the
    * entry (current-app entries under the caller's boundary guarantee;
    * stopped-app entries because their frames are dead by construction).
    * Bounded by undeleted dirs — the real resource. */
  private[dedup] val trackedDurable =
    new java.util.concurrent.ConcurrentLinkedQueue[
      (String, String, java.lang.ref.WeakReference[DataFrame])]()

  /** Write `df` as parquet under the durable checkpoint root and read it
    * back — the fault-tolerant replacement for `localCheckpoint`. The
    * write IS the materializing action; the returned frame's lineage
    * roots at the parquet files, so downstream stages can recompute from
    * them after any executor loss. */
  private def writeReadBack(df: DataFrame, root: String, what: String): DataFrame = {
    val spark = df.sparkSession
    val name = s"${durableDirPrefix(spark)}${what}_${java.util.UUID.randomUUID()}"
    val path = s"${root.stripSuffix("/")}/$name"
    pendingWrites.add(name)
    try {
      df.write.mode("overwrite").parquet(path)
      val back = spark.read.parquet(path)
      durableBacking.put(back, path)
      writtenRoots.add((spark.sparkContext.applicationId,
        qualifiedPrefix(spark, root)))
      back
    } finally {
      pendingWrites.remove(name); ()
    }
  }

  /** The one deletion point for a durable backing dir. */
  private def deleteDir(
      hconf: org.apache.hadoop.conf.Configuration, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(hconf).delete(p, true)
    ()
  }

  /** Release an eagerly-materialized frame: durable-backed → delete its
    * parquet dir(s); local-checkpoint-backed → unpersist its executor
    * blocks. The single release point for both modes, so iterative
    * operators and cache evictors free superseded state without knowing
    * which mode ran.
    *
    * Durable backing is found two ways: the exact frame instance
    * [[writeReadBack]] returned (registry fast path), or — for DERIVED
    * frames (a projection over the materialized result, the shape cache
    * evictors hold) — by walking the analyzed plan for parquet relations
    * rooted under the session's checkpoint dir, deleting only this
    * module's own `graft_*` subdirectories. Caller contract is the same
    * as unpersist: every durable dir referenced by `df`'s plan is
    * released, so don't pass a frame whose backing another live consumer
    * still needs. */
  private[graft] def releaseEager(df: DataFrame): Unit = {
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    Option(durableBacking.remove(df)) match {
      case Some(path) => deleteDir(hconf, path)
      case None =>
        // Backing roots come from WRITE-time state ([[writtenRoots]]), not
        // only the conf value at release time: an unset or re-pointed
        // spark.graft.checkpointDir between materialization and eviction
        // must not skip the plan walk and leak the dirs. The current conf
        // root rides along for frames written by another JVM's run over a
        // shared directory.
        val prefixes = knownPrefixes(df.sparkSession,
          Some(df.sparkSession.sparkContext.applicationId))
        if (prefixes.nonEmpty) df.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(_.toString)
                  .filter(p => prefixes.exists(p.startsWith))
                  .foreach(deleteDir(hconf, _))
              case _ => ()
            }
          case _ => ()
        }
        // blocks too: a frame may mix modes across a session reconfigure
        org.apache.spark.sql.GraftInternal.unpersistLocalCheckpoint(df)
    }
  }

  /** Best-effort release for a frame whose owning application has
    * STOPPED — the cache-prune hook ([[graft.SparkEntry.pruneStaleApps]]):
    * a session-cycling JVM must not leak the pruned entries' durable
    * backing dirs until someone happens to call [[cleanCheckpoints]].
    * Only the durable side needs freeing (the dead frame's checkpoint
    * blocks died with its context), and the filesystem is reached
    * through the LIVE session's Hadoop conf, not the dead frame's.
    * Never throws: a dead-context plan that resists walking just falls
    * back to the operational sweep. */
  private[graft] def releaseStale(
      df: DataFrame, spark: org.apache.spark.sql.SparkSession): Unit =
    try {
      val hconf = spark.sparkContext.hadoopConfiguration
      Option(durableBacking.remove(df)) match {
        case Some(path) => deleteDir(hconf, path)
        case None =>
          // all roots any session of this JVM wrote — the frame's own
          // app is stopped, so its root may differ from the current conf
          val prefixes = knownPrefixes(spark, None)
          if (prefixes.nonEmpty) df.queryExecution.analyzed.foreach {
            case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              lr.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toString)
                    .filter(p => prefixes.exists(p.startsWith))
                    .foreach(deleteDir(hconf, _))
                case _ => ()
              }
            case _ => ()
          }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Eager materialization for OUTPUT-SIZED result frames outside the
    * pair miners (e.g. a pipeline's scored top-k feeding several
    * consumers): default = plain `localCheckpoint` (the frame is small
    * and short-lived, the default storage level is right), durable mode
    * ([[CheckpointDirConf]]) = the same parquet write + read-back as
    * every miner — an eager result on a preemptible cluster must not be
    * the one lineage-cut block set that kills the job. */
  private[graft] def eagerResult(df: DataFrame, what: String): DataFrame =
    durableRoot(df) match {
      case Some(root) => writeReadBack(df, root, what)
      case None => df.localCheckpoint(true)
    }

  /** Eager materialization for MINED PAIR outputs: one `localCheckpoint`
    * pass straight to DISK_ONLY blocks. Pair sets are OUTPUT-sized —
    * quadratic in the duplication factor in the worst case — and the
    * caller typically holds the frame across downstream stages, so a
    * blown-up pair set kept at the default MEMORY_AND_DISK level pins the
    * unified pool's PROTECTED storage floor for exactly as long as the
    * connected-components aggregate downstream needs that memory for
    * execution (the measured factor-300 cliff, BENCH_SCALE.md r17).
    * DISK_ONLY unconditionally: the write is a single sequential pass
    * either way (a memory-first checkpoint that is later demoted pays the
    * materialization TWICE and thrashes the store while multi-hundred-MB
    * partitions evict each other — measured at factor 300,
    * BENCH_SCALE.md r18), small outputs cost ~tens of ms of local block
    * writes, and consumers scan a pair set a handful of times, so
    * sequential local-disk reads are noise next to the shuffles they
    * feed.
    *
    * With [[CheckpointDirConf]] set, the materialization is a parquet
    * write + read-back under that directory instead — same eager
    * semantics, identical rows, but the blocks survive executor loss
    * (preemptible-cluster mode; see the conf's scaladoc for lifecycle). */
  private[graft] def eagerPairs(df: DataFrame): DataFrame = durableRoot(df) match {
    case Some(root) => writeReadBack(df, root, "pairs")
    case None => df.localCheckpoint(true, StorageLevel.DISK_ONLY)
  }

  /** Eager materialization for operator-INTERNAL frames that can be
    * CORPUS-scale (DupSpans' gram-count and positioned-gram streams,
    * Selection's narrow base): default = the tracked `localCheckpoint`
    * discipline ([[org.apache.spark.sql.GraftInternal.trackLocalCheckpoint]]
    * — scoped release at sweep boundaries instead of waiting on driver
    * GC); durable mode ([[CheckpointDirConf]]) = the same parquet
    * write + read-back as every miner, registered for the SAME scoped
    * release via [[releaseTracked]]. These frames were the last
    * corpus-sized lineage-cut block sets outside the dedup family — a
    * span-dedup job on a preemptible fleet died exactly the way CC used
    * to before the durable mode covered it. */
  private[graft] def eagerTracked(df: DataFrame, what: String): DataFrame =
    durableRoot(df) match {
      case Some(root) =>
        val back = writeReadBack(df, root, what)
        // NO dead-ref pruning here (unlike trackLocalCheckpoint's
        // registry): a GC-cleared frame's entry still carries the
        // DELETION DUTY for its parquet dir — pruning it would leak the
        // files outright (cleanCheckpoints deliberately never claims
        // current-app tracked dirs; observed as a GC-timing flake in
        // DupSpansSpec). The queue is bounded by UNDELETED dirs, which is
        // the real resource; releaseTracked drains and deletes every
        // entry at the caller's boundary.
        trackedDurable.add((df.sparkSession.sparkContext.applicationId,
          durableBacking.get(back),
          new java.lang.ref.WeakReference[DataFrame](back)))
        back
      case None =>
        org.apache.spark.sql.GraftInternal.trackLocalCheckpoint(
          df.localCheckpoint(true))
    }

  /** Release every operator-internal tracked materialization of this
    * session — localCheckpoint blocks AND durable backing dirs — in one
    * call. The single sweep-boundary release for both modes: callers
    * (the scale sweep between factors, a long curation session between
    * corpus dirs) guarantee no tracked frame is still awaiting
    * consumption, exactly the contract
    * [[org.apache.spark.sql.GraftInternal.releaseTrackedCheckpoints]]
    * documents for the block half. */
  private[graft] def releaseTracked(
      spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftInternal.releaseTrackedCheckpoints(spark)
    val hconf = spark.sparkContext.hadoopConfiguration
    val it = trackedDurable.iterator()
    while (it.hasNext) {
      // Current-app entries: the caller's nothing-in-flight guarantee
      // covers every tracked frame, GC'd or not. Other-app entries: that
      // application is STOPPED (one live SparkContext per JVM), its
      // frames are dead by construction — the deletion duty is discharged
      // here rather than dropping the entry, which would leak the dir for
      // the JVM lifetime. Either way the dir goes and the entry leaves.
      val (_, path, ref) = it.next()
      Option(ref.get()).foreach(durableBacking.remove)
      deleteDir(hconf, path)
      it.remove()
    }
  }

  /** Operational sweep of the durable checkpoint directory — the
    * clean-the-directory-between-runs contract as a call instead of a
    * manual step. Deletes `graft_ckpt_*` child dirs under the configured
    * [[CheckpointDirConf]] root (and under every root any session of this
    * JVM has written to) that belong to THIS JVM's applications — current
    * or stopped — and that no strongly-reachable read-back frame still
    * backs: abandoned final outputs, a stopped session's leftovers, the
    * CLI one-shot's top-k backing.
    *
    * CALLER CONTRACT (the same boundary guarantee as [[releaseTracked]]):
    * invoke only when no durable-backed result of this JVM is still
    * awaiting consumption, unless the exact frame [[writeReadBack]]
    * returned is still strongly held (those are detected live and kept).
    * A DERIVED frame — a projection or join over the materialized result
    * whose read-back instance has been dropped — is indistinguishable
    * from an abandoned one once the weak registry entry is collected, and
    * its backing WILL be swept; release such frames with [[releaseEager]]
    * (which walks the plan) before calling this. The engine's own shapes
    * are covered: [[graft.cli.Pipelines.BenchmarkOutput]] pins its
    * read-back strongly, and operator-internal tracked materializations
    * of the CURRENT application are always kept here (they are
    * [[releaseTracked]]'s duty, GC state notwithstanding).
    *
    * Dirs whose name carries an application tag this JVM never ran —
    * a CONCURRENT run sharing the root — are kept unless `sweepForeign`
    * is set, which widens the sweep to every unreferenced `graft_ckpt_*`
    * dir: flip it for crashed-run cleanup, asserting no other live run
    * shares the directory. Non-`graft_ckpt_` children are never touched
    * in either mode. */
  def cleanCheckpoints(
      spark: org.apache.spark.sql.SparkSession,
      sweepForeign: Boolean = false): Unit = {
    val app = spark.sparkContext.applicationId
    // every root any session of this JVM wrote to, plus the current conf
    val roots: Set[String] =
      knownPrefixes(spark, None).map(_.stripSuffix("/graft_ckpt_"))
    if (roots.isEmpty) return
    // tags of applications this JVM ran — the dirs this call may claim
    val ownTags: Set[String] = {
      val b = Set.newBuilder[String]
      val it = writtenRoots.iterator()
      while (it.hasNext) b += tagOf(it.next()._1)
      b += appTag(spark)
      b.result()
    }
    // Make weak-registry liveness reflect actual reachability before the
    // scan: a final-output frame the caller just dropped may not have
    // been collected yet, and a not-yet-cleared weak entry reads as
    // "live" — the dir would survive this sweep and, carrying this app's
    // tag, look like a concurrent run's to every LATER JVM's default
    // sweep. One explicit full GC on an explicitly-invoked operational
    // sweep is the same trade Spark's own ContextCleaner makes with its
    // periodic GC for reference-tracked cleanup.
    System.gc()
    val keep = scala.collection.mutable.Set[String]()
    pendingWrites.forEach(n => { keep += n; () })
    durableBacking.synchronized { // synchronizedMap: iteration needs the lock
      val vs = durableBacking.values().iterator()
      while (vs.hasNext) keep += new org.apache.hadoop.fs.Path(vs.next()).getName
    }
    val td = trackedDurable.iterator()
    while (td.hasNext) {
      val (a, path, ref) = td.next()
      // current-app internals are releaseTracked's duty even when the
      // read-back was GC'd (a lazy derived consumer may still be pending)
      if (a == app || ref.get() != null)
        keep += new org.apache.hadoop.fs.Path(path).getName
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    roots.foreach { root =>
      val rp = new org.apache.hadoop.fs.Path(root)
      val fs = rp.getFileSystem(hconf)
      if (fs.exists(rp)) fs.listStatus(rp).foreach { st =>
        val name = st.getPath.getName
        val ours = sweepForeign ||
          ownTags.exists(t => name.startsWith(s"graft_ckpt_${t}_"))
        if (name.startsWith("graft_ckpt_") && ours && !keep.contains(name)) {
          fs.delete(st.getPath, true); ()
        }
      }
    }
  }

  /** Lower-cased whitespace tokens (empty tokens dropped — consecutive
    * separators don't produce ghost shingles). Delegates to the canonical
    * [[graft.text.TextAnalysis.tokens]] so dedup and text analysis can
    * never drift apart. */
  def tokens(text: Column): Column = graft.text.TextAnalysis.tokens(text)

  /** Distinct word n-gram shingles of `text` (first-occurrence order);
    * documents shorter than n tokens have no shingles (empty array).
    * Fused single-pass kernel — see [[graft.expr.TokenOps.shingles]]. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.word_shingles(text, n)

  /** Exact-duplicate groups: md5 of the raw text → (hash, keeper=min id,
    * ids, group size). Groups of size 1 are unique documents. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keeper"),
        sort_array(collect_list(col(idCol))).as("ids"),
        count(lit(1)).as("group_size"))

  /** Exact dedup: keep one row (lowest id) per distinct text. Implemented
    * as a `min_by(row, id)` hash aggregate over the digest: the partial
    * (map-side) aggregate already collapses duplicates within each input
    * partition, so the single exchange carries at most one full row per
    * distinct digest per map partition — a rank window would shuffle every
    * input row. Requires unique ids (the corpus contract). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    df.select(md5(col(textCol)).as("__text_hash"), all.as("__row"), col(idCol).as("__id"))
      .groupBy(col("__text_hash"))
      .agg(min_by(col("__row"), col("__id")).as("__row"))
      .select(col("__row.*"))
  }

  /** Jaccard similarity of two (distinct-element) string arrays — fused
    * one-pass kernel (r21; see [[graft.expr.SetSimOps.jaccard]]): the
    * original spelling materialized the intersection AND union arrays per
    * candidate pair only to size them. [[jaccardTree]] keeps that spelling
    * as the SetSimSpec equivalence reference. */
  def jaccard(a: Column, b: Column): Column = graft.functions.jaccard_sim(a, b)

  /** The pre-fusion builtin spelling of [[jaccard]]. */
  private[graft] def jaccardTree(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /**
   * All-pairs n-gram Jaccard over a (small) document set: every id pair
   * (a < b) with similarity ≥ threshold. O(n²) — oracle/test path only;
   * use [[minHashNearDups]] at scale.
   */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val withSh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    val a = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * EXACT all-pairs n-gram Jaccard join at scale — prefix filtering in the
   * AllPairs/PPJoin family (Bayardo et al. WWW'07, Xiao et al. WWW'08; the
   * distributed shape follows Vernica et al. SIGMOD'10): identical output
   * to [[ngramJaccardPairs]] with NO O(n²) cross join. Use this when LSH's
   * probabilistic recall ([[minHashNearDups]]) isn't acceptable — exact
   * contracts, legal/contamination audits — at the cost of a candidate set
   * that grows with corpus self-similarity.
   *
   * How: tokens get a global rarest-first order (ascending document
   * frequency, token tie-break); a doc of size L needs only its first
   * p = L − ⌈t·L⌉ + 1 ordered tokens ("prefix") indexed, because two docs
   * with J ≥ t must share a token within both prefixes (prefix-filter
   * theorem — each qualifying pair's required overlap ⌈t/(1+t)(|x|+|y|)⌉
   * is ≥ ⌈t·|x|⌉ given the length filter |y| ≥ t·|x|, so these prefixes
   * are supersets of the canonical per-pair ones). Candidates = prefix
   * token equi-join + symmetric length filter; exact shingle Jaccard
   * verifies candidates only. Every FP bound is epsilon-RELAXED
   * (floor(t·L − 1e-9)) so binary-representation drift can only lengthen
   * a prefix, never drop a qualifying pair — slack makes extra
   * candidates, the verify step keeps the result exact.
   *
   * Scale shape: the df table is a map-side-combined vocab aggregate; the
   * ordering join shuffles (id, tok) by token (AQE broadcasts the df table
   * when it's small); the prefix self-join carries only ~⌈(1−t)·L⌉+1
   * tokens per doc — at t = 0.8 that's ≤ a fifth of the token stream, and
   * rarest-first ordering keeps equi-join buckets near-singleton (a token
   * with df = d contributes ≤ d² candidate slots but prefix membership
   * skews hard toward rare tokens). The exact-collapse pre-pass (same as
   * [[minHashNearDups]]) keeps the self-join independent of the corpus's
   * duplication factor.
   *
   * @param maxTokenBucket skew valve, default OFF (`Int.MaxValue` =
   *        exact): prefix-token buckets whose document count (family-
   *        weighted) exceeds the cap are dropped from candidate
   *        generation — bounding the equi-join on boilerplate-saturated
   *        corpora at a DOCUMENTED completeness trade, the same contract
   *        as every LSH bucket guard in this module.
   * @return (id_a, id_b, jaccard), id_a < id_b, jaccard ≥ threshold —
   *         computed eagerly; equal to [[ngramJaccardPairs]] on the same
   *         input at the default (exact) cap.
   */
  def jaccardJoinPrefix(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      collapseExact: Boolean = true,
      maxTokenBucket: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    require(maxTokenBucket >= 1, s"maxTokenBucket must be >= 1, got $maxTokenBucket")
    val eps = 1e-9
    val hashed = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("__h", md5(col("__text")))
    val reps =
      if (collapseExact)
        hashed.groupBy(col("__h"))
          .agg(min(col("id")).as("id"), first(col("__text")).as("__text"),
            count(lit(1)).as("__fam"))
      else hashed.withColumn("__fam", lit(1L))
    val withSh = reps
      .select(col("id"), shingles(col("__text"), n).as("sh"), col("__fam"))
      .withColumn("len", size(col("sh")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val toks = withSh.select(col("id"), col("len"), explode(col("sh")).as("tok"))
      val dfTab = toks.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
      // Rarest-first prefix per doc: sort (df, tok) structs, keep the
      // first p. Any CONSISTENT global order is correct; df-ascending is
      // the selectivity heuristic that makes the equi-join cheap.
      // Per-doc rank in the global order via a row_number window (the
      // per-doc partitions are doc-sized — this is NOT a corpus-wide
      // window) — measurably cheaper than collecting, sorting, slicing
      // and re-exploding per-doc arrays for the same one shuffle by id.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("__df"), col("tok"))
      val peAll = toks.join(dfTab, Seq("tok"))
        .withColumn("pos", row_number().over(w) - 1)
        .filter(col("pos") <
          (col("len") - floor(col("len") * threshold - eps)).cast("int"))
        .select(col("id"), col("len"), col("pos"), col("tok"))
      // Skew valve, default OFF (exact): a prefix-token bucket shared by B
      // docs joins B² candidate slots — on a boilerplate-heavy corpus
      // where even PREFIX tokens (rarest-first!) are ubiquitous, a cap
      // bounds the join at a DOCUMENTED completeness trade: pairs whose
      // every qualifying shared prefix token was dropped are missed
      // (same contract as every LSH bucket guard here). Bucket size
      // counts DOCUMENTS via the family weight, mirroring cappedBands.
      val pe =
        if (maxTokenBucket == Int.MaxValue) peAll
        else {
          val fams = withSh.select(col("id"), col("__fam"))
          val sizes = peAll.join(fams, Seq("id"))
            .groupBy(col("tok")).agg(sum(col("__fam")).as("count"))
          val oversized = sizes.filter(col("count") > maxTokenBucket)
            .select(col("tok"))
          peAll.join(broadcast(oversized), Seq("tok"), "left_anti")
        }
      // Positional filter (the PPJoin refinement): every common token of a
      // pair sits at-or-after its first shared prefix token's positions
      // (i, j) in the sorted orders, so overlap ≤ min(|x|−i, |y|−j); a
      // qualifying pair needs overlap ≥ t/(1+t)·(|x|+|y|), and its FIRST
      // shared token — the one with the largest bound — must clear it.
      // Kills the candidates where two long docs merely share one rare
      // token deep in both prefixes.
      val frac = threshold / (1.0 + threshold)
      val cand = pe.as("l").join(pe.as("r"),
          col("l.tok") === col("r.tok") && col("l.id") < col("r.id") &&
          col("r.len") >= col("l.len") * threshold - eps &&
          col("l.len") >= col("r.len") * threshold - eps &&
          least(col("l.len") - col("l.pos"), col("r.len") - col("r.pos")) >=
            (col("l.len") + col("r.len")) * frac - eps)
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .distinct()
      val repPairs = cand
        .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      if (!collapseExact) eagerPairs(repPairs)
      else {
        val members = hashed
          .join(reps.select(col("__h"), col("id").as("__rid")), Seq("__h"))
          .select(col("id"), col("__rid"))
        val cross = repPairs
          .join(members.select(col("__rid").as("id_a"), col("id").as("__ma")), Seq("id_a"))
          .join(members.select(col("__rid").as("id_b"), col("id").as("__mb")), Seq("id_b"))
          .select(least(col("__ma"), col("__mb")).as("id_a"),
            greatest(col("__ma"), col("__mb")).as("id_b"), col("jaccard"))
        // Within-family pairs: identical texts have J = 1 (≥ any valid
        // threshold) whenever they have shingles at all. Gated on the rep
        // SURVIVING the token-bucket cap (mirrors the LSH band-survival
        // rule): with the default cap this is every shingled rep (prefix
        // length ≥ 1), so the gate is a no-op on the exact path.
        val survived = pe.select(col("id").as("__srid")).distinct()
        val fams = withSh.filter(col("__fam") >= 2 && size(col("sh")) > 0)
          .join(survived, col("id") === col("__srid"))
          .select(col("id").as("__rid"), lit(1.0).as("jaccard"))
        val within = members.as("a")
          .join(members.as("b"),
            col("a.__rid") === col("b.__rid") && col("a.id") < col("b.id"))
          .select(col("a.__rid").as("__rid"), col("a.id").as("id_a"),
            col("b.id").as("id_b"))
          .join(fams, Seq("__rid"))
          .select(col("id_a"), col("id_b"), col("jaccard"))
        eagerPairs(cross.unionByName(within))
      }
    } finally withSh.unpersist(false)
  }

  /**
   * MinHash signature: element j = min over shingles of g_j(s) = h1+j·h2
   * (Kirsch-Mitzenmacher over xxhash64). One fused map-side kernel
   * ([[graft.expr.MinHashSig]]): two byte passes per shingle total — a
   * higher-order-function formulation would run numHashes interpreted
   * passes and dominate the whole pipeline's CPU.
   */
  def minHashSignature(shingleArr: Column, numHashes: Int): Column =
    graft.functions.min_hash_sig(shingleArr, numHashes)

  /**
   * LSH band keys straight from shingles: the MinHash signature split into
   * `bands` bands, each mixed to one band-index-salted long
   * ([[graft.expr.MinHashBandKeys]] — one fused kernel pass). Docs agreeing
   * on ANY key are candidates. P(candidate) = 1 - (1 - j^r)^b — tune
   * (b, r) to the target threshold j ≈ (1/b)^(1/r).
   */
  def bandKeys(shingleArr: Column, numHashes: Int, bands: Int): Column =
    graft.functions.min_hash_band_keys(shingleArr, numHashes, bands)

  /**
   * Near-duplicate pairs via MinHash+LSH, verified with exact shingle
   * Jaccard on the candidate set only.
   *
   * The shingle frame is referenced by both verify rejoins and the band
   * frame by the sizing pass and both candidate-join sides; without
   * caching, lineage recompute would run the shingle/MinHash kernels ~5×
   * over the corpus. Both frames are persisted (MEMORY_AND_DISK) for the
   * lifetime of this call, the pair result — candidate-bounded, tiny next
   * to the corpus — is materialized eagerly, and the caches are released
   * before returning. The returned frame is therefore computed (backed by
   * local blocks), not a lazy plan; callers compose over a result set, not
   * a re-derivable relation.
   *
   * @return (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold
   */
  def minHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.7,
      maxBucketSize: Int = 10000,
      collapseExact: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    // Exact-collapse pre-pass: identical texts have identical shingles,
    // signatures, and band keys, so a family of E exact copies multiplies
    // every one of its band buckets by E and the bucket self-join by E² —
    // mining cost scales QUADRATICALLY in the duplication factor while
    // producing no information the representative doesn't carry. Collapse
    // to one representative per distinct text (one md5 aggregate, the
    // dedup_exact shuffle), mine pairs among representatives only, then
    // expand back: rep-pair scores apply verbatim to every member combo,
    // and within-family pairs are emitted directly (jaccard 1 when the
    // family has shingles AND at least one surviving band — exactly the
    // uncollapsed conditions). Bucket caps count DOCUMENTS via the family
    // weight, so cap behavior is unchanged too. Mining work becomes
    // independent of the corpus's duplication factor; only the (output-
    // sized) expansion still scales with it.
    val hashed = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("__h", md5(col("__text")))
    val reps =
      if (collapseExact)
        hashed.groupBy(col("__h"))
          .agg(min(col("id")).as("id"), first(col("__text")).as("__text"),
            count(lit(1)).as("__fam"))
      else hashed.withColumn("__fam", lit(1L))
    val withSh = reps.select(col("id"), shingles(col("__text"), n).as("sh"),
        col("__fam"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Band-bucket join carries only (id, bandKey) — the shingle arrays do
    // NOT ride through the exploded shuffle; they're joined back onto the
    // (much smaller) distinct candidate set afterwards.
    val sigBands = withSh.select(col("id"),
        explode(bandKeys(col("sh"), numHashes, bands)).as("band"), col("__fam"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val capped = cappedBands(sigBands, maxBucketSize,
        weightCol = if (collapseExact) Some("__fam") else None)
      val candidates = pairsFromCapped(capped)
      // Exact-Jaccard verify on candidates only: shingles come from the
      // cached frame, keyed rejoin once per side.
      val repPairs = candidates
        .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      if (!collapseExact) eagerPairs(repPairs)
      else {
        val members = hashed
          .join(reps.select(col("__h"), col("id").as("__rid")), Seq("__h"))
          .select(col("id"), col("__rid"))
        // cross-family: the rep pair's verified jaccard applies to every
        // member combination (identical shingle sets)
        val cross = repPairs
          .join(members.select(col("__rid").as("id_a"), col("id").as("__ma")), Seq("id_a"))
          .join(members.select(col("__rid").as("id_b"), col("id").as("__mb")), Seq("id_b"))
          .select(least(col("__ma"), col("__mb")).as("id_a"),
            greatest(col("__ma"), col("__mb")).as("id_b"), col("jaccard"))
        // within-family: uncollapsed, copies pair iff they share ≥1
        // surviving band (all their bands are the rep's) and their exact
        // jaccard — 1 for non-empty shingle sets, 0 for empty — clears
        // the threshold
        val survived = capped.select(col("id").as("__rid")).distinct()
        val selfScore = withSh.filter(col("__fam") >= 2)
          .join(survived, withSh("id") === survived("__rid"))
          .select(col("__rid"),
            when(size(col("sh")) > 0, lit(1.0)).otherwise(lit(0.0)).as("jaccard"))
          .filter(col("jaccard") >= threshold)
        val within = members.as("a")
          .join(members.as("b"),
            col("a.__rid") === col("b.__rid") && col("a.id") < col("b.id"))
          .select(col("a.__rid").as("__rid"), col("a.id").as("id_a"),
            col("b.id").as("id_b"))
          .join(selfScore, Seq("__rid"))
          .select(col("id_a"), col("id_b"), col("jaccard"))
        eagerPairs(cross.unionByName(within))
      }
    } finally {
      sigBands.unpersist(false)
      withSh.unpersist(false)
    }
  }

  /**
   * LSH candidate pairs from an `(id, band)` table: skew-capped bucket
   * self-join, `id_a < id_b`, deduplicated across bands. THE single
   * definition of the guard + candidate semantics — shared by
   * [[minHashNearDups]] and [[graft.index.MinHashIndex.nearDupPairs]] so
   * the persisted index can never drift from the in-query operator.
   *
   * Skew guard: a band shared by B docs emits B² candidate pairs — at
   * corpus scale a boilerplate band would quadratically explode the join.
   * Buckets above `maxBucketSize` are dropped (documented recall tradeoff:
   * members can still pair via their other bands). The sizing pass
   * shuffles only (band, count) rows.
   */
  private[graft] def lshCandidatePairs(bands: DataFrame, maxBucketSize: Int): DataFrame =
    pairsFromCapped(cappedBands(bands, maxBucketSize, weightCol = None))

  /** Bucket-capped band rows. With `weightCol`, bucket size is the SUM of
    * that column instead of the row count — used by the exact-collapse
    * path, where one representative row stands for `__fam` documents and
    * the cap must keep counting DOCUMENTS to preserve the uncollapsed
    * semantics bit-for-bit. */
  private[graft] def cappedBands(bands: DataFrame, maxBucketSize: Int,
      weightCol: Option[String]): DataFrame = {
    val sizes = weightCol.fold(bands.groupBy(col("band")).count()) { w =>
      bands.groupBy(col("band")).agg(sum(col(w)).as("count"))
    }
    val oversized = sizes.filter(col("count") > maxBucketSize).select(col("band"))
    bands.join(broadcast(oversized), Seq("band"), "left_anti")
  }

  private[graft] def pairsFromCapped(capped: DataFrame): DataFrame =
    capped.as("l")
      .join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct() // a pair can collide in several bands

  /**
   * Connected components over a near-duplicate pair table: every vertex is
   * assigned the smallest id reachable through the pairs — turning pairwise
   * near-dup output into dedup CLUSTERS (the keeper-selection step of a
   * corpus dedup pipeline: keep rows where `component == id`, or pick one
   * representative per component by any policy).
   *
   * Algorithm: min-label propagation with pointer jumping. Each round every
   * vertex takes the min label among itself and its neighbors, then labels
   * are re-pointed through their own label (`comp ← comp(comp)`), which
   * halves chain lengths — convergence in O(log diameter) rounds instead of
   * O(diameter). All frames in the loop are skinny (id, comp) pairs; the
   * document payload never enters. Per-round results are eagerly
   * localCheckpoint'ed: iterative lineage otherwise grows exponentially and
   * re-executes the whole history each round.
   *
   * Convergence costs ZERO extra passes: each vertex's previous label rides
   * the gather aggregate as one extra column, and the changed-vertex count
   * is an `observe` metric (CollectMetrics) accumulated DURING the action
   * that materializes the round's checkpoint — one Spark action per round,
   * where a separate probe (a join or count against the previous labels)
   * would re-scan the label table once more per round, a real cost at
   * corpus scale.
   *
   * Small-graph fast path: a near-dup pair set is typically MINISCULE next
   * to the corpus (it lists only the docs that actually duplicate), and
   * the iterative loop's per-round scheduling floor dwarfs such graphs —
   * so when the edge count is at most `smallEdgeThreshold` the components
   * are solved driver-side (union-find with min-root invariant, the same
   * labels the distributed loop converges to) and applied as ONE broadcast
   * join onto the vertex frame, which never iterates at all. The threshold
   * bounds driver memory (two ids per edge); above it the distributed
   * pointer-jumping loop runs. The probe costs one `limit(threshold+1)`
   * count over the edge frame — it never counts past the threshold.
   *
   * Contract: `vertices` must cover every id appearing in `edges`
   * (endpoints outside it would be materialized into the result).
   *
   * @return (id, component) — eager (distributed path) or a cheap lazy
   *         broadcast join over the vertex ids (driver path)
   */
  def connectedComponents(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25,
      smallEdgeThreshold: Long = 1L << 20): DataFrame =
    connectedComponentsWithRounds(vertices, idCol, edges, aCol, bCol, maxIter,
      smallEdgeThreshold)._1

  /** Driver-side union-find over a collected edge list: path compression +
    * "smaller root wins" linking, so every tree's root IS its component's
    * minimum id — identical labels to the distributed loop. Ids compare
    * via their natural ordering (Long, String, …). */
  private def driverComponents(pairs: Array[(Any, Any)]): Map[Any, Any] = {
    val parent = new java.util.HashMap[Any, Any]() // entries only for non-roots
    def find(x0: Any): Any = {
      var root = x0
      while (parent.containsKey(root)) root = parent.get(root)
      var x = x0
      while (x != root) { val nxt = parent.get(x); parent.put(x, root); x = nxt }
      root
    }
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val out = Map.newBuilder[Any, Any]
    pairs.foreach { case (a, b) =>
      val fa = find(a); if (fa != a) out += a -> fa
      val fb = find(b); if (fb != b) out += b -> fb
    }
    out.result()
  }

  /** [[connectedComponents]] plus the number of distributed rounds it ran
    * (0 on the driver fast path) — exposed for tests that pin the
    * action-per-round contract. */
  private[graft] def connectedComponentsWithRounds(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25,
      smallEdgeThreshold: Long = 1L << 20): (DataFrame, Int) = {
    // The threshold bounds a driver-side collect; at Int.MaxValue-1 the
    // limit probe below would saturate and silently stop bounding it.
    require(smallEdgeThreshold < Int.MaxValue - 1L,
      s"smallEdgeThreshold must be < ${Int.MaxValue - 1} (it bounds a driver " +
        s"collect), got $smallEdgeThreshold")
    // A null endpoint names no vertex: such edges are dropped on BOTH paths
    // (the distributed join would drop the null side anyway; the driver
    // union-find would NPE on a null HashMap key).
    val cleanEdges = edges.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val lim = (smallEdgeThreshold + 1).max(0L).toInt
    if (smallEdgeThreshold >= 0 &&
        cleanEdges.limit(lim).count() <= smallEdgeThreshold) {
      val pairs = cleanEdges.select(col(aCol), col(bCol)).distinct().collect()
        .map(r => (r.get(0), r.get(1)))
      val comp = driverComponents(pairs)
      val idType = vertices.schema(idCol).dataType
      val spark = vertices.sparkSession
      val mapRows = comp.toSeq.map { case (id, c) => org.apache.spark.sql.Row(id, c) }
      val mapDf = spark.createDataFrame(
        spark.sparkContext.parallelize(mapRows, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__cid", idType),
          org.apache.spark.sql.types.StructField("__ccomp", idType))))
      val labels = vertices.select(col(idCol).as("id"))
        .join(broadcast(mapDf), col("id") === col("__cid"), "left")
        .select(col("id"), coalesce(col("__ccomp"), col("id")).as("component"))
      return (labels, 0)
    }
    // This path only engages above `smallEdgeThreshold` edges: round state
    // goes to DISK_ONLY so the per-round join + hash aggregate keep the
    // whole unified pool as EXECUTION memory (memory-resident round frames
    // held the protected storage floor and starved the aggregate at the
    // measured factor-300 cliff, BENCH_SCALE.md r17). Each round reads sym
    // + labels once, sequentially — scan cost, not a random-access term.
    //
    // With [[CheckpointDirConf]] set, round state is parquet write +
    // read-back instead of localCheckpoint — identical labels, but a
    // preempted executor cannot destroy a round (preemptible-cluster
    // mode). `sym` stays a DISK_ONLY persist in both modes: persist keeps
    // lineage, so lost blocks recompute from the edge frame.
    val durable = durableRoot(vertices)
    def eagerRound(df: DataFrame): DataFrame = durable match {
      case Some(root) => writeReadBack(df, root, "cc")
      case None => df.localCheckpoint(true, StorageLevel.DISK_ONLY)
    }
    val sym = cleanEdges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(cleanEdges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.DISK_ONLY)
    var labels = eagerRound(
      vertices.select(col(idCol).as("id"), col(idCol).as("comp")))
    val compType = labels.schema("comp").dataType
    try {
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        // gather: min label among self + neighbors. The self row also
        // carries the vertex's current label as __prev (exactly one
        // non-null per id), so the convergence check needs no re-join
        // against the previous round.
        val msgs = sym.join(
            labels.select(col("id").as("dst"), col("comp")), Seq("dst"))
          .select(col("src").as("id"), col("comp"),
            lit(null).cast(compType).as("__prev"))
        val gathered = labels
          .select(col("id"), col("comp"), col("comp").as("__prev"))
          .union(msgs)
          .groupBy(col("id"))
          .agg(min(col("comp")).as("comp"), max(col("__prev")).as("__prev"))
        // pointer jump: comp <- comp(comp). Every label IS a vertex id, so
        // the lookup always hits; left+coalesce guards the contract anyway.
        val parents = gathered.select(col("id").as("__pid"), col("comp").as("__pcomp"))
        val jumped = gathered.join(parents, gathered("comp") === col("__pid"), "left")
          .select(gathered("id"),
            coalesce(col("__pcomp"), gathered("comp")).as("comp"),
            gathered("__prev"))
        val next = durable match {
          case Some(root) =>
            // Durable round: __prev rides the written parquet, and the
            // convergence check is a filter over the read-back (an
            // observe metric only surfaces through the frame's own
            // QueryExecution, which a write action bypasses). One extra
            // scan of a skinny executor-independent file per round — the
            // documented durable-mode trade; the filter's parquet
            // row-group stats skip converged groups early.
            val round = writeReadBack(jumped, root, "cc")
            converged = round.filter(col("comp") =!= col("__prev")).isEmpty
            val nxt = round.select(col("id"), col("comp"))
            // re-key the backing dir to the projection we keep as `labels`
            durableBacking.put(nxt, durableBacking.remove(round))
            nxt
          case None =>
            // The changed count accumulates inside the checkpoint job
            // itself; __prev is consumed by the metric and pruned from
            // the checkpoint.
            val obsName = s"__cc_changed_$iter"
            val flagged = jumped.observe(obsName,
              count(when(col("comp") =!= col("__prev"), 1)).as("changed"))
            val projected = flagged.select(col("id"), col("comp"))
            val out = projected.localCheckpoint(true, StorageLevel.DISK_ONLY)
            converged =
              projected.queryExecution.observedMetrics(obsName).getLong(0) == 0L
            out
        }
        // release the superseded round (blocks or backing files; GC would
        // get the blocks eventually — iterative operators should not rely
        // on that, and durable files never GC)
        releaseEager(labels)
        labels = next
        iter += 1
      }
      require(converged, s"connectedComponents did not converge in $maxIter rounds " +
        "(pointer jumping needs ~log2(diameter) rounds; raise maxIter)")
      (labels.select(col("id"), col("comp").as("component")), iter)
    } finally {
      sym.unpersist(false)
    }
  }

  /**
   * End-to-end near-duplicate removal: LSH pair mining →
   * [[connectedComponents]] → keep each cluster's representative (the min
   * id) plus every unclustered row. The one-call corpus-curation API; the
   * pieces stay public for pipelines that need the pairs or clusters
   * themselves.
   *
   * The full row set only participates in one id-keyed semi-join at the
   * end; everything before it moves ids, signatures, and candidate pairs.
   */
  def dropNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.7,
      maxBucketSize: Int = 10000): DataFrame =
    dropNearDuplicates(df, idCol,
      minHashNearDups(df, idCol, textCol, n, numHashes, bands,
        threshold, maxBucketSize))

  /**
   * Near-duplicate removal from a PRECOMPUTED pair frame — the
   * pipeline-amortized entry point: a curation run that also wants the
   * pairs (for edit-similarity verification, cluster inspection, audit
   * logs) mines them once with [[minHashNearDups]] and feeds the same
   * frame here and to [[editSimilarity]], instead of paying the
   * corpus-wide shingle+MinHash kernel per consumer.
   *
   * @param pairs (id_a, id_b) near-dup pairs in `df`'s id space
   */
  def dropNearDuplicates(
      df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(df.select(col(idCol)), idCol,
      pairs, "id_a", "id_b")
    // Drop the DUPLICATES (clustered non-representatives), not keep the
    // keepers: keepers ≈ corpus-sized (every unclustered doc), so a
    // semi-join on them would shuffle the full corpus by id; the duplicate
    // set is only the docs actually removed — typically a small fraction —
    // and AQE broadcasts the anti-join side when it is, leaving the corpus
    // scan shuffle-free.
    val dupes = comps.filter(col("id") =!= col("component")).select(col("id"))
    df.join(dupes, df(idCol) === dupes("id"), "left_anti")
  }

  /**
   * Edit-distance verification over a mined pair set: the cheap "is it a
   * rename / literal-change clone" (type-2) check layered on a
   * bag-of-shingles miner. Pairwise cost is O(len_a·len_b) but runs
   * ONLY on the supplied pairs — a candidate-bounded set independent of
   * corpus size — never the corpus; the two text joins are id-keyed and
   * AQE-broadcastable when the pair set is small.
   *
   * Distance and length are both in the UTF-8 BYTE domain
   * ([[graft.functions.byte_levenshtein]] / `octet_length`): SQL engines
   * disagree on the edit unit (Spark's builtin edits code points, DuckDB
   * edits bytes), and the round-15 non-ASCII gate caught exactly that —
   * the previous code-point distance over a char-count denominator could
   * not be replayed cross-engine, and a byte distance over a CHAR length
   * can even leave [0, 1]. The byte view is the same discipline the
   * round-14 byte-faithful kernels pin, coincides with code points on
   * ASCII, and keeps edit_sim in [0, 1] by construction.
   *
   * @param pairs (id_a, id_b) — e.g. [[minHashNearDups]] output
   * @return (id_a, id_b, lev, edit_sim) with
   *         edit_sim = 1 - lev / max(bytelen_a, bytelen_b)
   */
  def editSimilarity(
      pairs: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val ta = docs.select(col(idCol).as("id_a"), col(textCol).as("__ta"))
    val tb = docs.select(col(idCol).as("id_b"), col(textCol).as("__tb"))
    pairs.select(col("id_a"), col("id_b"))
      .join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .withColumn("lev", graft.functions.byte_levenshtein(col("__ta"), col("__tb")))
      .select(col("id_a"), col("id_b"), col("lev"),
        (lit(1.0) - col("lev").cast("double") /
          greatest(octet_length(col("__ta")), octet_length(col("__tb")))).as("edit_sim"))
  }

  /**
   * Training-vs-eval contamination scan: every (corpus doc, eval doc) pair
   * sharing at least `minOverlap` distinct word n-grams — the standard
   * n-gram-overlap benchmark-decontamination check. The eval side is
   * benchmark-sized by contract, so its exploded shingle table broadcasts
   * and the corpus streams map-side: no corpus shuffle until the
   * (doc, eval, shingle)-hit aggregate, which carries only matching ids.
   *
   * @param excludeSameId drop pairs with equal ids (for the self-test
   *                      shape where eval ⊆ corpus in one id space)
   * @return (doc_id, eval_id, n_shared) — distinct shared-shingle count
   */
  def contaminationScan(
      corpus: DataFrame, corpusId: String, corpusText: String,
      evalSet: DataFrame, evalId: String, evalText: String,
      n: Int = 8, minOverlap: Int = 1,
      excludeSameId: Boolean = false): DataFrame = {
    val cs = corpus.select(col(corpusId).as("doc_id"),
      explode(shingles(col(corpusText), n)).as("sh"))
    val es = evalSet.select(col(evalId).as("eval_id"),
      explode(shingles(col(evalText), n)).as("sh"))
    val hits0 = cs.join(broadcast(es), Seq("sh"))
    val hits = if (excludeSameId) hits0.filter(col("doc_id") =!= col("eval_id")) else hits0
    hits.groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
  }

  /**
   * Winnowing near-dup pairs (MOSS, Schleimer et al. 2003): documents
   * sharing at least `minShared` winnowed rolling-hash fingerprints
   * ([[graft.expr.WinnowOps]]). The POSITIONAL complement to MinHash:
   * any shared run of ≥ w+k-1 characters guarantees a shared fingerprint,
   * so short exact matches (a lifted function, a boilerplate block) hit
   * even when global bag-of-shingles similarity is low.
   *
   * Shape: one kernel pass per doc, explode to an (id, fp) inverted
   * index, skew-capped fingerprint-bucket self-join (same guard + shape
   * as [[lshCandidatePairs]], but counting shared fingerprints instead of
   * collapsing to candidates), then per-pair count — ids-only shuffles
   * throughout, never all-pairs.
   *
   * @return (id_a, id_b, n_shared) with id_a < id_b, n_shared ≥ minShared — eager
   */
  def winnowNearDups(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 8, minShared: Int = 3,
      maxBucketSize: Int = 10000,
      collapseExact: Boolean = true): DataFrame = {
    // Same exact-collapse pre-pass as [[minHashNearDups]], and winnowing
    // needs it MORE: a doc carries ~len/((w+1)/2) fingerprints, so a
    // family of E exact copies pays E²·|fps| bucket-join rows — the
    // dominant cost on any corpus with heavy exact duplication. Mine on
    // one representative per distinct text (caps weighted by family size
    // so bucket drops still count documents), then expand: cross-family
    // pairs inherit the rep pair's surviving-shared-fingerprint count
    // verbatim; within-family pairs share exactly the rep's surviving
    // fingerprints, so their n_shared is that per-rep survivor count.
    val hashed = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("__h", md5(col("__text")))
    val reps =
      if (collapseExact)
        hashed.groupBy(col("__h"))
          .agg(min(col("id")).as("id"), first(col("__text")).as("__text"),
            count(lit(1)).as("__fam"))
      else hashed.withColumn("__fam", lit(1L))
    val fps = reps.select(col("id"),
        explode(graft.functions.winnow_fingerprints(col("__text"), k, w)).as("fp"),
        col("__fam"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // ubiquitous fingerprints (license headers, generated boilerplate)
      // would join quadratically — drop buckets over the cap, same
      // documented recall trade as every LSH guard here.
      val sizes =
        if (collapseExact) fps.groupBy(col("fp")).agg(sum(col("__fam")).as("count"))
        else fps.groupBy(col("fp")).count()
      val oversized = sizes.filter(col("count") > maxBucketSize).select(col("fp"))
      val capped = fps.join(broadcast(oversized), Seq("fp"), "left_anti")
      val repPairs = capped.as("l")
        .join(capped.as("r"),
          col("l.fp") === col("r.fp") && col("l.id") < col("r.id"))
        .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
      if (!collapseExact) eagerPairs(repPairs)
      else {
        val members = hashed
          .join(reps.select(col("__h"), col("id").as("__rid")), Seq("__h"))
          .select(col("id"), col("__rid"))
        val cross = repPairs
          .join(members.select(col("__rid").as("id_a"), col("id").as("__ma")), Seq("id_a"))
          .join(members.select(col("__rid").as("id_b"), col("id").as("__mb")), Seq("id_b"))
          .select(least(col("__ma"), col("__mb")).as("id_a"),
            greatest(col("__ma"), col("__mb")).as("id_b"), col("n_shared"))
        // per-rep surviving fingerprints = n_shared of an identical pair
        val selfShared = capped.groupBy(col("id")).count()
          .select(col("id").as("__rid"), col("count").as("n_shared"))
          .filter(col("n_shared") >= minShared)
        val within = members.as("a")
          .join(members.as("b"),
            col("a.__rid") === col("b.__rid") && col("a.id") < col("b.id"))
          .select(col("a.__rid").as("__rid"), col("a.id").as("id_a"),
            col("b.id").as("id_b"))
          .join(selfShared, Seq("__rid"))
          .select(col("id_a"), col("id_b"), col("n_shared"))
        eagerPairs(cross.unionByName(within))
      }
    } finally fps.unpersist(false)
  }

  /** MinHash Jaccard ESTIMATE (signature agreement rate) — used when even
    * candidate-verify must avoid touching shingles. Fused equal-count
    * kernel (r21; see [[graft.expr.SetSimOps.eqCount]]): the original ran
    * two interpreted higher-order functions per pair. [[minHashEstimateTree]]
    * keeps that spelling as the SetSimSpec equivalence reference. */
  def minHashEstimate(sigA: Column, sigB: Column): Column =
    graft.functions.sig_eq_count(sigA, sigB).cast("double") / size(sigA)

  /** The pre-fusion builtin spelling of [[minHashEstimate]]. */
  private[graft] def minHashEstimateTree(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA)

  /**
   * SimHash near-dups: 64-bit fingerprints, candidates = docs agreeing on
   * at least one 16-bit quarter of the fingerprint (any pair within Hamming
   * distance 3 agrees on ≥1 quarter by pigeonhole), verified by exact
   * Hamming distance. Fingerprints are 8 bytes/doc → the candidate join is
   * tiny regardless of corpus size.
   */
  def simHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    import graft.functions.{hamming_dist, simhash64}
    require(maxHamming <= 3, "quarter-banding guarantees recall only up to Hamming 3")
    val fp = df.select(col(idCol).as("id"), simhash64(tokens(col(textCol))).as("fp"))
    val quarters = array((0 until 4).map(q =>
      struct(lit(q).as("q"),
        shiftright(col("fp"), q * 16).bitwiseAND(0xffffL).as("qh"))): _*)
    // The banded frame feeds the sizing pass and both join sides — persist
    // it so the tokenize+fingerprint kernel runs once over the corpus (same
    // scoped persist + eager-result shape as minHashNearDups).
    val banded0 = fp.select(col("id"), col("fp"), explode(quarters).as("band"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Same skew guard as minHashNearDups: common quarter values (e.g. the
      // all-zero quarter of short docs) would join quadratically.
      val oversized = banded0.groupBy(col("band")).count()
        .filter(col("count") > maxBucketSize).select(col("band"))
      val banded = banded0.join(broadcast(oversized), Seq("band"), "left_anti")
      banded.as("l")
        .join(banded.as("r"),
          col("l.band") === col("r.band") && col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
          col("l.fp").as("fp_a"), col("r.fp").as("fp_b"))
        .distinct()
        .withColumn("hamming", hamming_dist(col("fp_a"), col("fp_b")))
        .filter(col("hamming") <= maxHamming)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .transform(eagerPairs)
    } finally {
      banded0.unpersist(false)
    }
  }
}
