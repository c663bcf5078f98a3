package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import graft.embed.EmbedModel
import graft.index.{MinHashIndex, VectorCollection}

/**
 * Structured Streaming surface. The reference is batch-only (its ingest
 * loop `main.py:122-125` is eager chunking), so these are the engine's
 * forward-looking stream equivalents, built on the standard primitives:
 * event-time windows + watermarks, foreachBatch idempotent sinks, and
 * mapGroupsWithState for custom state.
 *
 * The windowed aggregation is expressed identically for batch and stream
 * frames — Spark's unified Dataset API means the SAME function is
 * oracle-checked in batch mode (SparkEntry `events_windowed`) and driven
 * through a real StreamingQuery in StreamingSpec.
 */
object Streaming {

  /** Tumbling event-time window counts/sums per event type. On a streaming
    * frame the watermark bounds state and drops data later than
    * `lateness`; on a batch frame the watermark is a no-op and the result
    * is the exact grouped aggregate. Money-style sums run on DECIMAL for
    * cross-engine determinism. */
  def windowedEventStats(
      events: DataFrame,
      windowLength: String = "1 hour",
      lateness: String = "10 minutes",
      slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength, slide.getOrElse(windowLength)),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("w_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /**
   * Streaming ingest into a [[VectorCollection]]: embed each micro-batch
   * with a pre-fitted model and upsert by deterministic id — the
   * foreachBatch + keyed-idempotent-sink pattern that makes restarts and
   * reprocessing exactly-once BY KEY (the streaming analogue of the
   * reference's `collection_exists` skip + deterministic UUID points).
   */
  def ingestStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      model: EmbedModel,
      collection: VectorCollection,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val embedded = model.transform(batch, textCol, "vec")
        collection.upsert(embedded, idCol)
      }
      .start()

  /**
   * Streaming document ingest from a WATCHED DIRECTORY of raw files: the
   * full reference ingest lifecycle (dir walk → charset-detected decode →
   * embed → upsert, `main.py:122-125`) as a live stream. New files
   * matching `glob` become micro-batches via the binaryFile source
   * ([[graft.ingest.DirSource.filesStream]] — identical decode kernel and
   * projection as the batch dir scan), each batch is embedded with the
   * pre-fitted model and upserted keyed by file path, so re-delivered or
   * re-listed files are exactly-once BY KEY like every other sink here.
   * Completes the ingest story: events streamed before; now collections
   * ingest continuously too.
   */
  def ingestFileStream(
      spark: SparkSession,
      dir: String,
      model: EmbedModel,
      collection: VectorCollection,
      checkpointDir: String,
      glob: String = "*.txt"): StreamingQuery =
    ingestStream(graft.ingest.DirSource.filesStream(spark, dir, glob),
      "path", "text", model, collection, checkpointDir)

  /**
   * Streaming NEAR-duplicate admission: each micro-batch of documents is
   * admitted only if it near-duplicates neither the already-admitted
   * corpus nor an earlier document of the same batch — the continuous
   * form of the daily-batch admission query (`batch_near_dup`), built on
   * the persisted [[MinHashIndex]] so the corpus-side shingle+MinHash
   * kernel is never re-paid.
   *
   * Per micro-batch (foreachBatch — the stateful artifact IS the state,
   * so no in-engine dedup state grows with the corpus):
   *   1. replay guard: drop ids already in the admitted corpus
   *      (exactly-once BY KEY, like every sink here);
   *   2. in-batch: [[graft.dedup.Dedup.dropNearDuplicates]] under the
   *      index's own (n, numHashes, bands) parameters — batch-sized work;
   *   3. vs corpus: [[MinHashIndex.nearDupAgainstExact]] band-joins the
   *      batch against the persisted band table and exact-verifies only
   *      candidate pairs; survivors are admitted;
   *   4. admitted rows append to the corpus parquet and incrementally
   *      upsert into the index (both O(batch)).
   *
   * At 100 TB the corpus-sized artifacts touched per batch are the band
   * table (columnar, band-key join) and — via the replay guard's
   * left-anti join — one columnar scan of the admitted corpus's ID
   * column; never the text. Measured (BENCH_SCALE.md round-15
   * `stream_flat`): per-batch cost grows ≈1.5× for a 30× corpus, the id
   * stripe + band join share. A deployment at genuine scale should keep
   * the admitted-id set as its own compact sidecar (or a bloom filter)
   * instead of re-reading the corpus parquet's id column per batch — the
   * guard only needs id membership, not the table. Each batch appends
   * one small file to the corpus AND one to the index's signature table;
   * when either exceeds `maxSinkFiles` files the batch callback folds it
   * first ([[graft.index.Compaction.compactDir]] / [[MinHashIndex.compact]]
   * — the callback IS the guaranteed single-writer window; 0 disables),
   * so file counts stay bounded by data size, not by batches
   * ever admitted. Single-writer
   * contract per index/admitted-dir, like the index upsert itself.
   *
   * `admittedDir` must hold the same corpus the index was built from
   * (schema: idCol, textCol, payload...).
   */
  def admitStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      index: MinHashIndex,
      admittedDir: String,
      threshold: Double,
      checkpointDir: String,
      maxBucketSize: Int = 10000,
      maxSinkFiles: Int = 256): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // auto-maintenance INSIDE the batch callback — the one place the
        // single-writer window is guaranteed: when either append target
        // (the corpus dir, the signature table) has accumulated more
        // than maxSinkFiles files, fold it before this batch reads it.
        // Bounded-frequency by construction (a compacted dir is ~total/
        // target files, so the trigger re-arms only after ~maxSinkFiles
        // further batches); 0 disables.
        if (maxSinkFiles > 0) {
          graft.index.Compaction.compactDir(spark, admittedDir,
            minFiles = maxSinkFiles)
          index.compact(minFiles = maxSinkFiles)
        }
        val m = index.meta
        val corpus = spark.read.parquet(admittedDir)
        val replayFree = batch.join(
          corpus.select(col(idCol)), Seq(idCol), "left_anti")
        val inBatch = graft.dedup.Dedup.dropNearDuplicates(
          replayFree, idCol, textCol,
          n = m.n, numHashes = m.numHashes, bands = m.bands,
          threshold = threshold, maxBucketSize = maxBucketSize)
        val matched = index.nearDupAgainstExact(
            inBatch, idCol, textCol, corpus, idCol, textCol,
            threshold, maxBucketSize)
          .select(col("batch_id").as(idCol)).distinct()
        // eager: the admitted frame feeds two writes; localCheckpoint
        // also severs it from the corpus read, so the append below can't
        // invalidate its own input listing
        val admitted = inBatch.join(matched, Seq(idCol), "left_anti")
          .localCheckpoint(true)
        if (!admitted.isEmpty) {
          // Upsert BEFORE append: the append is the commit point (the
          // replay guard keys on admittedDir). A crash between the two
          // then replays the batch — benign, because self-candidates are
          // id-filtered, exact-verify reads text from the not-yet-appended
          // corpus, and MinHashIndex.upsert is idempotent by key. The
          // reverse order's crash left admitted ids with no signatures:
          // the guard dropped them on restart and the index permanently
          // missed their bands (later duplicates sailed through).
          index.upsert(admitted, idCol, textCol)
          admitted.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(admittedDir)
        }
      }
      .start()

  /**
   * Streaming SPAN-CUT admission: each micro-batch is cut against the
   * persisted [[graft.index.SpanIndex]] — tokens covered by an n-gram the
   * admitted corpus (or an earlier doc of the same batch) already
   * contains are removed, the cleaned rows append to `cleanDir`, and the
   * index upserts with the CLEANED text's grams so later batches dedup
   * against exactly what was committed. The continuous form of
   * `index_span_cut`, and the span-level sibling of [[admitStream]]
   * (which rejects whole near-duplicate documents; this keeps every
   * document but strips its duplicated passages).
   *
   * Per micro-batch (foreachBatch; the artifact IS the state): replay
   * guard by key against `cleanDir`, [[graft.index.SpanIndex.cut]] in
   * foreign-batch mode, append, [[graft.index.SpanIndex.upsert]] — all
   * O(batch) plus the bucket-pruned gram-table join. Output schema:
   * `idCol`, `n_tokens`, `n_cut`, `textCol` (the cleaned text).
   * Each batch appends one small file to `cleanDir` (the gram table
   * itself is shadow-rewritten per upsert, never appended) — when its
   * file count exceeds `maxSinkFiles` the batch callback folds it first
   * ([[graft.index.Compaction.compactDir]]; 0 disables), so file counts
   * stay bounded by data size, not by batches ever admitted.
   * Single-writer contract per index/cleanDir, and batch ids must be
   * disjoint from the indexed corpus (the index ownership contract).
   */
  def cutStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      index: graft.index.SpanIndex,
      cleanDir: String,
      checkpointDir: String,
      preserveCase: Boolean = false,
      maxSinkFiles: Int = 256): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // auto-maintenance in the guaranteed single-writer window — see
        // admitStream; compactDir no-ops while cleanDir is small/absent
        if (maxSinkFiles > 0)
          graft.index.Compaction.compactDir(spark, cleanDir,
            minFiles = maxSinkFiles)
        // cleanDir is this sink's own output: empty until the first batch
        // commits, so "nothing there yet" means "nothing admitted yet".
        // The existence pre-check keeps the expected first-batch miss out
        // of the error log (Spark logs the FileNotFound at ERROR before
        // a catch would see it); the try stays for the dir-exists-but-
        // empty race a concurrent cleaner could leave.
        val cleanPath = new org.apache.hadoop.fs.Path(cleanDir)
        val cleanFs = cleanPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val fresh =
          (if (!cleanFs.exists(cleanPath)) None
          else
            try Some(spark.read.parquet(cleanDir).select(col(idCol)))
            catch { case scala.util.control.NonFatal(_) => None })
            .fold(batch)(seen => batch.join(seen, Seq(idCol), "left_anti"))
        val cleaned = index.cut(fresh, idCol, textCol,
            preserveCase = preserveCase)
          .withColumnRenamed("text_clean", textCol)
          .localCheckpoint(true)
        if (!cleaned.isEmpty) {
          // Upsert BEFORE append (the append commits the batch for the
          // replay guard). A crash between the two replays the batch
          // against an index that already holds the cleaned grams — the
          // cut is unchanged because ownership coalesce keeps the stored
          // owner and cutWithOwners exempts a gram's owner, so each doc
          // keeps exactly what it kept the first time; the re-upsert only
          // inflates n_docs for this batch's grams (harmless in foreign
          // mode, which tests presence). The reverse order's crash left
          // cleaned ids committed with their grams permanently missing —
          // later duplicates of admitted passages were never cut.
          index.upsert(cleaned, idCol, textCol)
          cleaned.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(cleanDir)
        }
      }
      .start()

  /**
   * Streaming exact-dedup: drop rows whose key was already seen, keeping
   * state only within the watermark horizon — the streaming twin of
   * [[graft.dedup.Dedup.dropExactDuplicates]]. Unbounded dedup state is the
   * classic streaming-pipeline OOM (at corpus-ingest rates the seen-keys
   * set grows forever); `dropDuplicatesWithinWatermark` expires keys once
   * the watermark passes them, so state is O(keys per horizon) and a
   * duplicate arriving outside the horizon is a documented re-admit.
   * Batch frames take the exact, horizon-free `dropDuplicates`.
   *
   * Key on a content digest (e.g. `md5(text)`) computed upstream to dedup
   * by content rather than by id without carrying document text in state.
   */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      lateness: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, lateness).dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /**
   * Batch sessionization — the exact, replayable twin of the streaming
   * [[sessionize]]: events more than `gapSeconds` apart start a new
   * session per user. Standard two-window shape: a lag over
   * (user, event-time) marks boundaries, a running sum numbers sessions —
   * one shuffle keyed by user, state never leaves the window operator.
   * Gaps are compared in whole SECONDS-BOUNDARY counts (unix_timestamp
   * truncation), which is sub-second-precision-agnostic and therefore
   * cross-engine exact.
   *
   * @return one row per (user, session): user id, 1-based session_id,
   *         n_events, session start/end timestamps
   */
  def sessionizeBatch(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val boundary = when(prev.isNull ||
      unix_timestamp(col(tsCol)) - unix_timestamp(prev) > gapSeconds, 1).otherwise(0)
    events
      .withColumn("__b", boundary)
      .withColumn("session_id",
        sum(col("__b")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"))
  }

  /**
   * Interval join, batch AND stream: left rows joined to right rows of the
   * same key whose time falls in `[leftTime - horizonSeconds, leftTime]` —
   * the streaming counterpart of [[graft.ops.AsOfJoin]]'s tolerance form
   * (stream-stream joins cannot express "latest match only", so this
   * yields ALL matches in the horizon; reduce downstream if one is
   * needed).
   *
   * On streaming frames both sides carry watermarks and the time-range
   * condition bounds join state: each side buffers only `horizon +
   * lateness` of events per key, the exact requirement for Spark to GC
   * stream-stream join state. On batch frames the watermark is a no-op
   * and the plan is a key-hash equi-join + range filter (no BNL — the
   * equi-key anchors the join), which is the oracle-checked twin
   * (`events_interval_join`).
   *
   * Column names must be disjoint across sides (rename upstream).
   */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      on: String,
      rightOn: String,
      leftTime: String,
      rightTime: String,
      horizonSeconds: Long,
      lateness: String = "10 minutes"): DataFrame = {
    val overlap = left.columns.intersect(right.columns)
    require(overlap.isEmpty,
      s"intervalJoin requires disjoint column names across sides; rename upstream: " +
        overlap.mkString("[", ", ", "]") +
        " appear on both (an overlapping name would make the join condition " +
        "ambiguous or silently self-compare)")
    val (l, r) =
      if (left.isStreaming || right.isStreaming)
        (left.withWatermark(leftTime, lateness),
          right.withWatermark(rightTime, lateness))
      else (left, right)
    l.join(r,
      col(on) === col(rightOn) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $horizonSeconds SECONDS") &&
        col(rightTime) <= col(leftTime))
  }

  /**
   * Stream-static enrichment join: each streaming row joined (left) to a
   * static dimension — the standard "attach user/doc metadata to an event
   * stream" step. The dimension is broadcast explicitly: stream-static
   * joins re-plan the static side per micro-batch, and a broadcast keeps
   * that per-batch cost a map-side lookup with NO shuffle of the stream
   * (stateless — nothing to watermark, unlike stream-stream joins). For a
   * dimension too large to broadcast, pre-bucket both sides instead
   * ([[graft.index.BucketedCorpus]]).
   *
   * Works identically on batch frames (same unified plan), which is how
   * the spec cross-checks it.
   */
  def enrichStream(stream: DataFrame, dim: DataFrame, on: String): DataFrame =
    stream.join(broadcast(dim), Seq(on), "left")

  final case class SessionUpdate(userId: Long, nEvents: Long, totalValue: Double, closed: Boolean)

  /**
   * Per-user sessionization via mapGroupsWithState: accumulates event
   * count/value per user; with `timeoutMs` set, emits the closed session
   * when the user goes quiet that long (processing-time timeout — note
   * the engine then schedules extra micro-batches to evaluate timeouts,
   * so `processAllAvailable` never settles; production queries use a real
   * trigger). `timeoutMs = None` keeps state open-ended. State is
   * O(active users).
   */
  def sessionize(
      events: Dataset[(Long, Double)], // (user_id, value)
      timeoutMs: Option[Long] = Some(30000L)): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val conf = timeoutMs.fold(GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.ProcessingTimeTimeout())
    events.groupByKey(_._1)
      .mapGroupsWithState(conf) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            val (n, v) = state.get
            state.remove()
            SessionUpdate(userId, n, v, closed = true)
          } else {
            val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
            val batch = rows.toSeq
            val updated = (n0 + batch.size, v0 + batch.map(_._2).sum)
            state.update(updated)
            timeoutMs.foreach(state.setTimeoutDuration)
            SessionUpdate(userId, updated._1, updated._2, closed = false)
          }
      }
  }

  /** Normalize the fixture's `ts` column to session-zone `TimestampType`,
    * whatever physical type the parquet writer chose:
    *   - `TIMESTAMP`/`TIMESTAMP_NTZ` (micro-precision writers; the current
    *     fixture) pass through with an NTZ→LTZ cast — values are UTC and
    *     the session zone is UTC, so instants are unchanged;
    *   - `BIGINT` (int64-nanos writers read under the nanosAsLong legacy
    *     conf) truncates nanos → micros, Spark's native precision.
    * Everything downstream (windows, watermarks, sessionization, as-of)
    * sees one stable type regardless of fixture vintage. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Convenience: batch-read the events fixture with streaming-compatible
    * types (see [[normalizeTs]]). Legacy int64-nanos fixtures are only
    * readable at all under `spark.sql.legacy.parquet.nanosAsLong`, which
    * must stay set session-wide for the lazy scan to execute — that path
    * is entered only when the plain read rejects the file's footer. */
  def eventsBatch(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(
      try graft.Tables.events(spark, dir)
      catch { case scala.util.control.NonFatal(_) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        graft.Tables.events(spark, dir)
      })

  /** A file-source stream over a DIRECTORY of event parquet files (file
    * streams watch directories; new files become micro-batches). Schema is
    * pinned from the existing files; same `ts` normalization as
    * [[eventsBatch]]. */
  def eventsStream(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema =
      (try spark.read.parquet(eventsDir)
      catch { case scala.util.control.NonFatal(_) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(eventsDir)
      }).schema
    normalizeTs(spark.readStream.schema(schema).parquet(eventsDir))
  }
}
