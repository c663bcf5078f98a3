package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.TfIdfEmbedder
import graft.index.{CollectionMeta, VectorCollection}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed event stats with watermark finalize windows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String, Double)]
    val agg = Streaming.windowedEventStats(
      source.toDF().toDF("ts", "event_type", "value"),
      windowLength = "1 hour", lateness = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_test")
      .outputMode("append").start()
    try {
      source.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0),
        (ts("2024-01-01 10:45:00"), "view", 5.0))
      q.processAllAvailable()
      // watermark hasn't passed 11:10 yet -> nothing finalized
      assert(spark.table("win_test").count() == 0)
      source.addData((ts("2024-01-01 12:00:00"), "click", 9.0))
      q.processAllAvailable()
      val out = spark.table("win_test")
        .select($"w_start".cast("string"), $"event_type", $"n_events", $"total_value")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(out.toSeq == Seq(
        ("2024-01-01 10:00:00", "click", 2L, 3.0),
        ("2024-01-01 10:00:00", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sliding windows on a stream: each event in two windows, matches batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String, Double)]
    val rows = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),  // windows 09:30 and 10:00
      (ts("2024-01-01 10:40:00"), "click", 2.0))  // windows 10:00 and 10:30
    val agg = Streaming.windowedEventStats(
      source.toDF().toDF("ts", "event_type", "value"), slide = Some("30 minutes"))
    val q = agg.writeStream.format("memory").queryName("slide_test")
      .outputMode("append").start()
    try {
      source.addData(rows: _*)
      source.addData((ts("2024-01-01 13:00:00"), "view", 0.0)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("slide_test").filter($"event_type" === "click")
        .select($"w_start".cast("string"), $"n_events").as[(String, Long)]
        .collect().toSet
      assert(got == Set(
        ("2024-01-01 09:30:00", 1L), ("2024-01-01 10:00:00", 2L),
        ("2024-01-01 10:30:00", 1L)))
      // batch twin over the same rows yields the identical window set
      val batch = Streaming.windowedEventStats(
          rows.toDF("ts", "event_type", "value"), slide = Some("30 minutes"))
        .select($"w_start".cast("string"), $"n_events").as[(String, Long)]
        .collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming ingest embeds micro-batches and upserts idempotently by key") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_stream")
    val fitDocs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
    val model = new TfIdfEmbedder(dim = 64).fit(fitDocs, "text")
    val coll = VectorCollection(spark, tmp.toString, "stream_coll")
    coll.create(CollectionMeta(64, "cosine", normalized = true))

    // data BEFORE start: AvailableNow snapshots available offsets when the
    // query starts, so addData after .start() races the snapshot (flaky
    // zero-batch runs). Same ordering at every AvailableNow site below.
    val source = MemoryStream[(Long, String)]
    source.addData((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
    val q = Streaming.ingestStream(
      source.toDF().toDF("doc_id", "text"), "doc_id", "text", model, coll,
      s"$tmp/ckpt1")
    q.awaitTermination() // AvailableNow drains and stops
    assert(coll.load().count() == 2)

    // second run re-delivers an old key plus a new one -> only the new lands
    val source2 = MemoryStream[(Long, String)]
    source2.addData((2L, "delta epsilon zeta"), (3L, "eta theta iota"))
    val q2 = Streaming.ingestStream(
      source2.toDF().toDF("doc_id", "text"), "doc_id", "text", model, coll,
      s"$tmp/ckpt2")
    q2.awaitTermination()
    val rows = coll.load()
    assert(rows.count() == 3)
    assert(rows.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(rows.schema("vec").dataType.typeName == "array")
  }

  test("file-stream ingest into a collection: decode → embed → idempotent upsert; batch twin") {
    val tmp = Files.createTempDirectory("graft_fstream")
    val watched = Files.createDirectory(tmp.resolve("docs"))
    def put(name: String, text: String): Unit =
      Files.write(watched.resolve(name), text.getBytes("UTF-8"))
    put("a.txt", "alpha beta gamma")
    put("b.txt", "delta epsilon zeta")

    val fitDocs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
    val model = new TfIdfEmbedder(dim = 64).fit(fitDocs, "text")
    val coll = VectorCollection(spark, tmp.toString, "file_coll")
    coll.create(CollectionMeta(64, "cosine", normalized = true))

    val q = Streaming.ingestFileStream(spark, watched.toString, model, coll,
      s"$tmp/ckpt1")
    q.awaitTermination() // AvailableNow drains and stops
    assert(coll.load().count() == 2)

    // a new file lands; the old ones are re-listed by the fresh stream but
    // must not duplicate (exactly-once by path key)
    put("c.txt", "eta theta iota")
    val q2 = Streaming.ingestFileStream(spark, watched.toString, model, coll,
      s"$tmp/ckpt2")
    q2.awaitTermination()
    val got = coll.load()
    assert(got.count() == 3)

    // batch twin: the same dir through the batch scan + the same model
    // yields identical vectors per path
    val batch = model.transform(
        graft.ingest.DirSource.files(spark, watched.toString), "text", "vec")
      .select($"path", $"vec".as("batch_vec"))
    val joined = got.join(batch, Seq("path"))
    assert(joined.count() == 3)
    assert(joined.filter($"vec" =!= $"batch_vec").count() == 0)
  }

  test("streaming near-dup admission: replay, in-batch, and vs-corpus dups all rejected") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_admit")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs before noon today ok")
    ).toDF("doc_id", "text")
    corpus.write.parquet(s"$tmp/admitted")
    val idx = graft.index.MinHashIndex(spark, tmp.toString, "admit_idx")
    idx.build(corpus, "doc_id", "text", n = 3, numHashes = 128, bands = 32)

    val source = MemoryStream[(Long, String)]
    source.addData( // before start: AvailableNow snapshots offsets at start
      // near-dup of corpus doc 1 (one word changed, jaccard ~0.54) -> reject
      (10L, "the quick brown fox jumps over the crazy dog again and again"),
      // fresh -> admit
      (11L, "sphinx of black quartz judge my vow said the wise old owl"),
      // exact in-batch dup of 11 -> reject (11 is the kept representative)
      (12L, "sphinx of black quartz judge my vow said the wise old owl"),
      // replayed already-admitted id -> reject
      (1L, "the quick brown fox jumps over the lazy dog again and again"))
    val q = Streaming.admitStream(source.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, s"$tmp/admitted", threshold = 0.5, s"$tmp/ckpt1")
    q.awaitTermination()
    val admitted = spark.read.parquet(s"$tmp/admitted")
    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 11L))

    // the admitted doc was upserted into the index incrementally: a later
    // batch near-dupping IT (not the seed corpus) must now be rejected
    val source2 = MemoryStream[(Long, String)]
    source2.addData(
      (20L, "sphinx of black quartz judge my vow said the wise young owl"),
      (21L, "how vexingly quick daft zebras jump over the fence right now"))
    val q2 = Streaming.admitStream(source2.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, s"$tmp/admitted", threshold = 0.5, s"$tmp/ckpt2")
    q2.awaitTermination()
    val admitted2 = spark.read.parquet(s"$tmp/admitted")
    assert(admitted2.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 11L, 21L))
    // index state tracks the admitted corpus 1:1
    assert(idx.signatures().count() == 4)
  }

  test("admission id sidecar: bootstraps from an existing corpus, tracks admitted ids") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_admit_sc")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs before noon today ok")
    ).toDF("doc_id", "text")
    corpus.write.parquet(s"$tmp/admitted")
    val idx = graft.index.MinHashIndex(spark, tmp.toString, "sc_idx")
    idx.build(corpus, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    val source = MemoryStream[(Long, String)]
    source.addData(
      (11L, "sphinx of black quartz judge my vow said the wise old owl"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"))
    val q = Streaming.admitStream(source.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, s"$tmp/admitted", threshold = 0.5, s"$tmp/ckpt1")
    q.awaitTermination()
    // the sidecar is exactly the admitted id set: pre-existing corpus ids
    // seeded at bootstrap (__batch = -1) plus the committed batch's record
    val sc = spark.read.parquet(Streaming.admitIdsDir(s"$tmp/admitted"))
    assert(sc.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 11L))
    assert(sc.filter($"__batch" === -1L).count() == 2)
    assert(sc.filter($"__batch" >= 0L).select("doc_id").as[Long].collect().toSeq == Seq(11L))
    assert(spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 11L))
  }

  test("admission crash recovery: a decided-but-uncommitted batch heals, never duplicates") {
    val tmp = Files.createTempDirectory("graft_admit_heal")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    corpus.write.parquet(s"$tmp/admitted")
    val idx = graft.index.MinHashIndex(spark, tmp.toString, "heal_idx")
    idx.build(corpus, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    val batch = Seq(
      (30L, "sphinx of black quartz judge my vow said the wise old owl"),
      (31L, "how vexingly quick daft zebras jump over the fence right now"))
      .toDF("doc_id", "text")
    // a normal batch commits: sidecar record + corpus rows + signatures
    Streaming.admitBatch(batch, 0L, "doc_id", "text", idx, s"$tmp/admitted",
      threshold = 0.5, checkpointDir = s"$tmp/ckptA")
    assert(spark.read.parquet(s"$tmp/admitted").count() == 3)
    // REPLAY of the same (checkpoint, batch): the decision record routes
    // to the heal path — nothing missing, nothing recomputed, NO duplicates
    Streaming.admitBatch(batch, 0L, "doc_id", "text", idx, s"$tmp/admitted",
      threshold = 0.5, checkpointDir = s"$tmp/ckptA")
    assert(spark.read.parquet(s"$tmp/admitted").count() == 3,
      "replaying a committed batch must not duplicate corpus rows")
    assert(idx.signatures().count() == 3)
    // simulate a crash BETWEEN the sidecar append and the corpus append:
    // doc 40's decision record exists, its corpus row does not
    val crashBatch = Seq(
      (40L, "five boxing wizards jump quickly over the frozen lazy river"))
      .toDF("doc_id", "text")
    crashBatch.select($"doc_id", lit(s"$tmp/ckptB").as("__ckpt"), lit(7L).as("__batch"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(Streaming.admitIdsDir(s"$tmp/admitted"))
    // the replayed batch heals: the recorded id is committed to the corpus
    // (and signed), exactly once
    Streaming.admitBatch(crashBatch, 7L, "doc_id", "text", idx, s"$tmp/admitted",
      threshold = 0.5, checkpointDir = s"$tmp/ckptB")
    val healed = spark.read.parquet(s"$tmp/admitted")
    assert(healed.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 30L, 31L, 40L))
    assert(idx.signatures().count() == 4, "healed row is signed into the index")
    // healing is idempotent too
    Streaming.admitBatch(crashBatch, 7L, "doc_id", "text", idx, s"$tmp/admitted",
      threshold = 0.5, checkpointDir = s"$tmp/ckptB")
    assert(spark.read.parquet(s"$tmp/admitted").count() == 4)
    assert(idx.signatures().count() == 4)
    // a RESPELLED-but-equivalent checkpoint path (trailing slash) must
    // still key the same decision records: both the committed-batch
    // replay and a fresh crash-window heal resolve through the
    // normalized key instead of stranding the decided ids (ADVICE r16)
    Streaming.admitBatch(crashBatch, 7L, "doc_id", "text", idx, s"$tmp/admitted",
      threshold = 0.5, checkpointDir = s"$tmp/ckptB/")
    assert(spark.read.parquet(s"$tmp/admitted").count() == 4,
      "a trailing-slash respelling must hit the same decision record, not re-admit")
    val crashBatch2 = Seq(
      (41L, "pack my box with five dozen liquor jugs said the clerk quietly"))
      .toDF("doc_id", "text")
    crashBatch2.select($"doc_id", lit(s"$tmp/ckptC").as("__ckpt"), lit(2L).as("__batch"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(Streaming.admitIdsDir(s"$tmp/admitted"))
    Streaming.admitBatch(crashBatch2, 2L, "doc_id", "text", idx, s"$tmp/admitted",
      threshold = 0.5, checkpointDir = s"$tmp/ckptC/")
    assert(spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 30L, 31L, 40L, 41L),
      "the heal keyed on a respelled checkpoint path must still fire")
  }

  test("span-cut admission: duplicated passages stripped, index tracks cleaned text") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_cut_stream").toString
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val idx = graft.index.SpanIndex(spark, s"$tmp/idx", "corpus")
      .build(corpus, "doc_id", "text", n = 5, buckets = 8)

    val source = MemoryStream[(Long, String)]
    source.addData(
      // embeds corpus doc 1's full text -> those 9 tokens cut, tail kept
      (10L, "the quick brown fox jumps over the lazy dog but what a tail"),
      // novel -> untouched
      (11L, "sphinx of black quartz judge my vow tonight"))
    val q = Streaming.cutStream(source.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, s"$tmp/clean", s"$tmp/ckpt1")
    q.awaitTermination()
    val clean = spark.read.parquet(s"$tmp/clean")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_cut"), r.getAs[String]("text")))).toMap
    assert(clean(10L) === ((9L, "but what a tail")))
    assert(clean(11L) === ((0L, "sphinx of black quartz judge my vow tonight")))

    // The cleaned text was upserted: a later batch repeating doc 11's
    // passage (admitted) OR doc 10's surviving tail (too short to gram at
    // n=5... use 11) gets cut against the ADMITTED stream content.
    val source2 = MemoryStream[(Long, String)]
    source2.addData(
      (20L, "sphinx of black quartz judge my vow tonight"),
      // replayed id -> dropped entirely (exactly-once by key)
      (10L, "the quick brown fox jumps over the lazy dog but what a tail"))
    val q2 = Streaming.cutStream(source2.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, s"$tmp/clean", s"$tmp/ckpt2")
    q2.awaitTermination()
    val clean2 = spark.read.parquet(s"$tmp/clean")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_cut"), r.getAs[String]("text")))).toMap
    assert(clean2.keySet === Set(10L, 11L, 20L))
    assert(clean2(20L) === ((8L, "")))
  }

  test("sidecar placement and lifecycle guards: slash-normalized path, reset-checkpoint refusal, corrupt sidecar loud, reconcile repairs a relocated checkpoint") {
    // a trailing slash must NOT nest the sidecar inside the data dir
    // (maintenance rewrites of the data dir would destroy it)
    assert(Streaming.admitIdsDir("/data/corpus/") == "/data/corpus__ids")
    assert(Streaming.admitIdsDir("/data/corpus") == "/data/corpus__ids")

    val tmp = Files.createTempDirectory("graft_sidecar_guards").toString
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val idx = graft.index.SpanIndex(spark, s"$tmp/idx", "corpus")
      .build(corpus, "doc_id", "text", n = 5, buckets = 8)
    val batchA = Seq((10L, "sphinx of black quartz judge my vow tonight"))
      .toDF("doc_id", "text")
    Streaming.cutBatch(batchA, 0L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckpt")
    assert(spark.read.parquet(s"$tmp/clean").count() == 1)

    // RESET checkpoint (same path, batchIds restart at 0, different data):
    // the heal must refuse loudly, not silently drop the new batch
    val batchB = Seq((20L, "a wholly different document arrives now here"))
      .toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Streaming.cutBatch(batchB, 0L, "doc_id", "text", idx, s"$tmp/clean",
        checkpointDir = s"$tmp/ckpt")
    }
    assert(err.getMessage.contains("FRESH checkpointDir"), err.getMessage)

    // RELOCATED checkpoint inside the decision->append crash window:
    // id 30 is decided under ckptX but its row never landed; a new
    // checkpoint path can never heal it and the guard drops it — until
    // reconcileSidecar removes the stranded decision
    Seq(30L)
      .toDF("doc_id").select($"doc_id", lit(s"$tmp/ckptX").as("__ckpt"),
        lit(7L).as("__batch"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(Streaming.admitIdsDir(s"$tmp/clean"))
    val batchC = Seq((30L, "stranded by a checkpoint move"))
      .toDF("doc_id", "text")
    Streaming.cutBatch(batchC, 0L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckptNew")
    assert(spark.read.parquet(s"$tmp/clean").count() == 1) // still dropped
    assert(Streaming.reconcileSidecar(spark, s"$tmp/clean", "doc_id") == 1L)
    Streaming.cutBatch(batchC, 1L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckptNew")
    assert(spark.read.parquet(s"$tmp/clean")
      .filter($"doc_id" === 30L).count() == 1) // re-admitted
    assert(Streaming.reconcileSidecar(spark, s"$tmp/clean", "doc_id") == 0L)

    // a PRESENT but unreadable sidecar must fail loudly, not silently
    // re-bootstrap (which would disable the replay guard and duplicate
    // the corpus id set per batch)
    val idsDir = Streaming.admitIdsDir(s"$tmp/clean")
    java.nio.file.Files.write(
      Paths.get(idsDir, "part-corrupt.snappy.parquet"),
      "not parquet at all".getBytes)
    intercept[Exception] {
      Streaming.cutBatch(batchC, 2L, "doc_id", "text", idx, s"$tmp/clean",
        checkpointDir = s"$tmp/ckptNew")
    }
  }

  test("span-cut crash recovery: decided-but-uncommitted rows re-cut identically, never duplicated") {
    val tmp = Files.createTempDirectory("graft_cut_heal").toString
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val idx = graft.index.SpanIndex(spark, s"$tmp/idx", "corpus")
      .build(corpus, "doc_id", "text", n = 5, buckets = 8)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog but what a tail"),
      (11L, "sphinx of black quartz judge my vow tonight")).toDF("doc_id", "text")
    Streaming.cutBatch(batch, 0L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckptA")
    def cleanRows() = spark.read.parquet(s"$tmp/clean")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_cut"), r.getAs[String]("text")))).toMap
    val first = cleanRows()
    assert(first(10L) === ((9L, "but what a tail")))
    assert(first(11L) === ((0L, "sphinx of black quartz judge my vow tonight")))
    // replay of a fully-committed batch: heal path, no duplicates
    Streaming.cutBatch(batch, 0L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckptA")
    assert(spark.read.parquet(s"$tmp/clean").count() == 2)
    // simulate a crash BETWEEN the decision record and the clean append:
    // doc 20's grams are upserted and its decision recorded, but its
    // cleaned row never landed
    val crashBatch = Seq(
      (20L, "sphinx of black quartz judge my vow tonight maybe again"))
      .toDF("doc_id", "text")
    val preCut = idx.cut(crashBatch, "doc_id", "text")
      .withColumnRenamed("text_clean", "text").localCheckpoint(true)
    idx.upsert(preCut, "doc_id", "text")
    crashBatch.select($"doc_id", lit(s"$tmp/ckptB").as("__ckpt"), lit(3L).as("__batch"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(Streaming.admitIdsDir(s"$tmp/clean"))
    // the replayed batch heals: doc 20 is re-cut and lands EXACTLY as the
    // crashed attempt computed it (ownership exemption keeps its own grams)
    Streaming.cutBatch(crashBatch, 3L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckptB")
    val healed = cleanRows()
    assert(healed.keySet === Set(10L, 11L, 20L))
    val expected = preCut.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_cut"), r.getAs[String]("text")))).toMap
    assert(healed(20L) === expected(20L),
      s"heal recompute must match the crashed attempt: ${healed(20L)} vs ${expected(20L)}")
    // healing is idempotent
    Streaming.cutBatch(crashBatch, 3L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckptB")
    assert(spark.read.parquet(s"$tmp/clean").count() == 3)
  }

  test("admission auto-compaction: sink file count stays bounded, rows exact") {
    // Six single-doc admission runs would leave six corpus appends and
    // six signature appends; with maxSinkFiles=3 the batch callback folds
    // each target whenever it reaches 3 files, so counts stay bounded by
    // data size while every admitted row survives the rewrites.
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_admit_compact")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    corpus.write.parquet(s"$tmp/admitted")
    val idx = graft.index.MinHashIndex(spark, tmp.toString, "admit_cidx")
    idx.build(corpus, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    val fresh = Seq(
      "sphinx of black quartz judge my vow said the wise old owl",
      "how vexingly quick daft zebras jump over the fence right now",
      "grumpy wizards make toxic brew for the evil queen and jack",
      "five boxing wizards jump quickly over the frozen lazy river",
      "jived fox nymph grabs quick waltz in the bright summer air",
      "two driven jocks help fax my big quiz before lunch arrives")
    fresh.zipWithIndex.foreach { case (text, i) =>
      val src = MemoryStream[(Long, String)]
      src.addData((100L + i, text))
      val q = Streaming.admitStream(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", idx, s"$tmp/admitted", threshold = 0.5,
        s"$tmp/ckpt_c$i", maxSinkFiles = 3, sidecarBuckets = 4)
      q.awaitTermination()
    }
    def files(p: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var n = 0
      while (it.hasNext) {
        val f = it.next().getPath.getName
        if (!f.startsWith("_") && !f.startsWith(".")) n += 1
      }
      n
    }
    val admitted = spark.read.parquet(s"$tmp/admitted")
    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq
      == (Seq(1L) ++ (0 until 6).map(100L + _)),
      "every fresh doc admitted, none lost across compactions")
    assert(files(s"$tmp/admitted") <= 3,
      s"corpus file count must stay bounded, got ${files(s"$tmp/admitted")}")
    assert(files(s"$tmp/admit_cidx/sig") <= 3,
      s"signature file count must stay bounded, got ${files(s"$tmp/admit_cidx/sig")}")
    // sidecar bound = L0 batch files (≤ maxSinkFiles) + base (≤ buckets);
    // the fold retires L0 appends into <idsDir>_base/bucket=N/ (sibling)
    val idsDir = Streaming.admitIdsDir(s"$tmp/admitted")
    assert(files(idsDir) <= 3 + 4,
      s"id-sidecar file count must stay bounded, got ${files(idsDir)}")
    assert(new java.io.File(s"${idsDir}_base").isDirectory,
      "the maintenance fold must have produced the bucketed base level")
    assert(idx.signatures().count() == 7, "index rows survive compaction")
    // the sidecar (both levels) tracks the admitted id set exactly
    val l0Ids = spark.read.parquet(idsDir).select("doc_id")
    val baseIds = spark.read.parquet(s"${idsDir}_base").select("doc_id")
    assert(l0Ids.union(baseIds).as[Long].collect().sorted.toSeq
      == (Seq(1L) ++ (0 until 6).map(100L + _)))
  }

  test("sidecar fold: L0 retires into a bucketed base; guard, heal ordering and reconcile still exact") {
    val tmp = Files.createTempDirectory("graft_sidecar_fold").toString
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val idx = graft.index.SpanIndex(spark, s"$tmp/idx", "fold_corpus")
      .build(corpus, "doc_id", "text", n = 5, buckets = 8)
    // three committed batches, then an explicit fold
    (0 until 3).foreach { i =>
      val b = Seq((10L + i, s"wholly fresh document number $i with plenty of unique words here"))
        .toDF("doc_id", "text")
      Streaming.cutBatch(b, i.toLong, "doc_id", "text", idx, s"$tmp/clean",
        checkpointDir = s"$tmp/ckpt", maxSinkFiles = 0)
    }
    val idsDir = Streaming.admitIdsDir(s"$tmp/clean")
    Streaming.foldSidecar(spark, idsDir, "doc_id", buckets = 4)
    // layout: no L0 data files left, base bucketed with pinned meta
    val fs = new org.apache.hadoop.fs.Path(idsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(idsDir)).exists(s =>
      s.isFile && !s.getPath.getName.startsWith("_")), "L0 files must retire")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"${idsDir}_base/_meta.json")))
    val base = spark.read.parquet(s"${idsDir}_base")
    assert(base.select("doc_id").as[Long].collect().sorted.toSeq == Seq(10L, 11L, 12L))
    assert(base.columns.contains("bucket"))
    // replay guard: an id that lives ONLY in the folded base is still
    // dropped (touched-bucket pruning must not lose it)
    val replay = Seq((11L, "wholly fresh document number 1 with plenty of unique words here"),
        (30L, "sphinx of black quartz judge my vow tonight"))
      .toDF("doc_id", "text")
    Streaming.cutBatch(replay, 9L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckpt", maxSinkFiles = 0)
    assert(spark.read.parquet(s"$tmp/clean").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(10L, 11L, 12L, 30L),
      "base-resident ids must be guard-dropped; fresh ids admitted")
    // a second fold folds the new L0 rows in, rows exact across both folds
    Streaming.foldSidecar(spark, idsDir, "doc_id", buckets = 4)
    assert(spark.read.parquet(s"${idsDir}_base").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(10L, 11L, 12L, 30L))
    // heal-before-fold ordering: a decided-but-uncommitted record in L0
    // heals even when the batch's own maintenance would trigger a fold
    val crash = Seq((40L, "five boxing wizards jump quickly over the frozen river"))
      .toDF("doc_id", "text")
    crash.select($"doc_id", lit(s"$tmp/ckptB").as("__ckpt"), lit(0L).as("__batch"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(idsDir)
    Streaming.cutBatch(crash, 0L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckptB", maxSinkFiles = 1, sidecarBuckets = 4)
    assert(spark.read.parquet(s"$tmp/clean").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(10L, 11L, 12L, 30L, 40L),
      "the crash-window record must heal before any fold can retire it")
    // reconcile sees BOTH levels: strand a record, fold it into the base,
    // then reconcile drops exactly that row and the id re-admits
    Seq(50L).toDF("doc_id")
      .select($"doc_id", lit(s"$tmp/ckptX").as("__ckpt"), lit(7L).as("__batch"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(idsDir)
    Streaming.foldSidecar(spark, idsDir, "doc_id", buckets = 4)
    assert(Streaming.reconcileSidecar(spark, s"$tmp/clean", "doc_id") == 1L)
    val strandedRetry = Seq((50L, "grumpy wizards make toxic brew for the evil queen"))
      .toDF("doc_id", "text")
    Streaming.cutBatch(strandedRetry, 0L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckptY", maxSinkFiles = 0)
    assert(spark.read.parquet(s"$tmp/clean").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(10L, 11L, 12L, 30L, 40L, 50L),
      "a base-folded stranded decision must reconcile away and re-admit")
  }

  test("sidecar drift guards: base-typed bucket pruning, reserved id column, raw-spelled decision records") {
    val tmp = Files.createTempDirectory("graft_sidecar_drift").toString
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val idx = graft.index.SpanIndex(spark, s"$tmp/idx", "drift_corpus")
      .build(corpus, "doc_id", "text", n = 5, buckets = 8)
    (0 until 3).foreach { i =>
      val b = Seq((10L + i, s"wholly fresh document number $i with plenty of unique words here"))
        .toDF("doc_id", "text")
      Streaming.cutBatch(b, i.toLong, "doc_id", "text", idx, s"$tmp/clean",
        checkpointDir = s"$tmp/ckpt", maxSinkFiles = 0)
    }
    val idsDir = Streaming.admitIdsDir(s"$tmp/clean")
    Streaming.foldSidecar(spark, idsDir, "doc_id", buckets = 4)

    // RESERVED COLUMN: an id column named after the fold's own bucket
    // column (or the sidecar's commit columns) must refuse loudly.
    Seq("bucket", "__ckpt", "__batch").foreach { bad =>
      val err = intercept[IllegalArgumentException] {
        Streaming.foldSidecar(spark, idsDir, bad, buckets = 4)
      }
      assert(err.getMessage.contains("reserved"), err.getMessage)
    }
    // ... and at BATCH ENTRY, not only inside the fold: a stream with
    // maxSinkFiles=0 never folds, so a fold-only check would admit
    // batches with the ambiguous column forever (r18 ADVICE) — the
    // misconfiguration must refuse before any sidecar row is written.
    val err2 = intercept[IllegalArgumentException] {
      Streaming.cutBatch(
        Seq((99L, "some wholly different text")).toDF("bucket", "text"),
        99L, "bucket", "text", idx, s"$tmp/clean",
        checkpointDir = s"$tmp/ckptR", maxSinkFiles = 0)
    }
    assert(err2.getMessage.contains("reserved"), err2.getMessage)

    // RAW-SPELLED DECISION RECORD (pre-normalization writer): a decided-
    // but-uncommitted record whose __ckpt stored the caller's RAW path
    // spelling must still heal when the stream restarts with that same
    // spelling (the normalized key alone would never match it).
    val rawCkpt = s"$tmp/ckptZ/" // trailing slash: raw != normalized
    Seq(40L).toDF("doc_id")
      .select($"doc_id", lit(rawCkpt).as("__ckpt"), lit(0L).as("__batch"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(idsDir)
    val healed = Seq((40L, "five boxing wizards jump quickly over the frozen river"))
      .toDF("doc_id", "text")
    Streaming.cutBatch(healed, 0L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = rawCkpt, maxSinkFiles = 0)
    assert(spark.read.parquet(s"$tmp/clean")
      .filter($"doc_id" === 40L).count() == 1,
      "a raw-spelled crash-window record must heal, not stay guard-dropped")

    // ID-TYPE DRIFT (last — an int batch that admitted rows would append
    // an int-typed file into long-typed dirs): the folded base hashed
    // LONG ids into buckets; a source schema drifting to INT must not
    // prune by xxhash64(int) — equal ids hash to different buckets across
    // types and the guard would silently re-admit folded history. Premise
    // check first: the fixture ids must actually bucket differently
    // across the two types, or this test could pass vacuously.
    val discriminates = spark.range(10, 13)
      .select(
        pmod(xxhash64($"id"), lit(4L)).as("asLong"),
        pmod(xxhash64($"id".cast("int")), lit(4L)).as("asInt"))
      .filter($"asLong" =!= $"asInt").count()
    assert(discriminates > 0, "fixture ids must bucket differently as int vs long")
    val before = spark.read.parquet(s"$tmp/clean").count()
    val intBatch = Seq( // every id already admitted -> nothing may land
      (10, "wholly fresh document number 0 with plenty of unique words here"),
      (11, "wholly fresh document number 1 with plenty of unique words here"),
      (12, "wholly fresh document number 2 with plenty of unique words here"))
      .toDF("doc_id", "text") // IntegerType ids
    Streaming.cutBatch(intBatch, 7L, "doc_id", "text", idx, s"$tmp/clean",
      checkpointDir = s"$tmp/ckpt", maxSinkFiles = 0)
    assert(spark.read.parquet(s"$tmp/clean").count() == before,
      "base-folded ids must stay guard-dropped under an int-typed batch")
    // ...and the reserved-column refusal above wrote no sidecar row
    // (idsDir is readable here — the heal section re-populated its L0)
    assert(spark.read.parquet(idsDir).filter($"__batch" === 99L).isEmpty,
      "the refused batch must not have appended a sidecar row")
  }

  test("touched-bucket pruning: a cast-nulled batch id falls back to the UNPRUNED base") {
    val tmp = Files.createTempDirectory("graft_sidecar_castnull").toString
    val idsDir = s"$tmp/data__ids"
    (0L until 16L).map(i => (i, "ck", 0L)).toDF("doc_id", "__ckpt", "__batch")
      .write.parquet(idsDir)
    Streaming.foldSidecar(spark, idsDir, "doc_id", buckets = 4)
    // one L0 row so the guard's L0 frame keeps the base's LONG id type
    Seq((100L, "ck", 1L)).toDF("doc_id", "__ckpt", "__batch")
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(idsDir)
    // premise: the folded base spans several buckets, so a wrongly-pruned
    // read would actually lose ids (not pass vacuously)
    val baseBuckets = spark.read.parquet(Streaming.sidecarBaseDir(idsDir))
      .select($"bucket").distinct().count()
    assert(baseBuckets > 1, s"fixture must span >1 bucket, got $baseBuckets")
    // '1e2' casts to NULL as BIGINT yet equals long id 100 under the
    // join's double coercion — and xxhash64 SKIPS null inputs (yielding
    // the seed's hash, never null), so hashing the cast directly would
    // prune to the seed's one bucket and silently re-admit most of the
    // folded base. The guard must detect the null on the CAST column and
    // read the base unpruned.
    val batch = Seq("1e2").toDF("doc_id")
    val got = Streaming.guardIdsFor(spark, idsDir, batch, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == (0L until 16L).toSet + 100L,
      s"guard must see the FULL base on a cast-nulled id; got ${got.size} ids")
  }

  test("file-source events stream: windowed agg over the fixture matches batch") {
    val streamDir = Files.createTempDirectory("graft_events_stream")
    Files.copy(Paths.get(s"${graft.TestSpark.sf0001}/events.parquet"),
      streamDir.resolve("events.parquet"))
    val agg = Streaming.windowedEventStats(
      Streaming.eventsStream(spark, streamDir.toString))
    val q = agg.writeStream.format("memory").queryName("file_win")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("file_win").count()
    val batch = Streaming.windowedEventStats(
      Streaming.eventsBatch(spark, graft.TestSpark.sf0001)).count()
    // append mode withholds windows the watermark hasn't passed — the tail
    // of the fixture stays open, everything earlier must be emitted
    assert(streamed > 0 && streamed <= batch)
    assert(batch - streamed <= 2, s"streamed=$streamed batch=$batch")
  }

  test("searchCollection picks dot metric for normalized collections") {
    val tmp = Files.createTempDirectory("graft_search_coll")
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    val model = new TfIdfEmbedder(dim = 64).fit(docs, "text")
    val vecs = model.transform(docs, "text", "vec").select($"doc_id", $"vec")
    val coll = VectorCollection(spark, tmp.toString, "norm_coll")
    coll.create(CollectionMeta(64, "cosine", normalized = true))
    coll.upsert(vecs, "doc_id")
    val res = graft.search.Knn.searchCollection(coll, vecs, "doc_id", "vec",
      "doc_id", "vec", k = 2, roundScoreTo = Some(6))
    // dot on unit vectors == cosine: self excluded, scores within [-1,1]
    assert(res.count() == 6)
    assert(res.filter($"query_id" === $"doc_id").count() == 0)
    val scores = res.select($"score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
  }

  test("stream-stream interval join matches its batch twin and bounds state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streaming.intervalJoin(
      clicks.toDF().toDF("user_id", "click_id", "ts"),
      views.toDF().toDF("v_user_id", "view_id", "v_ts"),
      "user_id", "v_user_id", "ts", "v_ts", horizonSeconds = 3600L)
    val q = joined.writeStream.format("memory").queryName("ij_test")
      .outputMode("append").start()
    val clickRows = Seq(
      (1L, 10L, ts("2024-01-01 12:00:00")),
      (2L, 20L, ts("2024-01-01 12:30:00")))
    val viewRows = Seq(
      (1L, 100L, ts("2024-01-01 11:30:00")), // in horizon of click 10
      (1L, 101L, ts("2024-01-01 10:30:00")), // too old
      (1L, 102L, ts("2024-01-01 12:00:00")), // same instant: included
      (2L, 200L, ts("2024-01-01 12:45:00"))) // after the click: excluded
    try {
      clicks.addData(clickRows: _*)
      views.addData(viewRows: _*)
      q.processAllAvailable()
      val got = spark.table("ij_test").select($"click_id", $"view_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 100L), (10L, 102L)))
    } finally q.stop()
    // batch twin on the same rows: identical pair set
    val batch = Streaming.intervalJoin(
      clickRows.toDF("user_id", "click_id", "ts"),
      viewRows.toDF("v_user_id", "view_id", "v_ts"),
      "user_id", "v_user_id", "ts", "v_ts", horizonSeconds = 3600L)
      .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
    assert(batch == Set((10L, 100L), (10L, 102L)))
    // batch plan: the equi-key anchors a hash join — no nested loop
    val plan = Streaming.intervalJoin(
      clickRows.toDF("user_id", "click_id", "ts"),
      viewRows.toDF("v_user_id", "view_id", "v_ts"),
      "user_id", "v_user_id", "ts", "v_ts", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("interval join rejects overlapping column names with a pointed message") {
    val l = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("user_id", "ts")
    val r = Seq((1L, ts("2024-01-01 11:30:00"))).toDF("user_id", "v_ts")
    val e = intercept[IllegalArgumentException] {
      Streaming.intervalJoin(l, r, "user_id", "user_id", "ts", "v_ts", 3600L)
    }
    assert(e.getMessage.contains("user_id") && e.getMessage.contains("rename upstream"))
  }

  test("stream-static enrichment join attaches dimension rows, keeps unmatched") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, String)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = Streaming.enrichStream(events.toDF().toDF("user_id", "event"), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      events.addData((1L, "click"), (3L, "view"))
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .select($"user_id", $"event", $"tier").as[(Long, String, Option[String])]
        .collect().toSet
      assert(got == Set((1L, "click", Some("gold")), (3L, "view", None)))
    } finally q.stop()
    // batch twin: identical rows through the same function
    val batch = Streaming.enrichStream(
        Seq((1L, "click"), (3L, "view")).toDF("user_id", "event"), dim, "user_id")
      .select($"user_id", $"event", $"tier").as[(Long, String, Option[String])]
      .collect().toSet
    assert(batch == Set((1L, "click", Some("gold")), (3L, "view", None)))
  }

  test("dedupStream drops within-horizon duplicate keys, batch twin is exact") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Long, String)]
    val dedup = Streaming.dedupStream(
      source.toDF().toDF("ts", "doc_id", "text"), Seq("doc_id"),
      tsCol = "ts", lateness = "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "a"),
        (ts("2024-01-01 10:01:00"), 1L, "a"), // dup in same batch
        (ts("2024-01-01 10:02:00"), 2L, "b"))
      q.processAllAvailable()
      source.addData((ts("2024-01-01 10:03:00"), 2L, "b")) // dup across batches
      source.addData((ts("2024-01-01 10:04:00"), 3L, "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select($"doc_id").as[Long]
        .collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
    // batch frame: plain exact dedup, no watermark required
    val batch = Streaming.dedupStream(
      Seq((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 11:00:00"), 1L))
        .toDF("ts", "doc_id"), Seq("doc_id"))
    assert(batch.count() == 1)
  }

  test("sessionizeBatch splits on gaps > threshold, numbers sessions per user") {
    val df = Seq(
      (7L, ts("2024-01-01 10:00:00")),
      (7L, ts("2024-01-01 10:10:00")), // same session (10 min gap)
      (7L, ts("2024-01-01 11:00:00")), // 50 min gap -> new session
      (7L, ts("2024-01-01 11:30:00")), // exactly 30 min -> NOT > gap, same session
      (9L, ts("2024-01-01 09:00:00"))).toDF("user_id", "ts")
    val got = Streaming.sessionizeBatch(df, gapSeconds = 1800L)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
    assert(got.keySet == Set((7L, 1), (7L, 2), (9L, 1)))
    assert(got((7L, 1))._1 == 2L)
    assert(got((7L, 2)) == ((2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00"))))
    assert(got((9L, 1))._1 == 1L)
  }

  test("sessionize accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Double)]
    val q = Streaming.sessionize(source.toDS(), timeoutMs = None)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("update").start()
    try {
      source.addData((7L, 1.5), (7L, 2.5), (9L, 4.0))
      q.processAllAvailable()
      source.addData((7L, 6.0))
      q.processAllAvailable()
      val latest = spark.table("sess_test")
        .groupBy($"userId").agg(max($"nEvents").as("n"), max($"totalValue").as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(latest.toSeq == Seq((7L, 3L, 10.0), (9L, 1L, 4.0)))
    } finally q.stop()
  }
}
