package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "the lazy dog sleeps"),
    (3L, "quick quick quick brown"),
    (4L, "an unrelated document entirely")
  ).toDF("doc_id", "text")

  test("bm25: rare-term matches outrank common-term matches; idf discounts ubiquity") {
    val q = Seq((10L, "quick brown")).toDF("doc_id", "text")
    val res = Bm25.search(corpus, "doc_id", "text", q, "doc_id", "text",
      k = 4, excludeSelf = false, roundScoreTo = Some(6)).orderBy("rank").collect()
    // docs 1 and 3 both match both terms; 2 and 4 match neither query term
    val ids = res.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.toSet.intersect(Set(2L, 4L)).isEmpty,
      s"non-matching docs must not appear: $ids")
    assert(ids.take(2).toSet == Set(1L, 3L))
    assert(res.forall(_.getAs[Double]("score") > 0))
  }

  test("bm25: excludeSelf drops the query's own doc; tf saturates via k1") {
    val q = corpus.filter($"doc_id" === 3L)
    val res = Bm25.search(corpus, "doc_id", "text", q, "doc_id", "text",
      k = 4, roundScoreTo = Some(6)).collect()
    assert(!res.map(_.getAs[Long]("doc_id")).contains(3L))
    // doc 1 shares "quick" and "brown" -> best remaining match
    assert(res.minBy(_.getAs[Int]("rank")).getAs[Long]("doc_id") == 1L)
  }

  test("persisted index answers are identical to the self-contained operator") {
    val root = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
    val idx = graft.index.Bm25Index(spark, root, "docs")
    assert(!idx.exists)
    idx.build(docs, "doc_id", "text")
    assert(idx.exists)
    val q = graft.bench.Sampling.seeded(docs, "doc_id", 5)
    val direct = Bm25.search(docs, "doc_id", "text", q, "doc_id", "text",
      k = 10, roundScoreTo = Some(6))
    val fromIndex = idx.query(q, "doc_id", "text", k = 10,
      roundScoreTo = Some(6), outIdCol = "doc_id")
    assert(direct.exceptAll(fromIndex).count() == 0 &&
      fromIndex.exceptAll(direct).count() == 0)
  }

  test("bucketed postings: query scan is partition-pruned to the touched term shards") {
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_bk").toString
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
    val idx = graft.index.Bm25Index(spark, root, "docs")
      .build(docs, "doc_id", "text", buckets = 16)
    // layout: one directory per term-hash bucket
    val bucketDirs = new java.io.File(s"$root/docs/tf").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(bucketDirs.length > 1, s"expected bucketed layout, got ${bucketDirs.toSeq}")
    // a single-term query touches exactly one shard: the scan must carry a
    // partition filter on bucket (the IVF-cells move applied to text)
    val q = Seq((999L, "quick")).toDF("doc_id", "text")
    val res = idx.query(q, "doc_id", "text", k = 5, roundScoreTo = Some(6))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n$plan")
    // and pruning must not change answers: identical to the direct operator
    val qs = graft.bench.Sampling.seeded(docs, "doc_id", 5)
    val direct = Bm25.search(docs, "doc_id", "text", qs, "doc_id", "text",
      k = 10, roundScoreTo = Some(6))
    val pruned = idx.query(qs, "doc_id", "text", k = 10,
      roundScoreTo = Some(6), outIdCol = "doc_id")
    assert(direct.exceptAll(pruned).count() == 0 &&
      pruned.exceptAll(direct).count() == 0)
  }

  test("index upsert: build(d1) + upsert(d2) answers exactly like build(d1 ∪ d2)") {
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_up").toString
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
    val d1 = docs.filter($"doc_id" < 400)
    val d2 = docs.filter($"doc_id" >= 400)
    val idx = graft.index.Bm25Index(spark, root, "docs").build(d1, "doc_id", "text")
    idx.upsert(d2, "doc_id", "text")
    // re-delivering an ingested batch is a no-op (idempotent by key)
    idx.upsert(d2, "doc_id", "text")
    val full = graft.index.Bm25Index(spark,
      java.nio.file.Files.createTempDirectory("graft_bm25_full").toString, "docs")
      .build(docs, "doc_id", "text")
    val q = graft.bench.Sampling.seeded(docs, "doc_id", 5)
    val a = idx.query(q, "doc_id", "text", k = 10, roundScoreTo = Some(6))
    val b = full.query(q, "doc_id", "text", k = 10, roundScoreTo = Some(6))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("index compact: per-upsert posting files fold, hive layout kept, answers identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_cmp").toString
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
    val idx = graft.index.Bm25Index(spark, root, "docs")
      .build(docs.filter($"doc_id" < 300), "doc_id", "text", buckets = 4)
    // five single-ish upserts: each appends one file per touched bucket
    (0 until 5).foreach { i =>
      idx.upsert(docs.filter($"doc_id" >= 300 + i * 20 && $"doc_id" < 320 + i * 20),
        "doc_id", "text")
    }
    def tfFiles(): Seq[java.io.File] =
      new java.io.File(s"$root/docs/tf").listFiles()
        .filter(_.getName.startsWith("bucket=")).toSeq
        .flatMap(_.listFiles().filter(f =>
          !f.getName.startsWith("_") && !f.getName.startsWith(".")))
    val q = graft.bench.Sampling.seeded(docs.filter($"doc_id" < 400), "doc_id", 5)
    val before = idx.query(q, "doc_id", "text", k = 10, roundScoreTo = Some(6))
      .collect().toSet
    val nBefore = tfFiles().size
    val (b0, a0) = idx.compact(minFiles = 5)
    assert(b0 == nBefore && a0 < b0, s"expected a fold, got $b0 -> $a0")
    // hive layout preserved (readers keep pruning on bucket=), floor is one
    // file per present bucket, and answers are row-identical
    assert(new java.io.File(s"$root/docs/tf").listFiles()
      .count(_.getName.startsWith("bucket=")) == 4)
    assert(tfFiles().size <= 4)
    assert(idx.query(q, "doc_id", "text", k = 10, roundScoreTo = Some(6))
      .collect().toSet == before)
    // once at the per-bucket floor, further passes are no-ops
    val (b1, a1) = idx.compact(minFiles = 2)
    assert(b1 == a1)
  }

  test("bm25: string doc ids take the bounded-heap path and rank identically") {
    // same corpus, ids as non-numeric strings: since r17 the heap's
    // tie-break compares UTF8String bytes, so uuid-style ids stay on the
    // |Q|·k-bounded aggregate instead of the rank-window fallback — and
    // must produce the same ranking as the integral-id path modulo the id
    // mapping
    val named = corpus.select(concat(lit("doc-"), $"doc_id").as("doc_id"), $"text")
    val q = Seq(("q-1", "quick brown")).toDF("doc_id", "text")
    // Bm25.search localCheckpoints its result (scoped-persist pattern), so
    // the plan pin runs on the inner scoreTf stage it wraps.
    val tf = Bm25.tfFrame(named, "doc_id", "text")
    val dfTable = tf.groupBy($"__t").agg(countDistinct($"__d").as("__df"))
    val (n, dl) = Bm25.corpusStats(named, "text")
    val inner = Bm25.scoreTf(tf, dfTable, n, dl.toDouble / n, q, "doc_id", "text",
      k = 4, k1 = 1.2, b = 0.75, excludeSelf = false, roundScoreTo = Some(6),
      outIdCol = "doc_id")
    val plan = inner.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"),
      s"string ids must take the heap path, not a rank window:\n$plan")
    val res = Bm25.search(named, "doc_id", "text", q, "doc_id", "text",
      k = 4, excludeSelf = false, roundScoreTo = Some(6)).orderBy("rank").collect()
    val ids = res.map(_.getAs[String]("doc_id")).toSeq
    assert(ids.nonEmpty && ids.toSet.subsetOf(Set("doc-1", "doc-3")),
      s"non-matching docs must not appear and rows must survive: $ids")
    val numeric = Bm25.search(corpus, "doc_id", "text",
      Seq((10L, "quick brown")).toDF("doc_id", "text"), "doc_id", "text",
      k = 4, excludeSelf = false, roundScoreTo = Some(6)).orderBy("rank").collect()
    assert(ids == numeric.map(r => s"doc-${r.getAs[Long]("doc_id")}").toSeq)
  }

  test("upsert stats survive a non-deterministic batch (pinned before the append)") {
    // A batch plan that is NOT stable across executions: a random sample.
    // The admitted rows are checkpointed before the TF append, so the
    // pinned (n, totalTokens) must equal a rebuild over exactly the rows
    // that landed in tf/ — re-executing the lazy plan would disagree.
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_nd").toString
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
    val d1 = docs.filter($"doc_id" < 100)
    val idx = graft.index.Bm25Index(spark, root, "docs").build(d1, "doc_id", "text")
    val wild = docs.filter($"doc_id" >= 100).sample(0.5, seed = System.nanoTime())
    idx.upsert(wild, "doc_id", "text")
    val indexedDocs = spark.read.parquet(s"$root/docs/tf")
      .select($"doc".as("doc_id")).distinct()
    val truth = docs.join(indexedDocs, Seq("doc_id"))
    val rebuilt = graft.index.Bm25Index(spark,
      java.nio.file.Files.createTempDirectory("graft_bm25_nd2").toString, "docs")
      .build(truth, "doc_id", "text")
    val q = graft.bench.Sampling.seeded(truth, "doc_id", 5)
    val a = idx.query(q, "doc_id", "text", k = 10, roundScoreTo = Some(6))
    val b = rebuilt.query(q, "doc_id", "text", k = 10, roundScoreTo = Some(6))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("rrf: fuses two lists scale-free; doc ranked in both lists beats single-list docs") {
    val listA = Seq((1L, 100L, 1), (1L, 200L, 2)).toDF("query_id", "result_id", "rank")
    val listB = Seq((1L, 200L, 1), (1L, 300L, 2)).toDF("query_id", "result_id", "rank")
    val fused = Hybrid.rrf(Seq(listA, listB), k = 60, topK = 3).orderBy("rank").collect()
    // 200 appears in both lists (1/62 + 1/61) and must beat the single-list
    // rank-1 doc 100 (1/61) and doc 300 (1/62)
    assert(fused.map(_.getAs[Long]("result_id")).toSeq == Seq(200L, 100L, 300L))
    val s = fused.map(_.getAs[Double]("score"))
    assert(s(0) > s(1) && s(1) > s(2))
  }

  test("weighted fusion: min-max calibrated convex sum; alpha dials the balance") {
    // dense: a(1.0) > b(0.5) > c(0.0 after min-max); lexical: c best, b mid, a absent
    val dense = Seq((1L, 100L, 0.9), (1L, 200L, 0.5), (1L, 300L, 0.1))
      .toDF("query_id", "result_id", "score")
    val lexical = Seq((1L, 300L, 12.0), (1L, 200L, 8.0), (1L, 400L, 4.0))
      .toDF("query_id", "result_id", "score")
    val fused = Hybrid.weighted(dense, lexical, alpha = 0.5, topK = 4)
      .orderBy("rank").collect()
    // normalized: dense a=1 b=.5 c=0; lexical c=1 b=.5 d=0
    // fused: a=.5, b=.5, c=.5, d=0 -> three-way tie broken by id, d last
    assert(fused.map(_.getAs[Long]("result_id")).toSeq == Seq(100L, 200L, 300L, 400L))
    assert(fused.take(3).forall(_.getAs[Double]("score") == 0.5))
    assert(fused.last.getAs[Double]("score") == 0.0)
    // alpha = 1.0: pure dense ranking, lexical-only docs sink to zero
    val denseOnly = Hybrid.weighted(dense, lexical, alpha = 1.0, topK = 4)
      .orderBy("rank").collect()
    assert(denseOnly.take(3).map(_.getAs[Long]("result_id")).toSeq ==
      Seq(100L, 200L, 300L))
    // degenerate all-tied list: every doc keeps the list's full weight
    val tied = Seq((1L, 100L, 3.0), (1L, 200L, 3.0)).toDF("query_id", "result_id", "score")
    val f2 = Hybrid.weighted(tied, lexical, alpha = 0.5, topK = 2).collect()
    assert(f2.filter(_.getAs[Long]("result_id") == 100L)
      .head.getAs[Double]("score") == 0.5)
  }

  test("rrf: string result ids take the bounded-heap path, same fusion order") {
    val listA = Seq(("q", "a", 1), ("q", "b", 2)).toDF("query_id", "result_id", "rank")
    val listB = Seq(("q", "b", 1), ("q", "c", 2)).toDF("query_id", "result_id", "rank")
    val fusedDf = Hybrid.rrf(Seq(listA, listB), k = 60, topK = 3)
    val plan = fusedDf.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"),
      s"string result ids must take the heap path, not a rank window:\n$plan")
    val fused = fusedDf.orderBy("rank").collect()
    assert(fused.map(_.getAs[String]("result_id")).toSeq == Seq("b", "a", "c"))
  }
}
