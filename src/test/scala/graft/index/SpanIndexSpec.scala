package graft.index

import graft.SparkSpec
import graft.text.DupSpans

class SpanIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-spanidx").toString

  private val corpus = Seq(
    (1L, "a b c d e f"),
    (2L, "x a b c d e y"),
    (3L, "p q r s t u v"),
    (4L, "tiny"))

  test("self-cut is identical to the direct operator") {
    val docs = corpus.toDF("doc_id", "text")
    val idx = SpanIndex(spark, tmpRoot(), "docs")
      .build(docs, "doc_id", "text", n = 5, buckets = 8)
    val direct = DupSpans.cutDuplicatedSpans(docs, "doc_id", "text", n = 5)
      .collect().map(_.toSeq).toSet
    val viaIndex = idx.cut(docs, "doc_id", "text", batchIsIndexed = true)
      .collect().map(_.toSeq).toSet
    assert(viaIndex === direct)
  }

  test("foreign batch: corpus always owns shared grams, batch loses them") {
    val docs = corpus.toDF("doc_id", "text")
    val idx = SpanIndex(spark, tmpRoot(), "docs")
      .build(docs, "doc_id", "text", n = 5, buckets = 8)
    // Batch doc 100 repeats corpus doc 1's span; 101 is novel.
    val batch = Seq(
      (100L, "zz a b c d e f zz"),
      (101L, "totally novel text with no overlap at all")).toDF("doc_id", "text")
    val got = idx.cut(batch, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_cut"), r.getAs[String]("text_clean")))).toMap
    // Tokens 2-7 of doc 100 are covered by corpus grams (both 5-gram
    // windows of "a b c d e f" exist in corpus doc 1).
    assert(got(100L) === ((6L, "zz zz")))
    assert(got(101L)._1 === 0L)
  }

  test("foreign batch: batch-internal duplicates cut to the batch-min owner") {
    val docs = corpus.toDF("doc_id", "text")
    val idx = SpanIndex(spark, tmpRoot(), "docs")
      .build(docs, "doc_id", "text", n = 5, buckets = 8)
    val batch = Seq(
      (200L, "m n o p q r"),
      (201L, "m n o p q r")).toDF("doc_id", "text")
    val got = idx.cut(batch, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_cut")).toMap
    assert(got(200L) === 0L) // batch-min owner keeps its copy
    assert(got(201L) === 6L)
  }

  test("upserted index equals a rebuild over the union") {
    val docs = corpus.toDF("doc_id", "text")
    val batch = Seq(
      (100L, "zz a b c d e f zz"),
      (101L, "m n o p q r"),
      (102L, "m n o p q r s")).toDF("doc_id", "text")
    val upserted = SpanIndex(spark, tmpRoot(), "docs")
      .build(docs, "doc_id", "text", n = 5, buckets = 8)
    upserted.upsert(batch, "doc_id", "text")
    val rebuilt = SpanIndex(spark, tmpRoot(), "docs")
      .build(docs.unionByName(batch), "doc_id", "text", n = 5, buckets = 8)
    val probe = Seq((500L, "a b c d e f m n o p q r brand new tail here ok"))
      .toDF("doc_id", "text")
    def cutRows(ix: SpanIndex) =
      ix.cut(probe, "doc_id", "text").collect().map(_.toSeq).toSet
    assert(cutRows(upserted) === cutRows(rebuilt))
    // Later batches now dedup against the admitted one: 101's span is
    // owned by the index after upsert, so a repeat gets cut.
    val repeat = Seq((600L, "m n o p q r")).toDF("doc_id", "text")
    val got = upserted.cut(repeat, "doc_id", "text").collect().head
    assert(got.getAs[Long]("n_cut") === 6L)
  }

  test("cut before build fails loudly; meta pins gram size") {
    val root = tmpRoot()
    val idx = SpanIndex(spark, root, "docs")
    val docs = corpus.toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](idx.cut(docs, "doc_id", "text"))
    assert(e.getMessage.contains("build"))
    idx.build(docs, "doc_id", "text", n = 7, buckets = 4)
    assert(idx.n === 7)
  }
}
