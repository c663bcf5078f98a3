package graft.text

import graft.SparkSpec

class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int = 5) =
    DupSpans.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Double]("dup_frac")))).toMap

  test("hand-computed cross-document shared span") {
    // d1 spans: "a b c d e", "b c d e f"; d2 spans: "x a b c d",
    // "a b c d e" — exactly one shared 5-gram between them.
    val got = run(Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d e")))
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 1L, 0.5)))
  }

  test("within-document repetition alone is not duplication") {
    // The 5-gram "p q r s t" repeats inside doc 1 only: zero dup spans.
    val got = run(Seq(
      (1L, "p q r s t p q r s t"),
      (2L, "u v w x y z")))
    assert(got(1L)._2 === 0L)
    assert(got(2L)._2 === 0L)
  }

  test("documents shorter than n tokens are dropped") {
    val got = run(Seq((1L, "a b c"), (2L, "a b c d e")))
    assert(got.keySet === Set(2L))
    assert(got(2L) === ((1L, 0L, 0.0)))
  }

  test("case folding and whitespace runs use the canonical tokenizer") {
    val got = run(Seq(
      (1L, "The  Quick\tBrown   Fox Jumps"),
      (2L, "the quick brown fox jumps extra")))
    // Both contain the folded 5-gram "the quick brown fox jumps".
    assert(got(1L) === ((1L, 1L, 1.0)))
    assert(got(2L)._2 === 1L)
  }

  test("fully duplicated pair has dup_frac 1.0 on every span") {
    val text = "one two three four five six seven"
    val got = run(Seq((1L, text), (2L, text)))
    assert(got(1L) === ((3L, 3L, 1.0)))
    assert(got(2L) === ((3L, 3L, 1.0)))
  }

  test("zero-token documents pass through the cut as (0, 0, \"\") — never dropped") {
    // The pass-through contract covers the EMPTY case too: a doc whose
    // text yields no tokens (empty, whitespace-only, or null) must
    // survive the cut with an empty clean text — in cutStream, dropping
    // it here would silently lose the document from the clean corpus
    // forever (the sidecar replay guard never re-admits).
    val docs = Seq[(Long, String)](
      (1L, "a b c d e f"), (2L, "x a b c d e"),
      (3L, ""), (4L, "   \t  ")).toDF("doc_id", "text")
      .union(Seq(5L).toDF("doc_id").withColumn("text",
        org.apache.spark.sql.functions.lit(null).cast("string")))
    val got = DupSpans.cutDuplicatedSpans(docs, "doc_id", "text", 5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_cut"),
          r.getAs[String]("text_clean")))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L), "no doc may vanish")
    Seq(3L, 4L, 5L).foreach { id =>
      assert(got(id) === ((0L, 0L, "")), s"doc $id must emit (0, 0, \"\")")
    }
    assert(got(1L)._1 === 6L) // non-empty docs unchanged by the outer explode
  }

  private def runCut(docs: Seq[(Long, String)], n: Int = 5) =
    DupSpans.cutDuplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_cut"),
          r.getAs[String]("text_clean")))).toMap

  test("cut: canonical owner keeps the span, the other doc loses it") {
    val got = runCut(Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d e y")))
    // Doc 1 (min id) owns "a b c d e": untouched.
    assert(got(1L) === ((6L, 0L, "a b c d e f")))
    // Doc 2 loses tokens 2-6; "x" and "y" survive.
    assert(got(2L) === ((7L, 5L, "x y")))
  }

  test("cut: overlapping duplicated spans merge per-token") {
    // Doc 2 shares both "a b c d e" (pos 1) and "b c d e f" (pos 2):
    // coverage is tokens 1-6 merged, not 10.
    val got = runCut(Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f g")))
    assert(got(2L) === ((7L, 6L, "g")))
  }

  test("cut: everything removed yields empty text, short docs untouched") {
    val text = "one two three four five"
    val got = runCut(Seq((1L, text), (2L, text), (3L, "tiny doc")))
    assert(got(1L) === ((5L, 0L, text)))
    assert(got(2L) === ((5L, 5L, "")))
    assert(got(3L) === ((2L, 0L, "tiny doc")))
  }

  test("cut: preserveCase rebuilds original-case tokens, detection stays folded") {
    val got = DupSpans.cutDuplicatedSpans(
      Seq((1L, "A B C D E f"), (2L, "X a b c D e Y")).toDF("doc_id", "text"),
      "doc_id", "text", n = 5, preserveCase = true)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_cut"), r.getAs[String]("text_clean")))).toMap
    // The folded gram "a b c d e" matches across both docs; doc 1 (owner)
    // keeps its original casing, doc 2 keeps its survivors' casing.
    assert(got(1L) === ((0L, "A B C D E f")))
    assert(got(2L) === ((5L, "X Y")))
  }

  test("cut: ownership is per-gram, so a middle doc can both keep and lose") {
    // "a b c d e" occurs in docs 1+2 (owner 1); "v w x y z" in docs 2+3
    // (owner 2): doc 2 loses the first span but keeps the second.
    val got = runCut(Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e v w x y z"),
      (3L, "v w x y z")))
    assert(got(1L) === ((5L, 0L, "a b c d e")))
    assert(got(2L) === ((10L, 5L, "v w x y z")))
    assert(got(3L) === ((5L, 5L, "")))
  }

  test("cut: materializeGrams=false (the 100 TB recompute path) is output-identical") {
    // The flag trades pinned lineage-free executor storage for a second
    // run of the tokenize+md5 kernel; it must never change results.
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e v w x y z"),
      (3L, "v w x y z")).toDF("doc_id", "text")
    def dump(materialize: Boolean) =
      DupSpans.cutDuplicatedSpans(docs, "doc_id", "text", 5,
          materializeGrams = materialize)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_cut"), r.getAs[String]("text_clean")))
        .sortBy(_._1).toSeq
    assert(dump(materialize = false) === dump(materialize = true))
  }

  test("durable checkpoint mode: identical spans + cut texts, backing released by releaseTracked") {
    import graft.dedup.Dedup
    // The preemptible-cluster mode must be a pure materialization swap
    // for the span family too (r19 verdict #1): same per-doc span stats,
    // same cut texts — with the gram-count/gram-stream materializations
    // living as parquet under spark.graft.checkpointDir instead of
    // lineage-cut local blocks, and freed by the sweep-boundary release.
    val data = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x a b c d e y z"),
      (3L, "p q r s t u v w"))
    def spans() = run(data)
    def cuts() = runCut(data)
    val (baseSpans, baseCuts) = (spans(), cuts())
    val root = java.nio.file.Files.createTempDirectory("graft_durable_spans").toFile
    spark.conf.set(Dedup.CheckpointDirConf, root.toString)
    try {
      assert(spans() === baseSpans)
      assert(cuts() === baseCuts)
      val pfx = Dedup.durableDirPrefix(spark)
      def count(prefix: String) = Option(root.listFiles())
        .getOrElse(Array.empty).count(_.getName.startsWith(prefix))
      assert(count(s"${pfx}spangcnt_") == 1, "duplicatedSpans' gcnt must back durably")
      assert(count(s"${pfx}spangrams_") == 1, "cut's gram stream must back durably")
      // outputs fully consumed above — the nothing-in-flight boundary
      Dedup.releaseTracked(spark)
      assert(count("graft_") == 0, "releaseTracked must delete the backing dirs")
    } finally {
      spark.conf.unset(Dedup.CheckpointDirConf)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }
}
