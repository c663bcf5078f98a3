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
}
