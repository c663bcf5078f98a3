package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs; "the" appears in all (idf = ln(1) = 0), "zebra" only in doc 1.
  private lazy val docs = Seq(
    (1L, "the zebra zebra jumps the fence"),
    (2L, "the cow eats grass"),
    (3L, "the cow sleeps"),
    (4L, "the fence is tall")
  ).toDF("doc_id", "text")

  test("distinctive rare term outranks ubiquitous term") {
    val kw = Keywords.tfidfKeywords(docs, "doc_id", "text", topN = 3)
      .filter($"doc_id" === 1L).orderBy("kw_rank").collect()
    assert(kw.head.getAs[String]("keyword") === "zebra") // tf=2 · log2(4/1)
    // "the" has idf log2(4/4)=0 → tfidf 0, beaten by any unique term.
    val keywords = kw.map(_.getAs[String]("keyword")).toSeq
    assert(!keywords.contains("the"))
  }

  test("tfidf values match hand computation, ranks dense within doc") {
    val kw = Keywords.tfidfKeywords(docs, "doc_id", "text", topN = 3).collect()
    val doc1 = kw.filter(_.getAs[Long]("doc_id") == 1L).sortBy(_.getAs[Int]("kw_rank"))
    // idf is now q20 log2: log2(4/1) = 2 exactly, so zebra = tf·2 = 4.0.
    val zebra = doc1.head
    assert(zebra.getAs[Double]("tfidf") === 4.0)
    // Within every doc ranks are 1..n without gaps.
    kw.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      val ranks = g.map(_.getAs[Int]("kw_rank")).sorted.toSeq
      assert(ranks === (1 to ranks.length))
    }
  }

  test("score ties rank by ascending term") {
    // Doc 4's "is" and "tall" both have tf=1, df=1 → equal tfidf; binary
    // string order must break the tie.
    // tfidf: is = tall = log2(4) > fence = log2(2) > the = 0; the tie
    // between "is" and "tall" breaks to "is" (binary string order).
    val doc4 = Keywords.tfidfKeywords(docs, "doc_id", "text", topN = 3)
      .filter($"doc_id" === 4L).orderBy("kw_rank").collect()
      .map(_.getAs[String]("keyword")).toSeq
    assert(doc4 === Seq("is", "tall", "fence"))
  }

  test("documents with fewer distinct terms than topN emit fewer rows") {
    val tiny = Seq((1L, "word"), (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val kw = Keywords.tfidfKeywords(tiny, "doc_id", "text", topN = 3)
    assert(kw.filter($"doc_id" === 1L).count() === 1)
    assert(kw.filter($"doc_id" === 2L).count() === 3)
  }
}
