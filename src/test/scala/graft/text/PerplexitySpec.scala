package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("hand-computed two-doc corpus") {
    // Corpus: "aab" and "ab". Bigrams: doc1 → aa, ab; doc2 → ab.
    // c(aa)=1, c(ab)=2; c(a*)=3; V = |{a, b}| = 2.
    // P(a|a) = (1+1)/(3+2) = 0.4;  P(b|a) = (2+1)/(3+2) = 0.6.
    val docs = Seq((1L, "aab"), (2L, "ab")).toDF("doc_id", "text")
    val got = Perplexity.bitsPerChar(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("bits_per_char"))).toMap
    val lpAA = r6(math.log(0.4) / math.log(2.0))
    val lpAB = r6(math.log(0.6) / math.log(2.0))
    assert(got(1L)._1 === 2L)
    assert(math.abs(got(1L)._2 - r6(-(lpAA + lpAB) / 2.0)) < 1e-9)
    assert(got(2L)._1 === 1L)
    assert(math.abs(got(2L)._2 - r6(-lpAB)) < 1e-9)
  }

  test("uppercase folds into the same model as lowercase") {
    val a = Seq((1L, "The Cat"), (2L, "the cat")).toDF("doc_id", "text")
    val res = Perplexity.bitsPerChar(a, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bits_per_char")).toMap
    assert(res(1L) === res(2L))
  }

  test("junk text scores more bits than fluent repetition") {
    // A corpus dominated by English-ish prose plus one mojibake doc: the
    // junk doc's transitions are rare under the corpus model.
    val prose = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog and runs on"))
    val junk = Seq((99L, "qzxqj vkwpq zzxqv jqkzx wvqpz")) // rare transitions
    val docs = (prose ++ junk).toDF("doc_id", "text")
    val res = Perplexity.bitsPerChar(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bits_per_char")).toMap
    val proseMax = res.filterKeys(_ != 99L).values.max
    assert(res(99L) > proseMax + 1.0) // clearly separated, not a near-tie
  }

  test("documents under two characters are dropped") {
    val docs = Seq((1L, "a"), (2L, ""), (3L, "ok")).toDF("doc_id", "text")
    val ids = Perplexity.bitsPerChar(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }

  test("sf0.001 run: every doc scored, bits positive and finite") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val res = Perplexity.bitsPerChar(docs, "doc_id", "text").collect()
    assert(res.length === docs.count())
    res.foreach { r =>
      val b = r.getAs[Double]("bits_per_char")
      assert(b > 0.0 && b < 30.0)
      assert(r.getAs[Long]("n_bigrams") > 0L)
    }
  }
}
