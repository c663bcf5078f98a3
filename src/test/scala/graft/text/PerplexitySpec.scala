package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Reference model of DetMath.log2q20 (same shift-and-square steps). */
  private def q20(num: Long, den: Long): Long = {
    var m = num.toDouble / den.toDouble
    var e = 0L
    for (_ <- 1 to 64) {
      if (m >= 2.0) { m *= 0.5; e += 1 }
      else if (m < 1.0) { m *= 2.0; e -= 1 }
    }
    var acc = 0L
    for (_ <- 1 to 20) {
      val m2 = m * m
      if (m2 >= 2.0) { m = m2 * 0.5; acc = acc * 2 + 1 }
      else { m = m2; acc = acc * 2 }
    }
    e * (1L << 20) + acc
  }

  test("q20 reference matches libm log2 to within the fixed-point grid") {
    for ((n, d) <- Seq((2L, 5L), (3L, 5L), (1L, 3L), (7L, 2L), (1L, 1L), (1024L, 1L))) {
      val exact = math.log(n.toDouble / d) / math.log(2.0)
      assert(math.abs(q20(n, d) / 1048576.0 - exact) < 2.0 / 1048576.0,
        s"q20($n,$d)")
    }
  }

  test("hand-computed two-doc corpus") {
    // Corpus: "aab" and "ab". Bigrams: doc1 → aa, ab; doc2 → ab.
    // c(aa)=1, c(ab)=2; c(a*)=3; V = |{a, b}| = 2.
    // P(a|a) = (1+1)/(3+2) = 0.4;  P(b|a) = (2+1)/(3+2) = 0.6.
    // qlogs are the q20 fixed-point log2 of those probabilities.
    val docs = Seq((1L, "aab"), (2L, "ab")).toDF("doc_id", "text")
    val got = Perplexity.bitsPerChar(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("bits_per_char"))).toMap
    val qAA = q20(2, 5)
    val qAB = q20(3, 5)
    assert(got(1L)._1 === 2L)
    assert(got(1L)._2 === r6(-((qAA + qAB).toDouble / (2.0 * 1048576.0))))
    assert(got(2L)._1 === 1L)
    assert(got(2L)._2 === r6(-(qAB.toDouble / 1048576.0)))
  }

  test("q20_bits is the exact integer score; bits_per_char derives from it") {
    val docs = Seq((1L, "aab"), (2L, "ab")).toDF("doc_id", "text")
    val got = Perplexity.bitsPerChar(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("q20_bits"),
          r.getAs[Double]("bits_per_char"))).toMap
    val qAA = q20(2, 5)
    val qAB = q20(3, 5)
    assert(got(1L)._2 === -(qAA + qAB)) // qlogs are negative → q20_bits positive
    assert(got(2L)._2 === -qAB)
    for ((_, (n, q, b)) <- got)
      assert(b === r6(q.toDouble / n.toDouble / 1048576.0))
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
