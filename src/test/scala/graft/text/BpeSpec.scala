package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE tokenizer (Bpe.train driver-side on a seeded sample +
  * expr.BpeEncode map-side): merge selection and encoding pinned against
  * the classic hand-computed reference (the Sennrich et al. low/lower/
  * newest/widest corpus), determinism, nesting under word counts, and
  * null/empty/unknown-symbol edges. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // word frequencies low:5 lower:2 newest:6 widest:3 — the textbook
  // example; one word per doc row to keep frequencies explicit.
  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("train reproduces the hand-computed merge sequence (ties lexicographic)") {
    val m = Bpe.train(corpus, "doc_id", "text", numMerges = 4, sampleSize = 1000)
    // round 1: (e,s) and (s,t) tie at 9 -> lexicographic; then (es,t)=9;
    // then (l,o)/(o,w) tie at 7 -> lexicographic; then (lo,w)=7
    assert(m.pairs == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("encode replays merges by rank: the textbook 'lowest' decomposition") {
    val m = Bpe.train(corpus, "doc_id", "text", numMerges = 4, sampleSize = 1000)
    val got = Seq((1L, "lowest"), (2L, "LOWEST lowest"), (3L, "xyz"))
      .toDF("doc_id", "text")
      .select($"doc_id", Bpe.encode($"text", m).as("sub"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("low", "est"))
    assert(got(2L) == Seq("low", "est", "low", "est"), "lowercase fold + word split")
    assert(got(3L) == Seq("x", "y", "z"), "symbols with no merges stay single chars")
  }

  test("null -> null, empty/whitespace -> empty; counts nest under word counts") {
    val m = Bpe.train(corpus, "doc_id", "text", numMerges = 4, sampleSize = 1000)
    val df = Seq((1L, "newest widest lowest"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val rows = df.select($"doc_id", Bpe.tokenCount($"text", m).as("n"),
        TextAnalysis.tokenCount($"text").as("nw"),
        Bpe.encode($"text", m).as("sub"))
      .collect().map(r => (r.getLong(0), r)).toMap
    assert(rows(1L).getInt(1) >= rows(1L).getAs[Number]("nw").intValue,
      "a word is >= 1 subword")
    assert(rows(1L).getSeq[String](3).take(3) == Seq("n", "e", "w"),
      "newest = n,e,w,est under these 4 merges")
    assert(rows(2L).getSeq[String](3).isEmpty && rows(3L).getSeq[String](3).isEmpty)
    assert(rows(4L).isNullAt(3), "null text -> null subwords")
  }

  test("training is deterministic and sample-bounded") {
    val a = Bpe.train(corpus, "doc_id", "text", numMerges = 6, sampleSize = 1000)
    val b = Bpe.train(corpus, "doc_id", "text", numMerges = 6, sampleSize = 1000)
    assert(a == b)
    // numMerges beyond exhaustion stops early instead of looping
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val m = Bpe.train(tiny, "doc_id", "text", numMerges = 50, sampleSize = 10)
    assert(m.pairs == Seq(("a", "b")), "one possible merge, then pairs are exhausted")
    // smaller sample: still deterministic (the salted-md5 prefix order)
    val s1 = Bpe.train(corpus, "doc_id", "text", numMerges = 3, sampleSize = 8)
    val s2 = Bpe.train(corpus, "doc_id", "text", numMerges = 3, sampleSize = 8)
    assert(s1 == s2)
  }

  test("astral (non-BMP) characters stay whole symbols, never lone surrogates") {
    // U+1F600 😀 and U+10348 𐍈 are outside the BMP: code-unit iteration
    // would split them into surrogate halves that become replacement bytes
    // in UTF8String and collide across distinct characters.
    val astral = (Seq.fill(4)("😀😀ab") ++ // 😀😀ab x4
      Seq.fill(2)("𐍈ab")) // 𐍈ab x2
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val m = Bpe.train(astral, "doc_id", "text", numMerges = 1, sampleSize = 100)
    // (😀,😀) count 4 beats (a,b) count 6? no — (a,b)=6, (😀,😀)=4, (😀,a)=4,
    // (𐍈,a)=2 -> best is (a,b); symbols must be the full astral chars
    assert(m.pairs == Seq(("a", "b")))
    val enc = Seq((1L, "😀ab 𐍈")).toDF("doc_id", "text")
      .select(Bpe.encode($"text", m)).head().getSeq[String](0)
    assert(enc == Seq("😀", "ab", "𐍈"),
      "astral chars are single symbols; ab merges")
    // distinct astral chars never collide in a fingerprint
    val fp = Seq((1L, "😀"), (2L, "𐍈"))
      .toDF("doc_id", "text")
      .select(md5(concat_ws(" ", Bpe.encode($"text", m)))).collect()
    assert(fp(0).getString(0) != fp(1).getString(0))
  }

  test("merge list round-trips through the parquet artifact") {
    val m = Bpe.train(corpus, "doc_id", "text", numMerges = 4, sampleSize = 1000)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/merges"
    Bpe.save(spark, m, path)
    assert(Bpe.load(spark, path) == m)
  }

  test("packing composes with BPE counts (model-real token budgets)") {
    val m = Bpe.train(corpus, "doc_id", "text", numMerges = 4, sampleSize = 1000)
    val docs = Seq((1L, "lowest newest"), (2L, "widest"), (3L, "low low low"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val packed = Packing.assign(docs, Seq("lang"), "doc_id",
      Bpe.tokenCount(col("text"), m), budget = 6L)
    val batches = packed.select($"doc_id", $"batch_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batches.size == 3, "every doc packed exactly once")
  }
}
