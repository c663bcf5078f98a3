package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // One query direction (1,0); corpus holds two exact copies of the most
  // relevant direction plus a moderately-relevant orthogonal-ish doc — the
  // canonical "diversification beats redundancy" fixture.
  private lazy val corpus = Seq(
    (1L, Array(1f, 0f)),        // rel 1.0
    (2L, Array(1f, 0f)),        // exact duplicate of 1 — rel 1.0
    (3L, Array(0.6f, 0.8f)),    // rel 0.6
    (4L, Array(0f, 1f)),        // rel 0.0
    (5L, Array(-1f, 0f))        // rel -1.0
  ).toDF("vec_id", "embedding")
  private lazy val q = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")

  test("lambda=1 degenerates to plain relevance top-k (same ids, same order)") {
    val mmr = Mmr.diversifiedTopK(q, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 4, lambda = 1.0, fetchK = 5)
      .orderBy("mmr_rank").collect()
    val topk = Knn.knnJoin(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
        k = 4, roundScoreTo = Some(6))
      .orderBy("rank").collect()
    assert(mmr.map(_.getAs[Long]("result_id")).toSeq ===
      topk.map(_.getAs[Long]("vec_id")).toSeq)
    // With no diversity term the mmr score IS the relevance.
    mmr.foreach(r =>
      assert(r.getAs[Double]("mmr_score") === r.getAs[Double]("score")))
  }

  test("lambda<1 demotes the exact duplicate below the novel document") {
    val res = Mmr.diversifiedTopK(q, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 3, lambda = 0.5, fetchK = 5)
      .orderBy("mmr_rank").collect()
    val ids = res.map(_.getAs[Long]("result_id")).toSeq
    // Pick 1: id 1 (rel 1.0, id tie-break over its duplicate 2).
    // Pick 2: duplicate 2 scores 0.5·1.0 − 0.5·1.0 = 0, doc 3 scores
    // 0.5·0.6 − 0.5·0.6 = 0 — tie → lower id 2... BUT doc 4 scores
    // 0.5·0 − 0.5·0 = 0 too; ids break the tie: 2 < 3 < 4.
    assert(ids.head === 1L)
    assert(res.head.getAs[Double]("mmr_score") === 0.5)
    // Every selected id is unique (selection never repeats).
    assert(ids.distinct.length === ids.length)
  }

  test("duplicate demotion: a clearly-distinct doc outranks the exact duplicate") {
    // Make the duplicate pair moderately relevant and the distinct doc
    // almost as relevant: greedy must pick one of the pair, then the
    // distinct doc, and only then the duplicate.
    val c = Seq(
      (1L, Array(1f, 0.1f)),   // rel ≈ 0.995
      (2L, Array(1f, 0.1f)),   // duplicate
      (3L, Array(1f, -0.1f))   // rel ≈ 0.995, sim(1,3) ≈ 0.980
    ).toDF("vec_id", "embedding")
    val res = Mmr.diversifiedTopK(q, "vec_id", "embedding",
        c, "vec_id", "embedding", k = 3, lambda = 0.5, fetchK = 3)
      .orderBy("mmr_rank").collect()
    assert(res.map(_.getAs[Long]("result_id")).toSeq === Seq(1L, 3L, 2L))
  }

  test("selection is deterministic across runs; small corpus caps the output") {
    val a = Mmr.diversifiedTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 5, lambda = 0.3, fetchK = 5)
      .orderBy("mmr_rank").collect()
    val b = Mmr.diversifiedTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 5, lambda = 0.3, fetchK = 5)
      .orderBy("mmr_rank").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // A 3-doc corpus yields only 3 candidates for k=5.
    val capped = Mmr.diversifiedTopK(q, "vec_id", "embedding",
      corpus.filter($"vec_id" <= 3L), "vec_id", "embedding",
      k = 5, lambda = 0.3, fetchK = 5).collect()
    assert(capped.length === 3)
  }

  test("negative pairwise similarity is NOT clamped to zero") {
    // Selected doc (1,0); remaining candidates (-1,0) with sim −1 and
    // (0,1) with sim 0. With λ=0.5: anti-parallel scores 0.5·(−1) −
    // 0.5·(−1) = 0, orthogonal scores 0.5·0 − 0.5·0 = 0 — tie, id order.
    // If the implementation clamped max-sim at 0, the anti-parallel doc
    // would score −0.5 and ALWAYS lose; the tie proves no clamp.
    val c = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(-1f, 0f)),
      (3L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val res = Mmr.diversifiedTopK(q, "vec_id", "embedding",
        c, "vec_id", "embedding", k = 3, lambda = 0.5, fetchK = 3)
      .orderBy("mmr_rank").collect()
    assert(res.map(_.getAs[Long]("result_id")).toSeq === Seq(1L, 2L, 3L))
    assert(res(1).getAs[Double]("mmr_score") === 0.0)
    assert(res(2).getAs[Double]("mmr_score") === 0.0)
  }

  test("fixture run on sf0.001 returns k rows per query with valid ranks") {
    val emb = spark.read.parquet(s"${graft.TestSpark.sf0001}/embeddings.parquet")
    val queries = graft.bench.Sampling.seeded(emb, "vec_id", 3)
    val res = Mmr.diversifiedTopK(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, lambda = 0.5, fetchK = 20)
    val rows = res.collect()
    assert(rows.length === 15)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { g =>
      assert(g.map(_.getAs[Int]("mmr_rank")).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      // From rank 2 onward mmr scores are non-increasing: the selected set
      // only grows, so every candidate's penalty only grows, and step i's
      // argmax saw step i+1's candidates too. Rank 1 is exempt — it has NO
      // penalty term, so a negative max-sim at rank 2 can legally beat it.
      val scores = g.sortBy(_.getAs[Int]("mmr_rank")).map(_.getAs[Double]("mmr_score")).drop(1)
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }
  test("string (uuid) ids: same picks as a Long-surrogate run, string order ties") {
    // Map each integral id to an md5 string: the md5 hex ORDER differs from
    // the numeric order (pinned below), so agreement between the two runs
    // proves the selection itself is key-order-independent while the
    // string-keyed tie-break uses the string order.
    val emb = spark.read.parquet(s"${graft.TestSpark.sf0001}/embeddings.parquet")
    val sidOf = md5(concat(lit("id:"), col("vec_id")))
    val embS = emb.select(sidOf.as("sid"), col("embedding"))
    val queriesL = graft.bench.Sampling.seeded(emb, "vec_id", 3)
    val queriesS = queriesL.select(sidOf.as("sid"), col("embedding"))
    val longRun = Mmr.diversifiedTopK(queriesL, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, lambda = 0.5, fetchK = 20)
      .select(md5(concat(lit("id:"), col("query_id"))).as("query_id"),
        md5(concat(lit("id:"), col("result_id"))).as("result_id"),
        col("mmr_rank"), col("mmr_score"), col("score"))
      .orderBy("query_id", "mmr_rank").collect()
    val strRun = Mmr.diversifiedTopK(queriesS, "sid", "embedding",
        embS, "sid", "embedding", k = 5, lambda = 0.5, fetchK = 20)
      .orderBy("query_id", "mmr_rank").collect()
    assert(strRun.length === 15)
    assert(strRun.map(_.toString).toSeq === longRun.map(_.toString).toSeq)
    // Fixture sanity: md5 order genuinely shuffles the id order.
    val ids = emb.select(col("vec_id")).orderBy("vec_id").limit(50)
      .collect().map(_.getLong(0))
    val byMd5 = emb.select(col("vec_id")).orderBy(sidOf).limit(50)
      .collect().map(_.getLong(0))
    assert(!java.util.Arrays.equals(ids, byMd5))
  }

  test("string-id tie-break is UTF8 byte order (heap/DuckDB collation), not UTF-16") {
    // U+10000 (surrogate pair, UTF-16 units 0xD800 0xDC00) vs U+FFFD:
    // UTF-16 unit order says the surrogate sorts FIRST; UTF-8 byte order
    // (and DuckDB binary collation) sorts the BMP char first.
    val hi = "𐀀" // U+10000
    val lo = "�"
    assert(Mmr.utf8ByteOrder.lt(lo, hi))
    assert(implicitly[Ordering[String]].lt(hi, lo)) // the divergence guarded against
    // Exact-duplicate vectors tie on rel AND on every mmr step: the pick
    // order must be byte order (lo first), not UTF-16 order.
    val c = Seq((hi, Array(1f, 0f)), (lo, Array(1f, 0f))).toDF("sid", "vec")
    val qs = Seq(("q", Array(1f, 0f))).toDF("sid", "vec")
    val picks = Mmr.diversifiedTopK(qs, "sid", "vec", c, "sid", "vec",
        k = 2, lambda = 0.5, fetchK = 2)
      .orderBy("mmr_rank").collect().map(_.getAs[String]("result_id")).toSeq
    assert(picks === Seq(lo, hi))
  }

  test("fractional ids refuse loudly; mixed id families refuse loudly") {
    import org.apache.spark.sql.functions._
    val qd = Seq((1.5, Array(1f, 0f))).toDF("id", "vec")
    val err = intercept[IllegalArgumentException] {
      Mmr.diversifiedTopK(qd, "id", "vec", qd, "id", "vec", k = 1, lambda = 0.5, fetchK = 1)
    }
    assert(err.getMessage.contains("integral or string ids"), err.getMessage)
    val ql = Seq((1L, Array(1f, 0f))).toDF("id", "vec")
    val qs = ql.select(concat(lit("u-"), $"id").as("id"), $"vec")
    val err2 = intercept[IllegalArgumentException] {
      Mmr.diversifiedTopK(ql, "id", "vec", qs, "id", "vec", k = 1, lambda = 0.5, fetchK = 1)
    }
    assert(err2.getMessage.contains("one family"), err2.getMessage)
  }

}
