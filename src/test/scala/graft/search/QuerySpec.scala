package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuerySpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, Array(1f, 0f, 0f, 0f), "a"),
    (2L, Array(0.9f, 0.1f, 0f, 0f), "a"),
    (3L, Array(0f, 1f, 0f, 0f), "b"),
    (4L, Array(0f, 0.9f, 0.1f, 0f), "b"),
    (5L, Array(0f, 0f, 1f, 0f), "c"),
    (6L, Array(0.5f, 0.5f, 0.5f, 0.5f), "c")
  ).toDF("vec_id", "embedding", "tag")

  test("prefetchK covering the corpus reproduces exact knnJoin ranking") {
    // With every corpus row prefetched, rescore sees the full candidate
    // set and MUST equal single-stage exact search — the recall=1 anchor.
    val exact = Knn.knnJoin(corpus.select("vec_id", "embedding"), "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 3, roundScoreTo = Some(6))
      .select($"query_id", $"vec_id", $"score", $"rank")
    val staged = Query.prefetchRescore(
        corpus.select("vec_id", "embedding"), "vec_id", "embedding",
        corpus, "vec_id", "embedding",
        cheapVec = v => slice(v, 1, 2), prefetchK = 6, k = 3,
        roundScoreTo = Some(6))
      .select($"query_id", $"vec_id", $"score", $"rank")
    assert(staged.except(exact).isEmpty && exact.except(staged).isEmpty)
  }

  test("rescore ranks candidates by the FULL vector, not the prefetch score") {
    // Query (0,0,1,0) with a 2-d head slice: the head (0,0) scores 0
    // against everything, so the prefetch pool is tie-ordered by id; the
    // full-vector rescore must still put 5 (identical direction) first
    // and 6 (diagonal) second.
    val q = Seq((100L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val res = Query.prefetchRescore(q, "vec_id", "embedding",
        corpus, "vec_id", "embedding",
        cheapVec = v => slice(v, 1, 2), prefetchK = 6, k = 2,
        roundScoreTo = Some(6))
      .orderBy("rank").collect()
    assert(res.map(_.getAs[Long]("vec_id")).toSeq === Seq(5L, 6L))
    assert(res.head.getAs[Double]("score") === 1.0)
  }

  test("a tight prefetch bounds stage-2 input: candidates outside the pool never surface") {
    // Query aligned with 1; head slice (first 2 dims) ranks 1,2 on top.
    // With prefetchK=2 only {1,2} reach rescore, so even a would-be
    // strong full-vector match outside the pool (none here, but rank 3)
    // cannot appear: output has exactly 2 rows per query.
    val q = Seq((200L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val res = Query.prefetchRescore(q, "vec_id", "embedding",
        corpus, "vec_id", "embedding",
        cheapVec = v => slice(v, 1, 2), prefetchK = 2, k = 5,
        roundScoreTo = Some(6)).collect()
    assert(res.length === 2)
    assert(res.map(_.getAs[Long]("vec_id")).toSet === Set(1L, 2L))
  }

  test("rescoreExact fuses multi-prefetch candidate pools and carries corpus payload") {
    val q = Seq((300L, Array(1f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    // Two branches with overlap: {1,3} and {3,5}; dedup leaves 3 distinct.
    val branchA = Seq((300L, 1L), (300L, 3L)).toDF("query_id", "vec_id")
    val branchB = Seq((300L, 3L), (300L, 5L)).toDF("query_id", "vec_id")
    val res = Query.rescoreExact(branchA.unionByName(branchB),
        q, "vec_id", "embedding", corpus, "vec_id", "embedding",
        k = 10, roundScoreTo = Some(6))
      .orderBy("rank").collect()
    assert(res.length === 3) // duplicate candidate 3 scored once
    assert(res.map(_.getAs[Long]("vec_id")).toSet === Set(1L, 3L, 5L))
    // Payload (tag) re-attached from the full frame.
    assert(res.map(_.getAs[String]("tag")).toSet === Set("a", "b", "c"))
    // Ranks are contiguous best-first.
    assert(res.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
  }

  test("distance metrics rescore ascending (rank 1 = nearest)") {
    val q = Seq((400L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val res = Query.prefetchRescore(q, "vec_id", "embedding",
        corpus, "vec_id", "embedding",
        cheapVec = v => slice(v, 1, 2), prefetchK = 6, k = 3,
        metric = "euclid", prefetchMetric = "euclid",
        roundScoreTo = Some(6))
      .orderBy("rank").collect()
    assert(res.head.getAs[Long]("vec_id") === 1L) // distance 0
    assert(res.head.getAs[Double]("score") === 0.0)
    val scores = res.map(_.getAs[Double]("score"))
    assert(scores.sorted.toSeq === scores.toSeq) // ascending with rank
  }

  test("rescoreFormula with formula = sim reproduces rescoreExact ranking") {
    val q = Seq((500L, Array(1f, 0.2f, 0f, 0f))).toDF("vec_id", "embedding")
    val cand = corpus.select(lit(500L).as("query_id"), $"vec_id")
    val exact = Query.rescoreExact(cand, q, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 4, roundScoreTo = Some(6))
      .select($"query_id", $"vec_id", $"score", $"rank")
    val viaFormula = Query.rescoreFormula(cand, q, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 4,
        formula = col("sim"), roundSimTo = Some(6), roundScoreTo = Some(6))
      .select($"query_id", $"vec_id", $"score", $"rank")
    assert(viaFormula.except(exact).isEmpty && exact.except(viaFormula).isEmpty)
  }

  test("rescoreFormula payload boost reorders results away from raw similarity") {
    // Query along dim 1: raw cosine ranks 1 > 2. A tag boost that pays
    // +2 only for tag "b" (beyond any cosine) must lift 3/4 above both.
    val q = Seq((600L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val cand = corpus.select(lit(600L).as("query_id"), $"vec_id")
    val res = Query.rescoreFormula(cand, q, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 4,
        formula = col("sim") + when(col("tag") === "b", 2.0).otherwise(0.0),
        roundSimTo = Some(6), roundScoreTo = Some(6))
      .orderBy("rank").collect()
    assert(res.take(2).map(_.getAs[Long]("vec_id")).toSet === Set(3L, 4L))
    assert(res(2).getAs[Long]("vec_id") === 1L) // best raw sim among unboosted
    // sim column still carries the raw (rounded) cosine, not the formula.
    assert(res(2).getAs[Double]("sim") === 1.0)
  }

  test("decay helpers: value at target is 1, at distance=scale is midpoint") {
    val df = Seq((0.0, 10.0), (1.0, 15.0), (2.0, 25.0)).toDF("id", "x")
    def vals(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      df.orderBy("id")
        .select(f(col("x"), lit(10.0), lit(5.0), lit(0.5)).as("d"))
        .collect().map(_.getDouble(0))
    def close(a: Double, b: Double, tol: Double = 1e-12) = math.abs(a - b) < tol
    val lin = vals(graft.functions.lin_decay)
    assert(lin(0) === 1.0 && close(lin(1), 0.5) && lin(2) === 0.0)
    val ex = vals(graft.functions.exp_decay)
    assert(ex(0) === 1.0 && close(ex(1), 0.5) && close(ex(2), 0.125))
    val ga = vals(graft.functions.gauss_decay)
    assert(ga(0) === 1.0 && close(ga(1), 0.5) && close(ga(2), math.pow(0.5, 9), 1e-9))
  }

  test("string (uuid) ids rescore on the heap — rows present, order matches exact search") {
    // pre-r17 these heap-only sites long-cast the id: a uuid-string corpus
    // NULL-cast every row out of the heap and rescore silently returned
    // EMPTY. Now string ids rank (UTF8String byte tie order).
    val sc = corpus.select(concat(lit("doc-"), $"vec_id").as("vec_id"),
      $"embedding", $"tag")
    val staged = Query.prefetchRescore(
        sc.select("vec_id", "embedding"), "vec_id", "embedding",
        sc, "vec_id", "embedding",
        cheapVec = v => slice(v, 1, 2), prefetchK = 6, k = 3,
        roundScoreTo = Some(6))
      .select($"query_id", $"vec_id", $"score", $"rank")
    assert(staged.count() == 18, "string-keyed rescore must not silently drop rows")
    val exact = Knn.knnJoin(sc.select("vec_id", "embedding"), "vec_id", "embedding",
        sc, "vec_id", "embedding", k = 3, roundScoreTo = Some(6))
      .select($"query_id", $"vec_id", $"score", $"rank")
    assert(staged.except(exact).isEmpty && exact.except(staged).isEmpty)
  }

  test("fractional ids refuse the heap loudly instead of truncation-colliding") {
    val fc = corpus.select(($"vec_id" + lit(0.5)).as("vec_id"), $"embedding", $"tag")
    val err = intercept[IllegalArgumentException] {
      Query.rescoreExact(
        fc.select(($"vec_id").as("query_id"), $"vec_id"),
        fc.select("vec_id", "embedding"), "vec_id", "embedding",
        fc, "vec_id", "embedding", k = 3)
    }
    assert(err.getMessage.contains("integral or string id"), err.getMessage)
  }

  test("prefetchK < 1 is rejected") {
    intercept[IllegalArgumentException] {
      Query.prefetchRescore(corpus, "vec_id", "embedding",
        corpus, "vec_id", "embedding", cheapVec = identity,
        prefetchK = 0, k = 5)
    }
  }
}
