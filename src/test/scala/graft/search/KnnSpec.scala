package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  // 4 unit-ish vectors on known directions; cosine to (1,0) is trivially
  // hand-computable.
  private lazy val corpus = Seq(
    (1L, Array(1f, 0f), "a"),
    (2L, Array(0.9f, 0.1f), "a"),
    (3L, Array(0f, 1f), "b"),
    (4L, Array(-1f, 0f), "b")
  ).toDF("vec_id", "embedding", "label")

  test("knnJoin returns per-query top-k by cosine, self excluded, ranked") {
    val q = corpus.filter($"vec_id" === 1L)
    val res = Knn.knnJoin(q, "vec_id", "embedding", corpus, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(res.length === 2)
    assert(res(0).getAs[Long]("vec_id") === 2L) // closest direction
    assert(res(0).getAs[Int]("rank") === 1)
    assert(res(1).getAs[Long]("vec_id") === 3L) // orthogonal beats antiparallel
    // self (vec_id=1, score 1.0) must be excluded
    assert(!res.map(_.getAs[Long]("vec_id")).contains(1L))
  }

  test("query payload columns ride along as query_<name>") {
    val q = corpus.filter($"vec_id" === 3L)
    val res = Knn.knnJoin(q, "vec_id", "embedding", corpus, "vec_id", "embedding", k = 1)
    assert(res.columns.contains("query_label"))
    assert(res.select("query_label").collect()(0).getString(0) === "b")
  }

  test("excludeSelf=false keeps the self match at rank 1 with score 1") {
    val q = corpus.filter($"vec_id" === 1L)
    val res = Knn.knnJoin(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
      k = 1, excludeSelf = false).collect()(0)
    assert(res.getAs[Long]("vec_id") === 1L)
    assert(math.abs(res.getAs[Double]("score") - 1.0) < 1e-12)
  }

  test("dot metric ranks by raw dot product") {
    val q = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val big = Seq((1L, Array(5f, 0f)), (2L, Array(0.9f, 0f))).toDF("vec_id", "embedding")
    val res = Knn.knnJoin(q, "vec_id", "embedding", big, "vec_id", "embedding",
      k = 2, metric = "dot").orderBy("rank").collect()
    assert(res(0).getAs[Long]("vec_id") === 1L) // dot=5 beats dot=0.9
  }

  test("euclid metric ranks ASCENDING: rank 1 is the smallest distance") {
    val q = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val res = Knn.knnJoin(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
      k = 3, metric = "euclid").orderBy("rank").collect()
    // distances from (1,0): id1 0, id2 sqrt(0.02)=0.1414, id3 sqrt(2), id4 2
    assert(res.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 2L, 3L))
    assert(res(0).getAs[Double]("score") === 0.0)
    assert(math.abs(res(1).getAs[Double]("score") - math.sqrt(0.02)) < 1e-6)
    assert(math.abs(res(2).getAs[Double]("score") - math.sqrt(2.0)) < 1e-12)
  }

  test("manhattan metric: L1 distances, ascending, id tie-break preserved") {
    val q = Seq((10L, Array(0f, 0f))).toDF("vec_id", "embedding")
    // id 2 is strictly closest (float 0.9f+0.1f sums just UNDER 1.0);
    // ids 1, 3, 4 are exact ties at L1 = 1.0 -> broken by ascending id.
    val res = Knn.knnJoin(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
      k = 4, metric = "manhattan").orderBy("rank").collect()
    assert(res.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 1L, 3L, 4L))
    assert(res.map(_.getAs[Double]("score")).forall(d => math.abs(d - 1.0) < 1e-6))
  }

  test("distance metrics: heap path ≡ window path (same rows, same ranks)") {
    val q = corpus.select($"vec_id", $"embedding")
    for (m <- Seq("euclid", "manhattan")) {
      val heap = Knn.knnJoin(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
        k = 2, metric = m, roundScoreTo = Some(6), useTopKAgg = true)
        .select("query_id", "vec_id", "rank", "score")
      val window = Knn.knnJoin(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
        k = 2, metric = m, roundScoreTo = Some(6), useTopKAgg = false)
        .select("query_id", "vec_id", "rank", "score")
      assert(heap.exceptAll(window).isEmpty && window.exceptAll(heap).isEmpty,
        s"heap/window divergence for metric $m")
    }
  }

  test("grouped search under a distance metric ranks groups by SMALLEST best") {
    val q = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val res = Knn.knnJoinGrouped(q, "vec_id", "embedding",
        corpus, "vec_id", "embedding",
        groupCol = "label", groupSize = 1, kGroups = 2, metric = "euclid")
      .orderBy("group_rank").collect()
    // best of 'a' = id1 at distance 0; best of 'b' = id3 at sqrt(2)
    assert(res.map(r => (r.getAs[String]("label"), r.getAs[Long]("vec_id"))).toSeq ===
      Seq(("a", 1L), ("b", 3L)))
  }

  test("corpusFilter: predicate applies before scoring, top-k from the filtered corpus") {
    val q = corpus.filter($"vec_id" === 1L)
    // label='b' excludes the otherwise-rank-1 neighbor (vec_id=2): the
    // top-k must re-rank over qualifying rows, not thin an unfiltered top-k.
    val res = Knn.knnJoin(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
      k = 2, corpusFilter = Some($"label" === "b")).orderBy("rank").collect()
    assert(res.map(_.getAs[Long]("vec_id")).toSeq === Seq(3L, 4L))
  }

  test("grouped search: top groups by best hit, each with its own top hits") {
    val q = corpus.filter($"vec_id" === 1L)
    val res = Knn.knnJoinGrouped(q, "vec_id", "embedding",
        corpus, "vec_id", "embedding",
        groupCol = "label", groupSize = 2, kGroups = 2)
      .orderBy("group_rank", "rank").collect()
    // group 'a' holds the best hit (vec_id 2, cos≈0.994) -> group_rank 1
    // with only member 2 surviving self-exclusion; group 'b' ranks 2 with
    // hits 3 (orthogonal) then 4 (antiparallel)
    assert(res.map(r => (r.getAs[String]("label"), r.getAs[Int]("group_rank"),
      r.getAs[Long]("vec_id"), r.getAs[Int]("rank"))).toSeq ==
      Seq(("a", 1, 2L, 1), ("b", 2, 3L, 1), ("b", 2, 4L, 2)))
  }

  test("recommend: ranks by mean(pos) - mean(neg), examples excluded") {
    val c = Seq(
      (1L, Array(1f, 0f)),    // positive example
      (2L, Array(0.8f, 0.2f)), // positive example
      (3L, Array(0f, 1f)),    // negative example
      (4L, Array(0.9f, 0.1f)), // near the positive mean -> rank 1
      (5L, Array(0.1f, 0.9f)), // near the negative -> last
      (6L, Array(0.7f, 0.3f))
    ).toDF("vec_id", "embedding")
    val res = Knn.recommend(c, "vec_id", "embedding",
      positiveIds = Seq(1L, 2L), negativeIds = Seq(3L), k = 3)
      .orderBy("rank").collect()
    // composite = mean((1,0),(0.8,0.2)) - (0,1) = (0.9, -0.9): rewards x,
    // punishes y — 4 (x-heavy) first, 5 (y-heavy) last, examples absent
    assert(res.map(_.getAs[Long]("vec_id")).toSeq == Seq(4L, 6L, 5L))
  }

  test("grouped search with_lookup attaches the group key's lookup record") {
    val q = corpus.filter($"vec_id" === 1L)
    val meta = Seq(("a", "alpha"), ("b", "beta"), ("zz", "unused"))
      .toDF("label", "title")
    val res = Knn.knnJoinGrouped(q, "vec_id", "embedding",
        corpus, "vec_id", "embedding",
        groupCol = "label", groupSize = 2, kGroups = 2,
        withLookup = Some((meta, "label")))
      .orderBy("group_rank", "rank").collect()
    // Same rows as the plain grouped search, each carrying its group's
    // lookup payload under the lookup_ prefix; the lookup's own key
    // column does not leak into the output.
    assert(res.map(r => (r.getAs[String]("label"), r.getAs[String]("lookup_title")))
      .toSeq === Seq(("a", "alpha"), ("b", "beta"), ("b", "beta")))
    assert(!res.head.schema.fieldNames.contains("lookup_label"))
  }

  test("recommend lookup_from: foreign examples, no corpus exclusion") {
    val c = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.8f, 0.2f)),
      (3L, Array(0f, 1f)),
      (4L, Array(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    // Prototype collection in its own id space: positive prototype along
    // x, negative along y — same composite as pos=(1,0) neg=(0,1).
    val protos = Seq(
      (100L, Array(1f, 0f)),
      (200L, Array(0f, 1f))
    ).toDF("proto_id", "vec")
    val res = Knn.recommend(c, "vec_id", "embedding",
        positiveIds = Seq(100L), negativeIds = Seq(200L), k = 4,
        lookupFrom = Some((protos, "proto_id", "vec")))
      .orderBy("rank").collect()
    // ALL corpus points are eligible (no exclusion): 1 is itself the
    // composite direction and ranks first.
    assert(res.length === 4)
    assert(res.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 4L, 2L, 3L))
  }

  test("recommend lookup_from: missing prototype id fails loudly") {
    val protos = Seq((100L, Array(1f, 0f))).toDF("proto_id", "vec")
    intercept[IllegalArgumentException] {
      Knn.recommend(corpus, "vec_id", "embedding",
        positiveIds = Seq(100L, 999L), k = 1,
        lookupFrom = Some((protos, "proto_id", "vec")))
    }
  }

  test("searchMatrix: pairwise top-k among the sample, self-pairs excluded") {
    val res = Knn.searchMatrix(corpus, "vec_id", "embedding",
      sample = 10, k = 1, roundScoreTo = Some(6)).collect()
    // sample covers all 4 points; each contributes its single best pair
    assert(res.length === 4)
    assert(res.forall(r => r.getAs[Long]("id_a") != r.getAs[Long]("id_b")))
    val best = res.map(r => r.getAs[Long]("id_a") -> r.getAs[Long]("id_b")).toMap
    assert(best(1L) === 2L && best(2L) === 1L) // mutual nearest by cosine
    assert(res.forall(_.getAs[Int]("rank") === 1))
  }

  test("discover: context pairs dominate, target similarity breaks the tier") {
    val c = Seq(
      (0L, Array(1f, 0f)),     // target
      (1L, Array(0f, 1f)),     // positive of pair 1
      (2L, Array(0f, -1f)),    // negative of pair 1
      // candidates:
      (10L, Array(0.9f, 0.3f)),  // sides WITH the pair (+y half), ctx=1
      (11L, Array(1f, 0.01f)),   // barely +y -> ctx=1, nearly parallel to target
      (12L, Array(0.9f, -0.3f))  // sides AGAINST the pair, ctx=0
    ).toDF("vec_id", "embedding")
    val res = Knn.discover(c, "vec_id", "embedding",
        targetId = 0L, contextPairs = Seq((1L, 2L)), k = 3, roundScoreTo = Some(6))
      .orderBy("rank").collect()
    // ctx=1 tier first (11 beats 10 on target sim), then ctx=0 tier: 12
    // TIES 10 on target similarity (0.9487 each) yet ranks below both —
    // lexicographic, not additive.
    assert(res.map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("context_score"))).toSeq
      === Seq((11L, 1), (10L, 1), (12L, 0)))
    assert(res.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
  }

  test("discover with no context pairs degrades to plain target search") {
    val res = Knn.discover(corpus, "vec_id", "embedding",
        targetId = 1L, contextPairs = Nil, k = 2, roundScoreTo = Some(6))
      .orderBy("rank").collect()
    assert(res.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 3L))
    assert(res.forall(_.getAs[Int]("context_score") === 0))
  }

  test("recommend: missing example id fails loudly, not silently") {
    val e = intercept[IllegalArgumentException] {
      Knn.recommend(corpus, "vec_id", "embedding", positiveIds = Seq(99L), k = 1)
    }
    assert(e.getMessage.contains("matched"))
  }

  test("corpusFilter: predicate reaches the parquet scan as a pushed filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_knnf").toString
    corpus.write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val q = corpus.filter($"vec_id" === 1L)
    val plan = Knn.knnJoin(q, "vec_id", "embedding", onDisk, "vec_id", "embedding",
        k = 2, corpusFilter = Some($"label" === "b"))
      .queryExecution.executedPlan.toString
    // the corpus-side scan must carry the predicate (pushed, not post-scan)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(label,b)"),
      s"expected label pushdown in:\n$plan")
  }
}
