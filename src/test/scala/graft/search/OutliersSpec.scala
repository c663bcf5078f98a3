package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  // A tight cluster around (1,0) plus one planted outlier at (-1,0):
  // every cluster member's nearest neighbors are other cluster members
  // (sim ≈ 1), the outlier's nearest neighbors are the cluster (sim ≈ −1).
  private lazy val corpus = Seq(
    (1L, Array(1f, 0.00f)),
    (2L, Array(1f, 0.01f)),
    (3L, Array(1f, -0.01f)),
    (4L, Array(1f, 0.02f)),
    (5L, Array(1f, -0.02f)),
    (9L, Array(-1f, 0f)) // planted outlier
  ).toDF("vec_id", "embedding")

  test("planted outlier ranks first with the lowest mean-kNN similarity") {
    val res = Outliers.topOutliers(corpus, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 3, n = 6)
      .orderBy("outlier_rank").collect()
    assert(res.head.getAs[Long]("vec_id") === 9L)
    assert(res.head.getAs[Int]("outlier_rank") === 1)
    val outlierScore = res.head.getAs[Double]("mean_knn_sim")
    val clusterScores = res.tail.map(_.getAs[Double]("mean_knn_sim"))
    assert(clusterScores.forall(_ > outlierScore))
    assert(outlierScore < -0.9) // anti-aligned with every neighbor
    assert(clusterScores.forall(_ > 0.99))
  }

  test("meanKnnSim averages exactly the k best sims, self excluded") {
    val scores = Outliers.meanKnnSim(corpus, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("mean_knn_sim")).toMap
    // Doc 1's two best neighbors are 2 and 3 (cos = 1/sqrt(1.0001) each,
    // 6dp-rounded 0.99995); the mean must use ONLY those two.
    val sim = math.round(1.0 / math.sqrt(1 + 0.01 * 0.01) * 1e6) / 1e6
    val expected = math.floor((BigDecimal(sim) + BigDecimal(sim)).toDouble / 2 * 1e6 + 0.5) / 1e6
    assert(math.abs(scores(1L) - expected) < 1e-9)
    // Every score is a mean of sims in [-1, 1].
    scores.values.foreach(s => assert(s >= -1.0 && s <= 1.0))
  }

  test("reference sample smaller than k still produces a bounded mean") {
    val ref = corpus.filter($"vec_id" <= 2L) // 2 refs; k=5 wants more
    val scores = Outliers.meanKnnSim(corpus, "vec_id", "embedding",
      ref, "vec_id", "embedding", k = 5).collect()
    // Docs in the ref exclude themselves: doc 1 has ONE neighbor (doc 2),
    // others have two; the mean divides by the actual count, never k.
    assert(scores.length === 6)
    scores.foreach(r => {
      val s = r.getAs[Double]("mean_knn_sim")
      assert(s >= -1.0 && s <= 1.0)
    })
  }

  test("string (uuid) ids ride the bounded heap and match integral-id scores") {
    // The last bounded-heap site joins the shared Knn.tieKeyFor routing
    // rule (r19 verdict #2): an md5-re-keyed corpus must take the SAME
    // ObjectHashAggregate heap plan as integral ids — before r20 the
    // long-cast tie key THREW at runtime under ANSI on a uuid corpus.
    def m(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"id:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keyed = corpus.select(
      md5(concat(lit("id:"), $"vec_id")).as("sid"), $"embedding")
    val df = Outliers.meanKnnSim(keyed, "sid", "embedding",
      keyed, "sid", "embedding", k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final bounded-heap aggregate, plan:\n$plan")
    assert(!plan.contains("Window"), s"window fallback still present:\n$plan")
    val byUuid = df.collect()
      .map(r => r.getString(0) -> r.getAs[Double]("mean_knn_sim")).toMap
    val base = Outliers.meanKnnSim(corpus, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("mean_knn_sim")).toMap
    // scores are id-independent (this fixture has no heap-boundary sim
    // ties), so the re-key must not move any mean
    base.foreach { case (id, s) =>
      assert(math.abs(byUuid(m(id)) - s) < 1e-9, s"doc $id moved")
    }
  }

  test("fractional reference ids refuse loudly at plan time") {
    val frac = corpus.select($"vec_id".cast("double").as("fid"), $"embedding")
    val e = intercept[IllegalArgumentException] {
      Outliers.meanKnnSim(frac, "fid", "embedding", frac, "fid", "embedding", k = 2)
    }
    assert(e.getMessage.contains("integral or string"), e.getMessage)
  }

  test("sf0.001 run: 20 outliers, ranks 1..20, scores non-decreasing") {
    val emb = spark.read.parquet(s"${graft.TestSpark.sf0001}/embeddings.parquet")
    val res = Outliers.topOutliers(emb, "vec_id", "embedding",
        graft.bench.Sampling.seeded(emb, "vec_id", 50), "vec_id", "embedding",
        k = 10, n = 20)
      .orderBy("outlier_rank").collect()
    assert(res.length === 20)
    assert(res.map(_.getAs[Int]("outlier_rank")).toSeq === (1 to 20))
    val s = res.map(_.getAs[Double]("mean_knn_sim"))
    assert(s.zip(s.tail).forall { case (a, b) => a <= b })
  }
}
