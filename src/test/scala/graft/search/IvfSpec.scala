package graft.search

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables, TestSpark}

class IvfSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf0001).cache()

  test("nearest_centroids: exact argmax cell for trivial centroid table") {
    import spark.implicits._
    val cents = Array(Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f))
    val df = Seq(
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.1f, 2.0f)),
      (3L, Array(-5f, 0.2f))).toDF("id", "v")
      .select($"id", graft.functions.nearest_centroids($"v", cents, 2).as("cells"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L).head == 0)
    assert(got(2L).head == 1)
    assert(got(3L).head == 2)
    assert(got.values.forall(_.length == 2))
  }

  test("knnJoinIvf: subset of exact with identical scores; full-probe = exact") {
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", nList = 4, seed = 42L)
    assert(cents.length == 4)
    val exact = Knn.knnJoin(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        k = 5, roundScoreTo = Some(6))
      .select(col("query_id"), col("vec_id").as("result_id"), col("score"))
    val ivf = Ivf.knnJoinIvf(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        k = 5, centroids = cents, nProbe = 2, roundScoreTo = Some(6))
      .select(col("query_id"), col("vec_id").as("result_id"), col("score"))
    val idJoin = ivf.join(exact, Seq("query_id", "result_id"), "left_semi").count()
    val fullJoin = ivf.join(exact, Seq("query_id", "result_id", "score"), "left_semi").count()
    assert(idJoin == fullJoin) // scores are true cosines
    val recall = fullJoin.toDouble / exact.count()
    assert(recall > 0.3, s"recall@5 with 2/4 probes = $recall")
    // probing EVERY cell must reproduce exact search bit-for-bit
    val all = Ivf.knnJoinIvf(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        k = 5, centroids = cents, nProbe = 4, roundScoreTo = Some(6))
      .select(col("query_id"), col("vec_id").as("result_id"), col("score"))
    assert(all.exceptAll(exact).count() == 0 && exact.exceptAll(all).count() == 0)
  }
}
