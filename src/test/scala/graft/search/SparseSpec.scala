package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SparseSpec extends SparkSpec {
  import spark.implicits._

  test("sparse dot: only shared indices contribute; absent overlap yields no row") {
    val docs = Seq(
      (1L, Array(1, 3), Array(2f, 4f)),     // shares 1 and 3 with the query
      (2L, Array(3, 9), Array(10f, 100f)),  // shares 3 only
      (3L, Array(7, 8), Array(5f, 5f))      // no overlap - must not appear
    ).toDF("id", "sidx", "svals")
    val q = Seq((10L, Array(1, 3), Array(1f, 1f))).toDF("id", "sidx", "svals")
    val res = Sparse.knn(docs, "id", "sidx", "svals", q, "id", "sidx", "svals",
      k = 5, excludeSelf = false, roundScoreTo = Some(6)).orderBy("rank").collect()
    assert(res.map(r => (r.getAs[Long]("result_id"), r.getAs[Double]("score"))).toSeq ==
      Seq((2L, 10.0), (1L, 6.0)))
  }

  test("dense equivalence: fully-dense sparse vectors rank exactly like dot-product kNN") {
    val emb = graft.Tables.embeddings(spark, graft.TestSpark.sf0001)
    val (idx, vals) = Sparse.sparsify(col("embedding"), 0.0) // keep everything
    val sparse = emb.select(col("vec_id"), idx.as("sidx"), vals.as("svals"))
    val q = emb.limit(8)
    val qs = q.select(col("vec_id"), idx.as("sidx"), vals.as("svals"))
    val got = Sparse.knn(sparse, "vec_id", "sidx", "svals",
        qs, "vec_id", "sidx", "svals", k = 5, roundScoreTo = Some(6))
      .select(col("query_id"), col("result_id"), col("rank"), col("score"))
    val want = Knn.knnJoin(q, "vec_id", "embedding", emb, "vec_id", "embedding",
        k = 5, metric = "dot", roundScoreTo = Some(6))
      .select(col("query_id"), col("vec_id").as("result_id"), col("rank"),
        col("score"))
    val joined = got.as("g").join(want.as("w"), Seq("query_id", "result_id"))
    // same id sets at same ranks; scores agree to the rounding grid (the
    // two paths sum in different orders/precisions, so allow one 1e-6 ulp)
    assert(joined.count() == want.count())
    assert(joined.filter(col("g.rank") =!= col("w.rank")).count() == 0)
    assert(joined.filter(abs(col("g.score") - col("w.score")) > 1.1e-6).count() == 0)
  }

  test("arity mismatch fails loudly instead of silently null-padding") {
    val docs = Seq((1L, Array(1, 2), Array(1f))).toDF("id", "sidx", "svals")
    val q = Seq((10L, Array(1), Array(1f))).toDF("id", "sidx", "svals")
    val e = intercept[Exception] {
      Sparse.knn(docs, "id", "sidx", "svals", q, "id", "sidx", "svals", k = 1)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("arity mismatch")))
  }

  test("driver sparse_knn query returns ranked rows") {
    val res = graft.SparkEntry.queries("sparse_knn")(spark, graft.TestSpark.sf0001)
    assert(res.count() > 0)
    assert(res.columns.toSeq == Seq("query_id", "result_id", "score", "rank"))
  }
}
