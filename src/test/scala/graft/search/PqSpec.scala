package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{cosine_similarity, pq_cosine, pq_encode}

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim space, m=2 subspaces of 2 dims, 2 centroids per codebook
  private val cb: Array[Array[Array[Float]]] = Array(
    Array(Array(1f, 0f), Array(0f, 1f)),
    Array(Array(1f, 1f), Array(-1f, 1f)))

  test("encode picks the L2-nearest centroid per subspace, first-index ties") {
    val df = Seq(
      (1L, Array(0.9f, 0.1f, 1.1f, 0.9f)), // -> (0, 0)
      (2L, Array(0.1f, 0.9f, -0.9f, 1.0f)) // -> (1, 1)
    ).toDF("id", "v")
    val codes = df.select(col("id"), pq_encode(col("v"), cb).as("c"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("c").toSeq).toMap
    assert(codes(1L) == Seq[Byte](0, 0))
    assert(codes(2L) == Seq[Byte](1, 1))
  }

  test("asymmetric cosine equals exact cosine against the reconstruction") {
    // corpus vector lands exactly ON codebook centroids -> reconstruction
    // is lossless -> pq_cosine must equal the true cosine exactly
    val exact = Seq((1L, Array(1f, 0f, -1f, 1f))).toDF("id", "v")
    val q = Array(0.3f, -0.2f, 0.8f, 0.5f)
    val got = exact.select(
        pq_cosine(lit(q), pq_encode(col("v"), cb), cb).as("pq"),
        cosine_similarity(lit(q), col("v")).as("true"))
      .head()
    assert(math.abs(got.getDouble(0) - got.getDouble(1)) < 1e-12,
      s"pq=${got.getDouble(0)} true=${got.getDouble(1)}")
    // off-centroid vectors score against their reconstruction (lossy but
    // deterministic): recompute the expected value by hand
    val lossy = Seq((1L, Array(0.9f, 0.1f, 1.2f, 0.8f))).toDF("id", "v")
    val recon = Array(1f, 0f, 1f, 1f) // codes (0, 0)
    val want = lossy.select(cosine_similarity(lit(q), lit(recon))).head().getDouble(0)
    val gotLossy = lossy.select(pq_cosine(lit(q), pq_encode(col("v"), cb), cb))
      .head().getDouble(0)
    assert(math.abs(gotLossy - want) < 1e-12)
  }

  test("trained codebooks: subspace count, dims, determinism by seed") {
    val emb = graft.Tables.embeddings(spark, graft.TestSpark.sf0001)
    val a = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 8, codebookSize = 16, seed = 7L)
    val b = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 8, codebookSize = 16, seed = 7L)
    assert(a.length == 8)
    assert(a.forall(_.forall(_.length == 8))) // 64 / 8 subspace dims
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq,
      "same seed must train identical codebooks")
    // dim not divisible -> loud failure
    intercept[IllegalArgumentException] {
      Pq.trainCodebooks(emb, "vec_id", "embedding", m = 7)
    }
  }

  test("zero query or zero reconstruction scores 0.0, arity mismatch scores 0.0") {
    val df = Seq((1L, Array(1f, 0f, 1f, 1f))).toDF("id", "v")
    val zq = Array(0f, 0f, 0f, 0f)
    assert(df.select(pq_cosine(lit(zq), pq_encode(col("v"), cb), cb))
      .head().getDouble(0) == 0.0)
    // codes from a DIFFERENT m (here: 1 byte instead of 2)
    assert(df.select(pq_cosine(lit(Array(1f, 0f, 0f, 0f)),
        lit(Array[Byte](0)), cb)).head().getDouble(0) == 0.0)
  }
}
