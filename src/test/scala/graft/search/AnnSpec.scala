package graft.search

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables, TestSpark}

class AnnSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf0001).cache()

  test("knnJoinLsh returns a subset of exact results with identical scores") {
    val exact = Knn.knnJoin(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        k = 5, roundScoreTo = Some(6))
      .select(col("query_id"), col("vec_id").as("result_id"), col("score"))
    val approx = Ann.knnJoinLsh(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        k = 5, bits = 4, tables = 8, roundScoreTo = Some(6))
      .select(col("query_id"), col("vec_id").as("result_id"), col("score"))
    // Approx scores are true cosines (verify-on-candidates): joining on all
    // three columns must match joining on the two ids.
    val idJoin = approx.join(exact, Seq("query_id", "result_id"), "left_semi").count()
    val fullJoin = approx.join(exact, Seq("query_id", "result_id", "score"), "left_semi").count()
    assert(idJoin == fullJoin)
    // With 4-bit signatures over 8 tables recall is high on this tiny set.
    val recall = fullJoin.toDouble / exact.count()
    assert(recall > 0.5, s"recall@5 = $recall")
  }

  test("knnJoinLsh drops vector columns and self matches") {
    val out = Ann.knnJoinLsh(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
      k = 3, bits = 4, tables = 4)
    assert(!out.columns.contains("embedding"))
    assert(out.filter(col("query_id") === col("vec_id")).count() == 0)
  }

  test("nearDupPairsLsh is a subset of exact nearDupPairs with equal cosines") {
    val t = 0.35
    val exact = Ann.nearDupPairs(emb, "vec_id", "embedding", t, roundScoreTo = Some(6))
    val lsh = Ann.nearDupPairsLsh(emb, "vec_id", "embedding", t,
      bits = 4, tables = 8, roundScoreTo = Some(6))
    val exactSet = exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lshSet = lsh.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lshSet.subsetOf(exactSet))
    assert(exactSet.isEmpty || lshSet.nonEmpty)
  }
}
