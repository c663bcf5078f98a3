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

  test("knnJoinLsh maxBucketSize drops degenerate buckets (skew guard)") {
    import spark.implicits._
    // 30 identical vectors share EVERY bucket in every table: uncapped, all
    // pairs are candidates; capped below 30, every bucket is oversized and
    // candidacy is lost entirely.
    val vec = Array.fill(8)(1.0f)
    val df = (1L to 30L).map(i => (i, vec)).toDF("id", "v")
    val full = Ann.knnJoinLsh(df, "id", "v", df, "id", "v", k = 5, bits = 4, tables = 4)
    assert(full.count() > 0)
    val capped = Ann.knnJoinLsh(df, "id", "v", df, "id", "v", k = 5,
      bits = 4, tables = 4, maxBucketSize = 10)
    assert(capped.count() == 0)
  }

  test("ann_recall production config: recall floor holds") {
    val r = graft.SparkEntry.queries("ann_recall")(spark, TestSpark.sf0001)
      .head().getDouble(0)
    assert(r >= 0.5, s"recall@10 = $r at the ann_recall config")
  }

  test("ann_recall production config: candidate set bounded well below |Q|x|C|") {
    import graft.functions.hyperplane_sig
    // Rebuild the LSH buckets exactly as Ann.bucketedIds does at the
    // SparkEntry.ann_recall config and measure the candidate-pair fraction:
    // the broadcast-degeneracy guard. bits=4/tables=8 (the old config) sits
    // above 40% on this data; the production config must stay well under it.
    val (bits, tables, seed) = (graft.SparkEntry.annRecallBits, graft.SparkEntry.annRecallTables, 42L)
    val bands = array((0 until tables).map { t =>
      struct(lit(t).as("t"), hyperplane_sig(col("embedding"), bits, seed + t * 1000003L).as("sig"))
    }: _*)
    val b = emb.select(col("vec_id"), explode(bands).as("bucket"))
    val candPairs = b.as("l").join(b.as("r"), col("l.bucket") === col("r.bucket"))
      .select(col("l.vec_id").as("q"), col("r.vec_id").as("c"))
      .distinct().count()
    val n = emb.count().toDouble
    val frac = candPairs / (n * n)
    assert(frac < 0.35, f"candidate fraction $frac%.3f — config drifting toward broadcast degeneracy")
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
