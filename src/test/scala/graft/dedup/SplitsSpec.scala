package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("leakFreeSplits: every component lands whole in exactly one split") {
    val docs = (1L to 40L).toDF("doc_id")
    // three clusters: {1,2,3}, {10,11}, {20,21,22,23}; rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("id_a", "id_b")
    val got = Splits.leakFreeSplits(docs, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("component"), r.getAs[String]("split")))
    assert(got.length == 40)
    // min-id component labels
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(3L)._2 == 1L && byId(11L)._2 == 10L && byId(23L)._2 == 20L)
    // the leakage invariant: one split per component
    val splitsPerComponent = got.groupBy(_._2).map { case (_, rows) => rows.map(_._3).toSet.size }
    assert(splitsPerComponent.forall(_ == 1))
    // split is a pure function of the component: a cluster member and its
    // representative singleton-hash agree (doc 2 vs what doc 1 would get alone)
    val alone = Splits.leakFreeSplits(Seq(1L).toDF("doc_id"),
      "doc_id", spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().head.getAs[String]("split")
    assert(byId(2L)._3 == alone)
  }

  test("leakFreeSplits: split fractions follow the bounds on many singletons") {
    val docs = (1L to 2000L).toDF("doc_id")
    val none = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    val counts = Splits.leakFreeSplits(docs, "doc_id", none, "id_a", "id_b")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    assert(math.abs(counts("val") / 2000.0 - 0.1) < 0.03)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.03)
  }

  test("leakFreeSplits: bound validation") {
    val docs = Seq(1L).toDF("doc_id")
    val none = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Splits.leakFreeSplits(docs, "doc_id", none, "id_a", "id_b", trainLt = 0.9, valLt = 0.8)
    }
  }
}
