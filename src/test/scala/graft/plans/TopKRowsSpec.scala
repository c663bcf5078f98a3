package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables, TestSpark}
import graft.search.Knn

class TopKRowsSpec extends SparkSpec {
  import spark.implicits._

  test("buffer keeps k best with (score desc, id asc) tie-break and survives serde") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
    val payloadType = new StructType().add("x", LongType)
    val agg = TopKRows(
      payload = BoundReference(0, payloadType, nullable = true),
      score = BoundReference(1, DoubleType, nullable = false),
      tieId = BoundReference(2, LongType, nullable = false), k = 3)
    val buf = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 7L), (0.5, 2L), (0.9, 9L), (0.1, 1L), (0.5, 3L))
      .foreach { case (s, i) => buf.insert(s, i, InternalRow(i)) }
    val kept = buf.sorted.map(e => (e.score, e.id)).toSeq
    // best three: 0.9@7, 0.9@9, then 0.5@2 (lowest id among the 0.5s)
    assert(kept == Seq((0.9, 7L), (0.9, 9L), (0.5, 2L)))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sorted.map(e => (e.score, e.id)).toSeq == kept)
    // merge respects the same ordering
    val other = new TopKBuffer(3)
    other.insert(0.95, 100L, InternalRow(100L))
    val merged = agg.merge(back, other)
    assert(merged.sorted.map(_.id).toSeq == Seq(100L, 7L, 9L))
  }

  test("knnJoin agg path matches the window path row-for-row") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val q = emb.limit(20)
    def run(useAgg: Boolean) =
      Knn.knnJoin(q, "vec_id", "embedding", emb, "vec_id", "embedding",
          k = 7, roundScoreTo = Some(6), useTopKAgg = useAgg)
        .select("query_id", "vec_id", "score", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4))
    assert(run(true).toSeq == run(false).toSeq)
  }

  test("agg path plans as ObjectHashAggregate (map-side partials), no window exchange of scored rows") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val df = Knn.knnJoin(emb.limit(5), "vec_id", "embedding", emb, "vec_id", "embedding",
      k = 3, useTopKAgg = true)
    // AdaptiveSparkPlanExec hides children from manual traversal; the
    // rendered plan string shows the current physical tree.
    val plan = df.queryExecution.executedPlan.toString
    val aggCount = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggCount >= 2, s"expected partial+final ObjectHashAggregate, plan:\n$plan")
    assert(!plan.contains("Window"), s"window exchange still present:\n$plan")
  }
}
