package graft.metrics

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-checked tiny result lists covering the reference's metric edge cases
  * (zero-relevant → 0 not null; P@k divides by k even with <k rows;
  * both MAP denominators — bcb_utils.py:229,237,250,252; poj_utils.py:259). */
class IrMetricsSpec extends SparkSpec {
  import spark.implicits._

  // q1: relevant at ranks 1 and 3 of 3; q2: nothing relevant.
  private lazy val detailed = Seq(
    ("q1", 1, true, 0.9), ("q1", 2, false, 0.8), ("q1", 3, true, 0.7),
    ("q2", 1, false, 0.6), ("q2", 2, false, 0.5), ("q2", 3, false, 0.4)
  ).toDF("query_id", "rank", "is_relevant", "score")

  test("perQuery accumulators") {
    val pq = IrMetrics.perQuery(detailed).orderBy("query_id").collect()
    val q1 = pq(0)
    assert(q1.getAs[String]("query_id") === "q1")
    assert(q1.getAs[Long]("hits") === 2L)
    assert(q1.getAs[Int]("first_rel_rank") === 1)
    // AP numerator: rank1 → 1/1, rank3 → 2/3
    assert(math.abs(q1.getAs[Double]("ap_numerator") - (1.0 + 2.0 / 3.0)) < 1e-12)
    assert(math.abs(q1.getAs[Double]("avg_relevant_score") - 0.8) < 1e-12)
    assert(math.abs(q1.getAs[Double]("avg_irrelevant_score") - 0.8) < 1e-12)
    val q2 = pq(1)
    assert(q2.getAs[Long]("hits") === 0L)
    assert(q2.isNullAt(q2.fieldIndex("first_rel_rank")))
    assert(q2.getAs[Double]("ap_numerator") === 0.0)
    // empty relevant side → 0.0, not null (bcb_utils.py:202-205)
    assert(q2.getAs[Double]("avg_relevant_score") === 0.0)
  }

  test("global metrics, POJ denominator (plain k)") {
    val g = IrMetrics.global(IrMetrics.perQuery(detailed), k = 3, apDenominator = lit(3))
      .collect()(0)
    assert(math.abs(g.getAs[Double]("success_rate") - 0.5) < 1e-12)
    assert(math.abs(g.getAs[Double]("mean_precision_at_k") - (2.0 / 3.0 + 0.0) / 2) < 1e-12)
    assert(math.abs(g.getAs[Double]("mrr") - 0.5) < 1e-12) // avg(1/1, 0)
    assert(math.abs(g.getAs[Double]("map_at_k") - ((1.0 + 2.0 / 3.0) / 3.0) / 2) < 1e-12)
  }

  test("global metrics, BCB denominator (min(|truth|, k))") {
    // q1 has 2 true clones in the ground truth, q2 has 5 → denominators 2 and 3.
    val truth = Seq(("q1", 2), ("q2", 5)).toDF("query_id", "num_relevant_truth")
    val pq = IrMetrics.perQuery(detailed).join(truth, "query_id")
    val g = IrMetrics.global(pq, k = 3,
      apDenominator = least(col("num_relevant_truth"), lit(3))).collect()(0)
    assert(math.abs(g.getAs[Double]("map_at_k") - ((1.0 + 2.0 / 3.0) / 2.0) / 2) < 1e-12)
  }

  test("MRR is 1 iff every query's first result is relevant") {
    val allFirst = Seq(("a", 1, true, 1.0), ("a", 2, false, 0.5), ("b", 1, true, 0.9))
      .toDF("query_id", "rank", "is_relevant", "score")
    val g = IrMetrics.global(IrMetrics.perQuery(allFirst), 2, lit(2)).collect()(0)
    assert(g.getAs[Double]("mrr") === 1.0)
    assert(g.getAs[Double]("success_rate") === 1.0)
  }
}
