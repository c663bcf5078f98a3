package graft.plans

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  // small carries a null key and a duplicated key; big carries repeated
  // keys (a postings-table shape) and keys absent from small
  private def small = Seq(
    (Some(1L), "a"), (Some(2L), "b"), (Some(2L), "b2"),
    (None, "n"), (Some(5L), "e")).toDF("id", "v")
  private def big = Seq(3L, 2L, 2L, 2L, 7L, 9L)
    .toDF("id").select(col("id").cast("long").as("id"))

  test("antiSmallLeft equals the plain left_anti, including null and duplicate keys") {
    val plain = small.join(big, Seq("id"), "left_anti")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    val reversed = Joins.antiSmallLeft(small, big, "id")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(reversed == plain)
    // null key never equi-matches -> survives the anti
    assert(reversed.contains((None, "n")))
    assert(!reversed.exists(_._2.startsWith("b"))) // id=2 present in big
  }

  test("semiSmallLeft equals the plain left_semi; duplicate big keys don't multiply rows") {
    val plain = small.join(big, Seq("id"), "left_semi")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    val reversed = Joins.semiSmallLeft(small, big, "id")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(reversed == plain)
    assert(reversed == Set((Some(2L): Option[Any], "b"), (Some(2L): Option[Any], "b2")))
    // semi preserves multiplicity of the SMALL side only: two id=2 rows in,
    // two out, despite three id=2 rows in big
    assert(Joins.semiSmallLeft(small, big, "id").count() == 2)
  }

  test("the big side never shuffles: plan has no exchange above its scan") {
    // the whole point of the reversed probe — assert the physical plan
    // broadcasts and keeps the big side exchange-free (these tiny frames
    // dispatch to the plain-broadcast path; the reversed path is pinned
    // in the dedicated dispatch test below)
    val plan = Joins.antiSmallLeft(small, big, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
  }

  test("size-aware dispatch: sub-threshold keys take the plain broadcast, reversed otherwise — same rows") {
    // tiny in-memory key table -> plain path: ONE broadcast join, no
    // second (hit-set) join in the plan
    val plainPlan = Joins.antiSmallLeft(small, big, "id")
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plainPlan).size == 1,
      s"sub-threshold keys must take the single plain broadcast join:\n$plainPlan")
    // disabling the broadcast threshold forces the reversed shape (the
    // explicit hints keep working): two broadcast joins, still no SMJ of
    // the big side — and rows identical to the plain path
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val reversed = Joins.antiSmallLeft(small, big, "id")
      val revPlan = reversed.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(revPlan).size == 2,
        s"above-threshold keys must take the reversed two-join shape:\n$revPlan")
      assert(!revPlan.contains("SortMergeJoin") && !revPlan.contains("ShuffledHashJoin"), revPlan)
      val rows = reversed.collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
      val semi = Joins.semiSmallLeft(small, big, "id")
        .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
      spark.conf.set(key, saved)
      assert(rows == Joins.antiSmallLeft(small, big, "id")
        .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet)
      assert(semi == Joins.semiSmallLeft(small, big, "id")
        .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet)
    } finally spark.conf.set(key, saved)
  }
}
