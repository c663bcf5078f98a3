package graft.bench

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
    .toDF("id", "stratum")

  test("seeded sample is deterministic and order-stable") {
    val a = Sampling.seeded(df, "id", 10).select("id").as[Long].collect()
    val b = Sampling.seeded(df, "id", 10).select("id").as[Long].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 10 && a.distinct.length == 10)
  }

  test("stratified: constant quota per stratum, small strata keep everything") {
    val got = Sampling.stratified(df, "id", "stratum", 8)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("big" -> 8L, "small" -> 8L))
    val tiny = Sampling.stratified(df, "id", "stratum", 50)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny == Map("big" -> 50L, "small" -> 10L)) // only 10 small rows exist
  }

  test("weighted: prob 0 keeps nothing, prob 1 keeps all, kept sets nest monotonically") {
    assert(Sampling.weighted(df, "id", lit(0.0)).count() == 0)
    assert(Sampling.weighted(df, "id", lit(1.0)).count() == df.count())
    val at3 = Sampling.weighted(df, "id", lit(0.3)).select("id").as[Long].collect().toSet
    val at6 = Sampling.weighted(df, "id", lit(0.6)).select("id").as[Long].collect().toSet
    assert(at3.subsetOf(at6)) // same uniform per id — raising p only adds rows
    assert(at3.nonEmpty && at6.size < df.count())
    // deterministic across layouts: the kept set ignores partitioning
    val re = Sampling.weighted(df.repartition(13), "id", lit(0.6))
      .select("id").as[Long].collect().toSet
    assert(re == at6)
  }

  test("stratified picks the same rows as seeded within a single stratum") {
    val one = df.filter($"stratum" === "big")
    val viaStrat = Sampling.stratified(one, "id", "stratum", 7)
      .select("id").as[Long].collect().sorted.toSeq
    val viaSeed = Sampling.seeded(one, "id", 7)
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaStrat == viaSeed) // same salted-md5 order on both paths
  }

  test("stratified plans the bounded heap: no per-stratum rank window") {
    // r17: the per-stratum quota is a TopKRows aggregate keyed on the full
    // md5 digest (string tie-key) — map-side ≤ n rows per stratum, shuffle
    // ≤ |strata|·n — instead of a window that funnels each stratum's full
    // row set through one sort reducer
    val plan = Sampling.stratified(df, "id", "stratum", 8)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate, plan:\n$plan")
    assert(!plan.contains("Window"), s"rank window still present:\n$plan")
  }
}
