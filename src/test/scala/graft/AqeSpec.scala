package graft

import org.apache.spark.sql.functions._

/**
 * Certifies the engine's runtime answer to skew: AQE detects a hot join
 * key at execution time and splits the oversized shuffle partition
 * (`skew=true` in the final adaptive plan). Manual salting
 * (CloneGraph.adjacencySalted) covers aggregation skew; this pins the
 * join-side story so a conf regression (someone disabling AQE or raising
 * the thresholds) can't silently revive the straggler-task failure mode
 * that kills 100 TB joins.
 */
class AqeSpec extends SparkSpec {

  test("AQE splits a skewed shuffle-join partition (skew=true in the final plan)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // fixture-sized skew thresholds: a real cluster keeps the defaults
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      import spark.implicits._
      // 95% of left rows share one key -> one shuffle partition dwarfs the rest
      val left = spark.range(0, 200000)
        .select(when($"id" % 20 =!= 0, lit(7L)).otherwise($"id").as("k"),
          $"id".as("v"))
      val right = spark.range(0, 64).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS dataset's own queryExecution (count() would build a
      // separate aggregate plan and leave this one unfinalized)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$plan")
    }
  }
}
