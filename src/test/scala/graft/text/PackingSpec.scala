package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // (group, id, tokens) — budget 10:
  //   g: 4, 5, 3 → exclusive sums 0, 4, 9 → batches 0, 0, 0 (12 tokens spill)
  //      then 7 → exclusive 12 → batch 1; 25 → exclusive 19 → batch 1
  //      then 2 → exclusive 44 → batch 4 (oversized doc skips batch ids)
  //   h: 6 → batch 0
  private val rows = Seq(
    ("g", 1L, "a b c d"), ("g", 2L, "a b c d e"), ("g", 3L, "a b c"),
    ("g", 4L, "a b c d e f g"), ("g", 5L, ("x " * 25).trim), ("g", 6L, "a b"),
    ("h", 7L, "a b c d e f"))

  private def df = rows.toDF("grp", "id", "text")

  test("assign follows the exclusive-prefix-sum rule, per group") {
    val got = Packing.assign(df, Seq("grp"), "id",
        TextAnalysis.tokenCount(col("text")), budget = 10L)
      .select($"id", $"batch_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L,
      6L -> 4L, 7L -> 0L))
  }

  test("batches manifest: every doc exactly once; under-budget before the last doc") {
    val b = Packing.batches(df, Seq("grp"), "id",
      TextAnalysis.tokenCount(col("text")), budget = 10L)
    assert(b.agg(sum($"n_docs")).head().getLong(0) == rows.size)
    // dropping each batch's last doc leaves < budget tokens: the rule never
    // starts a doc once a whole budget is already filled
    val a = Packing.assign(df, Seq("grp"), "id",
      TextAnalysis.tokenCount(col("text")), budget = 10L)
    val lastTok = a.groupBy($"grp", $"batch_id")
      .agg(max_by($"n_tokens", $"id").as("last"), sum($"n_tokens").as("tot"))
    assert(lastTok.filter($"tot" - $"last" >= 10L).count() == 0)
  }

  test("assignment is layout-independent (repartition does not change batches)") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.assign(d, Seq("grp"), "id", TextAnalysis.tokenCount(col("text")), 10L)
        .select($"id", $"batch_id").as[(Long, Long)].collect().toSet
    assert(run(df) == run(df.repartition(7)))
  }

  test("a global pack is rejected") {
    intercept[IllegalArgumentException] {
      Packing.assign(df, Seq.empty, "id", TextAnalysis.tokenCount(col("text")), 10L)
    }
  }
}
