package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("joins and aggregates over co-bucketed tables run with zero Exchange") {
    val docs = (1L to 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val meta = (1L to 200L).map(i => (i, i % 5)).toDF("doc_id", "tier")
    BucketedCorpus.write(docs, "bc_docs", "doc_id", nBuckets = 4)
    BucketedCorpus.write(meta, "bc_meta", "doc_id", nBuckets = 4)
    try {
      // force the large-large path: broadcast would mask the bucketing win
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.enabled" -> "false") {
        val joined = BucketedCorpus.join(spark, "bc_docs", "bc_meta", "doc_id")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
        assert(joined.count() == 200)

        // keyed aggregate rides the same pre-hashed scan
        val agg = BucketedCorpus.read(spark, "bc_docs")
          .groupBy($"doc_id").agg(count(lit(1)))
        assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))

        // control: the same join over non-bucketed frames DOES shuffle
        val naive = docs.join(meta, Seq("doc_id"))
        assert(naive.queryExecution.executedPlan.toString.contains("Exchange"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bc_docs")
      spark.sql("DROP TABLE IF EXISTS bc_meta")
    }
  }
}
