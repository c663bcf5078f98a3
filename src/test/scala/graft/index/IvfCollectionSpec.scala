package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables, TestSpark}
import graft.search.Knn

class IvfCollectionSpec extends SparkSpec {

  test("build/query: cell-partitioned layout, pruned scan, exact-score subset") {
    val root = Files.createTempDirectory("graft_ivf").toString
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val coll = IvfCollection(spark, root, "ivf_test")
      .build(emb, "vec_id", "embedding", nList = 4, seed = 42L)

    // layout: one directory per cell
    val cellDirs = new java.io.File(s"$root/ivf_test/cells").listFiles()
      .filter(_.getName.startsWith("ivf_cell=")).map(_.getName).sorted
    assert(cellDirs.length == 4)
    assert(coll.load().count() == emb.count())

    // pruning: a cell-filtered scan carries a partition filter, and reads
    // strictly fewer rows than the full collection
    val pruned = coll.loadCells(Seq(0, 1))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_cell"),
      s"expected partition filter in:\n$plan")
    assert(pruned.count() < emb.count())

    // query correctness: scores are true cosines (subset of exact)
    val q = emb.limit(10)
    val exact = Knn.knnJoin(q, "vec_id", "embedding", emb, "vec_id", "embedding",
        k = 5, roundScoreTo = Some(6))
      .select(col("query_id"), col("vec_id").as("result_id"), col("score"))
    val approx = coll.query(q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nProbe = 2, roundScoreTo = Some(6))
      .select(col("query_id"), col("vec_id").as("result_id"), col("score"))
    val idJoin = approx.join(exact, Seq("query_id", "result_id"), "left_semi").count()
    val fullJoin = approx.join(exact, Seq("query_id", "result_id", "score"), "left_semi").count()
    assert(idJoin == fullJoin && idJoin > 0)
  }
}
