package graft.bench

import java.nio.file.Files
import java.time.LocalDateTime

import graft.{SparkSpec, Tables, TestSpark}

class ScalabilitySpec extends SparkSpec {

  test("sweep truncates per size, probes latency, and writes reference-shaped CSVs") {
    val out = Files.createTempDirectory("graft_sweep").toString
    val corpus = Tables.embeddings(spark, TestSpark.sf0001)
    val points = Scalability.sweep(spark, corpus, "vec_id", "embedding",
      s"$out/collections", sizes = Seq(10, 25), numProbes = 3, k = 5)
    assert(points.map(_.size) == Seq(10L, 25L))
    assert(points.forall(_.avgQueryTimeSeconds > 0.0))
    assert(points.forall(_.ingestSeconds > 0.0))
    val (memPath, timePath) = Scalability.writeResults(spark, points, out, "test")
    val mem = spark.read.option("header", "true").csv(memPath)
    assert(mem.columns.toSeq == Seq("size", "memory_usage_mb"))
    assert(mem.count() == 2)
    val t = spark.read.option("header", "true").csv(timePath)
    assert(t.columns.toSeq == Seq("size", "avg_query_time_seconds"))
    assert(t.count() == 2)
  }

  test("timestampedPath encodes label + wall clock (F12)") {
    val p = Sinks.timestampedPath("/x", "runA",
      LocalDateTime.of(2026, 8, 12, 9, 30, 15))
    assert(p == "/x/runA_20260812_093015")
  }
}
