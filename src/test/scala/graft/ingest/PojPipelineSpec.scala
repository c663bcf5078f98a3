package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.TfIdfEmbedder
import graft.metrics.IrMetrics
import graft.search.Knn

/**
 * End-to-end POJ lifecycle (the reference's entry point B, main.py:92-148):
 * recursive dir walk → lossy decode → label/name/uuid extraction → embed →
 * top-k search → same-label relevance → IR metrics.
 */
class PojPipelineSpec extends SparkSpec {

  test("dir walk -> corpus -> embed -> knn -> label relevance -> metrics") {
    val root = Files.createTempDirectory("graft_poj")
    // two "problems" (labels), three solutions each; problem text clusters
    val texts = Map(
      "1" -> Seq("sort the array with quick sort pivot",
        "sort the array with merge sort halves",
        "sort an array using quick pivot swap"),
      "2" -> Seq("read matrix rows and multiply columns",
        "multiply two matrix blocks by rows",
        "read two matrices and multiply row column"))
    texts.foreach { case (label, docs) =>
      Files.createDirectories(Paths.get(s"$root/$label"))
      docs.zipWithIndex.foreach { case (t, i) =>
        Files.writeString(Paths.get(s"$root/$label/s$i.txt"), t)
      }
    }

    // S3/S5/F3/F1: walk + decode + parse labels + deterministic ids
    val corpus = Corpus.poj(DirSource.files(spark, root.toString))
    assert(corpus.count() == 6)
    val byName = corpus.collect().map(r =>
      r.getAs[String]("code_name") -> r.getAs[String]("clone_type")).toMap
    assert(byName("s0.txt") == "1" || byName("s0.txt") == "2")
    assert(corpus.select("code_uuid").distinct().count() == 6)

    // E1 + J2 + P6 + A3-A6: embed, search, same-type relevance, metrics
    val model = new TfIdfEmbedder(dim = 256).fit(corpus, "code_contents")
    val vecs = model.transform(corpus, "code_contents", "vec")
      .select(col("code_uuid"), col("clone_type"), col("vec"))
    val res = Knn.knnJoin(vecs, "code_uuid", "vec", vecs, "code_uuid", "vec",
        k = 2, roundScoreTo = Some(6), useTopKAgg = false) // string ids -> window path
      .withColumn("is_relevant", col("clone_type") === col("query_clone_type"))
    val metrics = IrMetrics.global(
      IrMetrics.perQuery(res), k = 2, apDenominator = lit(2)).head()
    // same-problem texts share vocabulary -> retrieval must beat chance
    assert(metrics.getAs[Double]("success_rate") > 0.8)
    assert(metrics.getAs[Double]("mrr") > 0.8)
  }
}
