package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.cosine_similarity
import graft.search.Knn

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana cherry apple"),
    (2L, "apple banana durian"),
    (3L, "xylophone quartz granite"),
    (4L, "apple banana cherry apple")).toDF("id", "text")

  test("fit/transform yields normalized array<float> of the configured dim") {
    val model = new TfIdfEmbedder(dim = 1024).fit(corpus, "text")
    val out = model.transform(corpus, "text", "vec")
    assert(out.columns.toSeq == Seq("id", "text", "vec"))
    val rows = out.select(col("id"), col("vec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length == 1024))
    // L2 norm ~ 1 for every non-empty doc
    rows.values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // identical texts embed identically (deterministic hashing + idf)
    assert(rows(1L) == rows(4L))
  }

  test("shared-vocabulary documents score higher than disjoint ones") {
    val model = new TfIdfEmbedder(dim = 1024).fit(corpus, "text")
    val vecs = model.transform(corpus, "text", "vec")
    val a = vecs.filter($"id" === 1).select($"vec".as("va"))
    val bc = vecs.filter($"id" =!= 1).select($"id", $"vec".as("vb"))
    val scores = a.crossJoin(bc)
      .select($"id", cosine_similarity($"va", $"vb").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(4L) > 0.999999) // identical text
    assert(scores(2L) > scores(3L)) // shared words beat disjoint
    assert(scores(3L) < 0.05)
  }

  test("documents -> vectors -> knnJoin end-to-end (the reference's whole ingest+query path)") {
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
    val model = new TfIdfEmbedder(dim = 128).fit(docs, "text")
    val vecs = model.transform(docs, "text", "vec").select($"doc_id", $"vec")
    val res = Knn.knnJoin(vecs.limit(5), "doc_id", "vec", vecs, "doc_id", "vec",
      k = 3, excludeSelf = false, roundScoreTo = Some(6))
    // with self-matches allowed, every query's rank-1 hit is itself at ~1.0
    val top1 = res.filter($"rank" === 1)
      .select($"query_id", $"doc_id", $"score").collect()
    assert(top1.length == 5)
    top1.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getDouble(2) > 0.999998)
    }
  }
}
