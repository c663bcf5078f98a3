package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.search.Knn

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "aaaa bbbb cccc"),
    (2L, "aaaa bbbb cccc"),
    (3L, "zzzz ]]]] ~~~~ @@@@")).toDF("doc_id", "text")

  test("packText: binary payload + typed metadata struct") {
    val m = Multimodal.packText(docs, "doc_id", "text")
    assert(m.columns.toSeq == Seq("doc_id", "media", "meta"))
    val r = m.filter($"doc_id" === 1).select($"media", $"meta.kind", $"meta.n_bytes").head()
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == "aaaa bbbb cccc")
    assert(r.getString(1) == "text/plain")
    assert(r.getLong(2) == 14L)
  }

  test("extractFeatures: deterministic, L2-normalized, payload-sensitive") {
    val f = Multimodal.extractFeatures(
        Multimodal.packText(docs, "doc_id", "text"), "media", "feat", buckets = 32)
      .select($"doc_id", $"feat").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f.values.forall(_.length == 32))
    assert(f(1L) == f(2L)) // identical payloads -> identical features
    assert(f(1L) != f(3L))
    val n = math.sqrt(f(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
  }

  test("binary -> features -> knn pipeline: self is rank-1 at score 1") {
    val feats = Multimodal.extractFeatures(
        Multimodal.packText(docs, "doc_id", "text"), "media", "feat", buckets = 32)
      .select($"doc_id", $"feat")
    val res = Knn.knnJoin(feats, "doc_id", "feat", feats, "doc_id", "feat",
        k = 2, excludeSelf = false, roundScoreTo = Some(6))
      .filter($"rank" === 1)
      .select($"query_id", $"score").collect()
    assert(res.length == 3)
    // duplicate payloads tie at 1.0 and the id tie-break still yields a
    // score-1 self-or-twin hit
    res.foreach(r => assert(r.getDouble(1) == 1.0))
  }
}
