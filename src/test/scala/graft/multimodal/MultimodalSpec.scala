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

  test("sampleFrameFeatures: k stripe rows per payload, map-side, stub-decode") {
    import spark.implicits._
    // payload of 8 bytes, k=4 -> stripes of 2; stripe content differs so
    // frame features differ; len < k pads with zero vectors.
    val media = Seq(
      (1L, Array[Byte](0, 0, -1, -1, 0, 0, -1, -1)),
      (2L, Array[Byte](7))).toDF("doc_id", "media")
    val out = Multimodal.sampleFrameFeatures(media, "media", "feat", k = 4, buckets = 4)
    assert(out.columns.toSeq == Seq("doc_id", "frame_idx", "feat"))
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getSeq[Float](2))).sortBy(p => (p._1, p._2))
    assert(rows.length == 8, "k rows per payload, none dropped")
    val d1 = rows.filter(_._1 == 1L)
    assert(d1(0)._3 == Seq(1f, 0f, 0f, 0f), "bytes 0x00 -> bucket 0")
    assert(d1(1)._3 == Seq(0f, 0f, 0f, 1f), "bytes 0xff -> top bucket")
    assert(d1(0)._3 == d1(2)._3 && d1(1)._3 == d1(3)._3, "periodic payload -> periodic frames")
    val d2 = rows.filter(_._1 == 2L)
    // floor binning: stripe i covers [len*i/k, len*(i+1)/k) — for len=1,
    // k=4 only stripe 3 is non-empty (1*4/4 = 1)
    assert(d2(3)._3.exists(_ > 0f), "last stripe holds the only byte")
    assert(d2.take(3).forall(_._3.forall(_ == 0f)), "empty stripes -> zero vectors, indices kept")
    // null payload -> zero frame rows, never null feature elements
    val withNull = media.union(
      Seq((3L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "media"))
    val n3 = Multimodal.sampleFrameFeatures(withNull, "media", "feat", k = 4, buckets = 4)
      .filter($"doc_id" === 3L).count()
    assert(n3 == 0L, "null payload contributes no frame rows")
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
