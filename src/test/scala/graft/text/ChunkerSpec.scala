package graft.text

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Int, Int, String)] =
    Chunker.chunk(Seq((1L, text)).toDF("id", "text"), Seq("id"), "text", size, stride)
      .select($"chunk_id", $"n_chunk_tokens", $"chunk_text")
      .as[(Int, Int, String)].collect().toSeq.sortBy(_._1)

  test("short doc yields exactly one chunk") {
    assert(chunksOf("a b c", 5, 2) == Seq((0, 3, "a b c")))
  }

  test("overlapping windows advance by stride, last chunk clipped") {
    val got = chunksOf("t0 t1 t2 t3 t4 t5 t6", 4, 2)
    assert(got == Seq(
      (0, 4, "t0 t1 t2 t3"),
      (1, 4, "t2 t3 t4 t5"),
      (2, 3, "t4 t5 t6")))
  }

  test("stride == size tiles without overlap; exact multiple has no stub chunk") {
    val got = chunksOf("a b c d e f", 3, 3)
    assert(got == Seq((0, 3, "a b c"), (1, 3, "d e f")))
  }

  test("empty text yields one empty chunk (no row loss for bookkeeping)") {
    assert(chunksOf("", 8, 4) == Seq((0, 0, "")))
  }

  test("every token appears in at least one chunk and positions respect stride") {
    val n = 57
    val text = (0 until n).map(i => s"w$i").mkString(" ")
    val got = chunksOf(text, 32, 16)
    assert(got.size == math.ceil((n - 32) / 16.0).toInt + 1)
    val covered = got.flatMap(_._3.split(" ")).toSet
    assert(covered == (0 until n).map(i => s"w$i").toSet)
    got.zipWithIndex.foreach { case ((cid, _, txt), i) =>
      assert(cid == i)
      assert(txt.split(" ").head == s"w${i * 16}")
    }
  }
}
