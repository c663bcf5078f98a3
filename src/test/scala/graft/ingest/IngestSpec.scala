package graft.ingest

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CloneGraphSpec extends SparkSpec {
  import spark.implicits._

  test("adjacency symmetrizes and dedups (bcb_utils.py:24-33 semantics)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 2L)).toDF("a", "b")
    val adj = CloneGraph.adjacency(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(adj(1L) === Seq(2L))
    assert(adj(2L) === Seq(1L, 3L)) // both directions, sorted
    assert(adj(3L) === Seq(2L))
  }

  test("adjacencySalted matches plain adjacency on a hub-skewed graph") {
    // id 1 is a hub with 200 neighbors; others are sparse
    val pairs = ((1 to 200).map(i => (1L, 100L + i)) ++ Seq((2L, 3L), (3L, 4L)))
      .toDF("a", "b")
    val plain = CloneGraph.adjacency(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val salted = CloneGraph.adjacencySalted(pairs, "a", "b", saltBuckets = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(salted == plain)
    assert(salted(1L).length == 200)
  }

  test("adjacencyWithCounts sizes the BCB MAP denominator input") {
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val m = CloneGraph.adjacencyWithCounts(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(m === Map(1L -> 2, 2L -> 1, 3L -> 1))
  }
}

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("sliceLines preserves the reference's off-by-one slice (bcb_utils.py:61-65)") {
    val df = Seq("l1\nl2\nl3\nl4\nl5").toDF("text")
    // python lines[1:3] → drops line 1, keeps lines 2..3
    val got = df.select(Corpus.sliceLines($"text", lit(1), lit(3))).as[String].collect()(0)
    assert(got === "l2\nl3")
    // empty when start >= end (python empty slice)
    val empty = df.select(Corpus.sliceLines($"text", lit(3), lit(3))).as[String].collect()(0)
    assert(empty === "")
  }

  test("bcb corpus: inner-join drop semantics + uuid5 identity + clone carry") {
    val adj = CloneGraph.adjacency(Seq((10L, 20L)).toDF("a", "b"), "a", "b")
      .withColumnRenamed("id", "func_id")
    val functions = Seq((10L, "f.java", 0, 2), (99L, "g.java", 0, 1))
      .toDF("ID", "FILE", "START", "END")
    val files = Seq(("f.java", "a\nb\nc")).toDF("path", "text")
    val out = Corpus.bcb(adj, functions, "ID", "FILE", "START", "END", files, "path", "text")
      .collect()
    assert(out.length === 1) // func 20 has no metadata row → dropped (try/except pass)
    val r = out(0)
    assert(r.getAs[Long]("func_id") === 10L)
    assert(r.getAs[String]("code_contents") === "a\nb") // lines[0:2]
    assert(r.getAs[Seq[Long]]("clones") === Seq(20L))
    // uuid5(NAMESPACE_DNS, "10")
    assert(r.getAs[String]("code_uuid") === "0159d6c7-973f-5e7a-a9a0-d195d0ea6fe2")
  }

  test("poj corpus: label/name from path, uuid5 of label+name (poj_utils.py:59-62)") {
    val files = Seq(("file:/data/poj104/17/1700.txt", "int main(){}")).toDF("path", "text")
    val r = Corpus.poj(files).collect()(0)
    assert(r.getAs[String]("clone_type") === "17")
    assert(r.getAs[String]("code_name") === "1700.txt")
    assert(r.getAs[String]("code_contents") === "int main(){}")
    // python: uuid.uuid5(uuid.NAMESPACE_DNS, "171700.txt")
    assert(r.getAs[String]("code_uuid") === "0728363c-f5dc-5f75-98a2-feb4b575a8fa")
  }
}

class DirSourceSpec extends SparkSpec {

  test("recursive *.txt scan with charset-detected decode (poj_utils.py:15-28,64-70)") {
    val dir = Files.createTempDirectory("graft_dirsource")
    Files.createDirectories(Paths.get(s"$dir/17"))
    Files.createDirectories(Paths.get(s"$dir/42"))
    Files.write(Paths.get(s"$dir/17/a.txt"), "hello".getBytes("UTF-8"))
    // 0xFF is invalid UTF-8 -> detection falls back to windows-1252, where
    // 0xFF = 'ÿ' (the chardet+decode path would keep it too — a UTF-8-lossy
    // pass would have dropped the byte)
    Files.write(Paths.get(s"$dir/42/b.txt"), Array[Byte]('h', 'i', 0xFF.toByte, '!'))
    Files.write(Paths.get(s"$dir/42/skip.csv"), "nope".getBytes("UTF-8"))

    val got = DirSource.files(spark, dir.toString)
      .select("path", "charset", "text").collect()
      .map(r => (r.getString(0).split("/").takeRight(2).mkString("/"),
        (r.getString(1), r.getString(2))))
      .toMap
    assert(got === Map(
      "17/a.txt" -> ("utf-8", "hello"),
      "42/b.txt" -> ("Windows-1252", "hiÿ!")))
    // a LITERAL U+FFFD in valid input must survive (python errors="ignore"
    // only drops undecodable bytes, not decodable replacement chars)
    assert(DirSource.decodeLossy("a�b".getBytes("UTF-8")) == "a�b")
    assert(DirSource.decodeLossy(Array[Byte]('x', 0xC3.toByte)) == "x") // truncated seq dropped
  }

  test("detectAndDecode: BOM sniff, UTF-16 round trips, windows-1252 holes drop") {
    // UTF-8 BOM stripped, charset labeled UTF-8-SIG (python utf-8-sig)
    val bomUtf8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "héllo".getBytes("UTF-8")
    assert(DirSource.detectAndDecode(bomUtf8) == ("UTF-8-SIG", "héllo"))
    // UTF-16 LE/BE with BOM decode and strip the BOM (python utf-16)
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "hi é".getBytes("UTF-16LE")
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ "hi é".getBytes("UTF-16BE")
    assert(DirSource.detectAndDecode(le) == ("UTF-16", "hi é"))
    assert(DirSource.detectAndDecode(be) == ("UTF-16", "hi é"))
    // plain ASCII/UTF-8 detects as utf-8
    assert(DirSource.detectAndDecode("plain".getBytes("UTF-8")) == ("utf-8", "plain"))
    val utf8Acc = "naïve café".getBytes("UTF-8")
    assert(DirSource.detectAndDecode(utf8Acc) == ("utf-8", "naïve café"))
    // latin-1/windows-1252 bytes keep their accents instead of being dropped
    val latin = "café".getBytes("windows-1252")
    assert(DirSource.detectAndDecode(latin) == ("Windows-1252", "café"))
    // the five undefined windows-1252 bytes vanish (errors="ignore")
    val holes = Array[Byte]('a', 0x81.toByte, 'b', 0x8D.toByte, 'c')
    assert(DirSource.detectAndDecode(holes) == ("Windows-1252", "abc"))
    assert(DirSource.detectAndDecode(null) == ((null, null)))
  }

  test("detectAndDecode: statistical GBK / Shift-JIS detection (poj_utils.py:64-70)") {
    import java.nio.charset.Charset
    // a GBK-encoded C file with a Chinese comment: real bytes via the JDK
    // codec, detected and decoded back losslessly
    val zh = "int main() { return 0; } // 你好世界这是中文注释"
    val zhBytes = zh.getBytes(Charset.forName("GBK"))
    assert(DirSource.detectAndDecode(zhBytes) == (("GBK", zh)))
    // Shift-JIS with hiragana + kanji: the kana/level-1 rows are strong
    // evidence SJIS-ward even though the byte stream also parses as GBK
    val ja = "// こんにちは世界\nint y = 1;"
    val jaBytes = ja.getBytes(Charset.forName("Shift_JIS"))
    assert(DirSource.detectAndDecode(jaBytes) == (("Shift_JIS", ja)))
    // cp1252 text whose accents happen to form structurally-valid CJK
    // pairs must NOT be claimed: isolated high bytes followed by ASCII
    // never hit the common planes
    val fr = "résumés déjà créés à côté"
    val frBytes = fr.getBytes(Charset.forName("windows-1252"))
    assert(DirSource.detectAndDecode(frBytes)._1 == "Windows-1252")
    // smart-quote cp1252 (lead bytes 0x93/0x94 are valid SJIS leads) stays cp1252
    val sq = "he said “hello” and “bye” and “more” then left"
    val sqBytes = sq.getBytes(Charset.forName("windows-1252"))
    assert(DirSource.detectAndDecode(sqBytes)._1 == "Windows-1252")
    // density floor: a long mostly-ASCII cp1252 file whose clustered
    // accented pairs DO satisfy the structural + common-plane tests (4+
    // adjacent pairs, both bytes high) must still fall back byte-preserving
    // — the characteristic pairs cover far less than 5% of the file
    val clustered = ("word " * 100).getBytes("US-ASCII") ++
      Array.fill(4)(Array(0xD6.toByte, 0xFC.toByte)).flatten // "Öü" ×4 adjacent
    assert(DirSource.detectAndDecode(clustered)._1 == "Windows-1252")
  }
}
