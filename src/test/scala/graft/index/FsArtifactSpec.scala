package graft.index

import java.nio.file.Files

import graft.SparkSpec

class FsArtifactSpec extends SparkSpec {
  import spark.implicits._

  test("FlatJson: quoted commas/braces/escapes parse; the old split reader's foot-gun is gone") {
    val m = FlatJson.parse(
      """{"dim":384,"metric":"co,mma}brace","name":"a \"q\" \\ b","normalized":false,"pi":3.5}""")
    assert(m("dim") == "384")
    assert(m("metric") == "co,mma}brace")
    assert(m("name") == "a \"q\" \\ b")
    assert(m("normalized") == "false")
    assert(m("pi") == "3.5")
    // unicode escapes, whitespace tolerance, empty object
    assert(FlatJson.parse("""{ "k" : "İx" , "n" : 7 }""") ==
      Map("k" -> "İx", "n" -> "7"))
    assert(FlatJson.parse("{}") == Map.empty[String, String])
    // duplicate keys: last wins (mainstream-parser behavior)
    assert(FlatJson.parse("""{"k":"a","k":"b"}""")("k") == "b")
    // nested structures are a schema bug, not a value — loud
    intercept[IllegalArgumentException] { FlatJson.parse("""{"k":{"x":1}}""") }
    intercept[IllegalArgumentException] { FlatJson.parse("""{"k":[1,2]}""") }
    intercept[IllegalArgumentException] { FlatJson.parse("""not json""") }
    intercept[IllegalArgumentException] { FlatJson.parse("""{"k":}""") }
  }

  test("meta roundtrip: a comma-in-string metric survives write -> read on a real artifact") {
    val root = Files.createTempDirectory("graft_fsart").toString
    val c = VectorCollection(spark, root, "tricky")
    // the old string-split reader returned "co" for this metric and "co,x"
    // truncated everything after it on the SAME line for later fields
    c.create(CollectionMeta(8, "co,x}sine", normalized = true))
    assert(c.meta == CollectionMeta(8, "co,x}sine", normalized = true))
    assert(c.partitionField.isEmpty)
    // a raw quote/backslash would produce invalid JSON the writers don't
    // escape — refused at the write boundary instead of corrupting meta
    intercept[IllegalArgumentException] {
      VectorCollection(spark, root, "bad")
        .create(CollectionMeta(8, "co\"sine", normalized = true))
    }
  }

  test("rebuildIfStale: stale fold rebuilds through the caller's build, current is untouched") {
    val root = Files.createTempDirectory("graft_fsart2").toString
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    val idx = MinHashIndex(spark, root, "docs")
    // absent artifact counts as stale: first call builds it
    assert(idx.rebuildIfStale(idx.build(docs, "doc_id", "text", n = 3, numHashes = 16, bands = 4)))
    assert(idx.foldCurrent && idx.meta.n == 3)
    // current artifact: closure must NOT run
    var ran = false
    assert(!idx.rebuildIfStale { ran = true })
    assert(!ran)
    // stale stamp (pre-versioning artifact): rebuild path restores currency
    val metaPath = new org.apache.hadoop.fs.Path(s"$root/docs/_meta.json")
    val hfs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(metaPath, true)
    out.write("""{"n":3,"numHashes":16,"bands":4}""".getBytes("UTF-8"))
    out.close()
    assert(!idx.foldCurrent)
    assert(idx.rebuildIfStale(idx.build(docs, "doc_id", "text", n = 3, numHashes = 16, bands = 4)))
    assert(idx.foldCurrent && idx.signatures().count() == 2)
    // a closure that forgets to rebuild fails loudly instead of leaving the
    // stale artifact to refuse again later
    val out2 = hfs.create(metaPath, true)
    out2.write("""{"n":3,"numHashes":16,"bands":4}""".getBytes("UTF-8"))
    out2.close()
    val e = intercept[IllegalArgumentException] { idx.rebuildIfStale { () } }
    assert(e.getMessage.contains("rebuildIfStale"), e.getMessage)
  }
}
