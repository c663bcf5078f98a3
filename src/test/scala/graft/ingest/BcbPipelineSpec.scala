package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.TfIdfEmbedder
import graft.index.{CollectionMeta, CollectionNaming, VectorCollection}
import graft.search.Knn

/**
 * End-to-end BCB lifecycle (the reference's entry point A, main.py:42-90):
 * CSV scans → clone graph → corpus build with line slicing → embed →
 * collection upsert → top-k search → relevance tagging. A user of the
 * reference switching to this library runs exactly this chain.
 */
class BcbPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("csv -> clone graph -> corpus -> embed -> collection -> knn, end to end") {
    val dir = Files.createTempDirectory("graft_bcb")

    // Fixture: 2 source files, 4 functions, clone pairs (1,2) and (3,4).
    Files.writeString(dir.resolve("clones.csv"),
      "FUNCTION_ID_ONE,FUNCTION_ID_TWO\n1,2\n3,4\n")
    Files.writeString(dir.resolve("functions.csv"),
      "ID,NAME,STARTLINE,ENDLINE\n" +
        "1,a.java,0,2\n2,a.java,2,4\n3,b.java,0,2\n4,b.java,2,4\n")
    val filesDf = Seq(
      ("a.java", "alpha beta\ngamma delta\nepsilon zeta\nquick brown"),
      ("b.java", "one two\nthree four\nfive six\nseven eight")).toDF("path", "text")

    // S1/S2 + A1 + J1/S4/F1
    val clones = CsvSource.readClones(spark, dir.resolve("clones.csv").toString)
    val functions = CsvSource.readFunctions(spark, dir.resolve("functions.csv").toString)
    val adjacency = CloneGraph.adjacency(
      clones.select($"FUNCTION_ID_ONE".as("a"), $"FUNCTION_ID_TWO".as("b")), "a", "b")
      .withColumnRenamed("id", "func_id")
    val corpus = Corpus.bcb(adjacency, functions,
      "ID", "NAME", "STARTLINE", "ENDLINE", filesDf, "path", "text")

    val rows = corpus.collect().map(r =>
      r.getAs[Long]("func_id") -> r.getAs[String]("code_contents")).toMap
    // python lines[0:2] drops line 0? No: [0:2] keeps lines 1..2 of 1-based
    // per the documented semantics start+1..end
    assert(rows(1L) == "alpha beta\ngamma delta")
    assert(rows(2L) == "epsilon zeta\nquick brown")
    assert(rows(3L) == "one two\nthree four")

    // E1 + S6/S8/S9 + naming
    val model = new TfIdfEmbedder(dim = 128).fit(corpus, "code_contents")
    val vecs = model.transform(corpus, "code_contents", "vec")
    val name = CollectionNaming.collectionName("bcb", "org/test-model", normalized = true)
    assert(name == "bcb_test-model_normalized")
    val coll = VectorCollection(spark, dir.resolve("colls").toString, name)
    assert(!coll.exists)
    coll.create(CollectionMeta(128, "cosine", normalized = true))
    assert(coll.exists)
    coll.upsert(vecs.select($"code_uuid", $"func_id", $"vec", $"clones"), "code_uuid")
    assert(coll.load().count() == 4)

    // J2 + P3 + P5: search the collection with one of its own functions,
    // tag relevance via the carried clone array (bcb_utils.py:183)
    val loaded = coll.load()
    val q = loaded.filter($"func_id" === 1)
      .select($"func_id".as("qid"), $"vec", $"clones".as("qclones"))
    val res = Knn.knnJoin(q, "qid", "vec", loaded.select($"func_id", $"vec"),
        "func_id", "vec", k = 3, roundScoreTo = Some(6))
      .withColumn("is_clone", array_contains($"query_qclones", $"func_id"))
    val byRank = res.orderBy($"rank").collect()
    assert(byRank.length == 3)
    assert(byRank.forall(_.getAs[Long]("func_id") != 1L)) // self excluded
    assert(res.filter($"is_clone").count() == 1) // func 2 is the only clone
  }
}
