package graft.cli

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class PipelinesSpec extends SparkSpec {

  test("runPoj produces reference-shaped outputs and sane metrics") {
    val root = Files.createTempDirectory("graft_cli_poj")
    Map(
      "1" -> Seq("sort array quick pivot swap left right",
        "sort array merge halves combine left right",
        "quick sort pivot partition array swap"),
      "2" -> Seq("matrix multiply rows columns accumulate cell",
        "multiply matrices row column dot cell",
        "matrix block multiply accumulate row column")).foreach { case (label, docs) =>
      Files.createDirectories(Paths.get(s"$root/$label"))
      docs.zipWithIndex.foreach { case (t, i) =>
        Files.writeString(Paths.get(s"$root/$label/s$i.txt"), t)
      }
    }
    val out = Pipelines.runPoj(spark, root.toString, k = 2, numSamples = 6, dim = 512)
    assert(out.detailed.columns.toSeq ==
      Seq("query_id", "result_id", "result_type", "similarity_score", "is_same_type"))
    assert(out.queryStats.columns.toSeq ==
      Seq("query_id", "query_type", "avg_same_type_score", "avg_diff_type_score",
        "num_same_type_found", "num_diff_type_found"))
    assert(out.detailed.count() == 12) // 6 queries x k=2
    val m = out.metrics.head()
    assert(m.getAs[Double]("success_rate") > 0.8)

    // registry-name path (the reference's --embedding_model surface):
    // the embedder comes from the registry; the dim arg is ignored
    val out2 = Pipelines.runPoj(spark, root.toString, k = 2, numSamples = 2,
      dim = 7, embeddingModel = Some("mmlw-e5-small"))
    assert(out2.detailed.count() == 4)

    val outDir = Files.createTempDirectory("graft_cli_out").toString
    Pipelines.writeOutputs(out, outDir, "poj")
    val written = new java.io.File(outDir).list()
    assert(written.exists(_.startsWith("poj_detailed_results_")))
    assert(written.exists(_.startsWith("poj_query_stats_")))
  }

  test("runBcb wires csv truth, line slicing, and the BCB MAP denominator") {
    val root = Files.createTempDirectory("graft_cli_bcb")
    Files.writeString(root.resolve("clones.csv"),
      "FUNCTION_ID_ONE,FUNCTION_ID_TWO\n1,2\n3,4\n")
    Files.writeString(root.resolve("functions.csv"),
      "ID,NAME,STARTLINE,ENDLINE\n1,a.java,0,2\n2,a.java,2,4\n3,b.java,0,2\n4,b.java,2,4\n")
    Files.createDirectories(root.resolve("src"))
    Files.writeString(root.resolve("src/a.java"),
      "alpha beta gamma\nalpha beta delta\nepsilon zeta eta\nepsilon zeta theta")
    Files.writeString(root.resolve("src/b.java"),
      "one two three\none two four\nfive six seven\nfive six eight")
    val out = Pipelines.runBcb(spark,
      root.resolve("clones.csv").toString, root.resolve("functions.csv").toString,
      root.resolve("src").toString, k = 2, numSamples = 4, dim = 256)
    // bcb_utils.py:191-199 exact column set, uuid point ids included
    assert(out.detailed.columns.toSeq ==
      Seq("query_id", "result_id", "result_func_id", "similarity_score", "is_clone"))
    assert(out.detailed.count() == 8) // 4 queries x k=2
    // result_id is the uuid5 point identity of result_func_id
    import org.apache.spark.sql.functions.col
    val mismatched = out.detailed.filter(
      col("result_id") =!= graft.functions.uuid5(col("result_func_id").cast("string")) ||
      !col("query_id").rlike("^[0-9a-f]{8}-")).count()
    assert(mismatched == 0)
    assert(out.queryStats.count() == 4)
    assert(out.metrics.columns.contains("map_at_k"))
    assert(out.metrics.head().getAs[Double]("success_rate") >= 0.0)
  }

  test("collection + embedder by model NAME: dim derives from the registry") {
    import org.apache.spark.sql.functions.{col, size => asize}
    import graft.embed.EmbedderRegistry
    import graft.index.{CollectionMeta, VectorCollection}
    val root = Files.createTempDirectory("graft_cli_reg").toString
    // the reference's setup_qdrant shape: no hand-passed dim anywhere —
    // the model name alone sizes the collection AND the embedder
    val model = "jinaai/jina-embeddings-v2-base-code"
    val c = VectorCollection.createFor(spark, root, "poj", model, normalized = true)
    assert(c.name == "poj_jina-embeddings-v2-base-code_normalized")
    assert(c.meta == CollectionMeta(768, "cosine", normalized = true))
    // idempotent re-open
    assert(VectorCollection.createFor(spark, root, "poj", model,
      normalized = true).meta.dim == 768)
    // embedded vectors actually land at the registry dim and upsert clean
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta")).toDF("id", "text")
    val fitted = EmbedderRegistry(model).embedder(normalized = true).fit(docs, "text")
    assert(fitted.dim == c.meta.dim)
    val vecs = fitted.transform(docs, "text", "vec")
    c.upsert(vecs, "id")
    assert(c.load().filter(asize(col("vec")) =!= c.meta.dim).count() == 0)
    // unknown names fail with the known list, and config lines extend it
    intercept[IllegalArgumentException](EmbedderRegistry("no-such-model"))
    EmbedderRegistry.registerAll("# custom models\nmy-model 64 code\n")
    assert(EmbedderRegistry.dimOf("my-model") == 64)
    assert(EmbedderRegistry("my-model").kind == "code")
    // a collection whose stored dim no longer matches the registry's is a
    // corrupt pairing: re-opening by model name fails loudly
    VectorCollection(spark, root, c.name).create(CollectionMeta(32, "cosine", true))
    val e = intercept[IllegalArgumentException] {
      VectorCollection.createFor(spark, root, "poj", model, normalized = true)
    }
    assert(e.getMessage.contains("refusing to mix"))
  }
}
