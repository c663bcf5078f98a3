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
}
