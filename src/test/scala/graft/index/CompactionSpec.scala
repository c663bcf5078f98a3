package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Small-file compaction: the append-only-artifact maintenance pass.
  * Row identity, threshold no-ops, hive-partition preservation, and the
  * torn-swap healing protocol are all pinned. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(p: String): Seq[String] = {
    val it = fs(p).listFiles(new Path(p), true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next().getPath.getName
      if (!f.startsWith("_") && !f.startsWith(".")) out += f
    }
    out.result()
  }

  private def appendBatches(dir: String, nBatches: Int): Unit =
    (0 until nBatches).foreach { b =>
      Seq.tabulate(50)(i => (b * 1000L + i, s"doc $b-$i"))
        .toDF("id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    }

  test("hidden subdirectory: never counted toward triggers, preserved across the swap") {
    val dir = Files.createTempDirectory("graft_compact_hidden").toString + "/t"
    appendBatches(dir, 10)
    // a '_'-prefixed subdir nested in the data dir (a caller's path
    // mistake, or a crashed write's _temporary): invisible to Spark's
    // readers, so compaction must neither count its files nor destroy it
    Seq((1L, "sidecar row")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/__nested")
    val hiddenRows = spark.read.parquet(s"$dir/__nested").collect().toSeq
    val before = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    val (b, a) = Compaction.compactDir(spark, dir, minFiles = 4)
    assert(b == 10 && a < 10, s"hidden files skewed the count: $b -> $a")
    assert(spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq == before)
    assert(spark.read.parquet(s"$dir/__nested").collect().toSeq == hiddenRows,
      "the nested hidden dir must survive the rewrite byte-identically")
  }

  test("compacts many per-batch appends into few files, rows identical") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    appendBatches(dir, 20)
    assert(dataFiles(dir).size == 20)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    val (b, a) = Compaction.compactDir(spark, dir, targetFileBytes = 1L << 30)
    assert(b == 20 && a < 20 && a >= 1, s"expected a rewrite, got $b -> $a")
    assert(dataFiles(dir).size == a)
    val after = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    assert(after == before, "compaction must be a pure layout change")
  }

  test("no-ops below minFiles, on already-large files, and on a missing dir") {
    val dir = Files.createTempDirectory("graft_compact_noop").toString + "/t"
    appendBatches(dir, 3)
    assert(Compaction.compactDir(spark, dir) == ((3, 3)), "below minFiles")
    // tiny target -> every file already exceeds it -> target >= count
    appendBatches(dir, 17)
    assert(Compaction.compactDir(spark, dir, targetFileBytes = 1L) == ((20, 20)))
    assert(Compaction.compactDir(spark, dir + "_missing") == ((0, 0)))
  }

  test("hive-partitioned dir keeps its partition layout") {
    val dir = Files.createTempDirectory("graft_compact_part").toString + "/t"
    (0 until 12).foreach { b =>
      Seq.tabulate(40)(i => (b * 100L + i, (i % 4).toString))
        .toDF("id", "bucket").coalesce(1)
        .write.mode("append").partitionBy("bucket").parquet(dir)
    }
    val before = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    val (b, a) = Compaction.compactDir(spark, dir,
      targetFileBytes = 1L << 30, partitionBy = Seq("bucket"))
    assert(a < b)
    // partition dirs survive -> bucket pruning still works on the layout
    val parts = fs(dir).listStatus(new Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("bucket="))
    assert(parts.toSet == Set("bucket=0", "bucket=1", "bucket=2", "bucket=3"))
    assert(spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq == before)
    // one file per partition-value combo -> a second pass must converge
    // to a no-op, not loop full rewrites forever
    assert(a == 4, s"partition-hashed rewrite gives one file per value, got $a")
    val again = Compaction.compactDir(spark, dir,
      targetFileBytes = 1L << 30, partitionBy = Seq("bucket"))
    assert(again == ((a, a)), s"already-at-floor partitioned dir must no-op, got $again")
  }

  test("heals a torn swap: dir missing with dir__old present") {
    val dir = Files.createTempDirectory("graft_compact_heal").toString + "/t"
    appendBatches(dir, 10)
    val rows = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    // simulate a crash between the two renames: dir staged away, no swap-in
    require(fs(dir).rename(new Path(dir), new Path(dir + "__old")))
    val (b, a) = Compaction.compactDir(spark, dir, targetFileBytes = 1L << 30)
    assert(b == 10 && a < 10, "healed dir must then compact normally")
    assert(spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq == rows,
      "healing must restore every row")
    // leftover __old alongside dir (crash before final delete) is dropped
    appendBatches(dir + "2", 2)
    fs(dir).mkdirs(new Path(dir + "2__old"))
    Compaction.compactDir(spark, dir + "2")
    assert(!fs(dir).exists(new Path(dir + "2__old")))
  }

  test("MinHashIndex.compact folds per-upsert signature files") {
    val root = Files.createTempDirectory("graft_compact_mh").toString
    val base = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n")).toDF("doc_id", "text")
    val idx = MinHashIndex(spark, root, "docs")
    idx.build(base, "doc_id", "text", n = 3, numHashes = 16, bands = 4)
    (0 until 10).foreach { b =>
      idx.upsert(Seq((100L + b, s"fresh doc number $b with words")).toDF("doc_id", "text"),
        "doc_id", "text")
    }
    val sigDir = s"$root/docs/sig"
    assert(dataFiles(sigDir).size >= 10, "each upsert appends a file")
    val before = spark.read.parquet(sigDir).count()
    val (b, a) = idx.compact()
    assert(a < b, s"expected the signature table to shrink: $b -> $a")
    assert(spark.read.parquet(sigDir).count() == before)
    // the index still answers: a near-dup of an upserted doc is found
    val probe = Seq((999L, "fresh doc number 3 with words")).toDF("doc_id", "text")
    val hits = idx.nearDupAgainstExact(probe, "doc_id", "text",
      base.unionByName(probe.withColumn("doc_id", lit(103L))),
      "doc_id", "text", threshold = 0.8)
    assert(hits.count() >= 1, "compaction must not lose index rows")
  }
}
