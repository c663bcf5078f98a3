package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.dedup.Dedup

class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 59).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    Seq(1L -> base, 2L -> nearDup, 3L -> other, 4L -> base, 5L -> "a b")
      .toDF("doc_id", "text") // doc 5 has < n tokens -> no shingles
  }

  test("build -> query matches the direct operator's pair set; short docs excluded") {
    val root = Files.createTempDirectory("graft_mh_idx").toString
    val idx = MinHashIndex(spark, root, "docs")
    assert(!idx.exists)
    idx.build(fixture, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    assert(idx.exists)
    assert(idx.meta == MinHashIndexMeta(3, 128, 32))
    assert(idx.signatures().count() == 4) // doc 5 excluded

    // exact pairs at 0.7 are (1,2) j=57/59, (1,4) j=1, (2,4): the estimate
    // with 128 hashes sits within a few percent -> same id set at 0.7
    val direct = Dedup.minHashNearDups(fixture, "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIndex = idx.nearDupPairs(threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == direct)
    // estimates are honest: identical docs estimate exactly 1.0
    val est = idx.nearDupPairs(threshold = 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(est((1L, 4L)) == 1.0)

    // rebuilding overwrites deterministically; a second query agrees
    idx.build(fixture, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    assert(idx.nearDupPairs(threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == direct)
    idx.drop()
    assert(!idx.exists)
  }

  test("upsert appends only unseen ids; index-backed dedup keeps representatives") {
    val root = Files.createTempDirectory("graft_mh_idx3").toString
    val idx = MinHashIndex(spark, root, "docs")
      .build(fixture, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    // re-delivering old ids + one new doc: only the new one is signed
    val batch = Seq(
      1L -> (1 to 60).map(i => s"tok$i").mkString(" "), // already indexed
      9L -> (1 to 60).map(i => s"new$i").mkString(" ")).toDF("doc_id", "text")
    idx.upsert(batch, "doc_id", "text")
    assert(idx.signatures().count() == 5) // 4 from build + doc 9
    idx.upsert(batch, "doc_id", "text") // idempotent re-delivery
    assert(idx.signatures().count() == 5)
    // the shingle-less doc 5 stays indexed (raw id universe) so it is not
    // re-signed, and still never appears in pairs
    assert(idx.nearDupPairs(0.7).filter(col("id_a") === 5L || col("id_b") === 5L).count() == 0)

    // index-backed dedup: cluster {1,2,4} -> keep 1; 3, 5, 9 unclustered
    val all = fixture.union(batch.filter(col("doc_id") === 9L))
    val kept = idx.dropNearDuplicates(all, "doc_id", threshold = 0.7)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 5L, 9L))
  }

  test("exact-verify path is output-identical to the direct operator") {
    val root = Files.createTempDirectory("graft_mh_idx4").toString
    val idx = MinHashIndex(spark, root, "docs")
      .build(fixture, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    // pairs: same ids AND the same exact-Jaccard values as the direct
    // operator (the estimate path only guarantees the id set)
    val direct = Dedup.minHashNearDups(fixture, "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaIndex = idx.nearDupPairsExact(fixture, "doc_id", "text", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == direct)
    // one-call removal agrees with the self-contained operator row-for-row
    val directKept = Dedup.dropNearDuplicates(fixture, "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.7)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val indexKept = idx.dropNearDuplicatesExact(fixture, "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(indexKept == directKept && indexKept == Seq(1L, 3L, 5L))
  }

  test("batch-vs-index: incoming docs matched against the indexed corpus, exact-verified") {
    val root = Files.createTempDirectory("graft_mh_batch").toString
    val idx = MinHashIndex(spark, root, "docs")
    idx.build(fixture, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    // a genuinely NEW batch (ids not in the index): one near-dup of doc 1,
    // one unrelated doc
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val newNearDup = ((1 to 58).map(i => s"tok$i") ++ Seq("X", "Y")).mkString(" ")
    val batch = Seq(100L -> newNearDup, 101L -> "completely different words entirely here now")
      .toDF("doc_id", "text")
    val got = idx.nearDupAgainstExact(batch, "doc_id", "text",
        fixture, "doc_id", "text", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 100 matches the base docs 1 and 4 (j = 56/60 ≈ 0.93 over 3-gram
    // shingles) and misses the CHANGED variant only if below threshold;
    // 101 matches nothing
    assert(got.contains((100L, 1L)) && got.contains((100L, 4L)))
    assert(!got.exists(_._1 == 101L))
    // self-pairs impossible even when the batch overlaps the corpus
    val overlap = idx.nearDupAgainstExact(fixture.filter(col("doc_id") === 1L),
      "doc_id", "text", fixture, "doc_id", "text", threshold = 0.7)
    assert(!overlap.collect().exists(r => r.getLong(0) == r.getLong(1)))
  }

  test("batch-vs-index bucket cap: an over-cap corpus band generates no candidates") {
    // Four verbatim copies of the base doc share every band (bucket size
    // 4); a probe that duplicates them matches at the default cap and is
    // silenced by maxBucketSize = 3 — the boilerplate skew guard applied
    // to the matched band set (the post-join windowed count must equal
    // the band's FULL corpus bucket size, not the probe-side join count).
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val corpus = (1L to 4L).map(_ -> base).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_mh_cap").toString
    val idx = MinHashIndex(spark, root, "docs")
      .build(corpus, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    val probe = Seq(100L -> base).toDF("doc_id", "text")
    val open = idx.nearDupAgainstExact(probe, "doc_id", "text",
      corpus, "doc_id", "text", threshold = 0.7)
    assert(open.collect().map(_.getLong(1)).toSet == Set(1L, 2L, 3L, 4L))
    val capped = idx.nearDupAgainstExact(probe, "doc_id", "text",
      corpus, "doc_id", "text", threshold = 0.7, maxBucketSize = 3)
    assert(capped.isEmpty)
  }

  test("empty-candidate exact verify returns an INDEPENDENT frame (release-safe)") {
    // The non-empty branch returns an owned checkpoint, so callers may
    // release the returned frame (plan-walk unpersist of its
    // LogicalRDDs). The empty branch must therefore NOT be a projection
    // over `cand` — aliasing its lineage-cut blocks would let that
    // release destroy the caller's candidate frame unrecoverably.
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(1L -> base).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_mh_emptyverify").toString
    val idx = MinHashIndex(spark, root, "docs")
      .build(corpus, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    val batch = Seq(100L -> "completely different words entirely here")
      .toDF("doc_id", "text")
    val cand = idx.candidatePairsAgainst(batch, "doc_id", "text", 10000)
    assert(cand.isEmpty)
    val out = idx.verifyCandidatesExact(cand, batch, "doc_id", "text",
      corpus, "doc_id", "text", threshold = 0.7)
    assert(out.columns.toSeq == Seq("batch_id", "match_id", "jaccard") && out.isEmpty)
    val aliased = out.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }
    assert(aliased.isEmpty, "empty verify must not wrap cand's plan")
    assert(cand.count() == 0, "cand must stay readable after the call")
  }

  test("materializeBands: identical answers, upsert tail visible, stale/torn coverage falls back") {
    val root = Files.createTempDirectory("graft_mh_mat").toString
    val idx = MinHashIndex(spark, root, "docs")
      .build(fixture, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    val derived = idx.bandTable().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val pairsB = idx.nearDupPairs(threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    idx.materializeBands()
    // the materialized source is row-identical to derivation
    assert(idx.bandTable().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == derived)
    assert(idx.nearDupPairs(threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == pairsB)
    // upsert AFTER materialization: the new doc's bands come from the
    // derive-tail (sig files not in the coverage snapshot) — a probe
    // that duplicates it must find it without re-materializing
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    idx.upsert(Seq(50L -> ((1 to 58).map(i => s"tok$i") ++ Seq("P", "Q"))
      .mkString(" ")).toDF("doc_id", "text"), "doc_id", "text")
    val probe = Seq(200L -> base).toDF("doc_id", "text")
    val corpus = fixture.union(Seq(
      50L -> ((1 to 58).map(i => s"tok$i") ++ Seq("P", "Q")).mkString(" "))
      .toDF("doc_id", "text"))
    val got = idx.nearDupAgainstExact(probe, "doc_id", "text",
        corpus, "doc_id", "text", threshold = 0.7)
      .collect().map(_.getLong(1)).toSet
    assert(got.contains(50L) && got.contains(1L), s"tail doc missing: $got")
    // compact() folds the tail and re-materializes (coverage refreshed):
    // same answers, and the tail is now inside the materialized table
    idx.compact(minFiles = 2)
    assert(idx.nearDupAgainstExact(probe, "doc_id", "text",
        corpus, "doc_id", "text", threshold = 0.7)
      .collect().map(_.getLong(1)).toSet == got)
    // torn materialization (coverage missing): silent fallback to derivation
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/docs/_bands.json"), false)
    assert(idx.nearDupAgainstExact(probe, "doc_id", "text",
        corpus, "doc_id", "text", threshold = 0.7)
      .collect().map(_.getLong(1)).toSet == got)
    // stale coverage (a covered sig file vanished): fallback, still exact
    idx.materializeBands()
    val sigFile = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/docs/sig"))
      .map(_.getPath).filter(p => !p.getName.startsWith("_")).head
    fs.rename(sigFile, new org.apache.hadoop.fs.Path(
      sigFile.getParent, "part-renamed.parquet"))
    assert(idx.nearDupAgainstExact(probe, "doc_id", "text",
        corpus, "doc_id", "text", threshold = 0.7)
      .collect().map(_.getLong(1)).toSet == got)
  }

  test("band table derives bands-per-doc from stored signatures only") {
    val root = Files.createTempDirectory("graft_mh_idx2").toString
    val idx = MinHashIndex(spark, root, "docs")
      .build(fixture, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
    val counts = idx.bandTable().groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.toSet == Set(32L))
    // identical docs share every band; unrelated docs share none
    val bands = idx.bandTable().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(bands(1L) == bands(4L))
    assert(bands(1L).intersect(bands(3L)).isEmpty)
  }

  test("fold stamp: a pre-r15 (full-mapping-fold) artifact refuses loudly; foldCurrent gates rebuild") {
    // Signatures derive from the canonical fold; an artifact built under
    // a DIFFERENT fold holds keys that silently disagree on İ/Σ-class
    // characters. The meta stamp turns that into a targeted error, and
    // foldCurrent is the predicate engine caches use to rebuild instead.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mh_fold").toString
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    val idx = MinHashIndex(spark, root, "docs")
    idx.build(docs, "doc_id", "text", n = 3, numHashes = 16, bands = 4)
    assert(idx.foldCurrent, "freshly built artifact carries the current stamp")
    // simulate a legacy artifact: rewrite _meta.json without the stamp
    val metaPath = new org.apache.hadoop.fs.Path(s"$root/docs/_meta.json")
    val hfs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(metaPath, true)
    out.write("""{"n":3,"numHashes":16,"bands":4}""".getBytes("UTF-8"))
    out.close()
    assert(idx.exists, "legacy artifact still EXISTS (no silent rebuild of user data)")
    assert(!idx.foldCurrent, "but it is not fold-current")
    val e = intercept[IllegalArgumentException] { idx.meta }
    assert(e.getMessage.contains("canonical fold"), e.getMessage)
    // the engine-cache pattern: !foldCurrent -> rebuild -> usable again
    idx.build(docs, "doc_id", "text", n = 3, numHashes = 16, bands = 4)
    assert(idx.foldCurrent && idx.meta.n == 3)
  }
}
