package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("shingles: n-grams, distinct, short-doc and separator edge cases") {
    val df = Seq(
      "a b c d",        // 2 distinct 3-grams
      "a b c",          // exactly one
      "a b",            // < n tokens -> empty
      "",               // empty -> empty
      "a  b \t c",      // consecutive separators collapse
      "x y x y x y x y" // repeated -> distinct collapses to 2
    ).toDF("text").select(Dedup.shingles(col("text"), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b c", "b c d"))
    assert(got(1) == Set("a b c"))
    assert(got(2).isEmpty)
    assert(got(3).isEmpty)
    assert(got(4) == Set("a b c"))
    assert(got(5) == Set("x y x", "y x y"))
  }

  test("exactGroups + dropExactDuplicates keep one per distinct text") {
    val df = docs(1L -> "hello world", 2L -> "hello world", 3L -> "other", 7L -> "hello world")
    val groups = Dedup.exactGroups(df, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("keeper"), r.getAs[Seq[Long]]("ids"), r.getAs[Long]("group_size")))
      .sortBy(_._1)
    assert(groups.toSeq == Seq((1L, Seq(1L, 2L, 7L), 3L), (3L, Seq(3L), 1L)))
    val kept = Dedup.dropExactDuplicates(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("minHashSignature is deterministic with numHashes elements; empty-safe") {
    val df = docs(1L -> "a b c d e f", 2L -> "a b c d e f", 3L -> "")
      .select(col("doc_id"), Dedup.minHashSignature(Dedup.shingles(col("text"), 3), 16).as("sig"))
    val rows = df.collect().sortBy(_.getLong(0)).map(_.getSeq[Long](1))
    assert(rows.forall(_.length == 16))
    assert(rows(0) == rows(1)) // same text -> identical signature
    assert(rows(2).forall(_ == Long.MaxValue)) // no shingles -> sentinel fill
  }

  test("minHashEstimate: identical docs estimate 1.0, disjoint estimate ~0") {
    val sig = (t: String) => Dedup.minHashSignature(Dedup.shingles(lit(t), 3), 128)
    val row = spark.range(1).select(
      Dedup.minHashEstimate(sig("a b c d e"), sig("a b c d e")).as("same"),
      Dedup.minHashEstimate(sig("a b c d e"), sig("v w x y z")).as("diff")).head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) < 0.15)
  }

  test("ngramJaccardPairs and minHashNearDups agree on clear near-dups") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 59).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other, 4L -> base)
    val exact = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    // 60 tokens -> 58 shingles; only the final shingle differs between 1 and
    // 2, so j = 57/59; (1,4) identical; (2,4) mirrors (1,2)
    assert(exact.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val exactMap = exact.map(p => (p._1, p._2) -> p._3).toMap
    assert(exactMap((1L, 4L)) == 1.0)
    assert(math.abs(exactMap((1L, 2L)) - 57.0 / 59.0) < 1e-12)
    val lsh = Dedup.minHashNearDups(df, "doc_id", "text", n = 3,
        numHashes = 128, bands = 32, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    // verify step computes EXACT jaccard on candidates -> values must match
    assert(lsh.toSeq == exact.toSeq)
  }

  test("dropNearDuplicates keeps one representative per cluster + unclustered docs") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 59).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other, 4L -> base)
    // cluster {1,2,4} -> representative 1; 3 is unclustered
    val kept = Dedup.dropNearDuplicates(df, "doc_id", "text", n = 3, threshold = 0.7)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("contaminationScan finds n-gram overlap pairs, counts distinct shingles") {
    import spark.implicits._
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "completely unrelated words here nothing shared at all",
      3L -> "quick brown fox jumps over the lazy dog again")
    val evalSet = Seq((100L, "a quick brown fox jumps over the lazy dog end"))
      .toDF("doc_id", "text")
    val got = Dedup.contaminationScan(corpus, "doc_id", "text",
        evalSet, "doc_id", "text", n = 5, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // docs 1 and 3 each share exactly the four 5-grams spanning
    // "quick brown fox jumps over the lazy dog" with the eval doc; doc 2
    // shares none. Exact counts pin DISTINCT-shingle semantics — a
    // multiplicity-counting regression would overcount.
    assert(got.toSeq == Seq((1L, 100L, 4L), (3L, 100L, 4L)))
    // minOverlap filters pairs below the bar
    val strict = Dedup.contaminationScan(corpus, "doc_id", "text",
      evalSet, "doc_id", "text", n = 5, minOverlap = 100)
    assert(strict.count() == 0)
  }

  test("maxBucketSize drops boilerplate buckets (skew guard) but default keeps them") {
    val boiler = (1 to 40).map(i => s"same$i").mkString(" ")
    val df = docs((1L to 6L).map(_ -> boiler): _*)
    // 6 identical docs share EVERY band -> all buckets have 6 members
    val default = Dedup.minHashNearDups(df, "doc_id", "text", n = 3, threshold = 0.9)
    assert(default.count() == 15) // all C(6,2) pairs
    val capped = Dedup.minHashNearDups(df, "doc_id", "text", n = 3, threshold = 0.9,
      maxBucketSize = 5)
    assert(capped.count() == 0) // every bucket oversized -> candidacy lost
  }

  test("simHashNearDups: identical docs at hamming 0, unrelated docs absent") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val df = docs(1L -> base, 2L -> base, 3L -> (1 to 80).map(i => s"q$i").mkString(" "))
    val got = Dedup.simHashNearDups(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }

  test("winnowNearDups: shared runs pair, unrelated docs don't, boilerplate capped") {
    import spark.implicits._
    val boiler = "LICENSE HEADER APACHE TWO POINT OH " * 3
    val docs = Seq(
      1L -> ("def quicksort(arr): pivot = arr[0]; " + "unique tail one"),
      2L -> ("def quicksort(arr): pivot = arr[0]; " + "other ending two"),
      3L -> "completely different content about matrices and graphs",
      4L -> (boiler + "alpha body"),
      5L -> (boiler + "beta payload")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowNearDups(docs, "doc_id", "text",
        k = 8, w = 4, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // long shared prefix
    assert(pairs.contains((4L, 5L))) // shared boilerplate
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // maxBucketSize=1 drops every fingerprint shared by 2+ docs — the
    // skew guard wired through: no shared buckets, no pairs
    val capped = Dedup.winnowNearDups(docs, "doc_id", "text",
        k = 8, w = 4, minShared = 3, maxBucketSize = 1)
    assert(capped.count() == 0)
    assert(Dedup.winnowNearDups(docs.limit(0), "doc_id", "text").count() == 0)
  }

  test("exact-collapse mining ≡ direct mining (minhash + winnow), incl. dup families") {
    // Families of exact copies (the duplication-amplified worst case),
    // near-dups across families, unique docs, and a family of texts too
    // short to shingle/fingerprint (must produce NO pairs either way).
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val other = "completely different content with no overlap whatsoever in sight"
    val corpus = docs(
      1L -> base, 2L -> base, 3L -> base,           // family A (3 copies)
      4L -> near, 5L -> near,                        // family B (2 copies), near A
      6L -> other,                                   // unique
      7L -> "tiny", 8L -> "tiny",                    // short family: no shingles
      9L -> "the quick brown fox jumps over the lazy dog again and again today" // = A, non-contiguous id
    )
    def key(r: Row) = (r.getLong(0), r.getLong(1))

    val mhFast = Dedup.minHashNearDups(corpus, "doc_id", "text",
      threshold = 0.5, collapseExact = true).collect().map(key).toSet
    val mhSlow = Dedup.minHashNearDups(corpus, "doc_id", "text",
      threshold = 0.5, collapseExact = false).collect().map(key).toSet
    assert(mhFast === mhSlow)
    // family A ∪ {9} gives C(4,2)=6 within pairs; A×B cross pairs exist
    assert(Set((1L, 2L), (1L, 9L), (2L, 3L), (1L, 4L)).subsetOf(mhFast))
    assert(!mhFast.exists { case (a, b) => a == 7L || b == 8L })

    val wFast = Dedup.winnowNearDups(corpus, "doc_id", "text",
      k = 8, w = 4, collapseExact = true).collect()
    val wSlow = Dedup.winnowNearDups(corpus, "doc_id", "text",
      k = 8, w = 4, collapseExact = false).collect()
    def full(r: Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(wFast.map(full).toSet === wSlow.map(full).toSet) // scores too
    assert(Set((1L, 2L), (2L, 9L)).subsetOf(wFast.map(key).toSet))
  }

  test("exact-collapse respects document-weighted bucket caps") {
    // One fingerprintable text duplicated 6×: any band/fp bucket holds 1
    // rep weighing 6 documents. With cap 5 the DIRECT path drops every
    // bucket (6 > 5) and emits nothing — the collapsed path must agree,
    // which only happens if caps count documents, not representatives.
    val corpus = docs((1L to 6L).map(i =>
      i -> "some repeated boilerplate text that fingerprint buckets will share"): _*)
    val direct = Dedup.minHashNearDups(corpus, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 5, collapseExact = false).count()
    val collapsed = Dedup.minHashNearDups(corpus, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 5, collapseExact = true).count()
    assert(direct === 0L && collapsed === 0L)
    val wDirect = Dedup.winnowNearDups(corpus, "doc_id", "text",
      k = 8, w = 4, maxBucketSize = 5, collapseExact = false).count()
    val wCollapsed = Dedup.winnowNearDups(corpus, "doc_id", "text",
      k = 8, w = 4, maxBucketSize = 5, collapseExact = true).count()
    assert(wDirect === 0L && wCollapsed === 0L)
  }

  test("connectedComponents: chains collapse transitively, singletons self-label") {
    import spark.implicits._
    // path graph 1-2-3-4-5-6-7-8 (diameter 7 forces >1 pointer-jump round),
    // a separate pair (20,21), and singletons 30, 31
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 7L,
      7L -> 8L, 21L -> 20L).toDF("id_a", "id_b")
    val vertices = ((1L to 8L) ++ Seq(20L, 21L, 30L, 31L)).toDF("doc_id")
    // default: the driver union-find fast path (4 edges << threshold)
    val got = Dedup.connectedComponents(vertices, "doc_id", edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 8L).foreach(i => assert(got(i) == 1L, s"vertex $i"))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got(30L) == 30L && got(31L) == 31L)
    assert(got.size == 12)
    // the distributed pointer-jumping path yields IDENTICAL labels
    val dist = Dedup.connectedComponents(vertices, "doc_id", edges, "id_a", "id_b",
        smallEdgeThreshold = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == got)
  }

  test("connectedComponents matches driver-side union-find on random graphs") {
    import spark.implicits._
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress to canonical min labels
      (1 to n).map(i => i.toLong -> find(i).toLong).toMap
    }
    for (seed <- Seq(1, 7, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(40)((rnd.nextInt(n) + 1).toLong -> (rnd.nextInt(n) + 1).toLong)
        .filter { case (a, b) => a != b }
      val want = unionFind(n, edges)
      // both execution paths against the same driver-side reference
      for (threshold <- Seq(-1L, 1000000L)) {
        val got = Dedup.connectedComponents(
            (1L to n.toLong).toDF("doc_id"), "doc_id",
            edges.toDF("id_a", "id_b"), "id_a", "id_b",
            smallEdgeThreshold = threshold)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"seed $seed threshold $threshold")
      }
    }
  }

  test("connectedComponents converges within the pointer-jump bound on a long chain") {
    import spark.implicits._
    val n = 40L // diameter 39: plain propagation would need 39 rounds
    val edges = (1L until n).map(i => i -> (i + 1)).toDF("id_a", "id_b")
    val vertices = (1L to n).toDF("doc_id")
    val got = Dedup.connectedComponents(vertices, "doc_id", edges, "id_a", "id_b",
        maxIter = 10, smallEdgeThreshold = -1L) // force the distributed loop
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.forall(_._2 == 1L))
  }

  test("connectedComponents runs ONE action per round (convergence rides the checkpoint)") {
    import spark.implicits._
    // Convergence must not cost a separate probe action (a join/isEmpty per
    // round re-scans the label table — real money at corpus scale): the
    // changed-count is an observe metric accumulated during the checkpoint
    // job, so the only actions are the initial label checkpoint plus one
    // localCheckpoint per round.
    val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        names.add(funcName)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
        names.add(s"FAILED:$funcName")
    }
    spark.listenerManager.register(listener)
    try {
      val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L).toDF("id_a", "id_b")
      val vertices = (1L to 6L).toDF("doc_id")
      val (labels, rounds) = Dedup.connectedComponentsWithRounds(
        vertices, "doc_id", edges, "id_a", "id_b",
        smallEdgeThreshold = -1L) // the distributed loop is under test
      assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 6L))
      org.apache.spark.sql.GraftInternal.drainListenerBus(spark)
      val during = names.toArray(Array.empty[String])
        .filterNot(_ == "collect") // the assertion's own collect above
      assert(during.forall(_ == "localCheckpoint"), during.mkString(","))
      assert(during.length == rounds + 1, s"${during.length} actions for $rounds rounds")
    } finally spark.listenerManager.unregister(listener)
  }

  test("durable checkpoint mode: identical pairs + cluster labels, superseded rounds deleted") {
    import spark.implicits._
    // The preemptible-cluster mode (spark.graft.checkpointDir) must be a
    // pure materialization swap: same mined pairs, same CC labels, same
    // round count — with round state living as parquet files (not
    // executor-local blocks) and superseded rounds deleted as the loop
    // advances. Identity is asserted against the DEFAULT (localCheckpoint)
    // mode on the same inputs.
    val df = docs(
      1L -> "a b c d e f g h", 2L -> "a b c d e f g h", // exact family
      3L -> "a b c d e f g x", 4L -> "q r s t u v w",
      5L -> "q r s t u v w z", 6L -> "lonely text entirely elsewhere")
    def mine() = Dedup.minHashNearDups(df, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.4)
    def pairsOf(p: org.apache.spark.sql.DataFrame) = p.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // diameter-7 chain forces multiple distributed rounds
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L,
      6L -> 7L, 7L -> 8L, 21L -> 20L).toDF("id_a", "id_b")
    val vertices = ((1L to 8L) ++ Seq(20L, 21L, 30L)).toDF("doc_id")
    def cc() = Dedup.connectedComponentsWithRounds(vertices, "doc_id",
      edges, "id_a", "id_b", smallEdgeThreshold = -1L)
    val basePairs = pairsOf(mine())
    val (bl, baseRounds) = cc()
    val baseLabels = bl.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val root = java.nio.file.Files.createTempDirectory("graft_durable_ckpt").toFile
    spark.conf.set(Dedup.CheckpointDirConf, root.toString)
    try {
      assert(pairsOf(mine()) == basePairs)
      val (dl, dRounds) = cc()
      assert(dl.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == baseLabels)
      assert(dRounds == baseRounds && dRounds > 1, s"rounds: $dRounds vs $baseRounds")
      val pfx = Dedup.durableDirPrefix(spark)
      val kids = Option(root.listFiles()).getOrElse(Array.empty).map(_.getName)
      // every durable dir carries the graft_ckpt_<app>_ namespace — the
      // sweep's ownership evidence, and disjoint from the repo's own
      // graft_scale_*/graft_admit_probe* work dirs
      assert(kids.forall(_.startsWith(pfx)), kids.mkString(","))
      // pairs: one eagerPairs materialization per mine(); rounds: only the
      // FINAL round's dir survives (superseded rounds deleted in-loop; the
      // initial-labels dir counts as superseded too)
      assert(kids.count(_.startsWith(s"${pfx}pairs_")) == 1, kids.mkString(","))
      assert(kids.count(_.startsWith(s"${pfx}cc_")) == 1, kids.mkString(","))
      def count(prefix: String) = Option(root.listFiles()).getOrElse(Array.empty)
        .count(_.getName.startsWith(prefix))
      // releaseEager must free the backing dir through a DERIVED frame
      // too (the shape cache evictors hold — a projection, not the exact
      // writeReadBack instance): plan-walk resolution, not registry-only.
      val derived = mine().select(col("id_a"))
      assert(count(s"${pfx}pairs_") == 2)
      Dedup.releaseEager(derived)
      assert(count(s"${pfx}pairs_") == 1, "derived-frame release must delete its dir")
      // eagerResult (the pipelines' top-k materializer) rides the same
      // durable machinery: backed under the dir, released via registry.
      val er = Dedup.eagerResult(df, "topk")
      assert(er.count() == df.count() && count(s"${pfx}topk_") == 1)
      Dedup.releaseEager(er)
      assert(count(s"${pfx}topk_") == 0, "eagerResult release must delete its dir")
    } finally {
      spark.conf.unset(Dedup.CheckpointDirConf)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("cleanCheckpoints sweeps own abandoned dirs; keeps live frames, foreign runs, user files") {
    import spark.implicits._
    val df = docs(1L -> "a b c", 2L -> "d e f")
    val root = java.nio.file.Files.createTempDirectory("graft_clean_ckpt").toFile
    spark.conf.set(Dedup.CheckpointDirConf, root.toString)
    try {
      val pfx = Dedup.durableDirPrefix(spark)
      def names() = Option(root.listFiles()).getOrElse(Array.empty)
        .map(_.getName).toSet
      val live = Dedup.eagerResult(df, "topk")
      assert(live.count() == 2)
      // a dir abandoned by THIS app (frame dropped without release, then
      // GC'd): weak registry entry gone, name carries our tag → swept
      val abandoned = new java.io.File(root, s"${pfx}pairs_00000000-dead")
      assert(abandoned.mkdirs())
      assert(new java.io.File(abandoned, "part-00000.parquet").createNewFile())
      // a CONCURRENT run's dir (another JVM sharing the root): its tag is
      // not ours, its registries are invisible here → off-limits by
      // default, swept only with the explicit sweepForeign opt-in
      val foreignRun = new java.io.File(root,
        "graft_ckpt_other-jvm-42_pairs_11111111-live")
      assert(foreignRun.mkdirs())
      // repo work dirs under the same root use the wider graft_ prefix —
      // never the sweep's namespace — and user data is always off-limits
      val fixture = new java.io.File(root, "graft_scale_docs_x300_v2")
      assert(fixture.mkdirs())
      val user = new java.io.File(root, "user_data")
      assert(user.mkdirs())
      Dedup.cleanCheckpoints(spark)
      val after = names()
      assert(!after.contains(abandoned.getName),
        s"own abandoned dir must be swept: $after")
      assert(after.count(_.startsWith(s"${pfx}topk_")) == 1,
        s"live registered frame's dir must survive: $after")
      assert(after.contains(foreignRun.getName),
        s"a concurrent run's dir is off-limits without sweepForeign: $after")
      assert(after.contains("graft_scale_docs_x300_v2") && after.contains("user_data"),
        s"non-checkpoint dirs are off-limits: $after")
      assert(live.count() == 2, "the kept frame must still read")
      Dedup.releaseEager(live)
      Dedup.cleanCheckpoints(spark, sweepForeign = true)
      val end = names()
      assert(!end.exists(_.startsWith("graft_ckpt_")),
        s"sweepForeign widens to every unreferenced checkpoint dir: $end")
      assert(end.contains("graft_scale_docs_x300_v2") && end.contains("user_data"),
        s"even sweepForeign never leaves the graft_ckpt_ namespace: $end")
    } finally {
      spark.conf.unset(Dedup.CheckpointDirConf)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("pruneStaleApps release hook deletes a stopped app's durable backing at eviction") {
    import spark.implicits._
    // A session-cycling JVM in durable mode: the frame caches evict
    // stopped-app entries on access, and the eviction hook
    // (Dedup.releaseStale) must free the durable backing THEN — not leak
    // it until someone happens to run cleanCheckpoints.
    val df = docs(1L -> "a b c", 2L -> "d e f")
    val root = java.nio.file.Files.createTempDirectory("graft_stale_ckpt").toFile
    spark.conf.set(Dedup.CheckpointDirConf, root.toString)
    try {
      val pfx = Dedup.durableDirPrefix(spark)
      def count(p: String) = Option(root.listFiles())
        .getOrElse(Array.empty).count(_.getName.startsWith(p))
      val cache = new java.util.concurrent.ConcurrentHashMap[
        (String, String), org.apache.spark.sql.DataFrame]()
      cache.put(("stopped-app-9", "some-dir"), Dedup.eagerResult(df, "topk"))
      assert(count(s"${pfx}topk_") == 1)
      graft.SparkEntry.pruneStaleApps(
        cache, spark.sparkContext.applicationId)(_._1)(Dedup.releaseStale(_, spark))
      assert(cache.isEmpty, "the stale entry must be evicted")
      assert(count(s"${pfx}topk_") == 0,
        "eviction must delete the durable backing dir")
    } finally {
      spark.conf.unset(Dedup.CheckpointDirConf)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("releaseTracked discharges a stopped application's deletion duty") {
    // A JVM that cycles Spark sessions must not leak a prior session's
    // durable operator-internal dirs: releaseTracked deletes other-app
    // entries' dirs (that app is stopped — one live SparkContext per JVM)
    // instead of silently dropping them from the queue.
    val root = java.nio.file.Files.createTempDirectory("graft_deadapp_ckpt").toFile
    val dead = new java.io.File(root, "graft_ckpt_stopped-app-7_spangcnt_feed")
    assert(dead.mkdirs())
    Dedup.trackedDurable.add(("stopped-app-7", dead.toString,
      new java.lang.ref.WeakReference[org.apache.spark.sql.DataFrame](null)))
    try {
      Dedup.releaseTracked(spark)
      assert(!dead.exists(), "stopped-app dir must be deleted, not dropped")
      import scala.jdk.CollectionConverters._
      assert(!Dedup.trackedDurable.asScala.exists(_._2 == dead.toString),
        "the discharged entry must leave the queue")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("derived-frame release survives a conf unset between write and release (write-time roots)") {
    import spark.implicits._
    // The ADVICE r19 failure mode: spark.graft.checkpointDir re-pointed or
    // unset between materialization and eviction skipped the plan walk and
    // leaked the backing dir. Roots are now captured at WRITE time.
    val df = docs(1L -> "a b c", 2L -> "d e f")
    val root = java.nio.file.Files.createTempDirectory("graft_rootcap_ckpt").toFile
    spark.conf.set(Dedup.CheckpointDirConf, root.toString)
    def count(prefix: String) = Option(root.listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith(prefix))
    val pfx = Dedup.durableDirPrefix(spark)
    try {
      val er = Dedup.eagerResult(df, "topk")
      assert(er.count() == 2 && count(s"${pfx}topk_") == 1)
      val derived = er.select(col("doc_id")) // registry fast path misses
      spark.conf.unset(Dedup.CheckpointDirConf) // session reconfigured mid-sweep
      Dedup.releaseEager(derived)
      assert(count(s"${pfx}topk_") == 0,
        "plan-walk release must use roots captured at write time, not the live conf")
    } finally {
      spark.conf.unset(Dedup.CheckpointDirConf)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("operators tolerate empty corpora") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.minHashNearDups(empty, "doc_id", "text").count() == 0)
    assert(Dedup.simHashNearDups(empty, "doc_id", "text").count() == 0)
    assert(Dedup.dropExactDuplicates(empty, "doc_id", "text").count() == 0)
    assert(Dedup.dropNearDuplicates(empty, "doc_id", "text").count() == 0)
    assert(Dedup.connectedComponents(empty.select($"doc_id"), "doc_id",
      noPairs, "id_a", "id_b").count() == 0)
    assert(Dedup.contaminationScan(empty, "doc_id", "text",
      empty, "doc_id", "text").count() == 0)
  }

  test("null text rows are tolerated and never pair") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, null.asInstanceOf[String]), (4L, base))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDups(df, "doc_id", "text", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 4L))) // null doc participates in nothing
    val kept = Dedup.dropNearDuplicates(df, "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L)) // null doc survives as its own row
  }

  test("editSimilarity: UTF-8-byte distance and byte-length denominator (engine-portable)") {
    // ASCII: bytes == code points, classic kitten/sitting = 3 over len 7.
    // Non-ASCII: the pinned unit is BYTES — 'café' vs 'cafe' differs in
    // é(2 bytes)↔e(1 byte) = substitution+insertion = 2 edits over
    // max(5, 4) bytes — exactly what DuckDB's levenshtein/strlen replay
    // (Spark's code-point builtin would say 1/4 and could not be
    // oracle-checked; a byte lev over CHAR length could leave [0,1]).
    val d = docs((1L, "kitten"), (2L, "sitting"), (3L, "café"), (4L, "cafe"))
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.editSimilarity(pairs, d, "doc_id", "text")
      .orderBy($"id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got(0) == ((1L, 2L, 3, 1.0 - 3.0 / 7.0)))
    assert(got(1)._3 == 2, s"byte edits for café→cafe, got ${got(1)._3}")
    assert(math.abs(got(1)._4 - (1.0 - 2.0 / 5.0)) < 1e-12)
    // identical texts -> 0 distance, similarity exactly 1
    val same = Dedup.editSimilarity(
      Seq((1L, 1L)).toDF("id_a", "id_b"), d, "doc_id", "text").head()
    assert(same.getInt(2) == 0 && same.getDouble(3) == 1.0)
  }

  test("jaccard column function handles empty arrays") {
    val row = spark.range(1).select(
      Dedup.jaccard(array(), array()).as("both_empty"),
      Dedup.jaccard(array(lit("a")), array()).as("one_empty"),
      Dedup.jaccard(array(lit("a"), lit("b")), array(lit("b"), lit("c"))).as("half")).head()
    assert(row.getDouble(0) == 0.0)
    assert(row.getDouble(1) == 0.0)
    assert(math.abs(row.getDouble(2) - 1.0 / 3.0) < 1e-12)
  }
}
