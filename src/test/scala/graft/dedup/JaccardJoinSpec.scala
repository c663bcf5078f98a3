package graft.dedup

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact prefix-filtered Jaccard join (Dedup.jaccardJoinPrefix): the
  * correctness contract is OUTPUT IDENTITY with the O(n²) reference
  * (ngramJaccardPairs) — checked on crafted corpora, duplicate families,
  * and seeded-random corpora dense with boundary-similarity pairs — while
  * the physical plan stays free of cartesian/nested-loop joins. */
class JaccardJoinSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq

  test("matches the all-pairs reference on clear near-dups") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 59).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other, 4L -> base)
    val expect = collectPairs(
      Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.7))
    val got = collectPairs(
      Dedup.jaccardJoinPrefix(df, "doc_id", "text", n = 3, threshold = 0.7))
    assert(got == expect)
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("duplicate families expand with jaccard 1.0; collapse on/off agree") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = ((1 to 39).map(i => s"w$i") :+ "X").mkString(" ")
    val df = docs(1L -> base, 2L -> base, 3L -> base, 4L -> near, 5L -> "a b")
    val expect = collectPairs(
      Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.7))
    val collapsed = collectPairs(
      Dedup.jaccardJoinPrefix(df, "doc_id", "text", n = 3, threshold = 0.7))
    val direct = collectPairs(Dedup.jaccardJoinPrefix(df, "doc_id", "text",
      n = 3, threshold = 0.7, collapseExact = false))
    assert(collapsed == expect && direct == expect)
    assert(expect.collect { case (a, b, j) if j == 1.0 => (a, b) } ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("random corpora: output-identical to the reference at several thresholds") {
    // Small token pool + doc-length spread => plenty of pairs sitting right
    // at the threshold boundary, where a wrong prefix bound or an FP ceil
    // would lose pairs.
    val rnd = new Random(42)
    val pool = (1 to 40).map(i => s"t$i")
    // Cluster-mutation generation: each doc is a base sequence with 0-3
    // point edits, so pair similarities spread densely from ~1.0 down
    // through every threshold under test.
    val bases = (0 until 8).map(_ => Seq.fill(8 + rnd.nextInt(8))(
      pool(rnd.nextInt(pool.size))))
    val rows = (1L to 50L).map { id =>
      val b = bases(rnd.nextInt(bases.size)).toArray
      (0 until rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = pool(rnd.nextInt(pool.size))
      }
      id -> b.mkString(" ")
    }
    val df = docs(rows: _*)
    for (t <- Seq(0.5, 0.7, 0.8, 1.0)) {
      val expect = collectPairs(
        Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 2, threshold = t))
      val got = collectPairs(
        Dedup.jaccardJoinPrefix(df, "doc_id", "text", n = 2, threshold = t))
      assert(got == expect, s"threshold $t: got ${got.size}, expect ${expect.size}")
      assert(expect.nonEmpty, s"threshold $t: vacuous fixture")
    }
  }

  test("maxTokenBucket valve drops saturated buckets; default stays exact") {
    // Every doc shares ALL tokens with every other (boilerplate corpus):
    // each prefix token's bucket holds every doc. cap=2 < 4 docs drops
    // every bucket -> no pairs (documented trade); the default cap keeps
    // the full exact pair set, including within-family expansion.
    val text = (1 to 20).map(i => s"b$i").mkString(" ")
    val df = docs(1L -> text, 2L -> text, 3L -> text, 4L -> text)
    val exact = collectPairs(
      Dedup.jaccardJoinPrefix(df, "doc_id", "text", n = 3, threshold = 0.8))
    assert(exact.map(p => (p._1, p._2)) ==
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    val capped = collectPairs(Dedup.jaccardJoinPrefix(df, "doc_id", "text",
      n = 3, threshold = 0.8, maxTokenBucket = 2))
    assert(capped.isEmpty,
      "cap below the family size must drop the bucket AND the within-family expansion")
  }

  test("exact pairs compose with the pairs-accepting removal API") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = ((1 to 39).map(i => s"w$i") :+ "X").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val df = docs(1L -> base, 2L -> near, 3L -> other, 4L -> base)
    val pairs = Dedup.jaccardJoinPrefix(df, "doc_id", "text", n = 3, threshold = 0.7)
    val kept = Dedup.dropNearDuplicates(df, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L),
      "guaranteed-complete dedup: cluster {1,2,4} keeps min id, 3 unclustered")
  }

  test("tolerates empty corpora, empty docs, and null text") {
    val empty = docs()
    assert(Dedup.jaccardJoinPrefix(empty, "doc_id", "text").count() == 0)
    val df = Seq[(Long, String)](1L -> "", 2L -> "a b", 3L -> "x y z w v u t s")
      .toDF("doc_id", "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    assert(Dedup.jaccardJoinPrefix(df, "doc_id", "text", n = 3, threshold = 0.5)
      .count() == 0)
  }

  test("physical plan has no cartesian or nested-loop join") {
    // The operator materializes eagerly (localCheckpoint), so the returned
    // frame's plan is just a checkpoint scan — capture the MINING plan via
    // a QueryExecutionListener instead.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = docs(1L -> "a b c d e", 2L -> "a b c d f", 3L -> "x y z w v")
      Dedup.jaccardJoinPrefix(df, "doc_id", "text", n = 2, threshold = 0.5)
      // listener delivery is async — poll until the mining plan shows up
      val deadline = System.nanoTime() + 10e9.toLong
      while (plans.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!plans.isEmpty, "no query execution captured")
      plans.forEach { p =>
        assert(!p.contains("CartesianProduct"), p)
        assert(!p.contains("BroadcastNestedLoopJoin"), p)
      }
    } finally spark.listenerManager.unregister(listener)
  }
}
