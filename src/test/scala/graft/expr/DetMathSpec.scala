package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The q20 kernel is the engine-stability linchpin for every scored output
 * that needs a logarithm (perplexity, keyword IDF, BM25 IDF): these tests
 * pin the Spark Column implementation against an independent Scala
 * reference of the same shift-and-square algorithm, and its accuracy
 * against libm within the fixed-point grid. The DuckDB CTE twin is
 * covered end-to-end by the doc_perplexity / doc_keywords / bm25_topk
 * oracle rows.
 */
class DetMathSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: same algorithm, plain JVM doubles. */
  private def ref(num: Long, den: Long): Long = {
    var m = num.toDouble / den.toDouble
    var e = 0L
    for (_ <- 1 to 64) {
      if (m >= 2.0) { m *= 0.5; e += 1 }
      else if (m < 1.0) { m *= 2.0; e -= 1 }
    }
    var acc = 0L
    for (_ <- 1 to 20) {
      val m2 = m * m
      if (m2 >= 2.0) { m = m2 * 0.5; acc = acc * 2 + 1 }
      else { m = m2; acc = acc * 2 }
    }
    e * DetMath.Q + acc
  }

  test("Column evaluation matches the reference on a wide ratio sweep") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(400) { _ =>
      (1L + rnd.nextInt(1 << 20).toLong, 1L + rnd.nextInt(1 << 20).toLong)
    } ++ Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 5L), (1048576L, 1L),
      (1L, 1048576L), (999999937L, 7L), (7L, 999999937L))
    val got = pairs.toDF("num", "den")
      .select(col("num"), col("den"),
        DetMath.log2q20(col("num"), col("den")).as("q"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (n, d) =>
      assert(got((n, d)) === ref(n, d), s"log2q20($n, $d)")
    }
  }

  test("accuracy: within 2 grid cells of the infinitely-precise log2") {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(200) { _ =>
      (1L + rnd.nextInt(1 << 24).toLong, 1L + rnd.nextInt(1 << 24).toLong)
    }.foreach { case (n, d) =>
      val exact = (math.log(n.toDouble) - math.log(d.toDouble)) / math.log(2.0)
      assert(math.abs(ref(n, d).toDouble / DetMath.Q - exact) < 2.0 / DetMath.Q,
        s"accuracy($n, $d)")
    }
  }

  test("exact powers of two are exact fixed-point values") {
    for (k <- -20 to 20) {
      val (n, d) = if (k >= 0) (1L << k, 1L) else (1L, 1L << -k)
      assert(ref(n, d) === k.toLong * DetMath.Q, s"2^$k")
    }
  }

  test("monotone: larger ratios never get smaller qlogs") {
    val qs = (1L to 2000L).map(n => ref(n, 997L))
    qs.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
  }
}
