package graft.expr

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.winnow_fingerprints

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(texts: String*): Seq[Set[Long]] =
    texts.toDF("t")
      .select(winnow_fingerprints(col("t"), 8, 4).as("f"))
      .collect().map(_.getSeq[Long](0).toSet).toSeq

  test("deterministic; identical docs share every fingerprint; short docs empty") {
    val Seq(a, b, short) = fps("the quick brown fox jumps over it",
      "the quick brown fox jumps over it", "tiny")
    assert(a == b && a.nonEmpty)
    assert(short.isEmpty) // < k chars -> no k-grams
  }

  test("winnowing guarantee: a shared run of >= w+k-1 chars yields a shared fingerprint") {
    // MOSS Theorem-1 shape with k=8, w=4: any common substring of length
    // >= 11 must produce at least one common selected fingerprint — check
    // across seeded random host strings with a planted common run.
    val planted = "ABCDEFGHIJK" // exactly w+k-1 = 11 chars
    val rnd = new scala.util.Random(42)
    def host(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = (1 to 10).map(_ => host(30) + planted + host(30))
    val sets = fps(docs: _*)
    for (Seq(x, y) <- sets.combinations(2))
      assert(x.intersect(y).nonEmpty, "planted run must share a fingerprint")
  }

  test("locality: a single edit preserves most fingerprints of a long doc") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val edited = base.replace("token30", "CHANGED")
    val Seq(a, b) = fps(base, edited)
    val overlap = a.intersect(b).size.toDouble / math.max(a.size, b.size)
    assert(overlap > 0.8, s"edit should be local, overlap was $overlap")
    // unrelated docs share essentially nothing
    val Seq(c) = fps((1 to 60).map(i => s"zzz$i").mkString(" "))
    assert(a.intersect(c).isEmpty)
  }

  test("no match shorter than k can share a fingerprint") {
    // disjoint alphabets except a common run of k-1 = 7 chars: every
    // k-gram of one doc differs from every k-gram of the other
    val Seq(a, b) = fps("aaaaaaaaaa" + "COMMON7" + "bbbbbbbbbb",
      "cccccccccc" + "COMMON7" + "dddddddddd")
    assert(a.intersect(b).isEmpty)
  }

  test("SQL registration and literal-arg validation") {
    graft.functions.registerAll(spark)
    val n = spark.sql(
      "SELECT size(winnow_fingerprints('the quick brown fox jumps', 8, 4)) AS n")
      .head().getInt(0)
    assert(n > 0)
    intercept[Exception] {
      spark.sql("SELECT winnow_fingerprints('x', 'bad', 4)").collect()
    }
  }
}
