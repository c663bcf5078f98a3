package graft

import org.apache.spark.sql.functions._

/** The recall-scalar quality gates (ivf/quant/ann) are rows-only or
  * replay-oracled driver-side, so their LAST line of defense is the
  * execution-time floor inlined into the result column by
  * `SparkEntry.recallFloor`. These tests prove the guard actually trips —
  * a forced-low recall throws (the driver would record `err` and the row
  * goes red) — and that a healthy recall passes through unchanged. */
class RecallFloorSpec extends SparkSpec {

  private def scalar(v: Double) = {
    import spark.implicits._
    Seq(v).toDF("recall_at_k")
  }

  test("recall below the pinned floor fails the query loudly") {
    val e = intercept[Exception] {
      SparkEntry.recallFloor(scalar(0.12), floor = 0.3, q = "ivf_recall").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("ivf_recall") && m.contains("below the pinned floor")),
      s"unexpected failure: ${messages(e).mkString(" | ")}")
  }

  test("recall at or above the floor passes through unchanged") {
    val out = SparkEntry.recallFloor(scalar(0.74), floor = 0.3, q = "x").collect()
    assert(out.length == 1 && out(0).getDouble(0) == 0.74)
    val edge = SparkEntry.recallFloor(scalar(0.3), floor = 0.3, q = "x").collect()
    assert(edge(0).getDouble(0) == 0.3)
  }
}
