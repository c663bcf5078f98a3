package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // left: observations; right: snapshots to attach
  private val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (1L, 11L, ts("2024-01-01 12:00:00")),
    (1L, 12L, ts("2024-01-01 09:00:00")), // before any right row
    (2L, 20L, ts("2024-01-01 10:30:00"))
  ).toDF("k", "lid", "t")
  private val right = Seq(
    (1L, 100L, ts("2024-01-01 09:30:00"), 1.0),
    (1L, 101L, ts("2024-01-01 10:00:00"), 2.0), // same instant as lid=10
    (1L, 102L, ts("2024-01-01 10:00:00"), 3.0), // equal-ts tie: greater rid wins
    (1L, 103L, ts("2024-01-01 11:00:00"), 4.0),
    (3L, 300L, ts("2024-01-01 00:00:00"), 9.0) // different key: never matches
  ).toDF("k", "rid", "rt", "v")

  test("asof backward: latest right at-or-before each left row, per key") {
    val got = AsOfJoin.backward(left, right, Seq("k"),
        leftTime = "t", rightTime = "rt", rightPayload = Seq("rid", "v"),
        leftTie = "lid", rightTie = "rid")
      .select($"lid", $"asof_rid", $"asof_v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.get(2))).toSet
    assert(got == Set(
      (10L, 102L, 3.0), // equal timestamp matches; rid tie-break picks 102
      (11L, 103L, 4.0),
      (12L, null, null), // no right row at or before
      (20L, null, null)  // key 2 has no right rows at all
    ))
  }

  test("asof tolerance nulls out stale matches") {
    val got = AsOfJoin.backward(left, right, Seq("k"),
        leftTime = "t", rightTime = "rt", rightPayload = Seq("rid"),
        leftTie = "lid", rightTie = "rid",
        toleranceSeconds = Some(1800L))
      .select($"lid", $"asof_rid")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toSet
    // lid=11 at 12:00 matched rid=103 at 11:00 — 3600s gap > 1800s → null
    assert(got == Set((10L, 102L), (11L, null), (12L, null), (20L, null)))
  }

  test("asof plan: ONE key-hash exchange over the union, no BNL/cartesian") {
    val plan = AsOfJoin.backward(left, right, Seq("k"),
      leftTime = "t", rightTime = "rt", rightPayload = Seq("rid"),
      leftTie = "lid", rightTie = "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // Both sides ride a single exchange: the union shuffles once on the
    // equi-key for the window — there is no join operator to re-shuffle.
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("asof string tie columns hash to long (no silent NULL cast)") {
    val l2 = left.withColumn("lid_s", concat(lit("L"), $"lid"))
    val r2 = right.withColumn("rid_s", concat(lit("R"), $"rid"))
    val got = AsOfJoin.backward(l2, r2, Seq("k"),
        leftTime = "t", rightTime = "rt", rightPayload = Seq("rid", "v"),
        leftTie = "lid_s", rightTie = "rid_s")
      .select($"lid", $"asof_rid")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toSet
    // Same matches as the integral-tie test except the equal-ts tie between
    // rid 101/102 is now broken by xxhash64("R101") vs xxhash64("R102") —
    // deterministic, one of the two.
    assert(got.contains((11L, 103L)) && got.contains((12L, null)) && got.contains((20L, null)))
    assert(got.exists(p => p._1 == 10L && (p._2 == 101L || p._2 == 102L)))
  }

  test("asof timestamp tie columns keep sub-second precision (unix_micros)") {
    // Two right rows in the SAME second, 1ms apart: a seconds-granularity
    // tie key would see them as equal; unix_micros orders them and the
    // later one (greater micros) wins the equal-event-time tie.
    val r2 = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), Timestamp.valueOf("2024-01-01 00:00:00.001"), 1.0),
      (1L, 101L, ts("2024-01-01 10:00:00"), Timestamp.valueOf("2024-01-01 00:00:00.002"), 2.0)
    ).toDF("k", "rid", "rt", "ingest", "v")
    val got = AsOfJoin.backward(left, r2, Seq("k"),
        leftTime = "t", rightTime = "rt", rightPayload = Seq("rid"),
        leftTie = "lid", rightTie = "ingest")
      .select($"lid", $"asof_rid")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got(10L) == 101L) // .002 > .001 — lost under a seconds cast
  }

  test("asof rejects unsupported tie column types fast") {
    val l2 = left.withColumn("score", $"lid" / 3.0)
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l2, right, Seq("k"),
        leftTime = "t", rightTime = "rt", rightPayload = Seq("rid"),
        leftTie = "score", rightTie = "rid") // double tie: unsupported
    }
    assert(e.getMessage.contains("tie column 'score'"))
  }

  test("asof NULL equi-keys never match (SQL join semantics)") {
    val l2 = Seq((Option.empty[Long], 50L, ts("2024-01-01 10:00:00")))
      .toDF("k", "lid", "t").unionByName(left.select($"k".as("k"), $"lid", $"t")
        .withColumn("k", $"k".cast("long")))
    val r2 = Seq((Option.empty[Long], 500L, ts("2024-01-01 09:00:00"), 7.0))
      .toDF("k", "rid", "rt", "v").unionByName(right)
    val got = AsOfJoin.backward(l2, r2, Seq("k"),
        leftTime = "t", rightTime = "rt", rightPayload = Seq("rid"),
        leftTie = "lid", rightTie = "rid")
      .select($"lid", $"asof_rid")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got(50L) == null)   // NULL key matches nothing, not the NULL-key right row
    assert(got(10L) == 102L)   // non-null keys unaffected
  }

  private val points = Seq(
    (1L, 1000L, 5L), (1L, 1001L, 15L), (1L, 1002L, 250L), (2L, 2000L, 5L)
  ).toDF("k", "pid", "x")
  private val intervals = Seq(
    (1L, 900L, 0L, 20L),    // covers pids 1000, 1001
    (1L, 901L, 200L, 260L), // covers pid 1002; spans bins 2..2 at width 100
    (1L, 902L, 10L, 12L),   // covers nothing
    (2L, 903L, 0L, 4L)      // right key, point 5 outside
  ).toDF("k", "iid", "lo", "hi")

  test("range join: exact containment, each pair exactly once") {
    val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi",
        binWidth = 100L, equiKeys = Seq("k"))
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == Seq((1000L, 900L), (1001L, 900L), (1002L, 901L)))
    assert(got.distinct.size == got.size)
  }

  test("range join matches the naive inequality join") {
    val naive = points.as("p").join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.x" >= $"i.lo" && $"p.x" <= $"i.hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
    val binned = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi",
        binWidth = 7L, equiKeys = Seq("k")) // width deliberately unaligned
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
    assert(binned == naive)
  }

  test("range join drops inverted intervals instead of exploding descending bins") {
    val inv = intervals.unionByName(
      Seq((1L, 904L, 300L, 100L)).toDF("k", "iid", "lo", "hi")) // lo > hi
    val got = RangeJoin.pointInInterval(points, "x", inv, "lo", "hi",
        binWidth = 100L, equiKeys = Seq("k"))
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == Seq((1000L, 900L), (1001L, 900L), (1002L, 901L)))
  }

  test("range join fails loudly on degenerate giant intervals") {
    val giant = Seq((1L, 905L, 0L, 10000000L)).toDF("k", "iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "x", giant, "lo", "hi",
        binWidth = 10L, equiKeys = Seq("k"), maxFanOut = 1000L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("fan-out exceeds 1000")), e.getMessage)
  }

  test("range join fan-out guard survives long overflow in the bin diff") {
    // bin(hi) - bin(lo) overflows long and goes negative for these bounds;
    // a plain subtraction would sail past the guard and die later inside
    // Spark's sequence-length check. try_subtract turns the overflow into
    // NULL, which the guard treats as over-limit and raises its own error.
    val extreme = Seq((1L, 906L, Long.MinValue + 1, Long.MaxValue - 1))
      .toDF("k", "iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "x", extreme, "lo", "hi",
        binWidth = 1L, equiKeys = Seq("k"), maxFanOut = 1000L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("fan-out exceeds 1000")), e.getMessage)
  }

  test("range join plan: equi hash join on (keys, bin), no BNL") {
    val plan = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi",
      binWidth = 100L, equiKeys = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
