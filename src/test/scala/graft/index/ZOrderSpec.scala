package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order clustered writes: the Morton interleave math is pinned exactly,
  * and the LAYOUT claim is measured — after writeClustered, per-FILE
  * min/max ranges are narrow on BOTH clustered dimensions (that is what
  * parquet footer pruning consumes), where single-column range
  * partitioning is narrow on one and full-width on the other. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: exact Morton interleave on pinned inputs") {
    // 2 cols x 2 bits over range [0,3]: bucket == value. bit b of col i
    // -> position b*2+i. (x=1,y=0) -> 0b01=1; (0,1) -> 0b10=2; (3,3) -> 0b1111=15;
    // (2,1) -> x bits {1}->pos2, y bits {0}->pos1 -> 0b0110=6.
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq($"x", $"y"),
      Seq((0.0, 3.0), (0.0, 3.0)), bits = 2).as("z")).as[Long].collect()
    assert(z.toSeq == Seq(1L, 2L, 15L, 6L))
  }

  test("zValue: z-adjacency tracks spatial adjacency (locality smoke)") {
    // Points on a 16x16 grid: sort by z, successive points must stay
    // spatially close on average — the curve property pruning relies on.
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
    val sorted = df.select($"x", $"y", ZOrder.zValue(Seq($"x", $"y"),
        Seq((0.0, 15.0), (0.0, 15.0)), bits = 4).as("z"))
      .orderBy($"z").collect()
    assert(sorted.map(_.getLong(2)).toSeq == (0L until 256L), "z is a bijection on the grid")
    val hops = sorted.sliding(2).map { w =>
      math.abs(w(1).getLong(0) - w(0).getLong(0)) +
        math.abs(w(1).getLong(1) - w(0).getLong(1))
    }.toSeq
    assert(hops.sum.toDouble / hops.size < 2.5,
      s"mean Manhattan hop along the curve should be small, got ${hops.sum.toDouble / hops.size}")
  }

  test("zValue: nulls propagate, constant range degrades to bucket 0") {
    val df = Seq((Some(1L), 5L), (None, 5L)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq($"x", $"y"),
      Seq((0.0, 3.0), (5.0, 5.0)), bits = 2).as("z")).collect()
    assert(z(0).getLong(0) == 1L, "y constant -> only x contributes")
    assert(z(1).isNullAt(0), "null input -> null z")
  }

  test("writeClustered: per-file ranges narrow on BOTH dimensions") {
    // 64x64 grid of (u, t) points — e.g. (user, time). Cluster into 16
    // files; every file should cover a small rectangle: per-file range
    // well under half the domain on BOTH axes. A t-only range partition
    // would put the FULL u-domain in every file.
    val pts = for (u <- 0 until 64; t <- 0 until 64) yield (u.toLong, t.toLong)
    val df = pts.toDF("u", "t").repartition(8) // scrambled input layout
    val out = Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeClustered(df, Seq("u", "t"), out, numFiles = 16)
    val perFile = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .groupBy($"f")
      .agg((max($"u") - min($"u")).as("du"), (max($"t") - min($"t")).as("dt"),
        count(lit(1)).as("n"))
      .collect()
    assert(perFile.length >= 8, s"expected >=8 files, got ${perFile.length}")
    assert(perFile.map(_.getAs[Long]("n")).sum == 64L * 64L, "no rows lost")
    val maxDu = perFile.map(_.getAs[Long]("du")).max
    val maxDt = perFile.map(_.getAs[Long]("dt")).max
    assert(maxDu <= 32 && maxDt <= 32,
      s"files must tile small rectangles: worst du=$maxDu dt=$maxDt of 63")
    // and the round-trip preserves content
    val got = spark.read.parquet(out).as[(Long, Long)].collect().toSet
    assert(got == pts.toSet)
  }

  test("zValue: NaN buckets as NULL, not silently to the top") {
    val df = Seq((Double.NaN, 3.0), (1.0, 3.0)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq($"x", $"y"),
      Seq((0.0, 3.0), (0.0, 3.0)), bits = 2).as("z")).collect()
    assert(z(0).isNullAt(0), "NaN input -> null z (same contract as NULL)")
    assert(!z(1).isNullAt(0))
  }

  test("writeClustered: a NaN row does not poison the min/max range") {
    val out = Files.createTempDirectory("graft_zorder_nan").toString
    val df = (Seq((Double.NaN, 0.0)) ++ (0 until 32).map(i => (i.toDouble, i.toDouble)))
      .toDF("u", "t")
    ZOrder.writeClustered(df, Seq("u", "t"), out, numFiles = 4)
    val got = spark.read.parquet(out)
    assert(got.count() == 33, "NaN row still written")
    // the non-NaN rows must still cluster: files tile sub-ranges, which
    // requires the range agg to have ignored the NaN (max would be NaN)
    val perFile = got.filter(!isnan($"u"))
      .withColumn("f", input_file_name()).groupBy($"f")
      .agg((max($"u") - min($"u")).as("du")).collect()
    assert(perFile.length >= 2 && perFile.map(_.getAs[Double]("du")).max < 31.0,
      "files must still tile the u range despite the NaN row")
  }

  test("writeClustered tolerates empty input and all-null columns") {
    val out = Files.createTempDirectory("graft_zorder_empty").toString
    ZOrder.writeClustered(Seq.empty[(Long, Long)].toDF("u", "t"),
      Seq("u", "t"), out, numFiles = 2)
    assert(spark.read.parquet(out).count() == 0)
  }

  test("readPruned: two-column predicate skips most files, result exact") {
    val pts = for (u <- 0 until 64; t <- 0 until 64) yield (u.toLong, t.toLong)
    val df = pts.toDF("u", "t").repartition(8)
    val out = Files.createTempDirectory("graft_zorder_prune").toString
    ZOrder.writeClustered(df, Seq("u", "t"), out, numFiles = 16)
    assert(ZOrder.hasManifest(spark, out))
    val (cands, total, read) = ZOrder.readPruned(spark, out,
      Seq(("u", 8.0, 15.0), ("t", 8.0, 15.0)))
    assert(total >= 8, s"expected >=8 files, got $total")
    assert(read < total, s"a corner predicate must skip files: $read of $total")
    assert(read <= total / 2,
      s"1/64 of the area should touch few tiles: $read of $total")
    // candidates are a superset; re-applied predicate is exact
    val got = cands.filter($"u".between(8L, 15L) && $"t".between(8L, 15L))
      .as[(Long, Long)].collect().toSet
    val want = pts.filter(p => p._1 >= 8 && p._1 <= 15 && p._2 >= 8 && p._2 <= 15).toSet
    assert(got == want)
  }

  test("readPruned: disjoint predicate reads zero files but keeps the schema") {
    val df = (0 until 32).map(i => (i.toLong, i.toLong)).toDF("u", "t")
    val out = Files.createTempDirectory("graft_zorder_prune0").toString
    ZOrder.writeClustered(df, Seq("u", "t"), out, numFiles = 4)
    val (cands, total, read) = ZOrder.readPruned(spark, out,
      Seq(("u", 1000.0, 2000.0)))
    assert(read == 0 && total >= 1)
    assert(cands.columns.toSeq == Seq("u", "t"))
    assert(cands.count() == 0)
  }

  test("readPruned: files with only NULLs in a stat column are kept (conservative)") {
    val df = Seq((Some(1.0), 1.0), (Some(2.0), 2.0), (None, 3.0), (None, 4.0))
      .toDF("u", "t")
    val out = Files.createTempDirectory("graft_zorder_prunenull").toString
    ZOrder.writeClustered(df, Seq("u", "t"), out, numFiles = 2)
    // predicate on u: the all-null-u file has no u stats line -> kept;
    // re-applied predicate still yields the exact result
    val (cands, _, _) = ZOrder.readPruned(spark, out, Seq(("u", 0.0, 10.0)))
    val got = cands.filter($"u".between(0.0, 10.0)).select($"t")
      .as[Double].collect().toSet
    assert(got == Set(1.0, 2.0))
  }

  test("readPruned: a file absent from the manifest is kept and counted") {
    // A file whose rows are all-NULL in EVERY clustered column emits zero
    // manifest lines (writeStatsManifest only writes non-null min/max), so
    // it does not appear in the stats at all — e.g. a compaction landing
    // null-heavy late rows. The conservative-keep contract must still
    // hold: the file counts toward filesTotal and its rows survive.
    val df = (0 until 32).map(i => (i.toLong, i.toLong)).toDF("u", "t")
    val out = Files.createTempDirectory("graft_zorder_nomanifest").toString
    ZOrder.writeClustered(df, Seq("u", "t"), out, numFiles = 4)
    // Drop one extra part file with all-null clustered columns into the dir.
    val extraDir = Files.createTempDirectory("graft_zorder_extra").toString
    Seq((Option.empty[Long], Option.empty[Long]))
      .toDF("u", "t").coalesce(1).write.mode("overwrite").parquet(extraDir)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val extra = fs.listStatus(new org.apache.hadoop.fs.Path(extraDir))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(extra, new org.apache.hadoop.fs.Path(out, "part-99999-extra.parquet"))
    val (cands, total, read) = ZOrder.readPruned(spark, out, Seq(("u", 0.0, 5.0)))
    assert(total >= 5, s"the extra file must count toward filesTotal, got $total")
    assert(read >= 1)
    // its (null, null) row is kept — no predicate evidence excludes it
    assert(cands.filter($"u".isNull).count() == 1L)
    // and a no-range read returns every row including the extra one
    val (all, allTotal, allRead) = ZOrder.readPruned(spark, out, Seq.empty)
    assert(allTotal == allRead)
    assert(all.count() == 33L)
  }

  test("readPruned: integral stats past 2^53 — 1-ULP widening keeps boundary files") {
    // At 2^62 the double ULP is 512 (1024 at-and-above), so the manifest's
    // cast-to-double min for a file of longs 2^62-101 .. 2^62-100 rounds UP
    // to exactly 2^62 — ABOVE both true values. A caller whose re-applied
    // predicate lives in the long domain can legitimately present a query
    // hi within one ULP below the stored bound; the unwidened `mn > hi`
    // test would prune the only file, and the caller's re-filter over kept
    // files would silently return nothing.
    val big = (1L << 62) - 100
    assert(big.toDouble == math.pow(2, 62), "precondition: the stats round UP past the true values")
    val df = Seq(big, big - 1).toDF("id")
    val out = Files.createTempDirectory("graft_zorder_bigint").toString
    ZOrder.writeClustered(df, Seq("id"), out, numFiles = 1)
    val hi = Math.nextDown(big.toDouble) // one ULP below the stored min
    val (cands, total, read) = ZOrder.readPruned(spark, out, Seq(("id", 0.0, hi)))
    assert(total == 1 && read == 1,
      s"boundary file must survive rounded stats (superset contract): read $read of $total")
    assert(cands.count() == 2L)
  }
}
