package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/**
 * TimeOne-style probe for the admission sinks' per-micro-batch replay
 * guard ([[graft.streaming.Streaming]] id sidecars): a fixed 128-row
 * batch's membership anti-join against a growing admitted-id sidecar, in
 * BOTH layouts —
 *
 *  - FLAT (pre-r17): every id in top-level L0 files; the guard is one
 *    full streaming pass over every id ever admitted, per batch, forever
 *    (the linear term the r16 verdict flagged: ~seconds per batch at
 *    billions of ids);
 *  - FOLDED (r17): history bucketed into `_base/bucket=pmod(xxhash64(id),
 *    B)/`; the guard reads ONLY the buckets the batch's ids touch, so a
 *    trickle batch costs O(|base|·touched/B + |batch|) — for this probe's
 *    128-id batch at B=256, ≤ 99/256 ≈ 39 % of the base in the worst
 *    case and the measured cost stays near-flat as the corpus grows.
 *
 * Warmup + min-of-3 through the noop sink, same discipline as
 * [[JoinsProbe]]. Results land in BENCH_SCALE.md ("sidecar probe").
 */
object SidecarProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1000000L, 10000000L, 50000000L)
    val buckets = sys.env.getOrElse("SPARK_GRAFT_SIDECAR_BUCKETS", "256").toInt
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-sidecar-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_sidecar_probe").toString
    // fixed trickle batch: 128 ids, half admitted in every sidecar, half
    // novel — both guard outcomes exercised every run
    val batch = ((0L until 64L) ++ (0L until 64L).map(_ + (1L << 60)))
      .toDF("id").localCheckpoint(true)

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val out = sizes.map { n =>
      val flatDir = s"$root/flat_$n"
      val foldedDir = s"$root/folded_$n"
      val rows = spark.range(n).select(col("id"),
        lit("ckpt").as("__ckpt"), (col("id") / 10000L).cast("long").as("__batch"))
      rows.write.mode("overwrite").parquet(flatDir)
      rows.write.mode("overwrite").parquet(foldedDir)
      graft.streaming.Streaming.foldSidecar(spark, foldedDir, "id", buckets)
      def guard(dir: String) = graft.plans.Joins.antiSmallLeft(
        batch, graft.streaming.Streaming.guardIdsFor(spark, dir, batch, "id"), "id")
      Seq(guard(flatDir), guard(foldedDir)).foreach(time) // warmup
      val f = (0 until 3).map(_ => time(guard(flatDir))).min
      val b = (0 until 3).map(_ => time(guard(foldedDir))).min
      System.err.println(
        f"ids=$n%-9d flat=$f%.3fs folded=$b%.3fs flat/folded=${f / b}%.2f")
      n -> ((f, b))
    }
    val json = out.map { case (n, (f, b)) =>
      f""""$n":{"flat_s":$f%.4f,"folded_s":$b%.4f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"sidecar_probe","batch_rows":128,"buckets":$buckets,"sizes":$json}""")
    spark.stop()
  }
}
