package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * TimeOne-style probe for the per-micro-batch id-membership shape
 * ([[graft.plans.Joins]]): a fixed 128-row batch anti-joined against a
 * growing on-disk key table (the admitted-id sidecar / stored-id-column
 * shape), plain `left_anti` vs the reversed broadcast probe.
 *
 * The plain join can only broadcast its RIGHT side, so past the ~10 MB
 * broadcast threshold Spark sort-merge-shuffles the key table — per
 * call, i.e. per micro-batch on an admission sink. The reversed probe
 * stays one streaming scan at any size. This probe measures both on the
 * same parquet key tables (warmup + min-of-3 through the noop sink) so
 * the claim is a number, not an argument: the crossover is visible
 * exactly where the broadcast threshold lands, and beyond it the plain
 * shape's cost grows with the SHUFFLE of the key table while the
 * reversed shape tracks the bare scan. Results land in BENCH_SCALE.md
 * ("joins probe").
 *
 * Since r17 the entry points dispatch on the key table's statistics, so
 * the `dispatched` column is what every caller actually pays: the plain
 * broadcast below the threshold (the old 2× small-corpus penalty is
 * gone), the reversed scan above it.
 */
object JoinsProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(100000L, 1000000L, 10000000L, 50000000L)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-joins-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_joins_probe").toString
    // fixed batch: 128 ids, half present in every key table, half novel —
    // both join outcomes exercised every run
    val batch = ((0L until 64L) ++ (0L until 64L).map(_ + (1L << 60)))
      .toDF("id").localCheckpoint(true)

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val out = sizes.map { n =>
      val dir = s"$root/keys_$n"
      spark.range(n).select(col("id")).write.mode("overwrite").parquet(dir)
      def keys = spark.read.parquet(dir)
      def plain = batch.join(keys, Seq("id"), "left_anti")
      def dispatched = graft.plans.Joins.antiSmallLeft(batch, keys, "id")
      Seq(plain, dispatched).foreach(time) // warmup: codegen, file listing
      val p = (0 until 3).map(_ => time(plain)).min
      val r = (0 until 3).map(_ => time(dispatched)).min
      System.err.println(f"keys=$n%-9d plain_anti=$p%.3fs dispatched=$r%.3fs plain/dispatched=${p / r}%.2f")
      n -> ((p, r))
    }
    val json = out.map { case (n, (p, r)) =>
      f""""$n":{"plain_anti_s":$p%.4f,"dispatched_s":$r%.4f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"joins_probe","batch_rows":128,"sizes":$json}""")
    spark.stop()
  }
}
