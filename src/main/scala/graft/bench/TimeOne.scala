package graft.bench

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for plan/scale forensics: runs ONE
  * SparkEntry query against an arbitrary corpus dir (e.g. a ScaleBench
  * amplified tmpdir) through the same full-evaluation noop sink as the
  * bench, printing per-pass wall times and the executed plan. The bench
  * artifact stays the instrument of record; this exists so a suspicious
  * per-query trend can be reproduced and stack-sampled in isolation
  * without re-running the whole suite.
  *
  * Usage: runMain graft.bench.TimeOne <query> <dir> [passes=3]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeOne <query> <dir> [passes]")
    val (name, dir) = (args(0), args(1))
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    println(q(spark, dir).queryExecution.executedPlan.toString)
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
