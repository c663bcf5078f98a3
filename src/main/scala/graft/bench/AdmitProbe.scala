package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Stage-split probe for the streaming near-dup ADMISSION path
 * ([[graft.streaming.Streaming.admitStream]] →
 * [[graft.index.MinHashIndex.nearDupAgainstExact]]): the r19 sweep
 * measured per-batch admit cost growing ~1.6× from 1× to 100× corpus
 * while span-cut admission stayed flat — this probe prices each stage of
 * one worst-case micro-batch separately, per corpus factor, to show
 * WHERE the growth term lives:
 *
 *  1. `inbatch`  — [[graft.dedup.Dedup.dropNearDuplicates]] over the
 *     batch alone (corpus-independent, expected flat);
 *  2. `band`     — [[graft.index.MinHashIndex.candidatePairsAgainst]]:
 *     batch signatures broadcast-joined onto the corpus band table with
 *     the bucket cap (touches only matched buckets — grows with how
 *     duplicated the batch's CONTENT is in the corpus);
 *  3. `verify`   — [[graft.index.MinHashIndex.verifyCandidatesExact]]:
 *     exact shingle Jaccard over the candidates (grows with the
 *     candidate count, i.e. with stage 2's output, not with |corpus|);
 *  4. `upsert`   — [[graft.index.MinHashIndex.upsert]] of the batch
 *     (anti-join against indexed ids + one signature append).
 *
 * The batch is the streamflat worst case: 128 verbatim clones of base
 * docs with disjoint ids, so every replica of those docs in the
 * amplified corpus is a genuine candidate — candidates/doc == the
 * amplification factor BY CONSTRUCTION. A probe where band+verify track
 * the candidate count while inbatch stays flat demonstrates the admit
 * growth is candidate-driven (the work a correct verifier cannot skip),
 * not a corpus-scan term. `max_bucket` reports the largest corpus band
 * bucket so the cap's non-engagement (default 10000) is visible.
 *
 * Results land in BENCH_SCALE.md ("admission stage split").
 */
object AdmitProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 30, 100)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false")
      .appName("graft-admit-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_admit_probe").toString
    def release(df: DataFrame): Unit =
      org.apache.spark.sql.GraftInternal.unpersistLocalCheckpoint(df)

    val out = factors.map { n =>
      val dir = ScaleBench.amplified(spark, srcDir, n)
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
      val nCorpus = corpus.count()
      // worst-case foreign batch: 128 verbatim base-doc clones, ids
      // disjoint from every replica (same shape as ScaleBench streamflat).
      // Parquet-backed, NOT localCheckpoint: the per-rep release below
      // walks each stage frame's plan and unpersists every LogicalRDD in
      // it — a checkpointed batch riding inside a stage plan would lose
      // its blocks on the first release (lineage is cut, unrecoverable).
      spark.read.parquet(s"$srcDir/documents.parquet")
        .orderBy(col("doc_id")).limit(128)
        .withColumn("doc_id", col("doc_id") + lit(1000L * ScaleBench.Stride))
        .repartition(4)
        .write.mode("overwrite").parquet(s"$root/batch_x$n")
      val batch = spark.read.parquet(s"$root/batch_x$n")
      val mh = graft.index.MinHashIndex(spark, s"$root/mh_x$n", "documents")
      val tb0 = System.nanoTime()
      mh.build(corpus, "doc_id", "text", n = 3, numHashes = 128, bands = 32)
      mh.materializeBands()
      val buildSecs = (System.nanoTime() - tb0) / 1e9
      val maxBucket = mh.bandTable().groupBy(col("band"))
        .agg(count(lit(1)).as("c")).agg(max(col("c"))).head().getLong(0)

      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = body
        (a, (System.nanoTime() - t0) / 1e9)
      }
      def minOf3(body: => DataFrame): Double = (0 until 3).map { _ =>
        val (df, t) = timed(body)
        release(df); t
      }.min
      // warmup: prime the batch/sig/band scans and the shingle+minhash
      // codegen via the band stage; inbatch/band/verify then self-warm
      // through minOf3. upsert is NOT warmed — it runs once by necessity
      // (idempotent repeats anti-join to nothing), so its number carries
      // cold-start and reads as an upper bound, which is fine for the
      // stage split's question (is the growth in verify or in upsert?).
      release(mh.candidatePairsAgainst(batch, "doc_id", "text", 10000))
      val tInbatch = minOf3 {
        val d = graft.dedup.Dedup.dropNearDuplicates(batch, "doc_id", "text",
          n = 3, numHashes = 128, bands = 32, threshold = 0.8)
        d.write.format("noop").mode("overwrite").save(); d
      }
      val tBand = minOf3(mh.candidatePairsAgainst(batch, "doc_id", "text", 10000))
      val (cand, _) = timed(mh.candidatePairsAgainst(batch, "doc_id", "text", 10000))
      val nCand = cand.count()
      val tVerify = minOf3(mh.verifyCandidatesExact(cand, batch, "doc_id", "text",
        corpus, "doc_id", "text", threshold = 0.8))
      release(cand)
      // upsert once (idempotent repeats would anti-join to nothing)
      val (_, tUpsert) = timed(mh.upsert(batch, "doc_id", "text"))
      System.err.println(f"factor $n%-4d docs=$nCorpus%-9d build=$buildSecs%.2f " +
        f"inbatch=$tInbatch%.2f band=$tBand%.2f verify=$tVerify%.2f " +
        f"upsert=$tUpsert%.2f cand=$nCand max_bucket=$maxBucket")
      n -> ((nCorpus, buildSecs, tInbatch, tBand, tVerify, tUpsert, nCand, maxBucket))
    }
    val json = out.map { case (n, (d, b, ib, bd, v, u, c, mb)) =>
      f""""$n":{"docs":$d,"build_s":$b%.3f,"inbatch_s":$ib%.3f,""" +
        f""""band_s":$bd%.3f,"verify_s":$v%.3f,"upsert_s":$u%.3f,""" +
        f""""candidates":$c,"max_bucket":$mb}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"admit_stage_split","src":"$srcDir","factors":$json}""")
    spark.stop()
  }
}
