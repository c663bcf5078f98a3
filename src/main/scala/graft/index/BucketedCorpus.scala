package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed storage layout for shuffle-free co-located joins — the data
 * layout that makes repeated large-large joins affordable at 100 TB.
 *
 * A corpus and its derived tables (embeddings, signatures, metadata) are
 * all keyed by document id. Written naively, EVERY join between them
 * shuffles both sides on that key, every time. Written bucketed on the key
 * with the same bucket count, each table's scan already satisfies
 * `HashPartitioning(key, n)`: Spark's sort-merge join consumes the scans
 * directly — no Exchange on either side, for every future join against any
 * table bucketed the same way. The one-time bucketed write costs one
 * shuffle; every subsequent join (and aggregate keyed on the id) is
 * exchange-free. Same trade as [[IvfCollection]]'s partition pruning:
 * spend layout effort at write time, win every read.
 *
 * Files are plain parquet + catalog metadata (`bucketBy` requires a table
 * catalog — the path API cannot record bucket spec). Sorting within
 * buckets additionally lets the join skip its sort at read time.
 */
object BucketedCorpus {

  /** One-time bucketed materialization of `df` keyed on `keyCol`. */
  def write(df: DataFrame, table: String, keyCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Equi-join two tables bucketed on the same key with the same bucket
    * count. The plan this produces contains no Exchange node on either
    * side (asserted in BucketedCorpusSpec) — the scans are pre-hashed. */
  def join(spark: SparkSession, left: String, right: String,
      keyCol: String): DataFrame =
    read(spark, left).join(read(spark, right), Seq(keyCol))
}
