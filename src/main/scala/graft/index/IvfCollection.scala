package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.Ivf

/**
 * IVF-partitioned vector collection: the assigned corpus is written
 * `partitionBy(ivf_cell)`, so a probe query reads ONLY the nProbe cell
 * directories — Spark's static partition pruning turns the IVF selectivity
 * (nProbe/nList) into a physical I/O reduction, which is the difference
 * between scanning 100 TB and scanning 100 TB × nProbe/nList.
 *
 * Build once (train + assign + write), query many: the layout is the
 * persisted analogue of [[graft.search.Ivf.knnJoinIvf]]'s in-flight
 * assignment.
 */
class IvfCollection(spark: SparkSession, root: String, val name: String) {
  private val base = s"$root/$name"
  private val dataPath = s"$base/cells"
  private val centroidsPath = s"$base/centroids"

  /** Train centroids, assign every row, write cell-partitioned parquet.
    * Rows are deduplicated by `idCol` (last-writer-indifferent) so a
    * rebuilt collection stays keyed like [[VectorCollection.upsert]]. */
  def build(
      corpus: DataFrame, idCol: String, vecCol: String,
      nList: Int, seed: Long = 42L): this.type = {
    val centroids = Ivf.trainCentroids(corpus, vecCol, nList, seed)
    Ivf.assign(corpus.dropDuplicates(idCol), vecCol, centroids)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("ivf_cell")
      .parquet(dataPath)
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath)
    this
  }

  /** Built-and-complete marker: [[build]] writes the cell data FIRST and
    * the centroid table last, so centroid presence implies a whole
    * artifact (a crashed build leaves this false). */
  def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(centroidsPath)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def centroids(): Array[Array[Float]] =
    spark.read.parquet(centroidsPath)
      .orderBy(col("cell"))
      .collect()
      .map(_.getSeq[Float](1).toArray)

  /** The full assigned corpus (all cells). */
  def load(): DataFrame = spark.read.parquet(dataPath)

  /** Only the given cells — a plan whose parquet scan carries a partition
    * filter on ivf_cell (static pruning; verify with explain()). */
  def loadCells(cells: Seq[Int]): DataFrame =
    load().filter(col("ivf_cell").isin(cells: _*))

  /**
   * Top-k cosine probe against the persisted layout: compute each query's
   * nProbe cells, read only those partitions, score and rank. Same output
   * contract as [[graft.search.Ivf.knnJoinIvf]].
   *
   * `filter` is payload-filtered vector search (same contract as
   * [[graft.search.Knn.knnJoin]]'s `corpusFilter`): it restricts the
   * probed cells BEFORE scoring, and because it sits directly above the
   * parquet relation it composes with the cell pruning — the scan carries
   * BOTH the ivf_cell partition filter and the predicate as PushedFilters
   * (plan-asserted in IvfCollectionSpec). Rows failing the predicate are
   * row-group-skipped at the source, not scored and discarded.
   */
  def query(
      queries: DataFrame, queryId: String, queryVec: String,
      corpusId: String, corpusVec: String,
      k: Int, nProbe: Int,
      excludeSelf: Boolean = true,
      roundScoreTo: Option[Int] = None,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val cents = centroids()
    // Driver-side probe-cell union: |Q| is small by the query contract, so
    // collecting the cell ids gives the scan a LITERAL partition filter
    // (static pruning) instead of a runtime join.
    val probeCells = queries
      .select(explode(graft.functions.nearest_centroids(col(queryVec), cents, nProbe))
        .as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val cells = loadCells(probeCells)
    // The persisted ivf_cell column was assigned from exactly these
    // centroids at build() time — safe to reuse, skipping the per-row
    // nearest-centroid recompute.
    Ivf.knnJoinIvf(queries, queryId, queryVec,
      filter.fold(cells)(cells.filter), corpusId, corpusVec,
      k, cents, nProbe, excludeSelf, roundScoreTo, reuseCellCol = true)
  }
}

object IvfCollection {
  def apply(spark: SparkSession, root: String, name: String): IvfCollection =
    new IvfCollection(spark, root, name)
}
