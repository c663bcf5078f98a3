package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.uuid5

/**
 * Corpus construction — the reference's two ingestion paths re-expressed as
 * declarative plans (no per-row Python loops, no driver-side file probing).
 *
 * BCB path (`/root/reference/bcb_utils.py:36-73`): for every func_id in the
 * clone graph, look up file/line metadata in the functions table (J1 — the
 * reference does an O(n) pandas scan per probe and silently drops ids that
 * fail the lookup via try/except, := inner-join semantics), slice the
 * function's lines out of its source file (S4), assign a deterministic
 * UUIDv5 identity (F1), and attach the clone ground truth.
 *
 * POJ path (`/root/reference/poj_utils.py:46-88`): parse the class label
 * (parent dir) and file name out of the path (F3), decode bytes (S5), and
 * assign UUIDv5 of label+name.
 */
object Corpus {

  /**
   * S4 line-slice with the reference's exact (quirky) semantics: python
   * `lines[start:end]` on a 0-based list = 1-based lines `start+1 .. end`
   * — i.e. the line numbered `start` is DROPPED and `end` is kept
   * (`bcb_utils.py:61-65`). Documented and preserved, not "fixed".
   */
  def sliceLines(text: Column, start: Column, end: Column, delim: String = "\n"): Column =
    array_join(slice(split(text, java.util.regex.Pattern.quote(delim)),
      start + lit(1), greatest(end - start, lit(0))), delim)

  /**
   * BCB corpus: clone adjacency × functions metadata × file contents.
   *
   * @param adjacency  (func_id, clones) from [[CloneGraph.adjacency]]
   * @param functions  metadata with id/file/start/end columns (S2)
   * @param files      (file path → whole text) table; pre-materialized once so
   *                   the slice is a column op, not per-row IO (the reference
   *                   re-opens the source file for every function,
   *                   bcb_utils.py:57-60 — at scale that's the classic
   *                   small-read antipattern; one distributed scan is right)
   * Join strategy: functions/adjacency are dimension-sized next to file text;
   * Spark picks broadcast for the smaller side automatically (AQE), and both
   * joins are equi-joins so no shuffle survives a broadcast.
   */
  def bcb(
      adjacency: DataFrame,
      functions: DataFrame,
      idCol: String, fileCol: String, startCol: String, endCol: String,
      files: DataFrame,
      pathCol: String, textCol: String): DataFrame = {
    adjacency
      .join(functions, adjacency("func_id") === functions(idCol), "inner") // J1: failed lookups drop
      .join(files, functions(fileCol) === files(pathCol), "inner")
      .select(
        uuid5(col("func_id").cast("string")).as("code_uuid"), // bcb_utils.py:54
        col("func_id"),
        sliceLines(col(textCol), col(startCol), col(endCol)).as("code_contents"),
        col("clones"))
  }

  /**
   * POJ corpus from a (path, content) listing (see [[DirSource]]):
   * clone_type = parent directory name, code_name = file name
   * (`poj_utils.py:59-62`), code_uuid = uuid5(clone_type + code_name).
   */
  def poj(files: DataFrame, pathCol: String = "path", textCol: String = "text"): DataFrame = {
    val parts = split(col(pathCol), "/")
    files.select(
      element_at(parts, -2).as("clone_type"),
      element_at(parts, -1).as("code_name"),
      col(textCol).as("code_contents"))
    .withColumn("code_uuid", uuid5(concat(col("clone_type"), col("code_name"))))
    .select(col("clone_type"), col("code_name"), col("code_uuid"), col("code_contents"))
  }
}
