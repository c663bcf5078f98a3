package graft.bench

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame

/**
 * Result sinks (SURVEY S7/F12): header CSV outputs matching the
 * reference's `df.to_csv(path, index=False)` (`main.py:85-90`) and its
 * timestamped scalability filenames (`main3.py:90-92`).
 */
object Sinks {

  /** S7: write a result frame as ONE header CSV directory. The reference
    * emits single files; results here are benchmark-sized (≤ |Q|·k rows),
    * so the coalesce(1) is a deliberate small-output convenience — never
    * use it for data-sized frames. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** F12: `<dir>/<label>_<yyyyMMdd_HHmmss>` — the reference's timestamped
    * output naming (`main3.py:90`). */
  def timestampedPath(dir: String, label: String,
      now: LocalDateTime = LocalDateTime.now()): String = {
    val ts = now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    s"$dir/${label}_$ts"
  }
}
