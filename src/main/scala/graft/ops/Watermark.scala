package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermark-based incremental ("Gate 2", reference README.md:26-27): keep
  * only rows strictly newer than the sink's high-water mark, so re-running
  * over the 7-day re-fetch overlap (main.py:61, 238) appends each row
  * exactly once (main.py:548-561).
  *
  * Where the reference materializes the ENTIRE sink and takes the last
  * row's `ts` (main.py:410-435 — correct only because Sheets appends are
  * ordered), the engine computes `max(ts)` as an aggregate: a partial+final
  * agg over the sink's parquet footer statistics, correct for unordered
  * sinks and O(metadata) when Parquet min/max row-group stats apply.
  *
  * The watermark predicate `ts > wm` is pushed down to the fact scan by
  * Catalyst (row-group skipping), so an incremental run reads only the new
  * tail of the data — the property that makes the pattern viable at 100 TB.
  */
object Watermark {

  /** Sink high-water mark, or None for an empty sink (main.py:428-435).
    * The value is whatever JVM type the sink's timestamp column collects to
    * (java.sql.Timestamp for TIMESTAMP, java.time.LocalDateTime for
    * TIMESTAMP_NTZ) — `lit()` handles both.
    */
  def maxTs(sink: DataFrame, tsCol: String = "ts"): Option[Any] =
    Option(sink.agg(max(col(tsCol))).collect()(0).get(0))

  /** Rows strictly newer than the watermark (main.py:548-558; the `>` is
    * strict — a bar equal to the sink max is already loaded).
    */
  def newerThan(df: DataFrame, wm: Option[Any], tsCol: String = "ts"): DataFrame =
    wm.fold(df)(w => df.filter(col(tsCol) > lit(w)))

  /** One-call incremental filter: probe the sink, filter the batch
    * (main.py:548-561 = S3 + F-5).
    */
  def incremental(df: DataFrame, sink: DataFrame, tsCol: String = "ts"): DataFrame =
    newerThan(df, maxTs(sink, tsCol), tsCol)

  /** Exact anti-join variant (SURVEY.md §2.4 J2): keep rows whose key is
    * absent from the sink. Needed when the sink may contain gaps BELOW its
    * max-ts (out-of-order history) — the max-ts filter would silently drop
    * such backfill rows (a trade-off the reference acknowledges,
    * main.py:543-546). Null-safe and shuffle-hash/SMJ-planned by Catalyst;
    * at scale, prefer bucketing both sides on the key.
    */
  def notInSink(df: DataFrame, sink: DataFrame, keyCols: Seq[String]): DataFrame =
    df.join(sink.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
}
