package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located fact-fact joins: both sides
  * bucketed (and sorted) on the join key join with ZERO exchanges — the
  * shuffle is paid once at write time and amortized over every subsequent
  * join/aggregation on that key. At 100 TB this converts the recurring
  * dominant cost of a fact-fact join (shuffling both sides) into a
  * metadata property of the table.
  *
  * Bucket count guidance: total size / bucket ≈ 128-512 MB per bucket per
  * partition; bucket counts of joined tables must be equal (or one a
  * multiple of the other with bucket coalescing enabled).
  */
object Bucketing {

  /** `path` = None writes a managed table into the session warehouse;
    * Some(p) writes an external table at p (for callers whose working
    * directory — hence default warehouse — may not be writable).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
