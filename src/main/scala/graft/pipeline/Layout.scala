package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output layout control: directory partitioning + bounded file sizes.
  *
  * The two failure modes of a naive `df.write.partitionBy(...)` at 100 TB:
  *  - SMALL FILES: every task holding rows of a partition writes its own
  *    file into that directory — 1 000 tasks × 1 000 days = a million
  *    files, and the next reader drowns in open() calls. Fixed by
  *    repartitioning ON the partition columns first, so each directory is
  *    written by as few tasks as possible.
  *  - GIANT FILES: one hot day lands in one task and writes one 50 GB
  *    file that no reader can split below row-group granularity. Fixed by
  *    `maxRecordsPerFile`, which rolls a new file every N records.
  *
  * Rows-per-file comes from the caller's average row width — an explicit
  * parameter, not a sampled estimate, because sampling the frame would
  * add a pass over the data and the caller (who declared the schema)
  * knows the width to within the factor of two that matters here.
  */
object Layout {

  /** Write `df` to `path` partitioned by `partitionCols`, with files
    * capped near `targetFileBytes` (default 128 MB, one HDFS-ish block /
    * one comfortable parquet row-group span).
    */
  def writeSized(df: DataFrame, path: String, partitionCols: Seq[String],
      avgRowBytes: Long, targetFileBytes: Long = 128L << 20): Unit = {
    require(avgRowBytes > 0 && targetFileBytes > 0)
    val rowsPerFile = math.max(1L, targetFileBytes / avgRowBytes)
    val repartitioned =
      if (partitionCols.isEmpty) df
      else df.repartition(partitionCols.map(col): _*)
    repartitioned.write
      .mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
