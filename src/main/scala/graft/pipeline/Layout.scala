package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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
    *
    * `maxPartitionRows` (a caller hint, like `avgRowBytes`: the caller
    * knows the hot key's magnitude; sampling would cost a pass) bounds the
    * rows of the LARGEST partition value. When it exceeds one file's
    * rows, the repartition key gains a chunk salt —
    * `pmod(xxhash64(every column), ceil(maxPartitionRows / rowsPerFile))`
    * — so a hot partition value is written by up to `chunks` parallel
    * tasks instead of serializing through one. Without the salt (hint 0 =
    * unknown, the conservative default) `repartition(partitionCols)`
    * routes every row of a hot day through a single task:
    * `maxRecordsPerFile` still bounds file SIZES, but at 100 TB the
    * single writer task is a straggler that stretches the job to the
    * hottest partition's length. The salt keeps file counts bounded too:
    * each chunk task holds ~rowsPerFile rows of that partition, so a hot
    * day yields ≈chunks files of target size, not thousands of slivers
    * (the failure mode of not repartitioning at all).
    *
    * `hotFilter` (optional, like the two size hints a caller-known fact)
    * restricts the chunk salt to rows matching the predicate: cold
    * partition values keep salt 0 and funnel into one writer task each.
    * WITHOUT it the salt applies to every row, and each cold partition
    * value fans out across up to `chunks` writer tasks — up to `chunks`
    * sub-target files per cold directory. That is the small-files mode
    * this module exists to avoid, so when the table has many cold
    * partitions either pass `hotFilter` or size `maxPartitionRows` to the
    * hot key only (a hint of 0 never salts).
    */
  def writeSized(df: DataFrame, path: String, partitionCols: Seq[String],
      avgRowBytes: Long, targetFileBytes: Long = 128L << 20,
      maxPartitionRows: Long = 0L, hotFilter: Option[Column] = None): Unit = {
    require(avgRowBytes > 0 && targetFileBytes > 0)
    val rowsPerFile = math.max(1L, targetFileBytes / avgRowBytes)
    val chunks = math.max(1L,
      (maxPartitionRows + rowsPerFile - 1) / rowsPerFile)
    val repartitioned =
      if (partitionCols.isEmpty) df
      else if (chunks <= 1L) df.repartition(partitionCols.map(col): _*)
      else {
        // explicit partition count: an expression-only repartition is an
        // AQE-coalescible exchange, and coalescing would re-serialize the
        // hot partition's chunks back into one writer task (observed at
        // test scale; at 100 TB the same merge can glue hot chunks under
        // the advisory size). REPARTITION_BY_NUM is exempt. Keep the
        // session's configured parallelism, never below the chunk count.
        val n = math.max(
          df.sparkSession.sessionState.conf.numShufflePartitions.toLong,
          chunks).min(1L << 20).toInt
        // Salt from hashable columns only: HashExpression rejects MapType
        // (no canonical order), and a struct/array that CONTAINS a map is
        // equally rejected — a frame of only map columns falls back to a
        // row-position salt (spreads a hot partition just as well; file
        // ASSIGNMENT of rows may differ across retries, the data never).
        val hashable = df.schema.fields
          .filterNot(f => containsMap(f.dataType)).map(f => col(f.name))
        val saltBase =
          if (hashable.nonEmpty) xxhash64(hashable: _*)
          else monotonically_increasing_id()
        val chunkSalt = pmod(saltBase, lit(chunks))
        val salt = hotFilter.fold(chunkSalt)(h =>
          when(h, chunkSalt).otherwise(lit(0L)))
        df.repartition(n, partitionCols.map(col) :+ salt: _*)
      }
    repartitioned.write
      .mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: ArrayType => containsMap(a.elementType)
    case _ => false
  }
}
