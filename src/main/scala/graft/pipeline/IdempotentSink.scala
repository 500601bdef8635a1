package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Exactly-once-per-batch sink without a table format: each (micro-)batch
  * writes to its own deterministic subdirectory `batch=<id>` with
  * OVERWRITE mode, so a redelivered batch — Structured Streaming's
  * `foreachBatch` is at-least-once under failure/restart — replaces its
  * own previous output instead of appending a duplicate. Determinism of
  * (batchId → data) is what upgrades at-least-once delivery to
  * exactly-once contents; this is the standard idempotent-`foreachBatch`
  * pattern and the honest in-sandbox stand-in for a Delta/Iceberg MERGE
  * (no transactional-table jars in this environment — see
  * [[Sink]]'s single-writer caveat for the plain append form).
  *
  * Readers see the directory as a parquet table partitioned by `batch`,
  * so the layout is also partition-pruned: an incremental consumer reads
  * only batches above its own high-water mark.
  */
final case class IdempotentSink(path: String, schema: StructType) {

  private def align(df: DataFrame): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

  /** Write one batch; safe to call again with the same id (overwrites its
    * own directory, never touches other batches' directories).
    */
  def writeBatch(df: DataFrame, batchId: Long): Unit =
    align(df).write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** All committed batches as one frame (plus the `batch` partition col).
    * The existence probe goes through the Hadoop FileSystem API, so it
    * resolves `hdfs://`/`s3a://` paths with the session's Hadoop conf —
    * a `java.io.File` probe would silently report "no committed batches"
    * for any non-local store.
    */
  def existing(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) spark.read.schema(schema.add("batch", "long")).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema.add("batch", "long"))
  }

  /** Attach to a stream: every micro-batch lands in its own directory. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) => writeBatch(batch, id) }
      .trigger(Trigger.AvailableNow())
      .start()
}
