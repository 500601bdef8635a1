package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Append-only parquet sink with schema alignment — the engine's version of
  * the reference's Google-Sheets uploader (`SheetUploader.append_safely`,
  * main.py:477-510).
  *
  * The reference's three `_prepare_data` branches (empty sheet → write
  * header; header-only → project to header; else → re-filter by watermark
  * and project, main.py:449-472) collapse to: "project to the declared
  * schema, create-if-absent, append". The sink's declared `StructType`
  * replaces the sheet's header row as the schema authority (SURVEY.md
  * §1.3); column alignment (P7) is a `select` in sink order, and the
  * reference's double watermark ("雙重保險", main.py:459) is dropped as
  * documented redundancy — [[graft.ops.Watermark.incremental]] is the one
  * authoritative filter.
  *
  * Parquet append is not transactional (same single-writer assumption as
  * the reference's Sheets append, SURVEY.md §7.5#6); a transactional
  * deployment would swap this for a Delta/Iceberg MERGE keyed on `ts`.
  */
final case class Sink(path: String, schema: StructType) {

  /** Current sink contents; empty frame with the declared schema when the
    * sink doesn't exist yet (the "empty sheet" branch, main.py:449).
    */
  def existing(spark: SparkSession): DataFrame =
    if (new java.io.File(path).exists()) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** P7 column alignment: project to the sink schema, in sink order,
    * casting to the declared types (the reference aligns to whatever
    * header the sheet has, main.py:454-457, 471-472).
    */
  def align(df: DataFrame): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

  def append(df: DataFrame): Unit =
    align(df).write.mode("append").parquet(path)

  /** Append partitioned by the given columns (e.g. the session date) —
    * at 100 TB the sink must be partition-pruned on read; a reader
    * filtering one trading day then touches one directory, not the
    * history. Partition columns must be part of the declared schema.
    */
  def appendPartitioned(df: DataFrame, partitionCols: Seq[String]): Unit =
    align(df).write.mode("append").partitionBy(partitionCols: _*).parquet(path)
}
