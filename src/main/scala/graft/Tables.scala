package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (TESTDATA.md): one parquet
  * file per table under the scale-factor dir. Column pruning + predicate
  * pushdown reach these scans via Catalyst (verify with
  * `.explain("formatted")` → `ReadSchema` / `PushedFilters`).
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects; read it as raw nanos and rebuild the timestamp below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` as TIMESTAMP_NTZ at microsecond precision.
    *
    * The driver has generated this file with two encodings across rounds:
    * TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as raw
    * longs, via nanosAsLong above) and TIMESTAMP(MICROS) (read natively as
    * TIMESTAMP_NTZ). Dispatch on the loaded type: for nanos, integer-divide
    * to micros — exactly the truncation DuckDB applies reading the same
    * file (its timestamps are microseconds), so engine and oracle agree
    * bit-for-bit; `div` must be integer division (double division loses
    * precision above 2^53 ns). For micros, the value is already what
    * DuckDB sees.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "events")
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", tsCol)
  }
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
