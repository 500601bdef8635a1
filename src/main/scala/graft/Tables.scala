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

  /** `events` with `ts` as TIMESTAMP_NTZ at microsecond precision —
    * integer-division truncation of the stored nanos, exactly what DuckDB
    * does when it reads the same file (its timestamps are microseconds),
    * so engine and oracle agree bit-for-bit. `ts div 1000` must be integer
    * division: double division would lose precision above 2^53 ns.
    */
  def events(s: SparkSession, d: String): DataFrame =
    read(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
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
