package graft.model

import org.apache.spark.sql.types._

/** Typed row models + declared StructTypes for the engine's data plane.
  *
  * The reference (ychuangab/TXF-Continuous-Data-Pipeline) is schema-on-read
  * over stringly-typed storage (main.py:171-189 coerces every load with
  * to_numeric/to_datetime errors='coerce'); here every table has a declared
  * schema and coercion is an explicit `try_cast` load step (see
  * [[graft.sources.CoercingLoader]]).
  */
object Schemas {

  /** Raw 1-minute K-bar (reference main.py:247-254; `amount` is dropped at
    * ingest there, main.py:249 — we keep it in the source schema so the
    * drop is an explicit projection).
    */
  val rawBars: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false),
    StructField("amount", DoubleType, nullable = true)
  ))

  /** Settlement / rollover dimension (reference README.md:70-77,
    * settle_config_template.csv, loaded main.py:171-189). `[start_k,
    * settle_k]` intervals tile the timeline; build side of the interval
    * join.
    */
  val settleConfig: StructType = StructType(Seq(
    StructField("contract_year_month", StringType, nullable = false),
    StructField("next_contract_diff", DoubleType, nullable = true),
    StructField("accumulated_contract_diff", DoubleType, nullable = true),
    StructField("start_k", TimestampType, nullable = true),
    StructField("settle_k", TimestampType, nullable = true)
  ))

  /** Output bar schema (reference SURVEY.md §1.2(c); produced
    * main.py:263-315, serialized main.py:441-446).
    */
  val outputBars: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("open", DoubleType, nullable = true),
    StructField("high", DoubleType, nullable = true),
    StructField("low", DoubleType, nullable = true),
    StructField("close", DoubleType, nullable = true),
    StructField("volume", LongType, nullable = true),
    StructField("date_market_type", StringType, nullable = true),
    StructField("contract_year_month", StringType, nullable = true),
    StructField("accumulated_contract_diff", DoubleType, nullable = true),
    StructField("mxf_code", StringType, nullable = true)
  ))
}

/** One OHLCV bar; typed core for Dataset[...] users. */
case class Bar(
    ts: java.sql.Timestamp,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Long)

/** One settlement-config row (see [[Schemas.settleConfig]]). */
case class SettleConfig(
    contract_year_month: String,
    next_contract_diff: Option[Double],
    accumulated_contract_diff: Option[Double],
    start_k: Option[java.sql.Timestamp],
    settle_k: Option[java.sql.Timestamp])
