package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-on-read settle-config loader with lossy coercion — the engine's
  * version of the reference's Google-Sheet load (S2, main.py:171-189):
  * everything arrives as strings; numerics via `to_numeric(errors=
  * 'coerce')` and datetimes via `to_datetime(errors='coerce')` become
  * NULL on failure; rows with a null key are dropped.
  *
  * Spark mapping: header CSV scan → `try_cast` / `to_timestamp` (NULL on
  * failure under non-ANSI try semantics) → `na.drop` on the key. The
  * declared output schema is [[graft.model.Schemas.settleConfig]].
  */
object SettleConfigSource {

  /** Coerce an all-strings settle-config frame to the typed schema. */
  def coerce(raw: DataFrame): DataFrame =
    raw.select(
        col("contract_year_month"),
        expr("try_cast(next_contract_diff AS DOUBLE)").as("next_contract_diff"),
        expr("try_cast(accumulated_contract_diff AS DOUBLE)")
          .as("accumulated_contract_diff"),
        // try_to_timestamp: NULL on malformed input even under ANSI mode
        // (Spark 4 default), matching errors='coerce'
        expr("try_to_timestamp(start_k, 'yyyy-MM-dd HH:mm:ss')").as("start_k"),
        expr("try_to_timestamp(settle_k, 'yyyy-MM-dd HH:mm:ss')").as("settle_k"))
      .na.drop(Seq("contract_year_month"))

  /** Load from a header CSV (the settle_config_template.csv shape). */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    coerce(spark.read.option("header", "true").csv(path))
}
