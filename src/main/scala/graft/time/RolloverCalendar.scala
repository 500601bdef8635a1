package graft.time

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contract-rollover calendar arithmetic (reference
  * `SettleManager.calculate_next_contract`, main.py:191-224), as Column
  * expressions + one DataFrame op. Taiwan index futures settle on the
  * third Wednesday of the contract month at 13:25 (main.py:201-206).
  */
object RolloverCalendar {

  /** Third Wednesday of the month containing `d`.
    *
    * Derivation (replaces the reference's "advance day-by-day while weekday
    * != Wednesday" loop, main.py:203-206, with closed-form arithmetic that
    * also translates 1:1 to the DuckDB oracle): let `first` be the 1st of
    * the month; the first Wednesday is `first + ((4 - dayofweek(first) + 7)
    * % 7)` with Spark's dayofweek Sunday=1..Saturday=7 (Wednesday=4); the
    * third is 14 days later.
    */
  def thirdWednesday(d: Column): Column = {
    val first = trunc(d, "MM")
    date_add(first, ((lit(4) - dayofweek(first)) + 7) % 7 + 14)
  }

  /** Settlement bar timestamp: third Wednesday 13:25 (main.py:206). */
  def settleK(d: Column): Column =
    to_timestamp(thirdWednesday(d)) + expr("INTERVAL 13 HOURS 25 MINUTES")

  /** Next contract month: "yyyyMM" + 1 month (the reference's +31-days
    * trick from the month's 1st, main.py:196-198; `add_months` is the
    * clean equivalent with identical results).
    */
  def nextContractMonth(ym: Column): Column =
    date_format(add_months(to_date(ym, "yyyyMM"), 1), "yyyyMM")

  /** Contract code: "MXF" + yyyyMM (main.py:224). */
  def contractCode(ym: Column): Column = concat(lit("MXF"), ym)

  /** Running rollover spread (A6, main.py:210 generalized): the stored
    * per-row `accumulated_contract_diff` is the prefix sum of all EARLIER
    * contracts' `next_contract_diff`, anchored at `base` (the last known
    * accumulated value). Single-partition window is fine: the dimension is
    * one row per contract month.
    */
  def withAccumulatedDiff(cfg: DataFrame, base: Column = lit(0.0)): DataFrame = {
    val w = Window.orderBy("contract_year_month")
      .rowsBetween(Window.unboundedPreceding, -1)
    cfg.withColumn("accumulated_contract_diff",
      base + coalesce(sum(col("next_contract_diff")).over(w), lit(0.0)))
  }

  /** C2 — predict the next contract and append it to the config
    * (main.py:191-224): month = last + 1; settle = 3rd Wed 13:25;
    * start = previous settle + 5 min (main.py:207); accumulated diff =
    * last accumulated + last next_contract_diff (main.py:210); its own
    * `next_contract_diff` is unknown → NULL (U2's allowMissingColumns,
    * main.py:216-221).
    */
  def predictNext(cfg: DataFrame): DataFrame = {
    val last = cfg
      .orderBy(desc("contract_year_month"))
      .limit(1)
    val predicted = last.select(
      nextContractMonth(col("contract_year_month")).as("contract_year_month"),
      lit(null).cast("double").as("next_contract_diff"),
      (coalesce(col("accumulated_contract_diff"), lit(0.0)) +
        coalesce(col("next_contract_diff"), lit(0.0)))
        .as("accumulated_contract_diff"),
      (col("settle_k") + expr("INTERVAL 5 MINUTES")).as("start_k"),
      settleK(add_months(to_date(col("contract_year_month"), "yyyyMM"), 1))
        .as("settle_k"))
    cfg.unionByName(predicted, allowMissingColumns = true)
  }
}
