package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval (range) join + contract back-adjustment — the reference's
  * central operator (`enrich_row`, main.py:294-318): for each bar, find the
  * settlement-config row whose `[start_k, settle_k]` interval contains the
  * bar's timestamp, then shift OHLC by that row's
  * `accumulated_contract_diff` (0 when unmatched — left-outer semantics).
  *
  * The reference drives this with a row-wise Python `apply(axis=1)` that
  * rescans the whole config per bar. Here it is a single
  * `BroadcastNestedLoopJoin`: the dimension is tens-to-thousands of rows
  * (one per contract month), so it broadcasts to every executor and the
  * probe stays embarrassingly parallel — no shuffle of the fact side at
  * any scale. Only if the build side outgrew broadcast would a range-binned
  * co-partitioned join be needed; for a monthly-interval dimension that
  * point is ~centuries of contracts away.
  */
object IntervalJoin {

  /** Left-outer interval join: `facts` rows keep all columns and gain
    * `dim`'s columns where `start <= facts.tsCol <= end` (NULLs otherwise).
    *
    * First-match tie-break: the reference takes the first matching config
    * row in table order (`match.iloc[0]`, main.py:308). Intervals are
    * non-overlapping by construction (asserted by
    * [[QualityGates.requireNonOverlapping]]), so normally every bar has at
    * most one match; `tieBreak` re-imposes first-match semantics when a
    * caller feeds overlapping intervals: smallest `tieBreak` column wins.
    */
  def leftJoin(
      facts: DataFrame,
      dim: DataFrame,
      ts: Column,
      start: Column,
      end: Column,
      tieBreak: Option[Column] = None): DataFrame = {
    tieBreak match {
      case None => facts.join(broadcast(dim), ts >= start && ts <= end, "left")
      case Some(order) =>
        // Overlap allowed: keep the first dim match per FACT ROW. The
        // window partitions by a synthetic unique row id, not the fact
        // timestamp — two distinct fact rows sharing a ts must each keep
        // their own first match, not collapse to one survivor.
        val withId = facts.withColumn("__fid", monotonically_increasing_id())
        withId.join(broadcast(dim), ts >= start && ts <= end, "left")
          .withColumn("__rn",
            row_number().over(
              Window.partitionBy(col("__fid")).orderBy(order.asc_nulls_last)))
          .filter(col("__rn") === 1)
          .drop("__rn", "__fid")
    }
  }

  /** Back-adjust OHLC by the accumulated rollover spread (main.py:298-315):
    * left interval join against the settle config, then
    * `price += coalesce(accumulated_contract_diff, 0)`; unmatched bars get
    * `contract_year_month = ""` and diff 0 — exactly the reference's
    * default-then-overwrite (main.py:298-311) without mutation.
    */
  def backAdjust(
      bars: DataFrame,
      settleConfig: DataFrame,
      tsCol: String = "ts"): DataFrame = {
    val diff = coalesce(col("accumulated_contract_diff"), lit(0.0))
    val adjusted = leftJoin(
      bars, settleConfig.select("contract_year_month",
        "accumulated_contract_diff", "start_k", "settle_k"),
      col(tsCol), col("start_k"), col("settle_k"))
    Seq("open", "high", "low", "close")
      .foldLeft(adjusted)((df, c) => df.withColumn(c, col(c) + diff))
      .withColumn("contract_year_month",
        coalesce(col("contract_year_month"), lit("")))
      .withColumn("accumulated_contract_diff", diff)
      .drop("start_k", "settle_k")
  }
}
