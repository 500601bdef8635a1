package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucketed OHLCV aggregation ("resample") on top of Spark's built-in
  * `window()` — the engine's version of the reference's pandas
  * `resample('5min'/'60min')` (main.py:263-278).
  *
  * Two semantic deltas vs Spark defaults, both handled here:
  *
  *  1. '''Bucket edges.''' pandas uses `closed='right', label='left'`
  *     (bucket `(t, t+w]` labeled `t`); Spark windows are `[start, end)`.
  *     We shift the timestamp by −1 microsecond before windowing so a bar
  *     stamped exactly on a boundary lands in the PRECEDING bucket, then
  *     label with `window.start` (SURVEY.md §7.5#1).
  *  2. '''first/last determinism.''' pandas `first/last` are order-defined;
  *     Spark's `first()/last()` aggregates are not. We use `min_by`/`max_by`
  *     on the timestamp, which are deterministic when timestamps are unique
  *     within a bucket (they are: source bars are a 1-minute grid) and stay
  *     in codegen'd built-ins (SURVEY.md §7.5#2).
  *
  * Phase offsets (pandas `offset='45min'`, main.py:272-274) map to
  * `window()`'s native `startTime` parameter.
  *
  * Scale: this is a single partial+final hash aggregation (map-side combine
  * shrinks each partition to ≤ one row per (key, bucket) before the
  * shuffle). No sort needed. At 100 TB the shuffle is proportional to the
  * number of distinct buckets×keys, not input rows.
  */
object Resample {

  /** ε-shift that converts Spark's closed-left windows into the
    * reference's closed-right buckets.
    */
  def closedRightTs(ts: Column): Column = ts - expr("INTERVAL 1 MICROSECOND")

  /** Bucket label column: left-labeled window start; closed-right edge via
    * the ε-shift when requested. The reference mixes both: the 1-min→5-min
    * stage is `closed='right'` (main.py:263) but the 5-min→60-min stage
    * uses pandas' default `closed='left'` (main.py:272-278) — i.e. Spark's
    * native window semantics.
    */
  def bucket(ts: Column, width: String, phase: String = "0 minutes",
      closedRight: Boolean = true): Column =
    window(if (closedRight) closedRightTs(ts) else ts, width, width, phase)("start")

  /** Resample OHLCV bars (open/high/low/close/volume columns) into
    * `width`-sized buckets; `main.py:263-265` (5-min) / `272-278` (60-min,
    * with `phase = "45 minutes"` for the day session).
    *
    * @param keys extra grouping keys carried alongside the time bucket
    *             (empty for the single-instrument reference; e.g.
    *             `Seq(col("symbol"))` for a multi-instrument table).
    */
  def ohlcvBars(
      bars: DataFrame,
      width: String,
      phase: String = "0 minutes",
      tsCol: String = "ts",
      keys: Seq[Column] = Nil,
      closedRight: Boolean = true): DataFrame = {
    val ts = col(tsCol)
    bars
      .groupBy(keys :+ bucket(ts, width, phase, closedRight).as(tsCol): _*)
      .agg(
        min_by(col("open"), ts).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), ts).as("close"),
        sum(col("volume")).as("volume"))
  }

  /** Resample a tick-like table (one scalar observation per row — e.g. the
    * driver's `events.value`) into OHLCV bars: open/close = first/last
    * observation in the bucket, high/low = max/min, volume = row count.
    */
  def ohlcvFromTicks(
      ticks: DataFrame,
      valueCol: String,
      width: String,
      phase: String = "0 minutes",
      tsCol: String = "ts",
      keys: Seq[Column] = Nil,
      closedRight: Boolean = true): DataFrame = {
    val ts = col(tsCol)
    val v = col(valueCol)
    ticks
      .groupBy(keys :+ bucket(ts, width, phase, closedRight).as(tsCol): _*)
      .agg(
        min_by(v, ts).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, ts).as("close"),
        count(lit(1)).as("volume"))
  }

  /** Fill the gaps of a per-key bucketed series: generate each key's
    * complete bucket grid between its first and last observation
    * (`sequence` + explode — no driver loop), left-join the observed rows,
    * and forward-fill `fillCols` with the running
    * `last(..., ignoreNulls)`; `is_filled` marks synthesized rows. The
    * dense-grid complement of the completeness GATE
    * ([[QualityGates.checkCompleteness]]): where the gate rejects holes,
    * this repairs them — what a downstream consumer of bar data needs when
    * the exchange simply traded nothing in an interval.
    *
    * Scale: the grid is buckets-sized (output-sized, not input-sized); the
    * join and the forward-fill window both hash on the key columns, and
    * each key's window is a single streaming pass in bucket order.
    */
  def fillForward(
      buckets: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      step: String,
      fillCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = buckets
      .groupBy(keyCols.map(col): _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
      .select(keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"),
          expr(s"INTERVAL $step"))).as(tsCol): _*)
    val joined = grid.join(buckets, keyCols :+ tsCol, "left")
      .withColumn("is_filled", col(fillCols.head).isNull)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    fillCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
