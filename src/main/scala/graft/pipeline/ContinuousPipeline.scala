package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{IntervalJoin, QualityGates, Resample, Watermark}
import graft.time.SessionCalendar

/** The reference's core "query" (`DataProcessor.resample_and_split`,
  * main.py:259-323) + the full ETL composition (main.py:516-596), as ONE
  * lazy logical plan per output.
  *
  * Shape (SURVEY.md §3.2):
  * {{{
  * raw 1-min bars
  *   → 5-min OHLCV resample                     (A1)
  *   → split day / night by time-of-day         (F-1/F-2)
  *   → [60-min path] resample the session-      (A2/A3 — 45-min phase for
  *      filtered 5-min frames                    day, none for night)
  *   → label date_market_type                   (F1)
  *   → union day+night                          (U1)
  *   → broadcast interval join + back-adjust    (J1)
  * }}}
  *
  * The 60-min path derives from the SESSION-FILTERED 5-min frames, not from
  * raw — a night session is 14 bars only because the filter precedes the
  * resample (main.py:272-278; SURVEY.md §7.5#8). The filtered 5-min frames
  * are the shared subexpression between both outputs; callers running both
  * should `.cache()` the result of [[fiveMinuteSessions]].
  */
object ContinuousPipeline {

  /** A1 + F-1/F-2: 5-min bars split into (day, night) session frames. */
  def fiveMinuteSessions(raw1min: DataFrame): (DataFrame, DataFrame) = {
    val bars5 = Resample.ohlcvBars(raw1min.drop("amount"), "5 minutes")
    (bars5.filter(SessionCalendar.isDay(col("ts"))),
      bars5.filter(SessionCalendar.isNight(col("ts"))))
  }

  private def labeled(day: DataFrame, night: DataFrame): DataFrame =
    day.withColumn("date_market_type",
        SessionCalendar.dateMarketType(col("ts"), isNightSession = false))
      .unionByName(night.withColumn("date_market_type",
        SessionCalendar.dateMarketType(col("ts"), isNightSession = true)))

  /** F-1/F-2 + F1 fused in ONE pass: keep day∪night rows and CASE-label
    * them, instead of filter×2 + union. The sessions are disjoint windows
    * of the clock (08:45–13:45 vs ≥15:00/≤05:00), so the row set is
    * identical to the reference's two-frame concat — but the upstream
    * 5-min aggregate appears ONCE in the plan rather than under each union
    * branch (Spark does not CSE across union arms: the two-filter form
    * computes the whole resample twice or forces a cache; at 100 TB that
    * is the difference between one shuffle and two, or a corpus-sized
    * cache). Bars in neither session (the 14:xx gap, 05:01–08:44) drop,
    * exactly as the reference's between_time pair drops them.
    */
  private def labelSessionsOnePass(bars: DataFrame): DataFrame = {
    val day = SessionCalendar.isDay(col("ts"))
    bars.filter(day || SessionCalendar.isNight(col("ts")))
      .withColumn("date_market_type",
        when(day, SessionCalendar.dateMarketType(col("ts"), isNightSession = false))
          .otherwise(SessionCalendar.dateMarketType(col("ts"), isNightSession = true)))
  }

  /** Full 5-min output (main.py:320): labeled sessions, back-adjusted —
    * resample once, label in-pass, one broadcast interval join.
    */
  def fiveMinute(raw1min: DataFrame, settleConfig: DataFrame): DataFrame = {
    val bars5 = Resample.ohlcvBars(raw1min.drop("amount"), "5 minutes")
    IntervalJoin.backAdjust(labelSessionsOnePass(bars5), settleConfig)
  }

  /** Full 60-min output (main.py:321-323): 60-min resample of the
    * session-filtered 5-min frames — 45-minute phase offset for the day
    * session so buckets tile 08:45, 09:45, … (A2); no offset at night (A3).
    */
  def sixtyMinute(raw1min: DataFrame, settleConfig: DataFrame): DataFrame = {
    val (d5, n5) = fiveMinuteSessions(raw1min)
    // The 60-min stage uses pandas' DEFAULT closed='left' (main.py:272-278)
    // — unlike the closed='right' 1-min→5-min stage — so no ε-shift here:
    // bucket [08:45, 09:45) holds the 5-min bars labeled 08:45..09:40.
    val d60 = Resample.ohlcvBars(d5, "60 minutes", phase = "45 minutes",
      closedRight = false)
    val n60 = Resample.ohlcvBars(n5, "60 minutes", closedRight = false)
    IntervalJoin.backAdjust(labeled(d60, n60), settleConfig)
  }

  /** The whole incremental run (main.py:516-596), wall clock injected:
    * resample+split+adjust → drop the in-flight session (W3) → keep only
    * rows newer than each sink's watermark (W1/Gate 2) → completeness gate
    * (W5/Gate 1, throws) → stamp contract code → schema-aligned append.
    * Returns the (fiveMin, sixtyMin) frames that were appended.
    *
    * `mxfCode` is a job parameter by design (C1, SURVEY.md §2.11): the
    * reference computes the code from the rollover calendar and probes the
    * broker for its existence, falling back to the continuous-contract
    * alias `MXFR1` when the probe fails (main.py:240-242). The probe is a
    * broker-API call — connector territory, outside the data plane — so
    * the engine's convention is: the ORCHESTRATOR resolves
    * [[graft.time.RolloverCalendar.contractCode]] (or its `predictNext`
    * output) against the live broker and passes either the verified code
    * or the fallback alias here; the data plane stamps whatever it is
    * given and stays deterministic.
    */
  def run(
      raw1min: DataFrame,
      settleConfig: DataFrame,
      sink5: Sink,
      sink60: Sink,
      now: Timestamp,
      mxfCode: String): (DataFrame, DataFrame) = {
    QualityGates.requireNonOverlapping(settleConfig, col("start_k"), col("settle_k"))
    val cfg = broadcast(settleConfig)

    def prepare(df: DataFrame, minutes: Int, sink: Sink): DataFrame = {
      val complete = QualityGates.dropIncompleteActiveSession(df, minutes, now)
      val fresh = Watermark.incremental(complete, sink.existing(raw1min.sparkSession))
      QualityGates.checkCompleteness(fresh, minutes)
      fresh.withColumn("mxf_code", lit(mxfCode))
    }

    val five = prepare(fiveMinute(raw1min, cfg), 5, sink5)
    val sixty = prepare(sixtyMinute(raw1min, cfg), 60, sink60)
    sink5.append(five)
    sink60.append(sixty)
    (five, sixty)
  }
}
