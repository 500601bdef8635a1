package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Trading-session calendar as pure `Column` combinators — no UDFs, so
  * everything stays inside whole-stage codegen.
  *
  * Semantics from the reference (ychuangab/TXF-Continuous-Data-Pipeline):
  *  - day session 08:45–13:45, night session 15:00–05:00 wrapping midnight
  *    (main.py:68-71, filters main.py:268-269);
  *  - a night session belongs to the calendar date it OPENED on, so bars
  *    before 05:00 are attributed to the previous day (main.py:283-287,
  *    341-345, 380-386 — the same rule is written three times there; here
  *    it exists once);
  *  - the 14:00–14:59 hour is a session gap → "UNKNOWN" (main.py:345).
  *
  * Timestamps are naive wall-clock values (the reference pins UTC+8 and
  * never attaches a zone, main.py:236); these expressions only ever look at
  * the wall-clock fields, so they are timezone-agnostic.
  */
object SessionCalendar {

  val DayStart = "08:45"
  val DayEnd = "13:45"
  val NightStart = "15:00"
  val NightEnd = "05:00"

  /** Wall-clock time-of-day as a sortable "HH:mm" string. */
  def tod(ts: Column): Column = date_format(ts, "HH:mm")

  /** Day-session membership: 08:45 <= tod <= 13:45, both ends inclusive
    * (pandas `between_time` default, main.py:268).
    */
  def isDay(ts: Column): Column = tod(ts) >= DayStart && tod(ts) <= DayEnd

  /** Night-session membership: tod >= 15:00 OR tod <= 05:00 — wraps
    * midnight (main.py:269).
    */
  def isNight(ts: Column): Column = tod(ts) >= NightStart || tod(ts) <= NightEnd

  /** Session-open calendar date: pre-05:00 bars belong to the previous
    * day's night session (main.py:283-287). Day bars map to their own date.
    */
  def sessionOpenDate(ts: Column): Column =
    to_date(when(hour(ts) < 5, ts - expr("INTERVAL 1 DAY")).otherwise(ts))

  /** Market type by hour: 8..13 → D, >=15 → N, <5 → N (previous day),
    * else UNKNOWN (the 14:xx gap; also 05:xx-08:44 off-session minutes
    * resolve through the hour rule exactly as the reference's
    * get_group_id, main.py:341-345).
    */
  def marketType(ts: Column): Column =
    when(hour(ts).between(8, 13), lit("D"))
      .when(hour(ts) >= 15, lit("N"))
      .when(hour(ts) < 5, lit("N"))
      .otherwise(lit("UNKNOWN"))

  /** Session id "yyyy-MM-dd_D" / "yyyy-MM-dd_N" / "UNKNOWN"
    * (main.py:341-345, 380-386).
    */
  def sessionId(ts: Column): Column =
    when(marketType(ts) === "UNKNOWN", lit("UNKNOWN"))
      .otherwise(concat(date_format(sessionOpenDate(ts), "yyyy-MM-dd"),
        lit("_"), marketType(ts)))

  /** "yyMMdd" session date + D/N suffix — the reference's
    * get_market_date_str (main.py:281-291), with the night/pre-dawn
    * attribution derived from the timestamp instead of a per-frame flag
    * (equivalent on session-filtered input, since sessions are disjoint).
    */
  def dateMarketType(ts: Column): Column =
    concat(date_format(sessionOpenDate(ts), "yyMMdd"), marketType(ts))

  /** Explicit-flag variant, bit-exact with the reference signature
    * get_market_date_str(ts, is_night) (main.py:281-287): the caller says
    * which session the frame holds.
    */
  def dateMarketType(ts: Column, isNightSession: Boolean): Column = {
    val d =
      if (isNightSession)
        when(hour(ts) < 5, ts - expr("INTERVAL 1 DAY")).otherwise(ts)
      else ts
    concat(date_format(d, "yyMMdd"), lit(if (isNightSession) "N" else "D"))
  }

  /** Expected bar counts per COMPLETED session (main.py:331-334, 371-374):
    * (barMinutes, marketType) → count. 5-min: D=60, N=168; 60-min: D=5,
    * N=14.
    */
  val expectedBars: Map[(Int, String), Long] = Map(
    (5, "D") -> 60L, (5, "N") -> 168L,
    (60, "D") -> 5L, (60, "N") -> 14L)

  /** Session id of the session active at wall-clock `now` (the session the
    * in-flight-drop gate protects, main.py:341-350). `now` is an injected
    * parameter — the engine never reads the wall clock (SURVEY.md §7.5#4).
    */
  def activeSessionId(now: java.sql.Timestamp): String = {
    val ldt = now.toLocalDateTime
    val h = ldt.getHour
    val (d, t) =
      if (h >= 8 && h <= 13) (ldt.toLocalDate, "D")
      else if (h >= 15) (ldt.toLocalDate, "N")
      else if (h < 5) (ldt.toLocalDate.minusDays(1), "N")
      else return "UNKNOWN"
    s"${d}_$t"
  }
}
