package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.time.SessionCalendar

class SessionCalendarSpec extends SparkSpec {
  import spark.implicits._

  private def ids(ts: String*): Seq[String] =
    ts.map(Timestamp.valueOf).toDF("ts")
      .select(SessionCalendar.sessionId(col("ts"))).as[String].collect().toSeq

  test("day hours map to the same-date D session") {
    assert(ids("2024-01-02 08:45:00", "2024-01-02 13:45:00") ==
      Seq("2024-01-02_D", "2024-01-02_D"))
  }

  test("night wraps midnight: pre-05:00 bars belong to the PREVIOUS day") {
    assert(ids("2024-01-02 15:00:00", "2024-01-03 00:30:00", "2024-01-03 04:59:00") ==
      Seq("2024-01-02_N", "2024-01-02_N", "2024-01-02_N"))
  }

  test("year-boundary night session: Dec 31 night owns Jan 1 pre-dawn (README.md:161-163)") {
    assert(ids("2025-12-31 23:59:00", "2026-01-01 04:00:00") ==
      Seq("2025-12-31_N", "2025-12-31_N"))
    // date_market_type renders 251231N for both
    val dmt = Seq("2025-12-31 23:59:00", "2026-01-01 04:00:00")
      .map(Timestamp.valueOf).toDF("ts")
      .select(SessionCalendar.dateMarketType(col("ts"))).as[String].collect().toSeq
    assert(dmt == Seq("251231N", "251231N"))
  }

  test("the 14:xx gap is UNKNOWN, not a crash") {
    assert(ids("2024-01-02 14:30:00") == Seq("UNKNOWN"))
  }

  test("session filters: inclusive day bounds, midnight-wrapping night") {
    val ts = Seq("2024-01-02 08:44:00", "2024-01-02 08:45:00",
      "2024-01-02 13:45:00", "2024-01-02 13:46:00",
      "2024-01-02 14:59:00", "2024-01-02 15:00:00",
      "2024-01-03 05:00:00", "2024-01-03 05:01:00")
      .map(Timestamp.valueOf).toDF("ts")
    assert(ts.filter(SessionCalendar.isDay(col("ts"))).count() == 2)
    assert(ts.filter(SessionCalendar.isNight(col("ts"))).count() == 2)
  }

  test("activeSessionId matches sessionId semantics (injected now)") {
    assert(SessionCalendar.activeSessionId(Timestamp.valueOf("2024-01-03 02:00:00"))
      == "2024-01-02_N")
    assert(SessionCalendar.activeSessionId(Timestamp.valueOf("2024-01-03 09:00:00"))
      == "2024-01-03_D")
    assert(SessionCalendar.activeSessionId(Timestamp.valueOf("2024-01-03 14:30:00"))
      == "UNKNOWN")
  }
}
