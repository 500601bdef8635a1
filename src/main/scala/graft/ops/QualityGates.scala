package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.time.SessionCalendar

/** Data-quality gates — runtime checks, deliberately NOT optimizer rules
  * (SURVEY.md §4): the reference treats them as correctness infrastructure
  * that aborts the load (main.py:589-593), and so do we.
  */
object QualityGates {

  /** Gate 1 violation (reference raises ValueError, main.py:399-400). */
  final class IncompleteSessionException(val offenders: Seq[(String, Long, Long)])
      extends RuntimeException(
        "incomplete sessions: " + offenders
          .map { case (s, got, want) => s"$s got=$got want=$want" }
          .mkString(", "))

  /** Per-session bar counts (A4, main.py:388-389). */
  def sessionCounts(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.groupBy(SessionCalendar.sessionId(col(tsCol)).as("session_id"))
      .agg(count(lit(1)).as("n"))

  /** Gate 1 — completeness ("每盤K棒數量必須精準", main.py:368-401): every
    * session must have EXACTLY the expected bar count for its market type
    * (5-min: D=60/N=168; 60-min: D=5/N=14). Any mismatch throws, blocking
    * the load. One cheap aggregate; the offender collect is bounded by the
    * number of bad sessions, not data size.
    */
  def checkCompleteness(df: DataFrame, barMinutes: Int, tsCol: String = "ts"): Unit = {
    val expected = SessionCalendar.expectedBars.collect {
      case ((m, t), n) if m == barMinutes => (t, n)
    }.toMap
    val want = expected.foldLeft(lit(null).cast("long")) { case (acc, (t, n)) =>
      when(substring(col("session_id"), -1, 1) === t, lit(n)).otherwise(acc)
    }
    val offenders = sessionCounts(df, tsCol)
      .filter(col("session_id") =!= "UNKNOWN")
      .withColumn("want", want)
      .filter(col("n") =!= col("want"))
      .orderBy("session_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    if (offenders.nonEmpty) throw new IncompleteSessionException(offenders.toSeq)
  }

  /** In-flight-session drop (W3, main.py:325-366): if the session active at
    * `now` is present but still incomplete, remove ALL its rows — only
    * finished sessions are emitted ("只上傳已完結的盤"). `now` is injected,
    * never read from the wall clock (SURVEY.md §7.5#4). The reference's
    * positional `iloc[:-n]` tail-truncate becomes the predicate it actually
    * means (F-6): one count aggregate + one pushed-down filter.
    */
  def dropIncompleteActiveSession(
      df: DataFrame,
      barMinutes: Int,
      now: Timestamp,
      tsCol: String = "ts"): DataFrame = {
    val active = SessionCalendar.activeSessionId(now)
    if (active == "UNKNOWN") return df
    val expected = SessionCalendar.expectedBars((barMinutes, active.takeRight(1)))
    val n = df
      .filter(SessionCalendar.sessionId(col(tsCol)) === active)
      .count()
    if (n > 0 && n < expected)
      df.filter(SessionCalendar.sessionId(col(tsCol)) =!= active)
    else df
  }

  /** Interval-dimension sanity gate (SURVEY.md §7.5#7): the interval join's
    * first-match tie-break only matters if intervals overlap; the engine
    * asserts they don't, turning a silent order-dependence in the reference
    * (`match.iloc[0]`, main.py:308) into an explicit failure.
    */
  final class OverlappingIntervalsException(val pairs: Long)
      extends RuntimeException(s"settle-config intervals overlap: $pairs pair(s)")

  def requireNonOverlapping(dim: DataFrame, start: Column, end: Column): Unit = {
    val a = dim.select(start.as("s"), end.as("e"))
    val b = a.select(col("s").as("s2"), col("e").as("e2"))
    // tiny dimension → broadcast self theta-join; count strictly-overlapping pairs
    val overlaps = a.join(broadcast(b),
        col("s") < col("s2") && col("s2") <= col("e"))
      .count()
    if (overlaps > 0) throw new OverlappingIntervalsException(overlaps)
  }
}
