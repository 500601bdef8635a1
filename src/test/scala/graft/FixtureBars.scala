package graft

import java.sql.Timestamp
import java.time.LocalDateTime

/** Deterministic synthetic K-bar fixtures (FIXTURES.md §A): close-labeled
  * 1-minute bars on the session grid — day 08:46..13:45, night
  * 15:01..05:00 (next day) — so the closed-right 5-min resample yields
  * open-labeled buckets 08:45..13:40 (D=60) and 15:00..04:55 (N=168),
  * exactly the reference's expected counts (main.py:331-334).
  *
  * Values: the i-th bar of a generation batch has open=i, high=i+1,
  * low=i-1, close=i+0.5, volume=1 (matches the pandas ground-truth run in
  * the repo history; keeps every aggregate exactly representable).
  */
object FixtureBars {

  case class Raw(ts: Timestamp, open: Double, high: Double, low: Double,
      close: Double, volume: Long, amount: Double)

  private def minutes(from: LocalDateTime, to: LocalDateTime): Seq[LocalDateTime] =
    Iterator.iterate(from)(_.plusMinutes(1)).takeWhile(!_.isAfter(to)).toSeq

  /** Close-labeled 1-min bars for the day session of `date`. */
  def daySession(date: String): Seq[LocalDateTime] =
    minutes(LocalDateTime.parse(s"${date}T08:46"), LocalDateTime.parse(s"${date}T13:45"))

  /** Close-labeled 1-min bars for the night session OPENING on `date`
    * (wraps midnight into the next calendar day).
    */
  def nightSession(date: String): Seq[LocalDateTime] = {
    val open = LocalDateTime.parse(s"${date}T15:01")
    minutes(open, open.plusHours(13).plusMinutes(59))
  }

  /** Number the given timestamps 0..n-1 and attach the value pattern. */
  def bars(ts: Seq[LocalDateTime]): Seq[Raw] =
    ts.zipWithIndex.map { case (t, i) =>
      Raw(Timestamp.valueOf(t), i.toDouble, i + 1.0, i - 1.0, i + 0.5, 1L, i * 10.0)
    }
}
