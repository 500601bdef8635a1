package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the escape hatch
  * for per-key logic that windowed aggregation can't express (SURVEY.md
  * §2.9; the reference's high-water-mark bookkeeping, main.py:548-561, is
  * exactly this shape when run continuously instead of per-cron-batch).
  *
  * State is sharded by key across executors and persisted in the state
  * store per micro-batch; memory is O(keys), not O(events). Use
  * event-time timeouts to expire idle keys when key cardinality is
  * unbounded.
  */
object StatefulOps {

  case class Tick(user_id: Long, ts: Timestamp, value: Double)
  case class HighWater(user_id: Long, ts: Timestamp, value: Double)

  /** Emit a row each time a key's running maximum value increases — the
    * streaming high-water mark. Exactly-once across restarts comes from
    * the state store + checkpoint; within a batch, input order follows
    * event order of the iterator.
    */
  def highWaterMarks(ticks: Dataset[Tick]): Dataset[HighWater] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[Tick], state: GroupState[Double]) => {
          var cur = state.getOption.getOrElse(Double.NegativeInfinity)
          val out = rows.toSeq.sortBy(_.ts.getTime).flatMap { t =>
            if (t.value > cur) { cur = t.value; Some(HighWater(user, t.ts, t.value)) }
            else None
          }
          state.update(cur)
          out.iterator
        })
  }

  /** The same high-water mark on Spark 4's `transformWithState` — the
    * arbitrary-state API that supersedes `flatMapGroupsWithState`: typed
    * state variables (`ValueState`/`ListState`/`MapState`) with
    * per-variable TTL, event-time timers, and schema evolution, backed by
    * the RocksDB state store (the provider the spec configures —
    * `transformWithState` requires it). Behavior is asserted identical to
    * [[highWaterMarks]] in StatefulBucketingSpec.
    */
  class HighWaterProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Tick, HighWater] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var hw: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hw = getHandle.getValueState[Double]("hw", Encoders.scalaDouble, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Tick],
        timers: TimerValues): Iterator[HighWater] = {
      var cur = if (hw.exists()) hw.get() else Double.NegativeInfinity
      val out = rows.toSeq.sortBy(_.ts.getTime).flatMap { t =>
        if (t.value > cur) { cur = t.value; Some(HighWater(key, t.ts, t.value)) }
        else None
      }
      hw.update(cur)
      out.iterator
    }
  }

  def highWaterMarksTws(ticks: Dataset[Tick]): Dataset[HighWater] = {
    import ticks.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ticks
      .groupByKey(_.user_id)
      .transformWithState(new HighWaterProcessor, TimeMode.None(),
        OutputMode.Append)
  }

  /** `ts` drives the watermark; `us` is the SAME instant in exact epoch
    * micros (java.sql.Timestamp.getTime truncates to millis — the
    * corpus timestamps all carry sub-millisecond micros, so gap
    * decisions and emitted bounds must run on `us`, never getTime). */
  case class SessEvent(user_id: Long, ts: Timestamp, us: Long)
  case class SessState(startUs: Long, endUs: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Gap sessionization driven by EVENT-TIME TIMERS — the
    * `transformWithState` capability windowed aggregation and
    * `session_window` don't expose: a session closes (and emits exactly
    * once) when the WATERMARK passes its end + gap, via a per-key timer
    * re-armed on every extension. In-batch gaps close inline (the timer
    * only owns the tail session); `handleExpiredTimer` emits and clears.
    * One live timer per key (the previous one is deleted on re-arm), so
    * timer state is O(keys) like the value state. Timers are registered
    * in WATERMARK milliseconds with 1 s of ceiling slack — the exact
    * micro bounds live in the value state, the timer only has to fire
    * at-or-after them.
    */
  class TimerSessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SessEvent, SessionOut] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode,
      TimerValues, TTLConfig, ValueState}
    @transient private var sess: ValueState[SessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessState]("sess",
        Encoders.product[SessState], TTLConfig.NONE)

    private def emit(user: Long, st: SessState) =
      SessionOut(user, st.startUs, st.endUs, st.n)

    override def handleInputRows(key: Long, rows: Iterator[SessEvent],
        timers: TimerValues): Iterator[SessionOut] = {
      var cur = if (sess.exists()) sess.get() else null
      val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
      rows.toSeq.sortBy(_.us).foreach { e =>
        if (cur == null) cur = SessState(e.us, e.us, 1)
        else if (e.us <= cur.endUs + gapUs)
          cur = SessState(cur.startUs, math.max(cur.endUs, e.us), cur.n + 1)
        else { closed += emit(key, cur); cur = SessState(e.us, e.us, 1) }
      }
      if (cur != null) {
        getHandle.listTimers().toList
          .foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer((cur.endUs + gapUs) / 1000L + 1000L)
        sess.update(cur)
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      // a firing timer is always the CURRENT one (re-arm deletes the
      // old), so the session it guards is closed unconditionally
      if (sess.exists()) {
        val cur = sess.get()
        sess.clear()
        Iterator.single(emit(key, cur))
      } else Iterator.empty
    }
  }

  /** @param delay watermark delay on `ts`; timers fire against this
    *              watermark, so emission lag = delay + gap.
    */
  def timerSessions(ev: Dataset[SessEvent], gapSeconds: Long,
      delay: String): Dataset[SessionOut] = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ev.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(
        new TimerSessionProcessor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append)
  }

  case class QEvent(event_type: String, event_id: Long, cents: Long,
      hk: Long)
  case class QElem(hk: Long, id: Long, cents: Long)
  case class QSketchState(n: Long, elems: List[QElem])
  case class QSketchOut(event_type: String, n_seen: Long, k_size: Int,
      hk_checksum: Long, est_p50: Long)

  /** Streaming bottom-k quantile sketch — [[graft.ops.QuantileSketch]]'s
    * merge identity turned into per-key streaming state: each micro-batch
    * folds its rows into the k smallest (hk, id) elements, and because
    * bottomK(state ∪ batch) = bottomK(all rows seen) EXACTLY, the final
    * sketch — and therefore the emitted checksum and median estimate —
    * is batching-invariant: any file order, any trigger sizing, any
    * restart produces the same final row per key, reproducible by a
    * BATCH oracle over the full table. State is O(k) per key forever
    * (the bounded-state contract a growing-reservoir design would
    * violate). Emits the running summary each batch; the final summary
    * is the per-key row with the largest n_seen (strictly monotone — a
    * key emits only on batches that contained its rows).
    */
  def bottomKSketchStream(ev: Dataset[QEvent], k: Int): Dataset[QSketchOut] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[QEvent],
            state: GroupState[QSketchState]) => {
          val prev = state.getOption.getOrElse(QSketchState(0L, Nil))
          val batch = rows.toList
          val n = prev.n + batch.size
          val merged = (prev.elems ++
            batch.map(e => QElem(e.hk, e.event_id, e.cents)))
            .sortBy(e => (e.hk, e.id)).take(k)
          state.update(QSketchState(n, merged))
          val byVal = merged.sortBy(e => (e.cents, e.id))
          val est = byVal((merged.size + 1) / 2 - 1).cents
          Iterator.single(QSketchOut(key, n, merged.size,
            merged.map(_.hk).reduce(_ ^ _), est))
        })
  }
}
