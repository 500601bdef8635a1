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
}
