package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.time.SessionCalendar

/** Structured Streaming variant of the continuous pipeline: the concepts
  * the reference hand-rolls as cron-batch (SURVEY.md §2.9) expressed
  * natively —
  *
  *  - W1 watermark/exactly-once: `withWatermark` + append output mode
  *    replaces the sink max-ts probe + strict filter (main.py:548-561);
  *  - W2 tumbling windows: the same `window()` aggregation as batch;
  *  - W3 emit-on-close: append mode emits a window only after the
  *    watermark passes its end — the reference's "only upload finished
  *    sessions" drop (main.py:325-366) for free;
  *  - W4 late data: rows older than the watermark are dropped, the same
  *    trade-off the reference makes re-fetching a 7-day overlap
  *    (main.py:61, 543-546).
  *
  * The aggregation itself is shared with the batch path — one definition,
  * two execution modes. Note closed-right bucket edges use the same
  * ε-shift; the shifted column participates in the watermark.
  *
  * Scale: stateful window aggregation shards by (window, keys) across
  * executors; state size is bounded by watermark horizon × key
  * cardinality, not stream length. Sink idempotency under retries comes
  * from `foreachBatch` + MERGE (or an idempotent file sink) in production.
  */
object StreamingPipeline {

  /** 5-min OHLCV bars over a (possibly streaming) tick source, emitted
    * only when the watermark closes the bucket.
    *
    * @param ticks     streaming DataFrame with tsCol + valueCol (+ keys)
    * @param lateness  watermark horizon, e.g. "10 minutes" (the batch
    *                  pipeline's analog is the 7-day re-fetch overlap)
    */
  def ohlcvStream(
      ticks: DataFrame,
      valueCol: String,
      width: String,
      lateness: String,
      tsCol: String = "ts",
      keys: Seq[Column] = Nil): DataFrame = {
    val shifted = ticks
      .withColumn("__ts", col(tsCol) - expr("INTERVAL 1 MICROSECOND"))
      .withWatermark("__ts", lateness)
    val v = col(valueCol)
    shifted
      .groupBy(keys :+ window(col("__ts"), width): _*)
      .agg(
        min_by(v, col("__ts")).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, col("__ts")).as("close"),
        count(lit(1)).as("volume"))
      .withColumn(tsCol, col("window.start"))
      .drop("window")
  }

  /** Session-labeled stream: same per-row session expressions as batch
    * (stateless projection — no watermark needed).
    */
  def withSessionLabels(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("session_id", SessionCalendar.sessionId(col(tsCol)))
      .withColumn("date_market_type", SessionCalendar.dateMarketType(col(tsCol)))

  /** Stream → idempotent sink: `foreachBatch` re-applies the batch
    * watermark filter against the sink before every append, so a replayed
    * micro-batch (failure/restart redelivery) appends nothing twice — the
    * streaming twin of the reference's Gate 2 "double insurance"
    * (main.py:459-472), here actually load-bearing because Structured
    * Streaming's at-least-once `foreachBatch` can re-run a batch.
    */
  def toIdempotentSink(bars: DataFrame, sink: graft.pipeline.Sink,
      tsCol: String = "ts"): org.apache.spark.sql.streaming.StreamingQuery =
    bars.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.append(graft.ops.Watermark.incremental(
          batch, sink.existing(batch.sparkSession), tsCol))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
