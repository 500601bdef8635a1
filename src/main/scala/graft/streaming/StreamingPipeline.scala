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

  /** Gap-session summaries over a stream — the stateful twin of the batch
    * [[graft.ops.Sessionize]] (whose doc names this form): Structured
    * Streaming's `session_window` merges events separated by less than
    * `gap`, keeps per-session state in the state store, and append mode
    * emits a session only after the watermark passes its close — the
    * streaming analog of "a session is final once `gap` of silence has
    * provably elapsed".
    *
    * Boundary note: `session_window` treats a session's extent as
    * half-open `[first, last + gap)`, so an event at EXACTLY last + gap
    * starts a new session, where the batch form's strict
    * `prev + gap < ts` test keeps it joined — the one-instant difference
    * inherent to the two formulations (documented rather than papered
    * over; real event streams never hit it).
    *
    * Scale: state is sharded by (key, session) and bounded by the
    * watermark horizon × active-key cardinality; sessions merge on the
    * state-store side, so no shuffle beyond the one hash exchange on keys.
    *
    * Output: keys + session_start, session_end (last event ts), n_events —
    * the batch summary shape.
    */
  def sessionStream(
      events: DataFrame,
      keys: Seq[Column],
      gap: String,
      lateness: String,
      tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(keys :+ session_window(col(tsCol), gap): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("session_window")

  /** Streaming exact dedup — the streaming twin of [[graft.ops.Dedup.exact]]:
    * key the state on the 64-bit normalized-text hash and drop any row whose
    * hash was already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark`). State is (hash → seen) per key,
    * evicted once the watermark passes — bounded by horizon × distinct-doc
    * rate, not stream length, which is what makes exact dedup viable on an
    * unbounded ingest feed. The hash (not the text) is the state key, the
    * same never-ship-text-twice rule as the batch form.
    */
  def dedupStream(docs: DataFrame, lateness: String,
      textCol: String = "text", tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("__th", xxhash64(graft.ops.Dedup.normalize(col(textCol))))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__th")
      .drop("__th")

  /** Stream-stream interval join with watermark-bounded state: each left
    * row joins right rows with the same key whose timestamp falls in
    * [left_ts, left_ts + horizon]. BOTH sides carry watermarks and the
    * join predicate carries the time range, which is exactly what lets
    * Structured Streaming evict buffered rows once the watermark passes —
    * state is horizon × arrival rate, not stream length, the property
    * that makes a stream-stream join viable on unbounded feeds. Output
    * columns are prefixed (`l_`/`r_`) so key/timestamp pairs survive the
    * join unambiguously.
    */
  /** Stream-stream interval join. `joinType` "inner" (default) emits
    * matches as they form; "leftOuter" additionally emits each unmatched
    * left row null-padded once the watermark proves its `[ts, ts+horizon]`
    * window can no longer match — the time-range condition on both sides
    * is what lets Spark evict state, so outer results are final, not
    * provisional. (An unmatched row near the head of the stream therefore
    * only flushes after the watermark passes its horizon: batch-parity
    * fixtures need a sentinel beyond `end + horizon + lateness`.)
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      keyCol: String, horizon: String, lateness: String,
      tsCol: String = "ts", joinType: String = "inner"): DataFrame = {
    val l = left.toDF(left.columns.toIndexedSeq.map("l_" + _): _*)
      .withWatermark(s"l_$tsCol", lateness)
    val r = right.toDF(right.columns.toIndexedSeq.map("r_" + _): _*)
      .withWatermark(s"r_$tsCol", lateness)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $horizon"),
      joinType)
  }

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
