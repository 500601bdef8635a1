package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Streaming family queries + DuckDB oracles (split from the
  * monolithic SparkEntry in round 12; entry bodies unchanged). */
private[graft] trait QueriesStreaming extends QueryShared {

  protected def streamingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // W1-W4 under the driver's independent check: the STREAMING 5-min
    // OHLCV path (StreamingPipeline.ohlcvStream — watermark, append-mode
    // emit-on-close, tumbling window state) run to completion over the
    // events fixture as a file-source stream, oracled by the exact batch
    // SQL it must equal. Mechanics: the fixture is staged to a temp dir
    // plus ONE sentinel row a day past the end; ingesting the sentinel
    // advances the watermark past every real window, and the no-data
    // micro-batch that follows (on by default) flushes them from state —
    // so the emitted set is exactly the batch answer, with the sentinel's
    // own (still-open) window never emitted and its row filtered
    // defensively. The staging copy + scalar max(ts) are harness-side
    // stream simulation (a file stream needs a writable dir), not the
    // measured operator; in production the source is readStream on the
    // ingest feed and no sentinel exists — windows close as real time
    // advances. State at scale: (event_type × open windows) rows, bounded
    // by the watermark horizon, sharded across executors by group key.
    "streaming_5m_ohlcv" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      // Stage ts as TIMESTAMP (LTZ): EventTimeWatermark rejects NTZ. The
      // NTZ→LTZ cast and the final date_format both use the session zone,
      // so the emitted wall-clock strings are cast-invariant; 5-minute
      // buckets stay aligned under any whole-minute zone offset (the
      // driver's Verify session pins UTC regardless). Staged once per
      // (session, sfDir) — the fixture is invariant across bench passes.
      val inDir = stagedEvents.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_q")
          val ev = Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"),
              col("event_type"), col("value"))
          ev.write.parquet(s"$tmp/in")
          ev.agg((max(col("ts")) + expr("INTERVAL 1 DAY")).as("ts"))
            .withColumn("event_type", lit("__sentinel"))
            .withColumn("value", lit(0.0))
            .write.mode("append").parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val stream = s.readStream
        .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
        .parquet(inDir)
      val bars = graft.streaming.StreamingPipeline.ohlcvStream(
        stream, "value", "5 minutes", lateness = "1 minute",
        keys = Seq(col("event_type")))
      // unique sink name per invocation: bench re-runs the query in one
      // session, and append-mode memory sinks accumulate under a reused name
      val qn = s"streaming_5m_ohlcv_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        bars.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).filter(col("event_type") =!= "__sentinel")
        .select(col("event_type"), tsStr(col("ts")).as("ts"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))
        .orderBy("event_type", "ts")
    },


    // VERDICT r8 #8: the reference's back-adjust INTERVAL JOIN inside the
    // micro-batch plan — streaming 5-min bars (watermark, append-mode
    // emit-on-close) left-joined against a BROADCAST settle-config
    // dimension on a range condition (ts ∈ [start_k, settle_k]), exactly
    // the batch ContinuousPipeline composition in streaming form. The
    // dim derives per-DAY intervals from the same events fixture (the
    // orders-month dim of the batch query doesn't overlap the events
    // clock), is computed batch-side like any config table, and
    // broadcast-NLJ-joins each micro-batch's emitted bars — stream-static
    // joins are stateless, so the only streaming state stays the window
    // aggregation's. adj_close = close + diff is emitted UNROUNDED: the
    // diff is an integral count, so the IEEE sum is engine-exact, where
    // a round(·, 2) on a full-precision double is the documented
    // cross-engine flake. Day-boundary bars whose bucket start precedes
    // the day's first tick stay unmatched and take the
    // default-then-overwrite path (empty label, diff 0).
    "streaming_backadjust_5m" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedEvents.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_q")
          val ev = Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"),
              col("event_type"), col("value"))
          ev.write.parquet(s"$tmp/in")
          ev.agg((max(col("ts")) + expr("INTERVAL 1 DAY")).as("ts"))
            .withColumn("event_type", lit("__sentinel"))
            .withColumn("value", lit(0.0))
            .write.mode("append").parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val stream = s.readStream
        .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
        .parquet(inDir)
      val bars = graft.streaming.StreamingPipeline.ohlcvStream(
        stream, "value", "5 minutes", lateness = "1 minute",
        keys = Seq(col("event_type")))
      val dim = Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyyMMdd").as("contract_day"))
        .agg(min(col("ts").cast("timestamp")).as("start_k"),
          max(col("ts").cast("timestamp")).as("settle_k"),
          count(lit(1)).cast("double").as("accumulated_contract_diff"))
      val adj = bars.join(broadcast(dim),
        col("ts") >= col("start_k") && col("ts") <= col("settle_k"), "left")
      val qn = s"streaming_adj_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        adj.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).filter(col("event_type") =!= "__sentinel")
        .select(col("event_type"), tsStr(col("ts")).as("ts"),
          col("close"), col("volume"),
          coalesce(col("contract_day"), lit("")).as("contract_day"),
          (col("close") + coalesce(col("accumulated_contract_diff"),
            lit(0.0))).as("adj_close"))
        .orderBy("event_type", "ts")
    },


    // Chained stateful windowed aggregations in ONE streaming query —
    // the multiple-stateful-operators capability (Spark 3.4+): 5-minute
    // per-type aggregates re-windowed into 60-minute rollups via
    // window(window_col), both levels watermark-driven, append mode.
    // The rollup carries only ASSOCIATIVE, order-independent exact
    // aggregates (count / min / max), so two-level ≡ direct-60m is an
    // engine-exact identity the oracle checks (a double sum would be
    // order-dependent). The sentinel closes level-1 windows, whose
    // emission in the same query advances level-2 past every real hour.
    "streaming_two_level_windows" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedEvents.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_q")
          val ev = Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"),
              col("event_type"), col("value"))
          ev.write.parquet(s"$tmp/in")
          ev.agg((max(col("ts")) + expr("INTERVAL 1 DAY")).as("ts"))
            .withColumn("event_type", lit("__sentinel"))
            .withColumn("value", lit(0.0))
            .write.mode("append").parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val stream = s.readStream
        .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
        .parquet(inDir)
      val l1 = stream.withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
      val l2 = l1
        .groupBy(window(col("window"), "60 minutes"), col("event_type"))
        .agg(sum(col("n")).as("n_events"),
          min(col("lo")).as("min_value"), max(col("hi")).as("max_value"))
      val qn = s"streaming_2lvl_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        l2.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).filter(col("event_type") =!= "__sentinel")
        .select(col("event_type"), tsStr(col("window.start")).as("hour"),
          col("n_events"), col("min_value"), col("max_value"))
        .orderBy("event_type", "hour")
    },


    // Complete-output-mode ranked result — the one output mode the rest
    // of the streaming family doesn't touch, and the only mode where a
    // global sort+limit is legal in a streaming query: top-10 users by
    // event count, the whole result re-emitted per micro-batch, final
    // table ≡ the batch ranking. Complete mode keeps ALL group state by
    // contract — bounded here by user cardinality, the documented
    // trade-off vs append's watermark-evicted state.
    "streaming_topk_complete" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedEventsFull.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_ij")
          Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
              col("event_type"), col("event_id"))
            .write.parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val src = s.readStream
        .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, event_id BIGINT")
        .parquet(inDir)
      val topk = src.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_id"))
        .orderBy(desc("n_events"), col("user_id"))
        .limit(10)
      val qn = s"streaming_topk_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        topk.writeStream.format("memory").queryName(qn)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn)
        .select(col("user_id"), col("n_events"), col("sum_id"))
        .orderBy(desc("n_events"), col("user_id"))
    },


    // Streaming gap sessionization: session_window(ts, 30 min) merges
    // each user's events into variable-length sessions in STREAMING
    // state (append mode, watermark-driven emission — a session emits
    // only once the watermark proves no event can extend it; the
    // sentinel advances the watermark past every real session). The
    // emitted set must equal the batch lag-based gap sessionization —
    // same [start, last+gap) windows, boundary event at exactly +gap
    // starts a NEW session in both formulations. The event-id checksum
    // makes session MEMBERSHIP, not just counts, oracle-checked.
    "streaming_session_window" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedSess.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_sess")
          val ev = Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
              col("event_id"))
          ev.write.parquet(s"$tmp/in")
          ev.agg((max(col("ts")) + expr("INTERVAL 1 DAY")).as("ts"))
            .withColumn("user_id", lit(-1L))
            .withColumn("event_id", lit(-1L))
            .write.mode("append").parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val src = s.readStream
        .schema("ts TIMESTAMP, user_id BIGINT, event_id BIGINT")
        .parquet(inDir)
      val sessions = src
        .withWatermark("ts", "1 minute")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("sum_event_id"))
      val qn = s"streaming_sess_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        sessions.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).filter(col("user_id") =!= -1L)
        .select(col("user_id"),
          tsStr(col("session_window.start")).as("session_start"),
          tsStr(col("session_window.end")).as("session_end"),
          col("n_events"), col("sum_event_id"))
        .orderBy("user_id", "session_start")
    },


    // Streaming exact dedup under the driver's check: documents flow as a
    // file stream through dropDuplicatesWithinWatermark on the normalized
    // text hash. WHICH member of a duplicate group survives depends on
    // arrival order inside a micro-batch (partition-parallel, not
    // deterministic), so the emitted value is the survivor-identity-
    // INVARIANT projection: one md5 text fingerprint per surviving row —
    // exactly the corpus's distinct-fingerprint set iff the streaming
    // dedup kept one-per-hash, which is what the oracle asserts. Emission
    // is immediate (the operator filters, it does not window), so no
    // sentinel row is needed; the watermark column only bounds state.
    "streaming_dedup_hashes" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedDocs.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_dedup")
          // the driver corpus has no EXACT dups (only near-dups), so the
          // stream plants 25 identical copies 10s after their originals;
          // a dedup regression surfaces as 525 emitted fingerprints
          val base = Tables.documents(s, d)
            .select(
              expr("timestampadd(SECOND, doc_id, TIMESTAMP '2024-01-01 00:00:00')")
                .as("ts"),
              col("text"), col("doc_id"))
          base.unionAll(
              base.filter(col("doc_id") < 25)
                .select((col("ts") + expr("INTERVAL 10 SECONDS")).as("ts"),
                  col("text"), col("doc_id")))
            .drop("doc_id")
            .write.parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val stream = s.readStream
        .schema("ts TIMESTAMP, text STRING")
        .parquet(inDir)
      val deduped = graft.streaming.StreamingPipeline
        .dedupStream(stream, lateness = "1 minute")
      val qn = s"streaming_dedup_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        deduped
          .select(TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).orderBy("fp_md5")
    },


    // UPDATE output mode — the third and final output mode (append and
    // complete covered elsewhere): running per-user counts re-emit on
    // every change, so the memory sink holds one row per (user,
    // emission). The result folds emissions with max(n_events) — counts
    // are monotone, so the fold equals the final state no matter how
    // AvailableNow splits the input into micro-batches, making the
    // query batching-invariant by construction rather than by luck.
    "streaming_update_mode_counts" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedEventsFull.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_ij")
          Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
              col("event_type"), col("event_id"))
            .write.parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val src = s.readStream
        .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, event_id BIGINT")
        .parquet(inDir)
      val counts = src.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_id"))
      val qn = s"streaming_upd_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        counts.writeStream.format("memory").queryName(qn)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).groupBy("user_id")
        .agg(max(col("n_events")).as("n_events"),
          max(col("sum_id")).as("sum_id"))
        .orderBy("user_id")
    },


    // The BUILT-IN dropDuplicatesWithinWatermark over the same planted-
    // duplicate stream as streaming_dedup_hashes: the native API and the
    // custom mapGroupsWithState dedup must emit the identical
    // fingerprint set (same oracle). Same state contract, too — keys are
    // evictable once the watermark passes, which is the property that
    // keeps state bounded on an unbounded feed; the custom op remains
    // the variant with controllable eviction semantics
    // (streaming_dedup_eviction drives that difference).
    "streaming_dropdup_api" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedDocs.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_dedup")
          val base = Tables.documents(s, d)
            .select(
              expr("timestampadd(SECOND, doc_id, TIMESTAMP '2024-01-01 00:00:00')")
                .as("ts"),
              col("text"), col("doc_id"))
          base.unionAll(
              base.filter(col("doc_id") < 25)
                .select((col("ts") + expr("INTERVAL 10 SECONDS")).as("ts"),
                  col("text"), col("doc_id")))
            .drop("doc_id")
            .write.parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val stream = s.readStream
        .schema("ts TIMESTAMP, text STRING")
        .parquet(inDir)
      val deduped = stream
        .withColumn("fp_md5", TextAnalysis.fingerprintMd5(col("text")))
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark("fp_md5")
      val qn = s"streaming_dropdup_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        deduped.select(col("fp_md5"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).orderBy("fp_md5")
    },


    // Exactly-once sink contents under at-least-once delivery: the
    // events fixture (4 source files) drains through [[IdempotentSink]]
    // in 4 micro-batches (maxFilesPerTrigger=1), then the WHOLE stream
    // runs a second time from a fresh checkpoint — a full redelivery of
    // every batch. Deterministic (batchId → data) + per-batch overwrite
    // means the second run replaces each batch's directory instead of
    // appending, so the per-type counts equal the plain batch aggregate
    // and the '__batches' row pins the 4-batch split. A sink that
    // appended on redelivery would double every count.
    "streaming_idempotent_sink" -> { (s, d) =>
      import org.apache.spark.sql.types.StructType
      val root = stagedIdem.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_idem")
          Tables.events(s, d)
            .select(col("event_id"), col("event_type"), col("value"))
            .repartition(4)
            .write.parquet(s"$tmp/in")
          tmp
        })
      val schema = StructType.fromDDL(
        "event_id LONG, event_type STRING, value DOUBLE")
      val sink = graft.pipeline.IdempotentSink(s"$root/out", schema)
      def drainOnce(): Unit = withStatePartitions(s, 8) {
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/in")
        sink.attach(stream).awaitTermination(180000)
      }
      drainOnce()
      drainOnce() // redelivery: same batches, overwritten not appended
      val rows = sink.existing(s)
      rows.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
        .unionByName(rows.agg(
          count_distinct(col("batch")).as("n"), lit(0L).as("sum_id"))
          .select(lit("__batches").as("event_type"), col("n"), col("sum_id")))
        .orderBy("event_type")
    },


    // Stream-stream interval join under the driver's check: purchases
    // join each user's views in the following 60 minutes, both sides
    // watermarked (the state-eviction property that makes the join viable
    // on unbounded feeds). Inner stream-stream joins emit matches eagerly
    // — the watermark only bounds state — and the staged fixture drains
    // in one AvailableNow batch, so the emitted pair set is exactly the
    // batch join's and the arrival order cannot drop late rows.
    "streaming_interval_join" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedEventsFull.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_ij")
          Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
              col("event_type"), col("event_id"))
            .write.parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val src = s.readStream
        .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, event_id BIGINT")
        .parquet(inDir)
      val joined = graft.streaming.StreamingPipeline.intervalJoinStream(
        src.filter(col("event_type") === "purchase")
          .select(col("ts"), col("user_id"), col("event_id")),
        src.filter(col("event_type") === "view")
          .select(col("ts"), col("user_id"), col("event_id")),
        keyCol = "user_id", horizon = "60 minutes", lateness = "1 minute")
      val qn = s"streaming_ij_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        joined.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn)
        .select(col("l_user_id").as("user_id"),
          col("l_event_id"), col("r_event_id"))
        .orderBy("l_event_id", "r_event_id")
    },


    // Stream-static enrichment join — the dimension-lookup pattern
    // (routing events through a reference table) in Structured Streaming:
    // a stateless per-batch broadcast hash join, no watermark, no state
    // store; the static side is (re)planned each micro-batch, which is
    // exactly how slowly-changing reference data picks up between
    // batches at scale. The memory-sink table is then batch-aggregated;
    // the oracle joins the same VALUES dimension in SQL, so the stream
    // must deliver every event exactly once with the right enrichment.
    "streaming_static_join" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val inDir = stagedEventsFull.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_ij")
          Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
              col("event_type"), col("event_id"))
            .write.parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val src = s.readStream
        .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, event_id BIGINT")
        .parquet(inDir)
      val dim = Seq(
        ("click", "engagement", 2), ("view", "engagement", 1),
        ("purchase", "transactional", 10), ("signup", "transactional", 5),
        ("error", "ops", 0)).toDF("event_type", "category", "points")
      val qn = s"streaming_static_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        src.join(broadcast(dim), Seq("event_type"))
          .select(col("event_id"), col("user_id"), col("category"),
            col("points"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).groupBy("category")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_checksum"),
          sum(col("points")).as("sum_points"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("category")
    },


    // Spark 4 `transformWithState` under the driver's gate — per-user
    // running high-water marks with typed ValueState on the RocksDB
    // provider, state carried across FOUR micro-batches (time-quartile
    // files, maxFilesPerTrigger=1). The fixture collapses ties to
    // per-(user, ts) maxima so the emitted set is arrival-order-invariant,
    // and the quartile split follows global event-time rank so each user's
    // rows arrive in ts order across batches. The oracle is the batch
    // prefix-maximum: a row emits iff it strictly exceeds every earlier
    // value of its user — any state loss or leak across batch boundaries
    // changes the emitted set and fails the hash.
    "streaming_tws_highwater" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val root = stagedTws.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_tws")
          val ev = Tables.events(s, d)
            .groupBy(col("user_id"), col("ts").cast("timestamp").as("ts"))
            .agg(max(col("value")).as("value"))
          val n = ev.count()
          // single-partition window: fixture staging only, runs once
          val ranked = ev.withColumn("rn",
            row_number().over(Window.orderBy(col("ts"), col("user_id"))))
          for (i <- 0 until 4)
            ranked.filter(col("rn") > i * n / 4 && col("rn") <= (i + 1) * n / 4)
              .select("user_id", "ts", "value")
              .coalesce(1).write.parquet(s"$tmp/in/q$i")
          tmp
        })
      val pkey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(pkey)
      s.conf.set(pkey, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val src = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
          .option("maxFilesPerTrigger", "1").parquet(s"$root/in/*")
          .as[graft.streaming.StatefulOps.Tick]
        val qn = s"streaming_tws_${streamRun.incrementAndGet()}"
        withStatePartitions(s, 8) {
          graft.streaming.StatefulOps.highWaterMarksTws(src)
            .toDF().writeStream.format("memory").queryName(qn)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
            .awaitTermination(180000)
        }
        s.table(qn).select(col("user_id"), tsStr(col("ts")).as("ts"),
            round(col("value"), 6).as("value"))
          .orderBy("user_id", "ts", "value")
      } finally prev match {
        case Some(v) => s.conf.set(pkey, v)
        case None => s.conf.unset(pkey)
      }
    },


    // Streaming CDC apply — merge_upsert's semantics under a stream: the
    // post-cutoff change feed drains in 4 time-quartile micro-batches
    // (maxFilesPerTrigger=1) and each foreachBatch MERGEs its batch into
    // the persisted snapshot (read → Merge.applyChanges → rewrite to a
    // new version — the Delta-less production shape, where a batch pays
    // CHANGE-volume cost, never snapshot cost; see Merge's scaladoc).
    // Sequential latest-wins over time-ordered batches equals the
    // one-shot batch MERGE, so the oracle is merge_upsert's own SQL: any
    // state lost, duplicated, or mis-ordered across batch boundaries —
    // including a tombstoned key resurfacing — fails the hash. State
    // versions are per-run temp dirs (the staged v0 is read-only), so
    // bench re-runs never collide.
    "streaming_merge_upsert" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.expressions.Window
      val cutoff = lit("2024-01-16 00:00:00").cast("timestamp_ntz")
      val root = stagedMergeCdc.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_merge")
          val ev = Tables.events(s, d)
            .select(col("user_id"), col("event_type"), col("value"),
              col("ts").cast("timestamp").as("ts"), col("event_id"))
          val w = Window.partitionBy(col("user_id"))
            .orderBy(col("ts").desc, col("event_id").desc)
          ev.filter(col("ts") < cutoff)
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
            .write.parquet(s"$tmp/state/v0")
          val changes = ev.filter(col("ts") >= cutoff)
          val n = changes.count()
          // single-partition window: fixture staging only, runs once
          val ranked = changes.withColumn("rn",
            row_number().over(Window.orderBy(col("ts"), col("event_id"))))
          for (i <- 0 until 4)
            ranked.filter(col("rn") > i * n / 4 && col("rn") <= (i + 1) * n / 4)
              .drop("rn").coalesce(1).write.parquet(s"$tmp/in/q$i")
          tmp
        })
      val runTmp = stagedTmpDir("graft_merge_run")
      val version = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var cur = s"$root/state/v0"
      val src = s.readStream.schema(
          "user_id BIGINT, event_type STRING, value DOUBLE, " +
            "ts TIMESTAMP, event_id BIGINT")
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in/*")
      withStatePartitions(s, 8) {
        src.writeStream
          .option("checkpointLocation", s"$runTmp/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val base = s.read.parquet(cur)
            val changes = batch.withColumn("op",
              when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
            val next = s"$runTmp/v${version.incrementAndGet()}"
            graft.ops.Merge.applyChanges(base, changes, Seq("user_id"),
                orderCols = Seq(col("ts"), col("event_id")))
              .write.parquet(next)
            cur = next
            ()
          }
          .trigger(Trigger.AvailableNow()).start().awaitTermination(180000)
      }
      s.read.parquet(cur)
        .select(col("user_id"), col("event_type"),
          round(col("value"), 6).as("value"),
          tsStr(col("ts")).as("ts"), col("event_id"))
        .orderBy("user_id")
    },


    // The STREAMING form of the bottom-k quantile sketch: per-key state
    // maintained by flatMapGroupsWithState across four micro-batches of
    // events split by id RESIDUE (deliberately unordered arrival — the
    // merge identity makes the final sketch invariant to any batching,
    // and that invariance IS the check: the final per-key summary must
    // hash-match a BATCH oracle computed over the whole table at once).
    // State is O(k) per key forever; the emitted rows are the per-batch
    // running summaries, and the final one is the max-n_seen row
    // (n_seen is strictly monotone per key).
    "streaming_quantile_sketch" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.expressions.Window
      val inDir = stagedQSketch.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_qsk")
          val ev = Tables.events(s, d)
            .select(col("event_type"), col("event_id"),
              floor(col("value") * 100).cast("long").as("cents"),
              Dedup.md5Hash64(concat(lit("qsk|"), col("event_id")))
                .bitwiseAND(lit(Long.MaxValue)).as("hk"))
          (0 until 4).foreach(i => ev
            .filter(pmod(col("event_id"), lit(4L)) === lit(i.toLong))
            .coalesce(1).write.mode("append").parquet(s"$tmp/in"))
          s"$tmp/in"
        })
      val stream = s.readStream
        .schema("event_type STRING, event_id BIGINT, cents BIGINT, hk BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
      import s.implicits._
      val out = graft.streaming.StatefulOps.bottomKSketchStream(
        stream.as[graft.streaming.StatefulOps.QEvent], k = 256)
      val qn = s"streaming_qsk_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        out.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn)
        .withColumn("rk", row_number().over(Window
          .partitionBy("event_type").orderBy(desc("n_seen"))))
        .filter(col("rk") === 1).drop("rk")
        .orderBy("event_type")
    },


    // SEVENTH driver-checked streaming lifecycle: watermarked stream-stream
    // LEFT OUTER interval join — every purchase paired with the follow-on
    // views inside [ts, ts+60 min], and purchases with NO such view emitted
    // null-padded exactly once, after the watermark closes their window
    // (outer results are final, state evicted — the semantics batch
    // left-joins get for free and streams only get via the time-range
    // condition). Per-side sentinels past end + horizon + lateness flush
    // the tail; the oracle is the plain batch LEFT JOIN.
    "streaming_left_outer_join" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedEventsOuter.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_loj")
          val ev = Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
              col("event_type"), col("event_id"))
          ev.write.parquet(s"$tmp/in")
          ev.agg((max(col("ts")) + expr("INTERVAL 2 DAYS")).as("ts"))
            .select(col("ts"), lit(-1L).as("user_id"),
              explode(array(lit("purchase"), lit("view"))).as("event_type"),
              lit(-1L).as("event_id"))
            .write.mode("append").parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val src = s.readStream
        .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, event_id BIGINT")
        .parquet(inDir)
      val joined = graft.streaming.StreamingPipeline.intervalJoinStream(
        src.filter(col("event_type") === "purchase")
          .select(col("ts"), col("user_id"), col("event_id")),
        src.filter(col("event_type") === "view")
          .select(col("ts"), col("user_id"), col("event_id")),
        keyCol = "user_id", horizon = "60 minutes", lateness = "1 minute",
        joinType = "leftOuter")
      val qn = s"streaming_loj_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        joined.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).filter(col("l_event_id") >= 0)
        .select(col("l_user_id").as("user_id"), col("l_event_id"),
          col("r_event_id"), col("r_event_id").isNull.as("unmatched"))
        .orderBy("l_event_id", "r_event_id")
    },


    // EIGHTH streaming lifecycle: dropDuplicatesWithinWatermark's
    // bounded-state contract made VISIBLE — duplicates arriving within
    // the watermark delay are dropped (25 planted +10 s copies), but a
    // second wave TWO DAYS later re-emits: their key state was evicted
    // when the watermark passed, which is exactly the unbounded-state
    // trade every streaming dedup at scale accepts. Two files,
    // maxFilesPerTrigger=1, so eviction happens between micro-batches;
    // the oracle counts docs 25..49's fingerprints twice.
    "streaming_dedup_eviction" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedDedupEvict.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_evict")
          val base = Tables.documents(s, d)
            .select(
              expr("timestampadd(SECOND, doc_id, TIMESTAMP '2024-01-01 00:00:00')")
                .as("ts"),
              col("text"), col("doc_id"))
          base.unionAll(base.filter(col("doc_id") < 25)
              .select((col("ts") + expr("INTERVAL 10 SECONDS")).as("ts"),
                col("text"), col("doc_id")))
            .drop("doc_id").coalesce(1).write.parquet(s"$tmp/in")
          // two watermark-advancer batches between the waves: eviction is
          // a between-batches effect (a batch must first ADVANCE the
          // watermark, a later one evicts) — without them the engine may
          // legally still suppress the far duplicates (the contract
          // beyond the delay is best-effort, and a single-hop fixture
          // measured exactly that: 500 rows, duplicates suppressed).
          Seq("1", "36").zipWithIndex.foreach { case (h, i) =>
            base.limit(1)
              .select((col("ts") + expr(s"INTERVAL $h HOURS")).as("ts"),
                lit(s"__advancer_$i").as("text"))
              .coalesce(1).write.mode("append").parquet(s"$tmp/in")
          }
          base.filter(col("doc_id") >= 25 && col("doc_id") < 50)
            .select((col("ts") + expr("INTERVAL 2 DAYS")).as("ts"),
              col("text"))
            .coalesce(1).write.mode("append").parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val stream = s.readStream
        .schema("ts TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
      val deduped = graft.streaming.StreamingPipeline
        .dedupStream(stream, lateness = "1 minute")
      val qn = s"streaming_evict_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        deduped
          .select(TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn).orderBy("fp_md5")
    },


    // NINTH streaming lifecycle: watermarked stream-stream FULL OUTER
    // interval join — unmatched PURCHASES null-pad on the right,
    // unmatched VIEWS null-pad on the left, each emitted exactly once
    // after the watermark closes the window in which a match could still
    // have arrived (a view can match a purchase up to 60 min BEFORE it,
    // so its close is ts on the left bound). Same staged fixture and
    // per-side sentinels as the left-outer lifecycle; oracle is the
    // batch FULL OUTER join.
    "streaming_full_outer_join" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedEventsOuter.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_loj")
          val ev = Tables.events(s, d)
            .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
              col("event_type"), col("event_id"))
          ev.write.parquet(s"$tmp/in")
          ev.agg((max(col("ts")) + expr("INTERVAL 2 DAYS")).as("ts"))
            .select(col("ts"), lit(-1L).as("user_id"),
              explode(array(lit("purchase"), lit("view"))).as("event_type"),
              lit(-1L).as("event_id"))
            .write.mode("append").parquet(s"$tmp/in")
          s"$tmp/in"
        })
      val src = s.readStream
        .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, event_id BIGINT")
        .parquet(inDir)
      val joined = graft.streaming.StreamingPipeline.intervalJoinStream(
        src.filter(col("event_type") === "purchase")
          .select(col("ts"), col("user_id"), col("event_id")),
        src.filter(col("event_type") === "view")
          .select(col("ts"), col("user_id"), col("event_id")),
        keyCol = "user_id", horizon = "60 minutes", lateness = "1 minute",
        joinType = "fullOuter")
      val qn = s"streaming_foj_${streamRun.incrementAndGet()}"
      withStatePartitions(s, 8) {
        joined.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination(180000)
      }
      s.table(qn)
        .filter((col("l_event_id").isNull || col("l_event_id") >= 0) &&
          (col("r_event_id").isNull || col("r_event_id") >= 0))
        .select(coalesce(col("l_user_id"), col("r_user_id")).as("user_id"),
          col("l_event_id"), col("r_event_id"))
        .orderBy("l_event_id", "r_event_id")
    },


    // TENTH streaming lifecycle: gap sessionization by EVENT-TIME
    // TIMERS on transformWithState — each key re-arms one timer at
    // session_end + gap; the session emits EXACTLY ONCE when the
    // watermark passes that point (in-batch gaps close inline; only the
    // tail session is timer-owned). This is the arbitrary-state
    // capability session_window's managed aggregation doesn't expose:
    // custom close logic + timer lifecycle + O(keys) state. Fixture:
    // clicks in one file, watermark advancer at max+13h (pushes the
    // watermark past every real end+gap), second advancer at max+2d
    // whose BATCH fires the timers (expiry is checked during a batch
    // against the PREVIOUS batch's watermark — the eviction-lifecycle
    // lesson). Oracle: batch gap sessionization, which the
    // timer-emitted set must equal row for row.
    "streaming_timer_sessions" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val inDir = stagedTimerSess.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_stream_tsess")
          val ev = Tables.events(s, d)
            .filter(col("event_type") === "click")
            .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
          ev.coalesce(1).write.parquet(s"$tmp/in")
          Seq("13 HOURS", "2 DAYS").foreach { h =>
            ev.agg(max(col("ts")).as("mx"))
              .select(lit(-1L).as("user_id"),
                (col("mx") + expr(s"INTERVAL $h")).as("ts"))
              .coalesce(1).write.mode("append").parquet(s"$tmp/in")
          }
          s"$tmp/in"
        })
      val pkey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(pkey)
      s.conf.set(pkey, "org.apache.spark.sql.execution.streaming.state" +
        ".RocksDBStateStoreProvider")
      try {
        import s.implicits._
        val src = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .select(col("user_id"), col("ts"),
            unix_micros(col("ts")).as("us"))
          .as[graft.streaming.StatefulOps.SessEvent]
        val qn = s"streaming_tsess_${streamRun.incrementAndGet()}"
        withStatePartitions(s, 8) {
          graft.streaming.StatefulOps
            .timerSessions(src, gapSeconds = 43200, delay = "1 minute")
            .toDF().writeStream.format("memory").queryName(qn)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
            .awaitTermination(180000)
        }
        s.table(qn).filter(col("user_id") >= 0)
          .select(col("user_id"),
            tsStr(timestamp_micros(col("start_us"))).as("session_start"),
            tsStr(timestamp_micros(col("end_us"))).as("session_end"),
            col("n_events"))
          .orderBy("user_id", "session_start")
      } finally prev match {
        case Some(v) => s.conf.set(pkey, v)
        case None => s.conf.unset(pkey)
      }
    }
  )

  protected def streamingOracles: Map[String, String] = Map(

    // The streaming path must emit EXACTLY the batch answer once the
    // sentinel closes every real window — same oracle as the batch query.
    "streaming_5m_ohlcv" -> ohlcvOracle
      .replace("%BUCKET%", "INTERVAL '5 minutes'").replace("%OFF%", ""),


    // Streaming bars + broadcast interval back-adjust ≡ the same batch
    // composition: 5-min close bars left-joined to per-day intervals,
    // adj_close an exact IEEE sum (diff is an integral count).
    "streaming_backadjust_5m" ->
      """WITH b AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL '5 minutes', ts - INTERVAL 1 MICROSECOND)
        |      AS bts,
        |    arg_max(value, ts) AS close, count(*) AS volume
        |  FROM events GROUP BY 1, 2),
        |dim AS (
        |  SELECT strftime(ts, '%Y%m%d') AS contract_day,
        |    min(ts) AS start_k, max(ts) AS settle_k,
        |    CAST(count(*) AS DOUBLE) AS diff
        |  FROM events GROUP BY 1)
        |SELECT b.event_type,
        |  strftime(b.bts, '%Y-%m-%d %H:%M:%S') AS ts, b.close, b.volume,
        |  coalesce(dim.contract_day, '') AS contract_day,
        |  b.close + coalesce(dim.diff, 0) AS adj_close
        |FROM b LEFT JOIN dim
        |  ON b.bts >= dim.start_k AND b.bts <= dim.settle_k
        |ORDER BY event_type, ts""".stripMargin,


    // Two-level streaming rollup ≡ direct 60-minute aggregation: the
    // carried aggregates are associative (count/min/max), so the
    // identity is exact.
    "streaming_two_level_windows" ->
      """SELECT event_type,
        |  strftime(time_bucket(INTERVAL '60 minutes', ts),
        |           '%Y-%m-%d %H:%M:%S') AS hour,
        |  count(*) AS n_events, min(value) AS min_value,
        |  max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, hour""".stripMargin,


    // Complete-mode top-k ≡ the batch ranking (deterministic id
    // tiebreak).
    "streaming_topk_complete" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events GROUP BY 1
        |ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin,


    // Batch gap sessionization with session_window's boundary rule
    // (an event at exactly prev+gap opens a NEW session — windows are
    // [start, last+gap) half-open), session end = last event + gap.
    "streaming_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR lag(ts) OVER w + INTERVAL 1800 SECONDS <= ts THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |idx AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 1800 SECONDS,
        |           '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events, CAST(sum(event_id) AS BIGINT) AS sum_event_id
        |FROM idx GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,


    // One fingerprint per surviving row == the corpus's distinct
    // fingerprint set (one-per-hash is the operator's contract; the md5
    // projection is survivor-identity-invariant).
    "streaming_dedup_hashes" ->
      """SELECT DISTINCT
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
        |FROM documents ORDER BY fp_md5""".stripMargin,


    // Update-mode emissions folded by the monotone max equal the batch
    // per-user aggregate.
    "streaming_update_mode_counts" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,


    // The built-in dropDuplicatesWithinWatermark must emit the same
    // distinct-fingerprint set as the custom dedup op.
    "streaming_dropdup_api" ->
      """SELECT DISTINCT
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
        |FROM documents ORDER BY fp_md5""".stripMargin,


    // The sink's contents after a full redelivery must equal the plain
    // batch aggregate; the 4-batch split is fixed by the fixture files.
    "streaming_idempotent_sink" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events GROUP BY event_type
        |UNION ALL SELECT '__batches', 4, 0
        |ORDER BY event_type""".stripMargin,


    // The batch equivalent of the watermarked stream-stream join: the
    // inner join emits eagerly, so the pair sets must be identical.
    "streaming_interval_join" ->
      """SELECT a.user_id, a.event_id AS l_event_id, b.event_id AS r_event_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND a.event_type = 'purchase' AND b.event_type = 'view'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE
        |ORDER BY l_event_id, r_event_id""".stripMargin,


    // The same VALUES dimension joined in SQL: the streamed result must
    // deliver every event exactly once with the right enrichment.
    "streaming_static_join" ->
      """WITH dim(event_type, category, points) AS (VALUES
        |  ('click', 'engagement', 2), ('view', 'engagement', 1),
        |  ('purchase', 'transactional', 10), ('signup', 'transactional', 5),
        |  ('error', 'ops', 0))
        |SELECT category, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(points) AS BIGINT) AS sum_points,
        |  count(DISTINCT user_id) AS n_users
        |FROM events JOIN dim USING (event_type)
        |GROUP BY 1 ORDER BY category""".stripMargin,


    // Batch prefix-maximum over the tie-collapsed series: a row emits iff
    // it strictly exceeds every earlier value of its user.
    "streaming_tws_highwater" ->
      """WITH t AS (
        |  SELECT user_id, ts, max(value) AS value FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, ts, value,
        |    max(value) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM t)
        |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  round(value, 6) AS value
        |FROM r WHERE pm IS NULL OR value > pm
        |ORDER BY user_id, ts, value""".stripMargin,


    // The one-shot batch MERGE the sequential stream must equal —
    // merge_upsert's oracle verbatim.
    "streaming_merge_upsert" ->
      """WITH base AS (
        |  SELECT user_id, event_type, value, ts, event_id FROM events
        |  WHERE ts < TIMESTAMP '2024-01-16'
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |                             ORDER BY ts DESC, event_id DESC) = 1),
        |chg AS (
        |  SELECT user_id, event_type, value, ts, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16'
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |                             ORDER BY ts DESC, event_id DESC) = 1),
        |m AS (
        |  SELECT user_id, event_type, value, ts, event_id FROM base
        |  WHERE user_id NOT IN (SELECT user_id FROM chg)
        |  UNION ALL
        |  SELECT user_id, event_type, value, ts, event_id FROM chg
        |  WHERE op <> 'D')
        |SELECT user_id, event_type, round(value, 6) AS value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id
        |FROM m ORDER BY user_id""".stripMargin,


    // The batch twin of the streaming state: bottom-256 per type over
    // the WHOLE table — batching-invariance means the streamed final
    // summary must equal this exactly (xor checksum included).
    "streaming_quantile_sketch" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    CAST(md5_number_upper('qsk|' || event_id)
        |      & 9223372036854775807 AS BIGINT) AS hk
        |  FROM events),
        |sk AS (
        |  SELECT * FROM ev
        |  QUALIFY row_number() OVER (PARTITION BY event_type
        |    ORDER BY hk, event_id) <= 256),
        |tot AS (SELECT event_type, count(*) AS n FROM ev GROUP BY 1),
        |est AS (
        |  SELECT event_type, cents AS est_p50 FROM (
        |    SELECT event_type, cents,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY cents, event_id) AS vr,
        |      count(*) OVER (PARTITION BY event_type) AS ksz
        |    FROM sk)
        |  WHERE vr = (ksz + 1) // 2)
        |SELECT s.event_type, CAST(t.n AS BIGINT) AS n_seen,
        |  CAST(count(*) AS INT) AS k_size,
        |  CAST(bit_xor(s.hk) AS BIGINT) AS hk_checksum,
        |  e.est_p50
        |FROM sk s JOIN tot t USING (event_type)
        |  JOIN est e USING (event_type)
        |GROUP BY s.event_type, t.n, e.est_p50
        |ORDER BY s.event_type""".stripMargin,


    // The batch LEFT JOIN the watermarked streaming outer join must equal.
    "streaming_left_outer_join" ->
      """WITH p AS (
        |  SELECT ts, user_id, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT ts, user_id, event_id FROM events
        |  WHERE event_type = 'view')
        |SELECT p.user_id, p.event_id AS l_event_id,
        |  v.event_id AS r_event_id, v.event_id IS NULL AS unmatched
        |FROM p LEFT JOIN v ON p.user_id = v.user_id
        |  AND v.ts >= p.ts AND v.ts <= p.ts + INTERVAL 60 MINUTES
        |ORDER BY l_event_id, r_event_id""".stripMargin,


    // Every fingerprint once, plus docs 25..49 a second time (their +2 d
    // duplicates arrive after state eviction and re-emit).
    "streaming_dedup_eviction" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |      AS fp_md5
        |  FROM documents)
        |SELECT fp_md5 FROM (
        |  SELECT DISTINCT fp_md5 FROM f
        |  UNION ALL
        |  SELECT DISTINCT fp_md5 FROM f WHERE doc_id >= 25 AND doc_id < 50
        |  UNION ALL
        |  SELECT md5('__advancer_0')
        |  UNION ALL
        |  SELECT md5('__advancer_1'))
        |ORDER BY fp_md5""".stripMargin,


    // The batch FULL OUTER the streaming join must equal.
    "streaming_full_outer_join" ->
      """WITH p AS (
        |  SELECT ts, user_id, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT ts, user_id, event_id FROM events
        |  WHERE event_type = 'view')
        |SELECT coalesce(p.user_id, v.user_id) AS user_id,
        |  p.event_id AS l_event_id, v.event_id AS r_event_id
        |FROM p FULL OUTER JOIN v ON p.user_id = v.user_id
        |  AND v.ts >= p.ts AND v.ts <= p.ts + INTERVAL 60 MINUTES
        |ORDER BY l_event_id, r_event_id""".stripMargin,


    // The batch gap sessionization the timer-driven emission must equal.
    "streaming_timer_sessions" ->
      """WITH ev AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR lag(ts) OVER w + INTERVAL 43200 SECONDS < ts THEN 1
        |         ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |idx AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_idx
        |  FROM flagged)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events
        |FROM idx GROUP BY user_id, session_idx
        |ORDER BY user_id, session_start""".stripMargin
  )
}
