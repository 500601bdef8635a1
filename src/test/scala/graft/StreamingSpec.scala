package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingPipeline

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming 5-min OHLCV: append mode emits only watermark-closed windows, values match batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // two 5-min buckets of ticks (one per minute 09:00..09:09) + one
    // straggler opening a third bucket
    val ticks = (0 until 10).map { i =>
      (Timestamp.valueOf(f"2024-01-02 09:0$i%d:10"), 100.0 + i)
    } :+ ((Timestamp.valueOf("2024-01-02 09:59:00"), 999.0))
    ticks.toDF("ts", "value").coalesce(1).write.parquet(s"$dir/in")

    val stream = spark.readStream
      .schema("ts TIMESTAMP, value DOUBLE")
      .parquet(s"$dir/in")
    val bars = StreamingPipeline.ohlcvStream(stream, "value", "5 minutes",
      lateness = "1 minute")
    val q = bars.writeStream
      .format("memory").queryName("bars_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val out = spark.table("bars_out")
      .orderBy("ts")
      .select(date_format($"ts", "HH:mm").as("t"), $"open", $"close", $"volume")
      .collect()
    // watermark = 09:59 - 1min = 09:58 -> buckets 09:00 and 09:05 closed,
    // the 09:55 bucket (straggler) stays open and is NOT emitted
    assert(out.map(_.getString(0)).toSeq == Seq("09:00", "09:05"))
    // closed-right semantics shared with batch: bucket 09:00 holds the
    // ticks at 09:00:10..09:04:10
    assert(out(0).getAs[Long]("volume") == 5L)
    assert(out(0).getAs[Double]("open") == 100.0)
    assert(out(0).getAs[Double]("close") == 104.0)
  }

  test("streaming gap sessions: closed sessions emit and match the batch form") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream3").toString
    val events = Seq(
      (7L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (7L, Timestamp.valueOf("2024-01-01 10:10:00")), // same session (10 min)
      (7L, Timestamp.valueOf("2024-01-01 12:00:00")), // > 30 min -> new session
      (9L, Timestamp.valueOf("2024-01-01 10:05:00")),
      (99L, Timestamp.valueOf("2024-01-01 23:00:00")) // sentinel: advances watermark, stays open
    )
    events.toDF("user_id", "ts").coalesce(1).write.parquet(s"$dir/in")

    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP")
      .parquet(s"$dir/in")
    val sessions = StreamingPipeline.sessionStream(
      stream, Seq($"user_id"), gap = "30 minutes", lateness = "1 minute")
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val out = spark.table("sessions_out")
      .orderBy("user_id", "session_start")
      .select($"user_id", date_format($"session_start", "HH:mm").as("s"),
        date_format($"session_end", "HH:mm").as("e"), $"n_events")
      .as[(Long, String, String, Long)].collect().toSeq
    // sentinel watermark 22:59 closes every earlier session; its own stays open
    assert(out == Seq(
      (7L, "10:00", "10:10", 2L),
      (7L, "12:00", "12:00", 1L),
      (9L, "10:05", "10:05", 1L)))

    // parity with the batch operator on the closed sessions
    val batch = graft.ops.Sessionize.sessions(
        events.toDF("user_id", "ts").filter($"user_id" =!= 99L),
        Seq("user_id"), "ts", gapSeconds = 1800)
      .orderBy("user_id", "session_start")
      .select($"user_id", date_format($"session_start", "HH:mm"),
        date_format($"session_end", "HH:mm"), $"n_events")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(batch == out)
  }

  test("streaming dedup drops duplicate text across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream4").toString
    // two files = two micro-batches (maxFilesPerTrigger=1); the duplicate
    // text reappears in batch 2 and must be dropped by cross-batch state
    Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), "the same document"),
        (2L, Timestamp.valueOf("2024-01-01 10:01:00"), "another document"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/in")
    Seq((3L, Timestamp.valueOf("2024-01-01 10:02:00"), "THE  same   document"),
        (4L, Timestamp.valueOf("2024-01-01 10:03:00"), "a third document"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream
      .schema("doc_id BIGINT, ts TIMESTAMP, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in")
    val q = StreamingPipeline.dedupStream(stream, lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
    // docs 1 and 3 normalize to the same text: exactly one survives
    // (whichever batch ran first); 2 and 4 always survive
    assert(kept.size == 3 && kept.intersect(Set(1L, 3L)).size == 1
      && kept.contains(2L) && kept.contains(4L), s"kept: $kept")
  }

  test("dedup state is watermark-bounded: numRowsTotal tracks the lateness window, not stream length") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-state").toString
    // 6 micro-batches of 100 DISTINCT docs each, event time advancing 20
    // minutes per batch under a 10-minute watermark: the state store may
    // only hold keys within the lateness window of the max event time,
    // so it must stay ~1 batch deep (plus one batch of eviction lag) —
    // an unbounded dedup would end at 600 state rows and OOM a
    // long-running job at production rates. This is the operational
    // metric (StateOperatorProgress.numRowsTotal) a 100 TB stream is
    // monitored by, asserted rather than eyeballed.
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    for (b <- 0 until 6) {
      (0 until 100).map { i =>
        (b * 100L + i, new Timestamp(base + b * 20 * 60000L + i * 100L),
          s"doc b$b i$i unique ${b * 100 + i}")
      }.toDF("doc_id", "ts", "text").coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, ts TIMESTAMP, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in")
    val q = StreamingPipeline.dedupStream(stream, lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_state_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    val stateRows = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsTotal)
    assert(stateRows.nonEmpty, "no state-operator progress recorded")
    assert(stateRows.max <= 300,
      s"state grew to ${stateRows.max} rows — watermark eviction did not " +
        s"engage (per-batch history: ${stateRows.mkString(",")})")
    // all inputs distinct: eviction must forget KEYS, not drop output.
    // (>= 400 not == 600: if the file source ever processed a batch far
    // out of order, its rows would be legitimately late-dropped.)
    assert(spark.table("dedup_state_out").count() >= 400)
  }

  test("stream-stream interval join matches the batch join, state watermark-bounded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ssj").toString
    val clicks = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "c1"),
      (1L, Timestamp.valueOf("2024-01-01 11:00:00"), "c2"),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), "c3"))
    val purchases = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), 9.99), // within 10 min of c1
      (1L, Timestamp.valueOf("2024-01-01 10:20:00"), 5.00), // outside c1's window
      (2L, Timestamp.valueOf("2024-01-01 10:31:00"), 1.25), // within c3
      (2L, Timestamp.valueOf("2024-01-01 23:00:00"), 0.01)) // watermark sentinel
    clicks.toDF("user_id", "ts", "click_id").coalesce(1).write.parquet(s"$dir/c")
    purchases.toDF("user_id", "ts", "amount").coalesce(1).write.parquet(s"$dir/p")

    def joined(c: org.apache.spark.sql.DataFrame, p: org.apache.spark.sql.DataFrame) =
      StreamingPipeline.intervalJoinStream(c, p, "user_id",
        horizon = "10 minutes", lateness = "1 minute")
        .select($"l_click_id", $"r_amount")

    val cs = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, click_id STRING")
      .parquet(s"$dir/c")
    val ps = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, amount DOUBLE")
      .parquet(s"$dir/p")
    val q = joined(cs, ps).writeStream
      .format("memory").queryName("ssj_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("ssj_out")
      .as[(String, Double)].collect().toSet

    // batch parity on the same inputs
    val batch = joined(spark.read.parquet(s"$dir/c"), spark.read.parquet(s"$dir/p"))
      .as[(String, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set(("c1", 9.99), ("c3", 1.25)))
  }

  test("stateless session labels work on a stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    Seq((Timestamp.valueOf("2024-01-03 02:00:00"), 1.0))
      .toDF("ts", "value").write.parquet(s"$dir/in")
    val labeled = StreamingPipeline.withSessionLabels(
      spark.readStream.schema("ts TIMESTAMP, value DOUBLE").parquet(s"$dir/in"))
    val q = labeled.writeStream.format("memory").queryName("labels_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val r = spark.table("labels_out").collect()(0)
    assert(r.getAs[String]("session_id") == "2024-01-02_N")
    assert(r.getAs[String]("date_market_type") == "240102N")
  }
}
