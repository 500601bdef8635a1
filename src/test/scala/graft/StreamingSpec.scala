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
