package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model.Bar
import graft.ops.{Resample, TypedResample}
import graft.pipeline.Sink
import graft.streaming.StreamingPipeline

class TypedResampleSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator resample matches the untyped built-in path") {
    val bars = (0 to 22).map { i =>
      Bar(Timestamp.valueOf(f"2024-01-02 09:${i % 60}%02d:00"),
        100.0 + i, 110.0 + i, 90.0 + i, 105.0 + i, 10L + i)
    }
    val typed = TypedResample.ohlcvBars(bars.toDS(), 5)
      .collect().map { case (k, o) =>
        (new Timestamp(k), o.open, o.high, o.low, o.close, o.volume)
      }.sortBy(_._1.getTime).toSeq
    val untyped = Resample.ohlcvBars(bars.toDF(), "5 minutes")
      .orderBy("ts")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(typed == untyped)
  }

  test("streaming foreachBatch sink is idempotent under replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fb").toString
    (0 until 20).map(i => (Timestamp.valueOf(f"2024-01-02 09:$i%02d:10"), 1.0 + i))
      .toDF("ts", "value").write.parquet(s"$dir/in")
    val sink = Sink(s"$dir/out",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("open",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("close",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("volume",
          org.apache.spark.sql.types.LongType))))

    def runOnce(): Unit = {
      val stream = spark.readStream.schema("ts TIMESTAMP, value DOUBLE")
        .parquet(s"$dir/in")
      val bars = StreamingPipeline.ohlcvStream(stream, "value", "5 minutes",
          lateness = "0 seconds")
        .select($"ts", $"open", $"close", $"volume")
      val q = StreamingPipeline.toIdempotentSink(bars, sink)
      q.awaitTermination(60000)
    }
    runOnce()
    val n1 = sink.existing(spark).count()
    assert(n1 > 0)
    runOnce() // full replay of the same input: nothing new may append
    assert(sink.existing(spark).count() == n1)
  }

  test("partitioned sink append creates prunable directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val sink = Sink(s"$dir/out", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("date_market_type",
        org.apache.spark.sql.types.StringType))))
    val df = Seq(
      (Timestamp.valueOf("2024-01-02 09:00:00"), 1.0, "240102D"),
      (Timestamp.valueOf("2024-01-02 16:00:00"), 2.0, "240102N")
    ).toDF("ts", "v", "date_market_type")
    sink.appendPartitioned(df, Seq("date_market_type"))
    assert(new java.io.File(s"$dir/out/date_market_type=240102D").exists())
    assert(sink.existing(spark).count() == 2)
  }
}
